"""Linear quality classifier: hash-trick bag-of-words + batch perceptron.

The model-based quality filter role in curation pipelines (GPT-3's
LR-over-WebText-features, CCNet/fastText quality gates): score every
document with a linear model over hashed token counts and gate on the
margin. Two deliberate design choices keep it exact and
oracle-checkable at any scale:

- **Integer arithmetic end to end.** Features are token counts, labels
  are ±1, and batch perceptron updates (``w += Σ y·x`` over
  misclassified docs) stay in int64 — no sigmoid/exp whose libm
  implementations differ across engines, so a DuckDB oracle replays the
  whole training trajectory bit-exactly (the kmeans/BPE pattern).
- **Parameter-bounded driver traffic.** Each training step collects one
  ``dim``-sized gradient (the per-bucket ``Σ y·c`` over misclassified
  docs) — like kmeans' k×dim centroids — and folds the next weight
  vector into literal expressions. Margins are computed MAP-SIDE per
  document (``aggregate`` over the bucket array), so scoring a corpus
  is shuffle-free and the fit costs one dim-sized shuffle per step.

Batch semantics (decision-function convention ``sign(0) = -1``): step t
misclassifies doc d iff ``sign(w_t·x_d) != y_d``; ``w_{t+1} = w_t +
Σ_mis y·x``. Step 1 from ``w_0 = 0`` therefore sums the positive class
— the standard batch-perceptron warm start.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_fits_spark.caching import tracked_persist
from spark_fits_spark.functions.text import spread_for_cpu, tokens


def hashed_buckets(col: Column | str, dim: int = 64) -> Column:
    """Hash-trick feature buckets: md5(token) → int64 → ``% dim``, one
    entry per (non-empty) token occurrence. Mirrored in SQL as
    ``CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % dim``."""
    return F.transform(
        F.filter(tokens(col), lambda t: F.length(t) > 0),
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10)
        .cast("long") % dim,
    )


def _margin(weights: list[int], buckets: Column) -> Column:
    """Map-side integer margin ``w·x`` from a bucket array: bucket →
    weight via a literal int64 map (dim entries inlined once per plan,
    not per row)."""
    wmap = F.map_from_arrays(
        F.array(*[F.lit(b).cast("long") for b in range(len(weights))]),
        F.array(*[F.lit(int(w)).cast("long") for w in weights]),
    )
    return F.aggregate(
        buckets, F.lit(0).cast("long"),
        lambda acc, b: acc + F.element_at(wmap, b))


def perceptron_fit(
    df: DataFrame,
    text_col: str,
    y_col: str,
    *,
    dim: int = 64,
    steps: int = 3,
) -> list[int]:
    """Train ``steps`` batch-perceptron rounds; returns the final int64
    weight vector (length ``dim``). ``y_col`` must hold ±1 labels.

    Plan per step: one scan of the persisted (y, buckets) projection
    computing map-side margins → misclassified filter → explode buckets
    → dim-row groupBy (the gradient) → driver collect of ≤ dim ints.
    The projection is pinned via ``tracked_persist`` (released by a
    ``caching.release_after()`` scope or caller ``clearCache()``)."""
    base = tracked_persist(
        spread_for_cpu(df).select(
            F.col(y_col).cast("long").alias("_y"),
            hashed_buckets(text_col, dim).alias("_b"),
        )
    )
    w = [0] * dim
    for _ in range(steps):
        margin = _margin(w, F.col("_b"))
        pred = F.when(margin > 0, F.lit(1)).otherwise(F.lit(-1))
        grad_rows = (
            base.where(pred != F.col("_y"))
            .select("_y", F.explode("_b").alias("_bk"))
            .groupBy("_bk").agg(F.sum("_y").alias("_g"))
            .collect()  # bounded-collect: ≤ dim rows per step
        )
        if not grad_rows:
            break  # converged: nothing misclassified
        for r in grad_rows:
            w[int(r["_bk"])] += int(r["_g"])
    return w


def score_margins(
    df: DataFrame,
    text_col: str,
    weights: list[int],
) -> Column:
    """Integer decision margin ``w·x`` per row — pure map-side column
    (zero shuffle at any corpus size); gate with ``margin > 0`` or feed
    ``sample.top_fraction_by_score`` for a quantile gate."""
    return _margin(weights, hashed_buckets(text_col, len(weights)))
