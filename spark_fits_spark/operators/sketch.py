"""Communication-bounded frequency sketches.

``heavy_hitters`` is the distributed Misra–Gries / Space-Saving summary:
every partition compresses its item stream into at most ``capacity``
counters, so the aggregation shuffle moves ``O(partitions × capacity)``
rows **regardless of corpus size** — the 100 TB story is that finding
the top tokens of a 5-trillion-token corpus costs a capacity-sized
sketch per task instead of a vocabulary-sized exchange.

The summary carries a *deterministic* error guarantee (Misra–Gries,
made mergeable per Agarwal et al., "Mergeable Summaries", PODS 2012):

- every estimate UNDERcounts: ``est(i) <= exact(i)``;
- the total undercount is bounded: ``exact(i) - est(i) <= bound`` where
  ``bound = Σ_p cut_p`` and ``cut_p`` is partition p's (capacity+1)-th
  largest item count (0 if the partition holds ≤ capacity distinct
  items);
- any item with ``exact(i) > bound`` is GUARANTEED to appear in the
  candidate set (if it missed every partition's top-``capacity``, its
  exact count would be ≤ the sum of the cuts).

Those three facts are what the driver gate checks (q97): Spark computes
the sketch AND the exact side, emits the guarantees as booleans, and
the SQL oracle replays the exact side asserting every boolean TRUE —
the q46 pattern for sketch operators whose raw estimates are not
SQL-replayable.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["heavy_hitters"]


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    *,
    capacity: int = 1024,
    n_parts: int | None = 16,
) -> DataFrame:
    """Approximate item frequencies via per-partition Misra–Gries
    summaries → ``(item, est, bound)`` candidates (at most
    ``capacity × partitions`` rows; in practice far fewer).

    Per partition: exact local counts (bounded by the partition's
    distinct items), truncated to the ``capacity`` items whose count
    exceeds ``cut`` = the (capacity+1)-th largest local count, each
    reported as ``count - cut``. Truncation depends only on the
    *multiset of local counts* — never on arrival order — so the sketch
    is deterministic given partition membership.

    ``n_parts`` pins partition membership by hash-repartitioning on the
    item (deterministic across runs and cluster sizes — what the
    correctness gate needs; also makes each item's estimate
    single-partition exact-minus-cut). Pass ``n_parts=None`` to sketch
    the NATURAL scan partitions instead — no repartition shuffle at
    all, only sketch rows move; estimates then depend on the partition
    layout but the MG guarantees (checked by q97) hold either way.

    NULL items are ignored. Returns one row per candidate with the
    global ``bound`` broadcast onto every row.
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    items = df.select(F.col(item_col).cast("string").alias("item")) \
        .where(F.col(item_col).isNotNull())
    if n_parts is not None:
        items = items.repartition(n_parts, "item")
    cap = capacity

    def sketch(batches: Iterator) -> Iterator:
        import pandas as pd

        counts: dict = {}
        for pdf in batches:
            for v, c in pdf["item"].value_counts().items():
                counts[v] = counts.get(v, 0) + int(c)
        if len(counts) > cap:
            cut = sorted(counts.values(), reverse=True)[cap]
        else:
            cut = 0
        out = [(v, c - cut, False) for v, c in counts.items() if c > cut]
        out.append((None, cut, True))  # sentinel: this partition's cut
        yield pd.DataFrame(out, columns=["item", "est", "is_cut"])

    from spark_fits_spark.caching import tracked_persist

    # cand and bound both read the sketch output; persist it so the
    # corpus is scanned and sketched ONCE per action, not per subtree
    sk = tracked_persist(
        items.mapInPandas(sketch,
                          schema="item string, est long, is_cut boolean"))
    cand = (
        sk.where(~F.col("is_cut"))
        .groupBy("item")
        .agg(F.sum("est").alias("est"))
    )
    bound = sk.where(F.col("is_cut")).agg(F.sum("est").alias("bound"))
    return cand.crossJoin(F.broadcast(bound))
