"""Deterministic sampling, splitting, and sequence-packing operators for
training-data pipelines.

All decisions are hash-based (md5 of a salted id), never RNG-based, so a
row's fate is a pure function of its id: results are reproducible across
runs, partitionings, and cluster sizes, a resample with a new salt is
independent of the old one, and the SQL oracle can replicate every
decision bit-for-bit.

Scale notes (100 TB):
- ``stratified_sample`` / ``hash_split`` are pure map-side column
  expressions — no shuffle, no driver state, trivially parallel.
- ``pack_sequences`` needs a *global* running token total, which a naive
  ``Window.orderBy`` would compute on a single partition (a scale-killer).
  Instead it does a distributed prefix sum: range-repartition by the
  order key, per-partition window cumsum, then a prefix sum over the
  per-partition totals — a table with ONE row per partition, so its
  global window is O(#partitions), not O(#rows) — broadcast-joined
  back. Work per data row is O(1); nothing flows through the driver.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from spark_fits_spark.caching import tracked_local_checkpoint

__all__ = ["hash_bucket", "stratified_sample", "hash_split", "pack_sequences",
           "take_token_budget", "shuffle_shards", "take_n_per_stratum",
           "temperature_mix", "top_fraction_by_score", "weighted_sample"]

#: hash-bucket resolution: rates are quantized to 1/10000ths.
N_BUCKETS = 10_000


def hash_bucket(id_col: Column | str, salt: str, buckets: int = N_BUCKETS) -> Column:
    """Deterministic bucket in ``[0, buckets)``: int64 from the first 15
    hex digits of ``md5('<salt>|<id>')``, mod ``buckets``. Mirrored in
    SQL as ``CAST(('0x' || substr(md5(...), 1, 15)) AS BIGINT) % buckets``."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    salted = F.concat(F.lit(f"{salt}|"), c.cast("string"))
    return (
        F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")
        % F.lit(buckets)
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: Mapping[str, float],
    *,
    id_col: str,
    salt: str = "sample",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row of stratum ``s`` with probability ``rates[s]``
    (quantized to 1/10000), decided by the row's hash bucket — exact
    per-stratum rates in expectation, deterministic membership.

    This is the data-mixing primitive: per-source quotas for a training
    mix are ``rates={source: weight}``. Strata absent from ``rates``
    fall back to ``default_rate``."""
    bucket = hash_bucket(id_col, salt)
    thresh: Column = F.lit(int(round(default_rate * N_BUCKETS)))
    for stratum, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(strata_col) == stratum, F.lit(int(round(rate * N_BUCKETS)))
        ).otherwise(thresh)
    return df.where(bucket < thresh)


def hash_split(
    df: DataFrame,
    *,
    id_col: str,
    weights: Sequence[float] = (0.8, 0.1, 0.1),
    labels: Sequence[str] = ("train", "val", "test"),
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one split by hash bucket against the
    cumulative weight thresholds. Stable across runs and data growth: a
    doc's split never changes when other docs are added or removed (the
    property that keeps eval sets leak-free as a corpus evolves)."""
    if len(weights) != len(labels):
        raise ValueError("weights and labels must have equal length")
    total = float(sum(weights))
    bucket = hash_bucket(id_col, salt)
    # cumulative upper thresholds for all but the last label (the else)
    cum_t = []
    cum = 0.0
    for w in weights[:-1]:
        cum += w / total
        cum_t.append(int(round(cum * N_BUCKETS)))
    # fold right-to-left so the SMALLEST matching threshold wins
    expr: Column = F.lit(labels[-1])
    for t, lab in zip(reversed(cum_t), reversed(labels[:-1])):
        expr = F.when(bucket < t, F.lit(lab)).otherwise(expr)
    return df.withColumn(split_col, expr)


def pack_sequences(
    df: DataFrame,
    *,
    id_col: str,
    n_tokens_col: str,
    budget: int,
    partitions: int | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid end-to-end
    in ``id_col`` order and cut into fixed ``budget``-token training
    sequences. Emits ``(id, n_tokens, seq_id, seq_offset)`` where
    ``seq_id = tokens_before // budget`` and ``seq_offset =
    tokens_before % budget`` (a doc whose tokens straddle a boundary
    starts in ``seq_id`` and spills into the next, as concat-and-chunk
    does).

    Distributed prefix sum (no single-partition window over the data):
    1. range-repartition + sort by id → globally ordered partitions;
    2. window cumsum *within* each partition;
    3. prefix sum over the per-partition totals (one row PER PARTITION,
       so this table's global window is O(#partitions) — ~800k rows for
       100 TB of 128 MB splits — not O(#rows)) → broadcast join back.
    The result is invariant to the partition boundaries step 1 picks,
    so sampling nondeterminism in ``repartitionByRange`` cannot change
    the output."""
    n_parts = partitions or df.sparkSession.sparkContext.defaultParallelism
    ordered = (
        df.select(F.col(id_col), F.col(n_tokens_col).cast("long").alias("_n"))
        .repartitionByRange(n_parts, F.col(id_col))
        .sortWithinPartitions(id_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    w = Window.partitionBy("_pid").orderBy(id_col)
    # localCheckpoint pins the partition layout: _pid must mean the same
    # partition in both branches below (totals vs rows)
    local = tracked_local_checkpoint(ordered.withColumn(
        "_cum_in_part", F.sum("_n").over(w) - F.col("_n")
    ), eager=False)

    prior = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        local.groupBy("_pid").agg(F.sum("_n").alias("_tot"))
        .withColumn(
            "_part_offset",
            F.coalesce(F.sum("_tot").over(prior), F.lit(0)).cast("long"),
        )
        .drop("_tot")
    )

    packed = (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn("_before", F.col("_part_offset") + F.col("_cum_in_part"))
        .select(
            F.col(id_col),
            F.col("_n").alias("n_tokens"),
            F.expr(f"_before div {int(budget)}").alias("seq_id"),
            (F.col("_before") % F.lit(int(budget))).alias("seq_offset"),
        )
    )
    return packed


def take_token_budget(
    df: DataFrame,
    strata_col: str,
    budgets: Mapping[str, int],
    *,
    id_col: str,
    n_tokens_col: str,
    salt: str = "budget",
    default_budget: int = 0,
    partitions: int | None = None,
) -> DataFrame:
    """Data mixing by TOKEN budget: within each stratum, take documents
    in deterministic hash order until the stratum's token budget is
    filled (the document that crosses the budget line is kept, so every
    non-zero budget yields at least one doc). This is the pretraining
    mix primitive when quotas are token counts, not doc counts or
    rates — ``budgets={source: n_tokens}``.

    Hash order (md5 of the salted id) makes the selection a pure
    function of ids: reproducible anywhere, stable per doc, and
    mirrorable in SQL. The running within-stratum token total uses the
    same distributed prefix sum as :func:`pack_sequences` — partition
    cumsums plus a prefix over per-(partition, stratum) totals, so no
    stratum ever needs to fit one partition and nothing crosses the
    driver."""
    hv = F.conv(
        F.substring(F.md5(F.concat(
            F.lit(f"{salt}|"),
            (F.col(id_col)).cast("string"))), 1, 15), 16, 10,
    ).cast("long")
    n_parts = partitions or df.sparkSession.sparkContext.defaultParallelism
    ordered = (
        df.select(
            F.col(id_col), F.col(strata_col),
            F.col(n_tokens_col).cast("long").alias("_n"),
            hv.alias("_hv"),
        )
        .repartitionByRange(n_parts, F.col(strata_col), F.col("_hv"), F.col(id_col))
        .sortWithinPartitions(strata_col, "_hv", id_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    w = Window.partitionBy("_pid", strata_col).orderBy("_hv", id_col)
    local = tracked_local_checkpoint(ordered.withColumn(
        "_cum_in_part", F.sum("_n").over(w) - F.col("_n")
    ), eager=False)

    prior = (
        Window.partitionBy(strata_col).orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        local.groupBy("_pid", strata_col).agg(F.sum("_n").alias("_tot"))
        .withColumn(
            "_off", F.coalesce(F.sum("_tot").over(prior), F.lit(0)).cast("long"))
        .drop("_tot")
    )

    budget: Column = F.lit(int(default_budget))
    for stratum, b in sorted(budgets.items()):
        budget = F.when(F.col(strata_col) == stratum, F.lit(int(b))).otherwise(budget)

    return (
        local.join(F.broadcast(offsets), ["_pid", strata_col])
        .where(F.col("_off") + F.col("_cum_in_part") < budget)
        .select(F.col(id_col), F.col(strata_col), F.col("_n").alias(n_tokens_col))
    )


def take_n_per_stratum(
    df: DataFrame,
    strata_col: str,
    n: int,
    *,
    id_col: str,
    salt: str = "taken",
    partitions: int | None = None,
) -> DataFrame:
    """Exactly ``n`` rows per stratum (fewer if the stratum is smaller),
    chosen deterministically in hash order — the fixed-size per-source
    eval-set / subsample primitive. A special case of
    :func:`take_token_budget` with every row weighing 1 token, so it
    inherits the distributed prefix sum (no per-stratum single-partition
    window) and the pure-function-of-id stability."""
    with_one = df.select(F.col(id_col), F.col(strata_col)).withColumn(
        "_one", F.lit(1))
    return take_token_budget(
        with_one, strata_col, {}, id_col=id_col, n_tokens_col="_one",
        salt=salt, default_budget=n, partitions=partitions,
    ).drop("_one")


def temperature_mix(
    df: DataFrame,
    strata_col: str,
    *,
    id_col: str,
    alpha: float = 0.5,
    target_frac: float = 0.5,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-based data mixing (the mT5/multilingual rebalancing
    rule): sampling weight per stratum ∝ ``share^alpha`` — ``alpha<1``
    upsamples small strata, flattens the source distribution — scaled so
    the expected kept fraction overall is ``target_frac``, clamped at
    keep-everything. Membership is the usual md5 bucket of the id.

    Everything stays in-plan: per-stratum counts are ONE map-side-
    combined agg (k rows), the grand total and weight sum ride one-row
    broadcasts, and the per-stratum keep-threshold joins back as a
    broadcast — no driver collects. Determinism across engines: weights
    are int64-quantized (``round(share^alpha · 1e6)``) before the
    cross-stratum sum, so the normalization is order-independent; the
    final threshold is an exact int both engines compute identically.
    Returns ``(id, stratum, thresh)`` for the kept rows."""
    counts = df.groupBy(strata_col).agg(F.count("*").alias("_n"))
    tot = counts.agg(F.sum("_n").alias("_tot"))
    w = counts.crossJoin(F.broadcast(tot)).select(
        strata_col, "_n", "_tot",
        F.round(F.pow(F.col("_n") / F.col("_tot"), float(alpha)) * 1_000_000, 0)
        .cast("long").alias("_w6"),
    )
    wsum = w.agg(F.sum("_w6").alias("_wsum"))
    rates = w.crossJoin(F.broadcast(wsum)).select(
        F.col(strata_col),
        F.least(
            F.lit(10000).cast("long"),
            F.round(
                (F.col("_w6") / F.col("_wsum"))
                * (F.col("_tot") * float(target_frac)) / F.col("_n") * 10000, 0,
            ).cast("long"),
        ).alias("thresh"),
    )
    return (
        df.join(F.broadcast(rates), strata_col)
        .where(hash_bucket(id_col, salt) < F.col("thresh"))
        .select(F.col(id_col), F.col(strata_col), F.col("thresh"))
    )


def shuffle_shards(
    df: DataFrame,
    *,
    id_col: str,
    n_shards: int,
    salt: str = "shuffle",
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic global training shuffle: every row gets a shard in
    ``[0, n_shards)`` and a dense position within that shard, both pure
    functions of ``(salt, id)`` — the "shuffle once, train anywhere"
    primitive. Shard = ``md5-hash % n_shards``; position = the row's
    rank within its shard under ``(hash, id)`` order, i.e. a fresh salt
    is an independent reshuffle and the same salt reproduces the exact
    epoch order on any cluster.

    The within-shard rank is the same distributed prefix sum as
    :func:`pack_sequences` — range-repartition by (shard, hash),
    per-partition ``row_number``, prefix over per-(partition, shard)
    counts — so no shard need fit one partition and a single global
    ``Window.orderBy`` (one-partition scale-killer) never appears."""
    hv = F.conv(
        F.substring(F.md5(F.concat(
            F.lit(f"{salt}|"), F.col(id_col).cast("string"))), 1, 15), 16, 10,
    ).cast("long")
    n_parts = partitions or df.sparkSession.sparkContext.defaultParallelism
    ordered = (
        df.select(
            F.col(id_col), hv.alias("_hv"),
            (hv % F.lit(int(n_shards))).alias("shard"),
        )
        .repartitionByRange(n_parts, F.col("shard"), F.col("_hv"), F.col(id_col))
        .sortWithinPartitions("shard", "_hv", id_col)
        .withColumn("_pid", F.spark_partition_id())
    )
    w = Window.partitionBy("_pid", "shard").orderBy("_hv", id_col)
    local = tracked_local_checkpoint(ordered.withColumn(
        "_rn", F.row_number().over(w).cast("long") - 1
    ), eager=False)

    prior = (
        Window.partitionBy("shard").orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        local.groupBy("_pid", "shard").agg(F.count("*").alias("_cnt"))
        .withColumn(
            "_off", F.coalesce(F.sum("_cnt").over(prior), F.lit(0)).cast("long"))
        .drop("_cnt")
    )
    return (
        local.join(F.broadcast(offsets), ["_pid", "shard"])
        .select(
            F.col(id_col), F.col("shard"),
            (F.col("_off") + F.col("_rn")).alias("pos"),
        )
    )


def top_fraction_by_score(
    df: DataFrame,
    score_col: Column | str,
    frac: float,
) -> DataFrame:
    """Keep the top ``frac`` of rows by an integer score — the exact
    global-quantile selection behind "train on the best 30% of the
    corpus" quality gates.

    A naive formulation (``percent_rank`` / ``row_number`` over a global
    ``Window.orderBy``) sorts the whole corpus through ONE partition — a
    100 TB scale-killer. Instead the threshold comes from a **score
    histogram**: one map-combined ``groupBy(score)`` (the only
    data-sized shuffle), a cumulative window over the *histogram* —
    bounded by |distinct scores| (≤10⁴ for 4-decimal-quantized scores),
    not by rows — and a one-row threshold broadcast back. The kept set
    is then a map-side filter. Work per data row is O(1).

    Selection rule: with ``k = floor(frac · N)``, the threshold is the
    k-th largest score and rows with ``score >= threshold`` are kept —
    ties at the threshold are kept inclusively (deterministic,
    partition-independent; ``n_kept >= k`` by at most the tie width).
    ``k == 0`` (``frac·N < 1``) keeps nothing. ``score_col`` must be
    integral (quantize floats first) so the histogram is exact and the
    SQL oracle replays bit-for-bit.

    Returns the input rows filtered, plus ``threshold``. Raises if the
    input already carries a ``threshold`` column (the output name is
    part of the contract — rename yours first)."""
    if "threshold" in df.columns:
        raise ValueError(
            "input already has a 'threshold' column; rename it before "
            "calling top_fraction_by_score")

    s = F.col(score_col) if isinstance(score_col, str) else score_col
    # persisted: the cumulative window AND the k-total both consume the
    # histogram; unpersisted, each consumer would recompute it — i.e.
    # re-scan the INPUT (3 corpus passes instead of the 2-pass minimum
    # an exact quantile needs: one to build the histogram, one to
    # filter). ≤|distinct scores| rows — trivial memory at any scale.
    from spark_fits_spark.caching import tracked_persist

    hist = tracked_persist(df.select(s.alias("_s")).groupBy("_s").agg(
        F.count("*").alias("_n")))
    cum_w = (Window.orderBy(F.desc("_s"))
             .rowsBetween(Window.unboundedPreceding, 0))
    thr = (
        hist.withColumn("_cum", F.sum("_n").over(cum_w))
        .crossJoin(F.broadcast(
            hist.agg(F.floor(F.sum("_n") * F.lit(float(frac)))
                     .cast("long").alias("_k"))))
        # k == 0 keeps NOTHING: without this guard every histogram row
        # satisfies cum >= 0 and "top 0%" would return the max-score
        # tie group (threshold aggregates to NULL here, and s >= NULL
        # filters every row)
        .where((F.col("_k") > 0) & (F.col("_cum") >= F.col("_k")))
        .agg(F.max("_s").alias("threshold"))
    )
    return df.crossJoin(F.broadcast(thr)).where(s >= F.col("threshold"))


def weighted_sample(
    df: DataFrame,
    *,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "wsample",
    key_col: str = "es_key",
) -> DataFrame:
    """Weighted random sampling WITHOUT replacement (Efraimidis &
    Spirakis A-ES): each row gets the key ``ln(u) / w`` with ``u`` a
    deterministic hash uniform in (0, 1] and ``w`` its weight; the
    ``k`` rows with the LARGEST keys are the sample. Equivalent to
    drawing rows one by one with probability proportional to weight —
    the primitive behind quality-weighted corpus selection ("sample 10M
    docs ∝ quality score").

    Deterministic like everything in this module: ``u`` comes from
    ``md5(salt|id)`` (first 15 hex digits + 1, over 2^60), so a row's
    key — and therefore the whole sample — is a pure function of
    (id, weight, salt), reproducible across runs/partitionings and
    replayable in SQL. Keys are quantized to int64 (×1e9) so the
    oracle comparison never rides raw float bits; ties break by id.

    Scale: the key is a map-side expression; selection is
    ``orderBy(key).limit(k)`` → ``TakeOrderedAndProject`` (per-partition
    partial top-k, merge of #partitions·k rows — no global sort, no
    full shuffle). For huge k (≥10⁷) prefer the histogram-threshold
    pattern of :func:`top_fraction_by_score` on the quantized key.

    Rows with NULL or non-positive weight are excluded (they can never
    be drawn). Returns the sampled rows with ``key_col`` appended."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if key_col in df.columns:
        raise ValueError(
            f"input already has a {key_col!r} column — rename it first")
    salted = F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string"))
    h = F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    w = F.col(weight_col).cast("double")
    key = F.round(F.log(u) / w * F.lit(1e9)).cast("long")
    return (
        df.where(w > 0)
        .withColumn(key_col, key)
        .orderBy(F.col(key_col).desc(), F.col(id_col))
        .limit(k)
    )
