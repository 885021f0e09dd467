"""Relational helpers for skewed data at scale.

AQE's skew-join splitting handles sort-merge skew automatically, but two
patterns still need explicit structure at 100 TB:

- :func:`salted_join` — explicit key salting for a shuffle join where one
  side has pathological hot keys: the hot side gets a random salt in
  [0, n), the other side is exploded n× over all salts, and the join key
  becomes (key, salt). Use when AQE can't help (e.g. hash joins on a
  pre-shuffled layout, or a hot key inside an aggregation upstream).
- :func:`two_phase_count` — skewed groupBy as partial-then-final
  aggregation with an explicit salt (for aggregations whose combiner
  can't be expressed as a simple partial agg).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    *,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` (skewed) with ``small`` on ``key`` using ``salts``-way
    key salting. ``small`` is replicated ``salts``× (keep it modest).

    The result has the same rows as ``big.join(small, key, how)``."""
    salted_big = big.withColumn("_salt", (F.rand(seed=42) * salts).cast("int"))
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    out = salted_big.join(salted_small, [key, "_salt"], how)
    return out.drop("_salt")


def two_phase_count(df: DataFrame, key: str, *, salts: int = 16) -> DataFrame:
    """count(*) per key for heavily skewed keys, as an explicit
    two-phase aggregation: partial count per (key, salt) then final sum
    per key. (Spark's hash agg already does map-side partials for
    count/sum — this shape is for teaching/validation and for custom
    aggs without partial support.) Returns (key, n)."""
    salted = df.withColumn("_salt", (F.rand(seed=42) * salts).cast("int"))
    partial = salted.groupBy(key, "_salt").agg(F.count("*").alias("_n"))
    return partial.groupBy(key).agg(F.sum("_n").alias("n"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    tiebreak: str,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each ``left`` row, attach the payload of the
    ``right`` row with the greatest ``right_ts`` <= ``left_ts`` (same
    ``on`` key). Ties on ``right_ts`` resolve to the greatest
    ``tiebreak`` value, making the result deterministic.

    Implemented shuffle-once (no range-join explosion): union both
    sides, one window per key ordered by (ts, side, tiebreak), and a
    running ``last(payload, ignorenulls)``. Scales as a single sort
    per key partition — the canonical big-data as-of strategy, vs. the
    O(n*m) inequality join a naive formulation would plan.

    Only ``direction="backward"`` (inclusive) is implemented.
    """
    if direction != "backward":
        raise NotImplementedError("only backward as-of joins are supported")
    payload = F.struct(*[F.col(c) for c in right_payload]).alias("_p")
    r = right.select(
        F.col(on), F.col(right_ts).alias("_ts"), F.lit(0).alias("_side"),
        F.col(tiebreak).alias("_tb"), payload)
    l = left.select(
        F.col(on), F.col(left_ts).alias("_ts"), F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_tb"].dataType).alias("_tb"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
        *[c for c in left.columns if c not in (on, left_ts)],
    )
    w = (
        Window.partitionBy(on).orderBy("_ts", "_side", "_tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l.unionByName(r, allowMissingColumns=True)
    out = matched.withColumn("_match", F.last("_p", ignorenulls=True).over(w))
    out = out.filter(F.col("_side") == 1).drop("_side", "_tb", "_p")
    for c in right_payload:
        out = out.withColumn(c, F.col(f"_match.{c}"))
    return out.drop("_match").withColumnRenamed("_ts", left_ts)


def range_join_pairs(
    df: DataFrame,
    key: str,
    ts_ms: str,
    id_col: str,
    *,
    max_gap_ms: int,
) -> DataFrame:
    """All ordered pairs (a, b) of rows sharing ``key`` with
    ``0 <= b.ts - a.ts <= max_gap_ms`` and a before b (ties broken by
    ``id_col``). Returns (key, id_a, id_b, gap_ms).

    Bucketed band join: each row lands in bucket floor(ts/gap); a is
    exploded into {bucket, bucket+1} so every qualifying pair meets on
    an equality key (key, bucket) and the residual inequality is a
    cheap post-filter. This keeps the join an equi-join (hash/SMJ,
    AQE-splittable) instead of a cross-product range join — the
    difference between O(n·k) and O(n²) at 100 TB.
    """
    bkt_a = F.floor(F.col("_tsa") / max_gap_ms)
    a_side = (
        df.select(key, F.col(ts_ms).alias("_tsa"), F.col(id_col).alias("_ida"))
        .withColumn(
            "_bkt",
            F.explode(F.array(bkt_a.cast("long"), (bkt_a + 1).cast("long"))))
    )
    b_side = df.select(
        key, F.col(ts_ms).alias("_tsb"), F.col(id_col).alias("_idb"),
        F.floor(F.col(ts_ms) / max_gap_ms).cast("long").alias("_bkt"))
    gap = F.col("_tsb") - F.col("_tsa")
    return (
        a_side.join(b_side, [key, "_bkt"])
        .filter(
            (gap >= 0) & (gap <= max_gap_ms)
            & ((F.col("_tsa") < F.col("_tsb"))
               | ((F.col("_tsa") == F.col("_tsb")) & (F.col("_ida") < F.col("_idb"))))
        )
        .select(
            key,
            F.col("_ida").alias("id_a"),
            F.col("_idb").alias("id_b"),
            gap.alias("gap_ms"),
        )
    )
    # no distinct needed: gap <= bucket width means each qualifying pair
    # meets on exactly one of a's two exploded buckets


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    *,
    path: str | None = None,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed parquet table: rows are
    hash-partitioned into ``n_buckets`` files per write-task by
    ``bucket_col`` at WRITE time, so every later equi-join or
    aggregation on that column reads co-located data and **skips its
    shuffle entirely** — the standard layout for a 100 TB fact table
    that is joined on the same key query after query (pay the shuffle
    once at ingest, never again).

    ``sort_col`` additionally sorts within buckets (lets sort-merge
    join skip its sort too). Bucket metadata lives in the session
    catalog (``saveAsTable`` — plain ``.parquet(path)`` cannot carry
    it); pass ``path`` to keep the data external to the warehouse dir.

    See ``tests/test_operators.py::test_bucketed_join_skips_shuffle``
    for the plan-level proof (no ``Exchange`` above either scan)."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def _pair_spread(df: DataFrame, *keys: str) -> DataFrame:
    """Repartition a pair-stream side by its blocking keys with an
    EXPLICIT partition count (r7, q152 root cause): the exploded side
    of a zones join amplifies work ~9·density× past the scan, so scan
    partitioning — sized for BYTES — under-parallelizes it (a
    single-file sf0.1 catalog ran the whole DD/DR/RR pair volume on
    ONE task under a broadcast join: no shuffle existed to re-spread
    it). Keys match the equi-join, so a shuffle join reuses this
    exchange; the explicit N keeps AQE's byte-based coalescing from
    collapsing it (pair-stream bytes wildly understate downstream
    work). Cost: one linear shuffle of the exploded rows — noise next
    to pair volume at any scale. Cell-level skew stays bounded by the
    radius-sized blocking cell, the documented zones granularity."""
    spark = df.sparkSession
    try:
        n = max(1, int(spark.conf.get("spark.sql.shuffle.partitions")))
    except (TypeError, ValueError):
        n = spark.sparkContext.defaultParallelism
    return df.repartition(n, *keys)


def zone_crossmatch(
    cat_a: DataFrame,
    cat_b: DataFrame,
    *,
    radius: int,
    x_col: str = "x",
    y_col: str = "y",
    id_col: str = "id",
) -> DataFrame:
    """Catalog crossmatch — all (a, b) pairs within ``radius`` of each
    other in a 2-D coordinate space → ``(id_a, id_b, dist_sq)``. The
    astronomy-survey join (match every detection in catalog A to the
    candidates in catalog B; the operation AXS/ASTROIDE build over a
    spark-fits-style scan), kept integer-exact so the SQL oracle can
    replay it bit-for-bit.

    Zone blocking (Gray et al., "The Zones Algorithm", MSR-TR-2006-52):
    space is cut into radius-sized cells; B maps each row to its single
    cell ``(floor(x/r), floor(y/r))`` while A explodes into the 3×3
    neighborhood. Any pair within ``radius`` differs by at most one
    cell per axis, so every qualifying pair meets on the cell equi-join
    key EXACTLY once (B's cell is unique, A's 9 are distinct) — an
    O(n·density) hash/SMJ equi-join plus an exact integer residual
    filter, never an all-pairs product, no ``distinct``. Skewed cells
    (dense sky regions) split under AQE skew-join handling.
    """
    if radius < 1:
        raise ValueError(f"radius must be >= 1, got {radius}")

    def cell(name: str) -> Column:
        # integer floor division (pmod-corrected `div`): double-based
        # floor(c / r) loses precision past 2^53 and can misplace a
        # row by one cell, silently breaking the exact-recall invariant
        return F.expr(
            f"(({name}) - pmod(({name}), {radius})) div {radius}"
        ).cast("long")

    a = cat_a.select(
        F.col(id_col).alias("id_a"),
        F.col(x_col).alias("_xa"), F.col(y_col).alias("_ya"))
    a = (
        a.withColumn(
            "_cx",
            F.explode(F.array(*[cell("_xa") + d for d in (-1, 0, 1)])))
        .withColumn(
            "_cy",
            F.explode(F.array(*[cell("_ya") + d for d in (-1, 0, 1)])))
    )
    a = _pair_spread(a, "_cx", "_cy")
    b = cat_b.select(
        F.col(id_col).alias("id_b"),
        F.col(x_col).alias("_xb"), F.col(y_col).alias("_yb"),
        cell(x_col).alias("_cx"), cell(y_col).alias("_cy"))
    dist = (
        (F.col("_xa") - F.col("_xb")) * (F.col("_xa") - F.col("_xb"))
        + (F.col("_ya") - F.col("_yb")) * (F.col("_ya") - F.col("_yb"))
    )
    return (
        a.join(b, ["_cx", "_cy"])
        .where(dist <= F.lit(radius * radius))
        .select("id_a", "id_b", dist.cast("long").alias("dist_sq"))
    )


def best_match_crossmatch(
    cat_a: DataFrame,
    cat_b: DataFrame,
    *,
    radius: int,
    x_col: str = "x",
    y_col: str = "y",
    id_col: str = "id",
) -> DataFrame:
    """Nearest-counterpart crossmatch — for each row of A, the single
    CLOSEST B row within ``radius`` → ``(id_a, id_b, dist_sq)``; A rows
    with no candidate in range are absent. The "best match" semantics
    every survey association step actually wants (one counterpart per
    detection), vs :func:`zone_crossmatch`'s all-pairs-within-radius.

    Built as zones blocking + ONE ``groupBy(id_a).min(struct(dist_sq,
    id_b))``: the lexicographic struct-min is a partial (map-side
    combined) aggregation, so the ≤9 candidate pairs per A row collapse
    before the single shuffle on ``id_a`` — cheaper at scale than a
    window sort over the pair table (no per-partition full sort, and
    combiner output is one row per (task, id_a)). Ties on distance
    break deterministically toward the smaller ``id_b``.
    """
    pairs = zone_crossmatch(
        cat_a, cat_b, radius=radius,
        x_col=x_col, y_col=y_col, id_col=id_col)
    best = pairs.groupBy("id_a").agg(
        F.min(F.struct("dist_sq", "id_b")).alias("_m"))
    return best.select(
        "id_a",
        F.col("_m.id_b").alias("id_b"),
        F.col("_m.dist_sq").alias("dist_sq"))


#: canonical half-plane of cell offsets for SELF-join pair streams:
#: for any two points p ≠ q within one cell of each other, the cell
#: delta d = cell(q) − cell(p) satisfies EXACTLY one of d = (0,0)
#: (same cell — deduped by id_a < id_b), d ∈ this set (met when p
#: probes offset d), or −d ∈ this set (met when q probes −d). The set
#: and its negation are disjoint, so each unordered pair meets the
#: cell equi-join exactly once — 5 probe cells instead of the full
#: 3×3 = 9, and half the join output of the ordered-pair stream.
_SELF_HALF_PLANE = ((0, 0), (0, 1), (1, -1), (1, 0), (1, 1))


def _ls_pair_bins(
    data: DataFrame,
    randoms: DataFrame,
    *,
    radius: int,
    nbins: int,
    x_col: str,
    y_col: str,
    id_col: str,
    region_col: str | None = None,
) -> DataFrame:
    """Fused Landy–Szalay pair-count kernel: the DD, DR and RR pair
    streams run as ONE stream-tagged plan — one explicit-N spread
    exchange, one cell equi-join on ``(stream, cell)``, one
    map-combined aggregation — instead of three stage-parallel
    spread/join/agg pipelines. Shuffle VOLUME equals the three
    separate streams; the fusion removes 2/3 of the exchanges and
    stage barriers (the dominant cost of the estimator's many short
    stages at bench scale, and strictly better slot utilization at
    any scale).

    DD/RR probe the canonical half-plane (:data:`_SELF_HALF_PLANE`:
    each unordered pair meets the join exactly once — same-cell pairs
    dedup by ``id_a < id_b``, opposite-sign offsets are disjoint) and
    count ×2 to the ordered-pair convention the ``n(n−1)``
    normalizations expect; DR probes the full 3×3 (each
    (data, random) pair once). PRECONDITION: ``id_col`` is unique
    within each catalog (as :func:`zone_crossmatch` assumes) — the
    same-cell ``id_a < id_b`` dedup counts duplicate-id coincident
    points as one point and keeps exactly one of each equal-id
    cross-cell pair, so duplicate ids silently under-count. Pairs at
    exactly ``radius`` are excluded (strict ``d² < r²``). Returns one
    row per non-empty
    ``(bin[, ra, rb])``: ``(bin[, ra, rb], dd, dr, rr)`` — with
    ``region_col``, the (ra, rb) labels are UNORDERED for DD/RR,
    which sums identically under any label-symmetric downstream use
    (the jackknife's leave-out keep)."""
    r2 = radius * radius
    full_3x3 = [(ox, oy) for ox in (-1, 0, 1) for oy in (-1, 0, 1)]

    def cell(name):
        return F.expr(
            f"(({name}) - pmod(({name}), {radius})) div {radius}"
        ).cast("long")

    def a_side(cat, tag, offsets):
        cols = [F.lit(tag).alias("_s"), F.col(id_col).alias("id_a"),
                F.col(x_col).alias("_xa"), F.col(y_col).alias("_ya")]
        if region_col is not None:
            cols.append(F.col(region_col).cast("long").alias("ra"))
        df = (cat.select(*cols)
              .withColumn("_o", F.explode(F.array(*[
                  F.struct(F.lit(ox).alias("x"), F.lit(oy).alias("y"))
                  for ox, oy in offsets]))))
        # _z marks same-cell probes of a SELF stream (the only rows
        # that could meet from both sides — deduped by id_a < id_b in
        # the residual); DR rows are never deduped
        return (df.withColumn("_cx", cell("_xa") + F.col("_o.x"))
                .withColumn("_cy", cell("_ya") + F.col("_o.y"))
                .withColumn("_z", F.lit(tag != 1)
                            & (F.col("_o.x") == 0) & (F.col("_o.y") == 0))
                .drop("_o"))

    def b_side(cat, tag):
        cols = [F.lit(tag).alias("_s"), F.col(id_col).alias("id_b"),
                F.col(x_col).alias("_xb"), F.col(y_col).alias("_yb"),
                cell(x_col).alias("_cx"), cell(y_col).alias("_cy")]
        if region_col is not None:
            cols.append(F.col(region_col).cast("long").alias("rb"))
        return cat.select(*cols)

    a = (a_side(data, 0, _SELF_HALF_PLANE)
         .unionByName(a_side(data, 1, full_3x3))
         .unionByName(a_side(randoms, 2, _SELF_HALF_PLANE)))
    a = _pair_spread(a, "_s", "_cx", "_cy")
    b = (b_side(data, 0)
         .unionByName(b_side(randoms, 1))
         .unionByName(b_side(randoms, 2)))
    d2 = ((F.col("_xa") - F.col("_xb")) * (F.col("_xa") - F.col("_xb"))
          + (F.col("_ya") - F.col("_yb")) * (F.col("_ya") - F.col("_yb")))
    keep = F.when(F.col("_z"), F.col("id_a") < F.col("id_b")) \
            .otherwise(F.lit(True))
    labels = ["ra", "rb"] if region_col is not None else []
    tagged = (a.join(b, ["_s", "_cx", "_cy"])
              .where(keep & (d2 < F.lit(r2)))
              .select("_s", d2.alias("_d2"), *labels))
    bin_col = F.expr(f"(_d2 * {nbins}) div {r2}").cast("long").alias("bin")
    return tagged.groupBy(bin_col, *labels).agg(
        (F.count(F.when(F.col("_s") == 0, 1)) * 2).alias("dd"),
        F.count(F.when(F.col("_s") == 1, 1)).alias("dr"),
        (F.count(F.when(F.col("_s") == 2, 1)) * 2).alias("rr"))


def two_point_correlation(
    data: DataFrame,
    randoms: DataFrame,
    *,
    radius: int,
    nbins: int,
    x_col: str = "x",
    y_col: str = "y",
    id_col: str = "id",
) -> DataFrame:
    """Angular two-point correlation function — the Landy–Szalay
    (1993) estimator ``ξ(θ) = (DD − 2DR + RR) / RR`` over a data
    catalog and a random (unclustered) catalog, the galaxy-clustering
    measurement survey pipelines run over the whole sky. Returns one
    row per separation bin: ``(bin, dd, dr, rr, xi6)``.

    Pair counting never goes all-pairs — and never goes stage-parallel
    ×3 either: DD/DR/RR run through the fused stream-tagged kernel
    (:func:`_ls_pair_bins` — one spread exchange, one cell equi-join,
    one aggregation; DD/RR via the half-plane, counted ×2, DR via the
    full 3×3), which is value-identical to three ordered-pair streams
    under the ``n(n−1)`` / ``nd·nr`` normalizations. Bins are
    equal-width annuli in SQUARED separation (``bin = dist_sq ·
    nbins div radius²``, integer-exact in any engine); pairs at
    exactly ``radius`` are excluded so every bin is well-defined.
    Per-bin counts are map-side-combined; empty bins appear with zero
    counts (one generated |nbins|-row frame, broadcast-joined);
    ``xi6`` is NULL where ``rr = 0``. ``id_col`` must be unique within
    each catalog (see :func:`_ls_pair_bins`'s same-cell dedup)."""
    if nbins < 1:
        raise ValueError(f"nbins must be >= 1, got {nbins}")
    if radius < 1:
        raise ValueError(f"radius must be >= 1, got {radius}")

    t = _ls_pair_bins(data, randoms, radius=radius, nbins=nbins,
                      x_col=x_col, y_col=y_col, id_col=id_col)
    nd = data.count()
    nr = randoms.count()
    bins = data.sparkSession.range(nbins).select(
        F.col("id").alias("bin"))
    out = (
        bins.join(t, "bin", "left")
        .select(
            "bin",
            F.coalesce("dd", F.lit(0)).alias("dd"),
            F.coalesce("dr", F.lit(0)).alias("dr"),
            F.coalesce("rr", F.lit(0)).alias("rr"))
    )
    ddn = F.col("dd") / F.lit(float(nd * (nd - 1)))
    drn = F.col("dr") / F.lit(float(nd * nr))
    rrn = F.col("rr") / F.lit(float(nr * (nr - 1)))
    xi = F.when(F.col("rr") > 0,
                F.round((ddn - 2 * drn + rrn) / rrn, 6))
    return out.select("bin", "dd", "dr", "rr", xi.alias("xi6"))


def tracklet_pairs(
    det: DataFrame,
    *,
    dt: int,
    radius: int,
    id_col: str = "det_id",
    t_col: str = "t",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Moving-object tracklet building, step 1 (the MOPS linking
    primitive behind asteroid pipelines): pair every detection at
    epoch ``t`` with the detections at ``t + dt`` within ``radius``
    (the maximum apparent motion per ``dt``). Returns ``(id_a, id_b,
    t0, dx, dy)`` — exact integer displacements, ready for
    constant-velocity chaining by :func:`link_chains`.

    Same zones blocking as :func:`zone_crossmatch` with the EPOCH in
    the equi-key: the earlier detection explodes into its 3×3 spatial
    neighborhood at ``t + dt``, the later sits in its single (t,
    cell) — every qualifying pair meets exactly once, cost
    O(n · density), never all-pairs across the night."""
    if radius < 1 or dt < 1:
        raise ValueError(
            f"radius >= 1 and dt >= 1 required, got radius={radius}, "
            f"dt={dt}")

    def cell(name):
        return F.expr(
            f"(({name}) - pmod(({name}), {radius})) div {radius}"
        ).cast("long")

    a = det.select(
        F.col(id_col).alias("id_a"), F.col(t_col).cast("long").alias("t0"),
        F.col(x_col).alias("_xa"), F.col(y_col).alias("_ya"))
    a = (a.withColumn("_tj", F.col("t0") + dt)
         .withColumn("_cx", F.explode(F.array(
             *[cell("_xa") + d for d in (-1, 0, 1)])))
         .withColumn("_cy", F.explode(F.array(
             *[cell("_ya") + d for d in (-1, 0, 1)]))))
    b = det.select(
        F.col(id_col).alias("id_b"), F.col(t_col).cast("long").alias("_tj"),
        F.col(x_col).alias("_xb"), F.col(y_col).alias("_yb"),
        cell(x_col).alias("_cx"), cell(y_col).alias("_cy"))
    # no _pair_spread here: detections arrive many-partitioned (events
    # scale with time), the _tj key bounds per-cell fan-out to one
    # epoch, and measured sf0.1 cost of the extra exchange (0.69 →
    # 1.8 s) outweighs any spread win for this shape
    dx = F.col("_xb") - F.col("_xa")
    dy = F.col("_yb") - F.col("_ya")
    return (
        a.join(b, ["_tj", "_cx", "_cy"])
        .where(dx * dx + dy * dy <= F.lit(radius * radius))
        .select("id_a", "id_b", "t0",
                dx.cast("long").alias("dx"), dy.cast("long").alias("dy"))
    )


def link_chains(pairs: DataFrame, *, dt: int = 1,
                exclude_stationary: bool = True) -> DataFrame:
    """Moving-object tracklet building, step 2: chain two
    consecutive :func:`tracklet_pairs` legs (built with the same
    ``dt``) that share their middle detection and move with the SAME
    displacement (constant-velocity gate) into 3-detection candidate
    tracklets ``(id_0, id_1, id_2, t0, dx, dy)`` — one hash
    equi-join on ``(middle id, t, dx, dy)``, so only kinematically
    consistent legs ever meet. ``exclude_stationary`` drops
    zero-motion chains (static sources pair with themselves at every
    epoch)."""
    p1 = pairs.select(F.col("id_a").alias("id_0"),
                      F.col("id_b").alias("id_1"),
                      "t0", "dx", "dy")
    p2 = pairs.select(F.col("id_a").alias("id_1"),
                      F.col("id_b").alias("id_2"),
                      (F.col("t0") - dt).alias("t0"), "dx", "dy")
    out = p1.join(p2, ["id_1", "t0", "dx", "dy"]).select(
        "id_0", "id_1", "id_2", "t0", "dx", "dy")
    if exclude_stationary:
        out = out.where((F.col("dx") != 0) | (F.col("dy") != 0))
    return out


def two_point_correlation_jackknife(
    data: DataFrame,
    randoms: DataFrame,
    *,
    radius: int,
    nbins: int,
    n_regions: int,
    x_col: str = "x",
    y_col: str = "y",
    id_col: str = "id",
    region_col: str = "region",
) -> DataFrame:
    """:func:`two_point_correlation` with delete-one-region JACKKNIFE
    errors (the standard survey error estimate for ξ: recompute the
    estimator K times leaving out one sky region, σ² = (K−1)/K ·
    Σ(ξ_k − ξ̄)²). Inputs carry a ``region`` column (0..K−1, e.g. a
    coarse zone id). Returns one row per bin: ``(bin, dd, dr, rr,
    xi6, xi_jk_sigma6)`` — ξ of the full sample plus its jackknife
    sigma (NULL where any leave-out RR empties).

    Scale shape: ONE fused stream-tagged pair plan
    (:func:`_ls_pair_bins` — one spread exchange, one cell equi-join,
    one aggregation; DD/RR half-plane ×2-weighted, the leave-out keep
    is (ra, rb)-symmetric so unordered labels sum identically) whose
    per-bin close keeps the (region_a, region_b) pair label — a
    ≤ nbins·K² table, NOT pair volume. Leave-one-out counts come from
    exploding k over that tiny table (map-side, one aggregation for
    all three streams), and the K normalizations from one |K|-row
    per-region count broadcast. Pair volume is touched exactly once
    per DD/DR/RR. ``id_col`` must be unique within each catalog (see
    :func:`_ls_pair_bins`'s same-cell dedup)."""
    if nbins < 1 or n_regions < 2:
        raise ValueError(
            f"nbins >= 1 and n_regions >= 2 required, got nbins="
            f"{nbins}, n_regions={n_regions}")
    if radius < 1:
        raise ValueError(f"radius must be >= 1, got {radius}")

    t = _ls_pair_bins(data, randoms, radius=radius, nbins=nbins,
                      x_col=x_col, y_col=y_col, id_col=id_col,
                      region_col=region_col)

    # per-region object counts (K rows each)
    def rc(df_):
        return {r["r"]: r["n"] for r in
                df_.groupBy(F.col(region_col).cast("long").alias("r"))
                .agg(F.count("*").alias("n"))
                .collect()}  # bounded-collect: <= n_regions rows
    ndr = rc(data)
    nrr = rc(randoms)
    nd = sum(ndr.values())
    nr = sum(nrr.values())
    ks = list(range(n_regions))
    # k = -1 encodes the full sample (nothing left out)
    kd = {k: nd - ndr.get(k, 0) for k in ks}
    kr = {k: nr - nrr.get(k, 0) for k in ks}
    kd[-1], kr[-1] = nd, nr

    kcol = F.explode(F.array(
        *[F.lit(k) for k in [-1] + ks])).alias("k")

    # ONE leave-out aggregation for all three streams: explode k over
    # the tiny (bin, ra, rb, dd, dr, rr) table, keep label-disjoint
    # rows, sum the three counts together
    lo = t.select("bin", "ra", "rb", "dd", "dr", "rr", kcol)
    keep = (F.col("k") == -1) | (
        (F.col("ra") != F.col("k")) & (F.col("rb") != F.col("k")))
    lo = (lo.where(keep).groupBy("bin", "k")
          .agg(F.sum("dd").alias("dd"), F.sum("dr").alias("dr"),
               F.sum("rr").alias("rr")))

    bins = data.sparkSession.range(nbins).select(
        F.col("id").alias("bin"))
    kframe = bins.select("bin", kcol)
    j = (kframe.join(lo, ["bin", "k"], "left")
         .select("bin", "k",
                 F.coalesce("dd", F.lit(0)).alias("dd"),
                 F.coalesce("dr", F.lit(0)).alias("dr"),
                 F.coalesce("rr", F.lit(0)).alias("rr")))
    ndm = F.create_map(*[x for k in kd for x in
                         (F.lit(k), F.lit(float(kd[k])))])
    nrm = F.create_map(*[x for k in kr for x in
                         (F.lit(k), F.lit(float(kr[k])))])
    ndk = F.element_at(ndm, F.col("k"))
    nrk = F.element_at(nrm, F.col("k"))
    ddn = F.col("dd") / (ndk * (ndk - 1))
    drn = F.col("dr") / (ndk * nrk)
    rrn = F.col("rr") / (nrk * (nrk - 1))
    xi = F.when(F.col("rr") > 0, (ddn - 2 * drn + rrn) / rrn)
    scored = j.select("bin", "k", "dd", "dr", "rr", xi.alias("_xi"))
    full = scored.where(F.col("k") == -1).select(
        "bin", "dd", "dr", "rr",
        F.round("_xi", 6).alias("xi6"))
    jk = (scored.where(F.col("k") != -1).groupBy("bin")
          .agg(F.count("_xi").alias("_nk"),
               F.avg("_xi").alias("_mx"),
               F.sum(F.col("_xi") * F.col("_xi")).alias("_sx2")))
    sigma = F.when(
        F.col("_nk") == n_regions,
        F.sqrt(F.greatest(
            F.lit(float(n_regions - 1)) / n_regions
            * (F.col("_sx2") - n_regions * F.col("_mx") * F.col("_mx")),
            F.lit(0.0))))
    return (full.join(jk.select("bin", sigma.alias("_sg")), "bin", "left")
            .select("bin", "dd", "dr", "rr", "xi6",
                    F.round("_sg", 6).alias("xi_jk_sigma6")))
