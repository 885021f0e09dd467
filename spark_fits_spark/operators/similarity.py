"""Similarity search over embedding columns.

Two tiers:

- :func:`cosine_topk` — brute-force exact top-k. The query side is tiny
  and **broadcast**, so the plan is a single pass over the corpus with
  no shuffle until the final per-query top-k (a groupBy over k·|Q| rows).
  This is the correctness baseline and is already the right plan for
  |Q| small — even at 100 TB the corpus is scanned once.
- :func:`hyperplane_lsh_topk` — approximate: random-hyperplane signature
  buckets cut candidates to ~corpus/2^bits per query, then exact cosine
  re-rank inside buckets. The hyperplanes are seeded → deterministic.

All math is JVM-side (``zip_with``/``aggregate``); no Python UDF.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _with_norm(df: DataFrame, vec_col: str, id_col: str, prefix: str) -> DataFrame:
    v = F.col(vec_col).cast("array<double>")
    return df.select(
        F.col(id_col).alias(f"{prefix}id"),
        v.alias(f"{prefix}v"),
    ).withColumn(f"{prefix}n", F.sqrt(_dot(F.col(f"{prefix}v"), F.col(f"{prefix}v"))))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    include_self: bool = False,
) -> DataFrame:
    """Exact cosine top-k: (query_id, vec_id, cosine, rank).

    ``queries`` is broadcast (small dim table); ties broken by vec_id
    for determinism."""
    c = _with_norm(corpus, vec_col, id_col, "_c")
    q = _with_norm(queries, vec_col, id_col, "_q")
    pairs = c.crossJoin(F.broadcast(q))
    if not include_self:
        pairs = pairs.where(F.col("_cid") != F.col("_qid"))
    scored = pairs.select(
        F.col("_qid").alias("query_id"),
        F.col("_cid").alias("vec_id"),
        (_dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))).alias("_cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("_cos", 4).alias("cosine"), "rank")
    )


def hyperplane_signature(vec_col, planes: np.ndarray):
    """Signature int: bit b set iff vec·plane_b > 0. planes: (bits, dim)."""
    sig = F.lit(0)
    for b, plane in enumerate(planes):
        lits = F.array(*[F.lit(float(x)) for x in plane])
        sig = sig + F.when(_dot(vec_col, lits) > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return sig


def ivf_centroids(n_centroids: int, dim: int, seed: int) -> np.ndarray:
    """Deterministic unit-norm coarse centroids (seeded Gaussian). A
    trained quantizer (k-means over a corpus sample) drops in here
    unchanged — the search path below only needs *some* fixed centroid
    set, and seeded centroids keep the whole operator oracle-checkable."""
    rng = np.random.RandomState(seed)
    c = rng.normal(size=(n_centroids, dim))
    return c / np.sqrt((c * c).sum(axis=1))[:, None]


def _nearest_centroids(vec_col, centroids: np.ndarray, nprobe: int):
    """Array of the ``nprobe`` centroid ids nearest (by dot product) to
    the vector — pure JVM array expressions, no UDF."""
    scored = F.array(*[
        F.struct(
            _dot(vec_col, F.array(*[F.lit(float(x)) for x in c])).alias("s"),
            F.lit(i).alias("c"),
        )
        for i, c in enumerate(centroids)
    ])
    best = F.slice(F.reverse(F.array_sort(scored)), 1, nprobe)
    return F.transform(best, lambda x: x["c"])


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    dim: int = 64,
    seed: int = 11,
    include_self: bool = False,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: corpus rows are assigned to their
    nearest coarse centroid (the inverted list); each query probes its
    ``nprobe`` nearest centroids and exact-re-ranks only those lists.

    The scale path of :func:`cosine_topk`: corpus work per query drops
    to ~``nprobe / n_centroids`` of the corpus, and the probe join is an
    equi-join on the centroid id — shuffle keys are 4-byte ints, the
    corpus is scanned once. Deterministic (seeded centroids, id
    tie-break), so the SQL oracle can replay it exactly.

    Pass ``centroids`` (e.g. ``np.array([v for _, v in kmeans_fit(...)])``)
    to probe a trained quantizer instead of the seeded one — better
    recall at equal nprobe, identical plan shape."""
    if centroids is None:
        centroids = ivf_centroids(n_centroids, dim, seed)

    c = _with_norm(corpus, vec_col, id_col, "_c").withColumn(
        "_cell", _nearest_centroids(F.col("_cv"), centroids, 1)[0])
    q = _with_norm(queries, vec_col, id_col, "_q").withColumn(
        "_cell", F.explode(_nearest_centroids(F.col("_qv"), centroids, nprobe)))

    pairs = c.join(F.broadcast(q), "_cell")
    if not include_self:
        pairs = pairs.where(F.col("_cid") != F.col("_qid"))
    scored = pairs.select(
        F.col("_qid").alias("query_id"),
        F.col("_cid").alias("vec_id"),
        (_dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))).alias("_cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("_cos", 4).alias("cosine"), "rank")
    )


def hyperplane_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    k: int = 10,
    bits: int = 4,
    dim: int = 64,
    seed: int = 7,
    include_self: bool = False,
) -> DataFrame:
    """Approximate cosine top-k: bucket by a ``bits``-bit random
    hyperplane signature, exact re-rank within the bucket.

    The bucket join key is the signature, so the corpus-side work per
    query is ~|corpus| / 2^bits. Deterministic: hyperplanes come from a
    seeded RNG; candidates missing from the query's bucket are simply
    not returned (approximate by design)."""
    rng = np.random.RandomState(seed)
    planes = rng.normal(size=(bits, dim))

    c = _with_norm(corpus, vec_col, id_col, "_c").withColumn(
        "_sig", hyperplane_signature(F.col("_cv"), planes))
    q = _with_norm(queries, vec_col, id_col, "_q").withColumn(
        "_sig", hyperplane_signature(F.col("_qv"), planes))

    pairs = c.join(F.broadcast(q), "_sig")
    if not include_self:
        pairs = pairs.where(F.col("_cid") != F.col("_qid"))
    scored = pairs.select(
        F.col("_qid").alias("query_id"),
        F.col("_cid").alias("vec_id"),
        (_dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))).alias("_cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("_cos", 4).alias("cosine"), "rank")
    )


def _sq_dist(vec_col, centroid_lits, zero):
    """Squared L2 distance to one literal centroid array — pure JVM."""
    return F.aggregate(
        F.zip_with(vec_col, centroid_lits, lambda a, b: (a - b) * (a - b)),
        zero, lambda acc, x: acc + x)


def _argmin_cluster(vec_col, cents, quantized: bool):
    """Id of the nearest centroid (squared-L2, ties to the smallest
    cluster id): array_min over (distance, cid) structs. ``cents`` is a
    list of (cid, vector) with plain-Python numbers."""
    zero = F.lit(0).cast("long") if quantized else F.lit(0.0)
    scored = F.array(*[
        F.struct(
            _sq_dist(vec_col, F.array(*[F.lit(x) for x in vec]), zero).alias("d"),
            F.lit(cid).cast("long").alias("c"),
        )
        for cid, vec in cents
    ])
    return F.array_min(scored)["c"]


def _quantized_vec(vec_col, scale: int):
    """int64 vector at fixed-point ``scale``: round(x*scale) — the same
    double product and ties-away-from-zero rounding in Spark and DuckDB,
    so both engines quantize bit-identically."""
    v = (F.col(vec_col) if isinstance(vec_col, str) else vec_col).cast("array<double>")
    return F.transform(v, lambda x: F.round(x * scale, 0).cast("long"))


def kmeans_fit(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    k: int = 8,
    iters: int = 2,
    quantize: int | None = None,
) -> list[tuple[int, list]]:
    """Lloyd's k-means over an embedding column, entirely in DataFrame
    ops — a trained coarse quantizer for :func:`ivf_topk`.

    Init: the ``k`` smallest-id vectors (deterministic, no RNG). Each
    iteration: a per-row argmin against k literal centroid arrays (map
    side only — interpreted higher-order exprs, a constant cost per row
    that scales horizontally), then ONE shuffle — the (cluster, dim)
    mean over the exploded vectors. Driver traffic per
    iteration is exactly k x dim numbers (the next plan's literals),
    parameter-bounded like connected_components' per-round scalar —
    never data-proportional, so the loop holds at 100 TB. Clusters that
    go empty drop out (standard Lloyd degeneracy).

    ``quantize=s`` runs the whole loop in int64 fixed-point at scale
    ``s``: sums of ints are aggregation-order-independent, so training
    is bit-reproducible and SQL-oracle-checkable end to end. With
    ``quantize=None`` means are doubles (real-use mode; last-ulp
    nondeterminism under re-aggregation is possible, as with any
    float agg).

    Returns surviving ``(cluster_id, centroid_vector)`` sorted by id;
    ``np.array([v for _, v in result])`` drops into ``ivf_topk``.
    """
    vec = (_quantized_vec(vec_col, quantize) if quantize
           else F.col(vec_col).cast("array<double>"))
    base = corpus.select(F.col(id_col).alias("_kid"), vec.alias("_kv")).persist()
    try:
        init = base.orderBy("_kid").limit(k).collect()  # bounded-collect: k rows
        cents = sorted((int(r["_kid"]), list(r["_kv"])) for r in init)
        for _ in range(iters):
            assigned = base.withColumn(
                "_c", _argmin_cluster(F.col("_kv"), cents, quantize is not None))
            upd = (
                assigned.select("_c", F.posexplode("_kv").alias("_p", "_x"))
                .groupBy("_c", "_p")
                .agg(F.sum("_x").alias("_s"), F.count("*").alias("_n"))
            )
            mean = (
                F.floor(F.col("_s").cast("double") / F.col("_n")).cast("long")
                if quantize else F.col("_s") / F.col("_n")
            )
            rows = (
                upd.withColumn("_m", mean)
                .groupBy("_c")
                .agg(F.array_sort(F.collect_list(F.struct("_p", "_m"))).alias("_a"))
                .select("_c", F.transform("_a", lambda s: s["_m"]).alias("_v"))
                .collect()  # bounded-collect: k centroids x dim numbers
            )
            cents = sorted((int(r["_c"]), list(r["_v"])) for r in rows)
    finally:
        base.unpersist()
    return cents


def kmeans_assign(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    cents: list[tuple[int, list]],
    *,
    quantize: int | None = None,
    cluster_col: str = "cluster",
) -> DataFrame:
    """Assign every vector to its nearest trained centroid (same argmin
    + quantization as the fit loop): adds ``cluster_col``. Map-side
    only — no shuffle, no UDF."""
    vec = (_quantized_vec(vec_col, quantize) if quantize
           else F.col(vec_col).cast("array<double>"))
    return df.withColumn(
        cluster_col, _argmin_cluster(vec, cents, quantize is not None))


def semdedup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    k: int = 8,
    iters: int = 1,
    threshold: float = 0.99,
    quantize: int = 1_000_000,
    cluster_col: str = "cluster",
) -> DataFrame:
    """SemDeDup (semantic deduplication, Abbas et al. 2023): cluster the
    embedding space with k-means, then inside each cluster drop every
    vector whose cosine similarity to some lower-id cluster-mate reaches
    ``threshold`` (the min-id member of a near-dup group survives).
    Returns one row per input vector:
    ``(id, cluster, max_cos_lower, keep)`` — ``max_cos_lower`` is the
    doc's highest cosine to any lower-id vector in its cluster (NULL for
    the cluster's min id).

    Pairwise work happens only *within* a cluster — the pairing key is
    the cluster id, so cost is Σ|cluster|², never corpus². Each cluster
    runs as ONE Arrow-batched ``applyInPandas`` task: the row-chunked
    integer GEMM bounds the per-slab transient (1024 × |cluster|), but
    the cluster's matrix itself must fit the task — size ``k`` so the
    largest cluster does (SemDeDup used 50k clusters for 5B embeddings
    ≈ 10⁵ vectors/cluster, ~50 MB at dim 64 — comfortably in-task).

    Determinism: vectors are quantized to int64 fixed-point, so dot
    products and squared norms are *exact integers* — in numpy exactly
    as in SQL; cosine divides those exact ints in double and rounds to
    4 decimals. The rounding reproduces Spark's ``F.round`` bit-for-bit
    (``BigDecimal.valueOf(double)`` = shortest-repr decimal, HALF_UP),
    and only the per-id *max* cosine is rounded — valid because HALF_UP
    is monotone, so max(round(x_i)) == round(max(x_i)).
    """
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    cents = kmeans_fit(df, vec_col, id_col, k=k, iters=iters, quantize=quantize)
    q = _quantized_vec(vec_col, quantize)

    a = df.select(F.col(id_col), q.alias("_q")).withColumn(
        cluster_col, _argmin_cluster(F.col("_q"), cents, True)
    )

    # per-cluster max-cosine-to-a-lower-id via exact int64 GEMM: the
    # earlier pure-column self-join evaluated an interpreted
    # aggregate(zip_with(...)) lambda per PAIR (~dim ops each, outside
    # codegen) — the numpy integer matmul does the same exact integer
    # arithmetic at C speed, chunked to 1024-row slabs
    sims_schema = StructType([
        StructField("_sid", LongType()),
        StructField("max_cos_lower", DoubleType()),
    ])
    quant = Decimal("0.0001")

    def _maxcos(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"_sid": pd.Series(dtype="int64"),
                              "max_cos_lower": pd.Series(dtype="float64")})
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        mat = np.stack(pdf["_q"].to_numpy())[order].astype(np.int64)
        nr = np.sqrt((mat * mat).sum(axis=1).astype(np.float64))
        # zero-norm (all-zero quantized) vectors: every cosine against
        # them is NULL in the SQL formulation (0/0), and F.max ignores
        # NULL — drop them so they neither emit nor count as lower mates
        keep = nr > 0
        ids, mat, nr = ids[keep], mat[keep], nr[keep]
        n = len(ids)
        if n < 2:
            return empty
        best = np.empty(n - 1, dtype=np.float64)
        for lo in range(1, n, 1024):
            hi = min(lo + 1024, n)
            sims = mat[lo:hi] @ mat.T  # int64: exact
            cos = sims / (nr[lo:hi, None] * nr[None, :])
            lower = np.arange(n)[None, :] < np.arange(lo, hi)[:, None]
            best[lo - 1:hi - 1] = np.where(lower, cos, -np.inf).max(axis=1)
        rounded = [
            # repr(float(v)): numpy-2-safe shortest repr — matches
            # Spark's BigDecimal.valueOf(double) HALF_UP exactly
            float(Decimal(repr(float(v))).quantize(
                quant, rounding=ROUND_HALF_UP))
            for v in best
        ]
        return pd.DataFrame({"_sid": ids[1:], "max_cos_lower": rounded})

    sims = (
        a.groupBy(cluster_col).applyInPandas(_maxcos, sims_schema)
        .withColumnRenamed("_sid", id_col)
    )
    return (
        a.select(id_col, cluster_col)
        .join(sims, id_col, "left")
        .select(
            F.col(id_col), F.col(cluster_col), F.col("max_cos_lower"),
            F.coalesce(F.col("max_cos_lower") < threshold, F.lit(True))
            .alias("keep"),
        )
    )


def scalar_quantize(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    levels: int = 255,
    keep_vec: bool = False,
) -> DataFrame:
    """Per-vector scalar quantization to ``levels+1`` codes (int8 when
    levels=255): ``code = round((x - min) / scale)`` with
    ``scale = (max - min) / levels``. Returns
    ``(id, qmin, qscale, codes, codes_hex)`` — ``codes_hex`` is the
    byte-packed code string (two hex chars per dim, built with JVM
    ``hex``/``lpad``/``concat_ws``, no UDF), i.e. a 64-dim float32
    vector stores in 64 bytes + two floats: a 4x bandwidth/memory cut
    for the ANN candidate stage at 100 TB. Map-side only, no shuffle;
    dequantization is :func:`dequantize_expr`. Constant vectors get
    scale 1 (all codes 0). ``keep_vec=True`` retains the original
    vector as ``vec`` so fidelity checks need no re-join (keeps the
    whole pipeline map-only)."""
    v = F.col(vec_col).cast("array<double>")
    mn, mx = F.array_min(v), F.array_max(v)
    scale = F.when(mx == mn, F.lit(1.0)).otherwise((mx - mn) / levels)
    out = df.select(
        F.col(id_col),
        v.alias("_v"),
        mn.alias("qmin"),
        scale.alias("qscale"),
    ).withColumn(
        "codes",
        F.transform(F.col("_v"), lambda x: F.round((x - F.col("qmin")) / F.col("qscale"), 0).cast("int")),
    ).withColumn(
        "codes_hex",
        F.lower(F.concat_ws("", F.transform(
            F.col("codes"), lambda c: F.lpad(F.hex(c), 2, "0")))),
    )
    return out.withColumnRenamed("_v", "vec") if keep_vec else out.drop("_v")


def dequantize_expr(codes, qmin, qscale):
    """Reconstructed double vector: ``qmin + code * qscale``."""
    return F.transform(codes, lambda c: qmin + c * qscale)


def rrf_fuse(
    ranked: list[DataFrame],
    *,
    k: int = 10,
    c: int = 60,
    query_col: str = "query_id",
    id_col: str = "vec_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of candidate rankings (hybrid retrieval:
    e.g. a lexical BM25 list fused with an ANN list, or two ANN
    retrievers with different blind spots). Each list contributes
    ``1/(c + rank)`` per candidate; fused score = sum over lists.

    Contributions are quantized to int64 (×1e6) so the per-candidate
    sum is aggregation-order-independent (the standard determinism
    trick here), and ties break by id. The union is rank-rows only
    (k·|Q| per list — tiny); the final per-query re-rank window
    partitions by query. Returns (query, id, rrf6_sum, rank)."""
    from functools import reduce

    u = reduce(
        lambda a, b: a.unionByName(b),
        [df.select(query_col, id_col, rank_col) for df in ranked],
    )
    contrib = u.select(
        query_col, id_col,
        F.round(1_000_000.0 / (F.lit(c) + F.col(rank_col)), 0)
        .cast("long").alias("_c6"),
    )
    scored = contrib.groupBy(query_col, id_col).agg(
        F.sum("_c6").alias("rrf6_sum"))
    w = Window.partitionBy(query_col).orderBy(
        F.desc("rrf6_sum"), F.asc(id_col))
    return (
        scored.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
        .select(query_col, id_col, "rrf6_sum", rank_col)
    )
