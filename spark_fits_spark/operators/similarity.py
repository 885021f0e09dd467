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


def _with_norm(df: DataFrame, vec_col: str, id_col: str, prefix: str,
               extra_cols: dict[str, str] | None = None) -> DataFrame:
    """(prefix)id / (prefix)v / (prefix)n projection; ``extra_cols``
    maps additional source columns to output names carried along."""
    v = F.col(vec_col).cast("array<double>")
    extras = [F.col(src).alias(out)
              for src, out in (extra_cols or {}).items()]
    return df.select(
        F.col(id_col).alias(f"{prefix}id"),
        v.alias(f"{prefix}v"),
        *extras,
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


def hard_negative_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    label_col: str,
    k: int = 10,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query,
    the top-``k`` most cosine-similar corpus vectors with a DIFFERENT
    label — the near-miss negatives that make embedding models learn
    (in-batch random negatives are too easy; the hardest negatives live
    exactly at the top of the other-label similarity ranking).

    Same plan as :func:`cosine_topk` — broadcast query side, one corpus
    scan, the label inequality folded into the broadcast-join predicate
    so same-label pairs are dropped BEFORE the dot product, then a
    per-query top-k. Swap the scan side to :func:`ivf_topk`'s cell join
    for the approximate variant at larger |Q|.

    Returns ``(query_id, query_label, vec_id, neg_label, cosine,
    rank)``."""
    c = _with_norm(corpus, vec_col, id_col, "_c",
                   extra_cols={label_col: "_cl"})
    q = _with_norm(queries, vec_col, id_col, "_q",
                   extra_cols={label_col: "_ql"})
    pairs = c.join(F.broadcast(q), F.col("_cl") != F.col("_ql"))
    scored = pairs.select(
        F.col("_qid").alias("query_id"),
        F.col("_ql").alias("query_label"),
        F.col("_cid").alias("vec_id"),
        F.col("_cl").alias("neg_label"),
        (_dot(F.col("_qv"), F.col("_cv"))
         / (F.col("_qn") * F.col("_cn"))).alias("_cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "query_label", "vec_id", "neg_label",
                F.round("_cos", 4).alias("cosine"), "rank")
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
    list of (cid, vector) with plain-Python numbers.

    LITERAL path: inlines k×dim literals into the expression tree —
    perfect for small k (pure JVM, SQL-oracle-replayable) but the plan
    grows O(k·dim); past :data:`ARGMIN_LITERAL_MAX_K` callers go through
    :func:`_assign_nearest` which switches to a broadcast + Arrow GEMM."""
    zero = F.lit(0).cast("long") if quantized else F.lit(0.0)
    scored = F.array(*[
        F.struct(
            _sq_dist(vec_col, F.array(*[F.lit(x) for x in vec]), zero).alias("d"),
            F.lit(cid).cast("long").alias("c"),
        )
        for cid, vec in cents
    ])
    return F.array_min(scored)["c"]


#: Above this k the literal-expression argmin is replaced by the
#: broadcast-matrix mapInPandas GEMM: at k=50_000 (the SemDeDup paper's
#: cluster count) the literal plan would carry k·dim ≈ 3.2M literals —
#: it would not even compile.
ARGMIN_LITERAL_MAX_K = 64


def _assign_nearest(df: DataFrame, vec_expr, cents, *, quantized: bool,
                    out_col: str,
                    literal_max_k: int = ARGMIN_LITERAL_MAX_K) -> DataFrame:
    """Add ``out_col`` = id of the nearest centroid (squared L2, ties to
    the smallest cluster id), preserving every existing column.

    k ≤ ``literal_max_k``: the pure-JVM literal-expression path
    (oracle-replayable, zero Python). Larger k: the centroid matrix is
    **broadcast** once per executor and each Arrow batch runs a
    row-chunked numpy argmin GEMM — plan size stays O(1) in k, per-task
    transient memory is bounded by the chunking, and the math is the
    SAME exact int64 arithmetic when ``quantized`` (d = v·v − 2·v·C + C·C
    is exact in int64, argmin's first-occurrence tie-break = smallest
    cid because centroids are sorted by cid). Float centroids use the
    same expansion in float64 — last-ulp differences vs the literal
    formulation are possible, matching the float-mode caveat documented
    on :func:`kmeans_fit`."""
    cents = sorted(cents)
    if len(cents) <= literal_max_k:
        return df.withColumn(out_col, _argmin_cluster(vec_expr, cents, quantized))

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    tmp = "_sfs_argmin_vec"
    src = df.withColumn(tmp, vec_expr)
    dt = np.int64 if quantized else np.float64
    cids = np.array([c for c, _ in cents], dtype=np.int64)
    cmat = np.array([v for _, v in cents], dtype=dt)
    bc = df.sparkSession.sparkContext.broadcast((cids, cmat))
    # fresh StructType — StructType.add would mutate src's cached schema
    schema = StructType(
        list(src.schema.fields) + [StructField(out_col, LongType())])

    def assign(batches):
        b_cids, b_c = bc.value
        ct = b_c.T
        cn2 = (b_c * b_c).sum(axis=1)
        # row chunk sized so the n×k score matrix stays ≤ ~64 MB
        step = max(1, 8_000_000 // max(1, len(b_cids)))
        for pdf in batches:
            if not len(pdf):
                out = pdf.copy()
                out[out_col] = pd.Series(dtype="int64")
                yield out
                continue
            mat = np.stack(pdf[tmp].to_numpy()).astype(dt)
            res = np.empty(len(mat), dtype=np.int64)
            for lo in range(0, len(mat), step):
                sl = mat[lo:lo + step]
                d = ((sl * sl).sum(axis=1)[:, None] - 2 * (sl @ ct)
                     + cn2[None, :])
                res[lo:lo + step] = b_cids[np.argmin(d, axis=1)]
            out = pdf.copy()
            out[out_col] = res
            yield out

    return src.mapInPandas(assign, schema).drop(tmp)


def _assign_nearest_grouped(df: DataFrame, vec_expr, group_col: str,
                            cents_by_group: dict[int, list], *,
                            quantized: bool, out_col: str,
                            literal_max_k: int = ARGMIN_LITERAL_MAX_K
                            ) -> DataFrame:
    """Per-row argmin where the centroid SET is picked by ``group_col``
    (the subspace id in :func:`pq_fit`). Same two paths and the same
    smallest-cid tie-break as :func:`_assign_nearest`: a CASE over the
    per-group literal argmin expressions for small k, or one broadcast
    of ``{group: matrix}`` with a per-group numpy argmin inside each
    Arrow batch past ``literal_max_k``."""
    groups = sorted(cents_by_group)
    cents_by_group = {g: sorted(cents_by_group[g]) for g in groups}
    if max(len(c) for c in cents_by_group.values()) <= literal_max_k:
        expr = None
        for g in groups:
            arm = _argmin_cluster(vec_expr, cents_by_group[g], quantized)
            cond = F.col(group_col) == F.lit(g)
            expr = F.when(cond, arm) if expr is None else expr.when(cond, arm)
        return df.withColumn(out_col, expr)

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    tmp = "_sfs_argmin_vec"
    src = df.withColumn(tmp, vec_expr)
    dt = np.int64 if quantized else np.float64
    packed = {
        g: (np.array([c for c, _ in cents_by_group[g]], dtype=np.int64),
            np.array([v for _, v in cents_by_group[g]], dtype=dt))
        for g in groups
    }
    bc = df.sparkSession.sparkContext.broadcast(packed)
    schema = StructType(
        list(src.schema.fields) + [StructField(out_col, LongType())])

    def assign(batches):
        tabs = bc.value
        pre = {g: (cids, c.T, (c * c).sum(axis=1),
                   max(1, 8_000_000 // max(1, len(cids))))
               for g, (cids, c) in tabs.items()}
        for pdf in batches:
            out = pdf.copy()
            if not len(pdf):
                out[out_col] = pd.Series(dtype="int64")
                yield out
                continue
            res = np.empty(len(pdf), dtype=np.int64)
            gv = pdf[group_col].to_numpy()
            for g in np.unique(gv):
                cids, ct, cn2, step = pre[int(g)]
                rows = np.flatnonzero(gv == g)
                mat = np.stack(pdf[tmp].to_numpy()[rows]).astype(dt)
                for lo in range(0, len(mat), step):
                    sl = mat[lo:lo + step]
                    d = ((sl * sl).sum(axis=1)[:, None] - 2 * (sl @ ct)
                         + cn2[None, :])
                    res[rows[lo:lo + step]] = cids[np.argmin(d, axis=1)]
            out[out_col] = res
            yield out

    return src.mapInPandas(assign, schema).drop(tmp)


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
            assigned = _assign_nearest(
                base, F.col("_kv"), cents,
                quantized=quantize is not None, out_col="_c")
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
    only — no shuffle; no Python below :data:`ARGMIN_LITERAL_MAX_K`
    centroids, a broadcast Arrow GEMM above it (see
    :func:`_assign_nearest`)."""
    vec = (_quantized_vec(vec_col, quantize) if quantize
           else F.col(vec_col).cast("array<double>"))
    return _assign_nearest(
        df, vec, cents, quantized=quantize is not None, out_col=cluster_col)


def pq_fit(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    m: int = 2,
    k: int = 16,
    iters: int = 1,
    quantize: int | None = None,
) -> list[list[tuple[int, list]]]:
    """Product-quantization codebooks (Jégou et al. 2011): split the
    embedding into ``m`` contiguous subspaces and train an independent
    k-means codebook per subspace — the memory-compression layer under
    IVF-PQ ANN indexes (``m·log2(k)`` bits per vector instead of
    ``dim·32``).

    All ``m`` codebooks train in ONE Lloyd loop (r5): each vector
    explodes into its m slices keyed by subspace id, assignment is a
    per-(row, subspace) argmin against that subspace's centroids
    (:func:`_assign_nearest_grouped` — same literal/GEMM paths and
    smallest-cid tie-break as :func:`kmeans_fit`), and the update is a
    single ``(subspace, cluster, dim)`` mean shuffle. Mathematically
    identical to m independent fits — the subspaces never interact
    through the (j, c) keys — but one job per iteration instead of m:
    at 100 TB that is m× fewer full-corpus stage barriers, and the
    driver traffic per iteration stays exactly k×dim numbers (the m
    codebooks' literals combined). The int64 fixed-point mode is
    bit-identical to the sequential formulation; float mode carries
    kmeans_fit's documented last-ulp re-aggregation caveat. Requires
    ``dim % m == 0``. Returns one ``(cluster_id, centroid)`` list per
    subspace."""
    first = corpus.select(vec_col).first()  # bounded collect: 1 row
    if first is None or first[0] is None:
        raise ValueError(
            "pq_fit: empty corpus (or NULL first vector) — cannot infer "
            "the embedding dimension; nothing to train on")
    dim = len(first[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    vec = (_quantized_vec(vec_col, quantize) if quantize
           else F.col(vec_col).cast("array<double>"))
    base = (
        corpus.select(F.col(id_col).alias("_kid"), vec.alias("_kv0"))
        .select("_kid", F.explode(F.array(*[
            F.struct(F.lit(j).cast("long").alias("_j"),
                     F.slice("_kv0", j * sub + 1, sub).alias("_kv"))
            for j in range(m)])).alias("_s"))
        .select("_kid", F.col("_s._j").alias("_j"),
                F.col("_s._kv").alias("_kv"))
        .persist()
    )
    try:
        # init: the k smallest-id vectors, sliced — every id contributes
        # one row per subspace, so limit(k*m) is exactly those k ids
        init = base.orderBy("_kid", "_j").limit(k * m).collect()  # bounded-collect: k*m codebook rows
        cents = {j: [] for j in range(m)}
        for r in init:
            cents[int(r["_j"])].append((int(r["_kid"]), list(r["_kv"])))
        for _ in range(iters):
            assigned = _assign_nearest_grouped(
                base, F.col("_kv"), "_j", cents,
                quantized=quantize is not None, out_col="_c")
            upd = (
                assigned.select("_j", "_c", F.posexplode("_kv")
                                .alias("_p", "_x"))
                .groupBy("_j", "_c", "_p")
                .agg(F.sum("_x").alias("_s"), F.count("*").alias("_n"))
            )
            mean = (
                F.floor(F.col("_s").cast("double") / F.col("_n"))
                .cast("long") if quantize else F.col("_s") / F.col("_n")
            )
            rows = (
                upd.withColumn("_m", mean)
                .groupBy("_j", "_c")
                .agg(F.array_sort(F.collect_list(F.struct("_p", "_m")))
                     .alias("_a"))
                .select("_j", "_c",
                        F.transform("_a", lambda s: s["_m"]).alias("_v"))
                .collect()  # bounded-collect: m x k centroids x subdim numbers
            )
            cents = {j: [] for j in range(m)}
            for r in rows:
                cents[int(r["_j"])].append((int(r["_c"]), list(r["_v"])))
    finally:
        base.unpersist()
    return [sorted(cents[j]) for j in range(m)]


def pq_encode(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    codebooks: list[list[tuple[int, list]]],
    *,
    quantize: int | None = None,
) -> DataFrame:
    """Encode every vector as ``m`` codebook ids plus its exact
    reconstruction error: ``(id, code0..code{m-1}, err_q2, rmse)``.

    Map-side only — per subspace one argmin (literal-expression plan for
    small k, broadcast Arrow GEMM past :data:`ARGMIN_LITERAL_MAX_K`) and
    one literal-map centroid lookup for the error term; zero shuffles at
    any corpus size. In ``quantize`` mode the squared error is exact
    int64 arithmetic (``rmse`` is its deterministic sqrt), so the whole
    encoding is SQL-oracle-checkable."""
    m = len(codebooks)
    sub = len(codebooks[0][0][1])
    dim = m * sub
    # same guard as ivfpq_topk (r3 ADVICE): a vector length that does
    # not equal m·subdim would silently slice short and emit
    # NULL/garbage codes and err_q2
    first = df.select(vec_col).first()
    if first is not None and first[0] is not None and len(first[0]) != dim:
        raise ValueError(
            f"pq_encode: vector length {len(first[0])} != m*subdim "
            f"{m}*{sub}={dim} of the supplied codebooks")
    quantized = quantize is not None
    zero = F.lit(0).cast("long") if quantized else F.lit(0.0)
    out = df
    err = None
    code_cols = []
    for j, cents in enumerate(codebooks):
        raw = F.slice(F.col(vec_col).cast("array<double>"), j * sub + 1, sub)
        vecj = _quantized_vec(raw, quantize) if quantized else raw
        subcol, codecol = f"_pq_sub{j}", f"code{j}"
        out = _assign_nearest(
            out.withColumn(subcol, vecj), F.col(subcol), cents,
            quantized=quantized, out_col=codecol)
        cent_map = F.map_from_arrays(
            F.array(*[F.lit(cid).cast("long") for cid, _ in cents]),
            F.array(*[F.array(*[F.lit(x) for x in vec])
                      for _, vec in cents]))
        ej = _sq_dist(F.col(subcol), F.element_at(cent_map, F.col(codecol)),
                      zero)
        err = ej if err is None else err + ej
        code_cols.append(codecol)
    scale = float(quantize) if quantized else 1.0
    return out.withColumn("err_q2", err).select(
        F.col(id_col), *code_cols, "err_q2",
        F.round(F.sqrt(F.col("err_q2").cast("double") / dim) / scale, 4)
        .alias("rmse"))


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    *,
    codebooks: list[list[tuple[int, list]]],
    quantize: int,
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    dim: int = 64,
    seed: int = 11,
    include_self: bool = False,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF-PQ approximate top-k — the memory-bounded scale path of the
    ANN stack: corpus vectors live as a coarse cell id + ``m`` PQ codes
    (+ one stored true norm for cosine), and candidate scoring uses the
    **reconstructed** centroid vectors (asymmetric distance: exact
    query × quantized corpus), never the raw corpus vectors. At 100 TB
    this is what makes the candidate stage fit in memory: a 64-dim f32
    vector (256 B) becomes cell(4) + codes(m) + norm(8) bytes.

    Same plan shape as :func:`ivf_topk` (probe equi-join on cell id,
    broadcast queries, corpus scanned once); extra cost is one argmin
    per subspace on the scan side (map-only, Arrow GEMM past
    :data:`ARGMIN_LITERAL_MAX_K`). Deterministic given ``codebooks``
    from the fixed-point :func:`pq_fit`, so the whole index build +
    search replays in SQL. Measure quality with the recall query
    (q88) — PQ reconstruction error trades directly against memory.

    Returns ``(query_id, vec_id, adc_cosine, rank)``."""
    if centroids is None:
        centroids = ivf_centroids(n_centroids, dim, seed)
    m = len(codebooks)
    sub_fit = len(codebooks[0][0][1])
    if dim % m or dim // m != sub_fit:
        # a mismatched dim/m/codebook silently NULLs every zip_with dot
        # product downstream (garbage top-k, no error) — refuse instead
        raise ValueError(
            f"dim={dim} with m={m} codebooks of subdim {sub_fit} is "
            "inconsistent (need dim == m * subdim)")
    first = corpus.select(vec_col).first()  # bounded-collect: 1 row
    if first is not None and len(first[0]) != dim:
        raise ValueError(
            f"corpus vectors have dim {len(first[0])}, expected {dim}")
    sub = dim // m

    c = _with_norm(corpus, vec_col, id_col, "_c").withColumn(
        "_cell", _nearest_centroids(F.col("_cv"), centroids, 1)[0])
    recon_parts = []
    for j, cents in enumerate(codebooks):
        vecj = _quantized_vec(
            F.slice(F.col("_cv"), j * sub + 1, sub), quantize)
        c = _assign_nearest(
            c.withColumn(f"_sub{j}", vecj), F.col(f"_sub{j}"), cents,
            quantized=True, out_col=f"_code{j}")
        cent_map = F.map_from_arrays(
            F.array(*[F.lit(cid).cast("long") for cid, _ in cents]),
            F.array(*[F.array(*[F.lit(x) for x in vec]) for _, vec in cents]))
        recon_parts.append(F.transform(
            F.element_at(cent_map, F.col(f"_code{j}")),
            lambda x: x / quantize))
    c = c.select(
        "_cid", "_cell", "_cn", F.concat(*recon_parts).alias("_rv"))

    q = _with_norm(queries, vec_col, id_col, "_q").withColumn(
        "_cell", F.explode(_nearest_centroids(F.col("_qv"), centroids, nprobe)))

    pairs = c.join(F.broadcast(q), "_cell")
    if not include_self:
        pairs = pairs.where(F.col("_cid") != F.col("_qid"))
    scored = pairs.select(
        F.col("_qid").alias("query_id"),
        F.col("_cid").alias("vec_id"),
        (_dot(F.col("_qv"), F.col("_rv"))
         / (F.col("_qn") * F.col("_cn"))).alias("_s"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_s"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id",
                F.round("_s", 4).alias("adc_cosine"), "rank")
    )


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
    row_cap: int = 100_000,
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
    the cluster id, so cost is Σ|cluster|², never corpus². A cluster of
    ≤ ``row_cap`` rows runs as ONE Arrow-batched ``applyInPandas`` task:
    the row-chunked integer GEMM bounds the per-slab transient
    (1024 × |cluster|), and at the default cap the cluster matrix is
    ≤ ~51 MB at dim 64 — comfortably in-task (SemDeDup used 50k
    clusters for 5B embeddings ≈ 10⁵ vectors/cluster).

    **Skew guard**: clusters above ``row_cap`` — the degenerate
    one-giant-cluster case, common on near-duplicate-heavy web corpora,
    which is exactly where semdedup is deployed — are hash-split into
    ⌈n/row_cap⌉ blocks and computed as per-block-PAIR partial maxima
    (the same block-pair decomposition as
    ``dedup.embedding_near_dup_pairs``): task (i,j) scores each member
    of one block against lower-id members of the other, a final
    map-combined ``max`` per id merges the partials. max is associative
    and HALF_UP rounding is monotone, so the split path is
    bit-identical to the naive one-task formulation (pinned by
    ``tests/test_operators.py``); no task ever materializes more than
    2·row_cap vectors.

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

    # persisted: the assignment feeds four subtrees (size gate, small
    # path, big path, final join) — without the cache the argmin would
    # re-run per subtree. Freed by a caching.release_after() scope
    # around the call, or by spark.catalog.clearCache() between
    # pipeline stages (see bench.py).
    from spark_fits_spark.caching import tracked_persist

    a = tracked_persist(_assign_nearest(
        df.select(F.col(id_col), q.alias("_q")), F.col("_q"), cents,
        quantized=True, out_col=cluster_col,
    ))

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

    def _prep(pdf: pd.DataFrame):
        """Sorted-by-id (ids, int64 matrix, norms, blocks) with
        zero-norm (all-zero quantized) vectors dropped: every cosine
        against them is NULL in the SQL formulation (0/0), and F.max
        ignores NULL — they neither emit nor count as lower mates."""
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        mat = np.stack(pdf["_q"].to_numpy())[order].astype(np.int64)
        blk = (pdf["_blk"].to_numpy(dtype=np.int64)[order]
               if "_blk" in pdf.columns else None)
        nr = np.sqrt((mat * mat).sum(axis=1).astype(np.float64))
        keep = nr > 0
        return (ids[keep], mat[keep], nr[keep],
                blk[keep] if blk is not None else None)

    def _round4(v: float) -> float:
        # repr(float(v)): numpy-2-safe shortest repr — matches
        # Spark's BigDecimal.valueOf(double) HALF_UP exactly
        return float(Decimal(repr(float(v))).quantize(
            quant, rounding=ROUND_HALF_UP))

    _empty = {"_sid": pd.Series(dtype="int64"),
              "max_cos_lower": pd.Series(dtype="float64")}

    def _maxcos_core(ids, mat, nr, pair_mask) -> pd.DataFrame:
        """Per row: max cosine to any lower-id row allowed by
        ``pair_mask(lo, hi)`` (an extra boolean gate on the n×n pair
        grid, or None for all-lower-ids). int64 GEMM in ≤1024-row
        slabs: exact integer dot products, transient ≤ 1024×n."""
        n = len(ids)
        if n < 2:
            return pd.DataFrame(_empty)
        out_ids, out_best = [], []
        for lo in range(1, n, 1024):
            hi = min(lo + 1024, n)
            sims = mat[lo:hi] @ mat.T  # int64: exact
            cos = sims / (nr[lo:hi, None] * nr[None, :])
            allowed = np.arange(n)[None, :] < np.arange(lo, hi)[:, None]
            if pair_mask is not None:
                allowed &= pair_mask(lo, hi)
            has = allowed.any(axis=1)
            if has.any():
                best = np.where(allowed, cos, -np.inf).max(axis=1)[has]
                out_ids.append(ids[lo:hi][has])
                out_best.append(best)
        if not out_ids:
            return pd.DataFrame(_empty)
        return pd.DataFrame({
            "_sid": np.concatenate(out_ids),
            "max_cos_lower": [_round4(v)
                              for v in np.concatenate(out_best)],
        })

    def _maxcos(pdf: pd.DataFrame) -> pd.DataFrame:
        ids, mat, nr, _ = _prep(pdf)
        return _maxcos_core(ids, mat, nr, None)

    def _maxcos_pair(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        _, i, j = key
        ids, mat, nr, blk = _prep(pdf)
        if i == j:
            # intra-block: all lower-id pairs of this block
            return _maxcos_core(ids, mat, nr, None)
        # cross-block only — intra pairs belong to the (i,i)/(j,j) tasks

        def cross(lo, hi):
            return blk[None, :] != blk[lo:hi, None]

        return _maxcos_core(ids, mat, nr, cross)

    # size gate: cluster counts ride a broadcast join (≤ k rows — no
    # driver action, the counts materialize inside the broadcast
    # exchange); clusters over row_cap take the block-pair path
    counts = a.groupBy(cluster_col).agg(F.count("*").alias("_cn"))
    sized = a.join(F.broadcast(counts), cluster_col)
    small = sized.where(F.col("_cn") <= row_cap).drop("_cn")
    sims_small = small.groupBy(cluster_col).applyInPandas(
        _maxcos, sims_schema)

    big = sized.where(F.col("_cn") > row_cap)
    nb = F.ceil(F.col("_cn") / F.lit(row_cap)).cast("int")
    blocked = big.withColumn(
        "_blk", F.pmod(F.hash(F.col(id_col)), nb).cast("int"))
    # per-oversized-cluster block-pair table (i ≤ j), built from the
    # k-row counts table — broadcast, never data-proportional
    pair_tab = (
        counts.where(F.col("_cn") > row_cap)
        .select(F.col(cluster_col).alias("_pc"), nb.alias("_nb"))
        .select("_pc", F.explode(
            F.sequence(F.lit(0), F.col("_nb") - 1)).alias("_pi"), "_nb")
        .select("_pc", "_pi", F.explode(
            F.sequence(F.col("_pi"), F.col("_nb") - 1)).alias("_pj"))
    )
    repl = blocked.join(
        F.broadcast(pair_tab),
        (blocked[cluster_col] == pair_tab["_pc"])
        & ((F.col("_blk") == F.col("_pi"))
           | (F.col("_blk") == F.col("_pj"))),
    ).drop("_pc", "_cn")
    sims_big = repl.groupBy(cluster_col, "_pi", "_pj").applyInPandas(
        _maxcos_pair, sims_schema)

    # merge partials: max is associative and the HALF_UP 4-decimal
    # rounding is monotone, so max(round(partials)) == round(true max)
    sims = (
        sims_small.unionByName(sims_big)
        .groupBy("_sid")
        .agg(F.max("max_cos_lower").alias("max_cos_lower"))
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
