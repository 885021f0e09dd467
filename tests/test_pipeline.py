"""End-to-end curation pipeline invariants at sf0.001 + planted rows."""

from pyspark.sql import functions as F

from spark_fits_spark.pipeline import curate_corpus

SF = "/root/testdata/sf0.001"


def test_curate_corpus_invariants(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # plant a near-dup pair whose LINES are distinct strings (so C4
    # line dedup keeps both docs — a shared line would be stripped from
    # the second doc) but whose token SETS are identical (each line of
    # doc B is doc A's line word-reversed): Jaccard exactly 1.0, so the
    # MinHash near-dedup stage MUST collapse them — the collapse cannot
    # be line dedup's doing; ids ~1e9 avoid collisions with real data
    line_a = ("the quick brown fox jumps over the lazy dog again and "
              "again today with more words to pass the word floor")
    line_b = " ".join(reversed(line_a.split(" ")))
    extra = spark.createDataFrame(
        [(10**9, line_a, "en", "planted", 100),
         (10**9 + 1, line_b, "en", "planted", 100)],
        docs.schema)
    corpus = docs.unionByName(extra)
    bench = spark.createDataFrame(
        [(5 * 10**8, "held out benchmark question about unique topic zzz",
          "en", "bench", 50)], docs.schema)

    out = curate_corpus(corpus, benchmark=bench)
    clean, report = out["clean"], out["report"]
    rep = {r["stage"]: r["n_docs"] for r in report.collect()}
    order = [r["stage"] for r in report.orderBy("stage_order").collect()]
    assert order == ["input", "scrub", "gopher_gate", "line_dedup",
                     "near_dedup", "decontaminate", "quality_gate"]
    # monotone non-increasing doc counts through the funnel
    ns = [rep[s] for s in order]
    assert all(a >= b for a, b in zip(ns, ns[1:])), ns
    assert rep["input"] == corpus.count()

    ids = {r["doc_id"] for r in clean.select("doc_id").collect()}
    # the planted near-dup pair collapsed (at most one survivor, and
    # if one survives it is the min id — keep_representatives rule)
    assert not (10**9 in ids and 10**9 + 1 in ids)
    assert 10**9 + 1 not in ids
    # output ids ⊆ input ids; schema preserved
    in_ids = {r["doc_id"] for r in corpus.select("doc_id").collect()}
    assert ids <= in_ids
    assert set(clean.columns) == set(corpus.columns)
    spark.catalog.clearCache()


def test_curate_corpus_drops_contaminated(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # a training doc sharing a 3-gram with the benchmark must not survive
    poisoned = spark.createDataFrame(
        [(10**9 + 7, "this document leaks the held out benchmark "
                     "question about unique topic zzz verbatim plus "
                     "enough other words to pass every quality gate "
                     "easily and cleanly today", "en", "planted", 150)],
        docs.schema)
    bench = spark.createDataFrame(
        [(5 * 10**8, "held out benchmark question about unique topic zzz",
          "en", "bench", 50)], docs.schema)
    out = curate_corpus(docs.unionByName(poisoned), benchmark=bench)
    ids = {r["doc_id"] for r in out["clean"].select("doc_id").collect()}
    assert 10**9 + 7 not in ids
    spark.catalog.clearCache()


def test_release_after_frees_all_blocks(spark):
    """caching.release_after: after a full curate_corpus run (which
    exercises minhash band tables, connected-components localCheckpoints,
    and every stage-boundary persist) is consumed inside the scope, the
    session holds ZERO persisted RDDs — cache-manager persists AND
    checkpoint blocks (r3 VERDICT #6)."""
    from spark_fits_spark import caching

    spark.catalog.clearCache()
    # set-based comparison: unrelated earlier tests' checkpoint blocks
    # can be ContextCleaner-collected mid-test, so raw counts shift;
    # the invariant is that no id NEW to this scope survives it
    before = caching.persistent_rdd_ids(spark)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with caching.release_after():
        out = curate_corpus(docs)
        n_clean = out["clean"].count()
        n_stages = out["report"].count()
        assert n_clean > 0 and n_stages == 6  # consumed inside the scope
        assert caching.persistent_rdd_ids(spark) - before  # blocks live
    assert caching.persistent_rdd_ids(spark) - before == set()


def test_release_after_scopes_are_isolated(spark):
    """An inner scope must not free an outer scope's blocks, and a
    persist outside any scope is untouched (r3 behavior)."""
    from pyspark.storagelevel import StorageLevel

    from spark_fits_spark import caching

    spark.catalog.clearCache()
    unscoped = spark.range(100).persist(StorageLevel.MEMORY_AND_DISK)
    unscoped.count()
    with caching.release_after():
        outer = caching.tracked_persist(spark.range(200))
        outer.count()
        with caching.release_after():
            inner = caching.tracked_persist(spark.range(300))
            inner.count()
            assert inner.storageLevel != StorageLevel.NONE
        assert inner.storageLevel == StorageLevel.NONE   # inner freed
        assert outer.storageLevel != StorageLevel.NONE   # outer survives
    assert outer.storageLevel == StorageLevel.NONE
    assert unscoped.storageLevel != StorageLevel.NONE    # never tracked
    unscoped.unpersist()
    spark.catalog.clearCache()
