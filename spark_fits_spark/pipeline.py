"""End-to-end corpus curation: the operators of this repo composed into
the standard pretraining-data pipeline shape (C4 / Gopher / GPT-3
lineage):

    scrub → rule gate (Gopher) → line dedup (C4) → near-dup dedup
    (MinHash-LSH + connected components) → benchmark decontamination
    → quality gate (top-fraction histogram threshold)

Each stage is one of the already-audited operators — this module adds
only composition and a per-stage accounting report, no new distributed
machinery. Scale shape is the union of its parts: map-side gates, the
two line-dedup shuffles, the LSH pipeline, a broadcast anti-join per
drop list; the corpus text crosses the wire only where a stage
fundamentally needs it (line dedup, shingling).

Stage boundaries are ``persist()``-ed (MEMORY_AND_DISK): the report
counts and the next stage both consume each boundary, and without a
persist every count would re-run the whole prefix of the pipeline.
Release: wrap the call and the consumption of ``clean``/``report`` in
``spark_fits_spark.caching.release_after()`` (frees exactly the blocks
this run pinned, checkpoints included), or call
``spark.catalog.clearCache()`` when done (bench.py pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_fits_spark.functions import text as T
from spark_fits_spark.operators import dedup, sample


def curate_corpus(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    benchmark: DataFrame | None = None,
    min_words: int = 5,
    max_words: int = 100_000,
    max_dup_gram_ratio: float = 0.5,
    max_symbol_ratio: float = 0.3,
    minhash_threshold: float = 0.9,
    n_hashes: int = 12,
    bands: int = 2,
    quality_keep_frac: float = 0.9,
) -> dict[str, DataFrame]:
    """Run the full curation pipeline; returns ``{"clean": df,
    "report": df}``.

    ``clean`` holds the surviving rows (original columns, with
    ``text_col`` scrubbed and line-deduplicated). ``report`` is one row
    per stage: ``(stage_order, stage, n_docs)`` — evaluating it runs
    the pipeline (boundaries are persisted so nothing re-runs).

    ``benchmark`` (optional) is a DataFrame with the same ``text_col``/
    ``id_col`` whose word 3-grams define contamination; omit to skip
    that stage."""
    from pyspark.storagelevel import StorageLevel

    def _p(df: DataFrame) -> DataFrame:
        # never re-persist a DataFrame the CALLER already persisted —
        # Spark throws on storage-level changes
        if df.storageLevel != StorageLevel.NONE:
            return df
        from spark_fits_spark.caching import tracked_persist

        return tracked_persist(df)

    stages: list[tuple[str, DataFrame]] = []
    stages.append(("input", _p(docs)))

    # 1. scrub (map-side)
    scrubbed = _p(docs.withColumn(text_col, T.scrub_text(text_col)))
    stages.append(("scrub", scrubbed))

    # 2. Gopher-style rule gate (map-side, zero shuffle). The symbol
    # class keeps letters of EITHER case and all whitespace — an
    # ALL-CAPS or newline-heavy document contains no "symbols"
    gated = _p(scrubbed.where(
        F.size(T.tokens(text_col)).between(min_words, max_words)
        & (T.dup_ngram_ratio(text_col, 3) <= max_dup_gram_ratio)
        & ((F.length(text_col)
            - F.length(F.regexp_replace(text_col, r"[^a-zA-Z0-9\s]", "")))
           / F.length(text_col) <= max_symbol_ratio)))
    stages.append(("gopher_gate", gated))

    # 3. C4 line dedup (two shuffles; may drop docs emptied of lines)
    kept_text = dedup.line_dedup(gated, text_col, id_col)
    line_ded = _p(
        gated.drop(text_col).join(kept_text, id_col))
    stages.append(("line_dedup", line_ded))

    # 4. near-dup dedup: LSH pairs → components → keep min-id reps.
    # connectivity_only: components only need the rep-pair + star
    # subgraph (identical clusters, Σ|group| instead of Σ|group|²
    # edges on dup-heavy corpora)
    pairs = dedup.minhash_lsh_pairs(
        line_ded, text_col, id_col,
        shingle_n=1, n_hashes=n_hashes, bands=bands,
        threshold=minhash_threshold, connectivity_only=True)
    clusters = dedup.connected_components(pairs)
    near_ded = _p(dedup.keep_representatives(line_ded, clusters, id_col))
    stages.append(("near_dedup", near_ded))

    # 5. benchmark decontamination: the DROP list (contaminated ids —
    # tiny by definition, benchmark grams are rare in the corpus) is
    # broadcast into a left_anti join; the keep list would be
    # corpus-sized and force a full shuffle join
    cur = near_ded
    if benchmark is not None:
        flags = dedup.decontaminate(
            near_ded, benchmark, text_col, id_col, n=3)
        drop = flags.where(F.col("contaminated")).select(id_col)
        cur = _p(near_ded.join(F.broadcast(drop), id_col, "left_anti"))
        stages.append(("decontaminate", cur))

    # 6. quality gate: exact top-fraction histogram threshold
    scored = cur.withColumn(
        "_q4",
        F.round(T.quality_score(text_col) * 10000, 0).cast("long"))
    clean = _p(sample.top_fraction_by_score(
        scored, "_q4", quality_keep_frac).drop("_q4", "threshold"))
    stages.append(("quality_gate", clean))

    spark = docs.sparkSession
    report = None
    for i, (name, df) in enumerate(stages):
        row = spark.createDataFrame(
            [(i, name)], ["stage_order", "stage"]
        ).crossJoin(df.agg(F.count("*").alias("n_docs")))
        report = row if report is None else report.unionByName(row)

    return {"clean": clean, "report": report}
