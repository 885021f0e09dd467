"""Text-analysis column functions for large-scale training-data pipelines.

Everything here is a composition of built-in ``pyspark.sql.functions``
(JVM-side, whole-stage-codegen friendly) — **no Python UDFs in the hot
path**. Each builder returns a Column usable in select/filter, so
Catalyst can push/prune/fold around them. At 100 TB these run inside the
scan stage with zero extra shuffles.

Determinism: all functions are pure; hashing is md5-based so results are
identical across engines (the DuckDB oracles in the test suite replicate
them in SQL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_fits_spark.caching import tracked_persist

# Small language-marker sets for the n-gram/stopword language heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "y", "es"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "les", "une", "et", "est"),
}

STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "is", "to", "in")

#: BPE-ish tokenizer regex: runs of letters, runs of digits, or a single
#: non-space symbol — a cheap standin for byte-pair pretokenization.
BPE_TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokens (single-space split; matches the oracle's
    ``string_split(text, ' ')``)."""
    return F.split(F.col(col) if isinstance(col, str) else col, " ")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).alias("token_count")


def bpe_token_count(col: Column | str) -> Column:
    """Token count under the BPE-ish regex pretokenizer."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), 0))


def distinct_token_ratio(col: Column | str) -> Column:
    """Lexical diversity: distinct tokens / tokens (rounded 4)."""
    t = tokens(col)
    return F.round(F.size(F.array_distinct(t)) / F.size(t), 4)


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    t = tokens(col)
    hits = F.size(F.filter(t, lambda x: x.isin(*stopwords)))
    return F.round(hits / F.size(t), 4)


def avg_token_length(col: Column | str) -> Column:
    t = tokens(col)
    total = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
    return F.round(total / F.size(t), 4)


def punct_ratio(col: Column | str) -> Column:
    """Punctuation chars / all chars."""
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return F.round(n_punct / F.greatest(F.length(c), F.lit(1)), 4)


def quality_score(col: Column | str) -> Column:
    """Heuristic document quality in [0,1]: rewards mid-length docs,
    lexical diversity, and a sane stopword rate. Deterministic and
    SQL-replicable (see the oracle)."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = F.size(tokens(c))
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    div_score = F.size(F.array_distinct(tokens(c))) / n_tok
    stop_score = F.least(stopword_ratio(c) * 5, F.lit(1.0))
    return F.round((len_score + div_score + stop_score) / 3, 4)


def quality_bucket(col: Column | str) -> Column:
    q = quality_score(col)
    return (
        F.when(q >= 0.7, F.lit("good"))
        .when(q >= 0.45, F.lit("ok"))
        .otherwise(F.lit("low"))
    )


def lang_scores(col: Column | str) -> dict[str, Column]:
    t = tokens(col)
    return {
        lang: F.size(F.filter(t, lambda x: x.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(col: Column | str) -> Column:
    """Language-ID heuristic: argmax of language-marker hit counts; all
    zero → 'und'. Ties broken by fixed language order (en,es,de,fr)."""
    scores = lang_scores(col)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # build reversed so earlier languages win ties
    for lang in reversed(list(scores)):
        expr = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def _est_scan_partitions(sizes: list[int], parallelism: int,
                         maxpb: int, opencost: int) -> int:
    """Mirror of Spark's FilePartition packing estimate: split size =
    ``min(maxPartitionBytes, max(openCostInBytes, bytesPerCore))`` with
    ``bytesPerCore = (Σsize + n·openCost) / parallelism``, then
    open-cost-padded bytes binned at that split size. Used to decide
    whether a scan is already spread without converting the plan to an
    RDD (the expensive probe)."""
    padded = sum(sizes) + len(sizes) * opencost
    per_core = padded // max(parallelism, 1)
    split = min(maxpb, max(opencost, per_core, 1))
    # bin-packing closes bins EARLY (a bin never exceeds the split), so
    # ceil over-counts by at most one bin; report the floor-leaning
    # estimate so a borderline small input errs toward spreading (a
    # cheap repartition of a by-construction small input) rather than
    # leaving it near-serial
    return max(1, -(-padded // split) - 1) if padded > split else 1


def spread_for_cpu(df, npartitions: int | None = None):
    """Small-input guard for CPU-heavy map stages (tokenize + md5 gram
    hashing): a 100 TB scan arrives with thousands of partitions, but a
    small corpus is often ONE parquet file → ONE scan partition, and the
    hashing then runs on a single core (measured: q64's 3s single-task
    stages at sf0.1). Repartition up to the default parallelism when the
    incoming plan has materially fewer partitions; the bytes moved are
    the (by construction small) input, and on a real many-partition scan
    this is a no-op branch.

    Probe cost: pass ``npartitions`` (a caller hint) to skip probing
    entirely. Otherwise ``inputFiles()`` (driver-side file listing, no
    plan conversion) plus the session's file-packing confs estimate the
    scan partition count — a raw file COUNT is not enough, because
    Spark packs small files: with default ``openCostInBytes`` (4 MB)
    64 tiny files plan as ~3 partitions, not 64. Local (``file:``)
    inputs are stat'ed directly (µs each); non-local or unlisted
    sources fall back to ``rdd.getNumPartitions()``, which converts
    the plan to an RDD (and, for a Python datasource, re-runs its
    partition planning) — acceptable exactly when the input is small,
    and skipped for very large listings (≥1024 files pack to ≥ cores
    partitions under any sane conf)."""
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    if npartitions is None:
        try:
            files = df.inputFiles()
        except Exception:
            files = []
        if files and len(files) < 1024:
            import os
            from urllib.parse import urlparse

            conf = df.sparkSession.conf

            def _b(v: str) -> int:
                v = v.strip().lower()
                for suf, mult in (("kb", 1 << 10), ("mb", 1 << 20),
                                  ("gb", 1 << 30), ("k", 1 << 10),
                                  ("m", 1 << 20), ("g", 1 << 30),
                                  ("b", 1)):
                    if v.endswith(suf):
                        return int(float(v[:-len(suf)])) * mult
                return int(v)

            maxpb = _b(conf.get("spark.sql.files.maxPartitionBytes",
                                "134217728"))
            opencost = _b(conf.get("spark.sql.files.openCostInBytes",
                                   "4194304"))
            try:
                sizes = [
                    os.path.getsize(urlparse(f).path) for f in files
                    if urlparse(f).scheme in ("file", "")]
                # use the size estimate only when EVERY listed file is
                # local: a mostly-remote (s3/hdfs) listing with one
                # local file would otherwise be misjudged as tiny and
                # hit with an unnecessary full repartition (r3 ADVICE);
                # mixed/remote listings fall through to the
                # getNumPartitions probe below
                if sizes and len(sizes) == len(files):
                    npartitions = _est_scan_partitions(
                        sizes, p, maxpb, opencost)
            except OSError:
                pass
        elif len(files) >= 1024:
            return df
        if npartitions is None:
            npartitions = df.rdd.getNumPartitions()
    if npartitions * 2 < p:
        return df.repartition(p)
    return df


def md5_fingerprint(col: Column | str) -> Column:
    """Exact-content fingerprint: md5 of the raw text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c)


def content_fingerprint(col: Column | str) -> Column:
    """Order-insensitive content fingerprint: md5 over the sorted
    distinct token set (a cheap document sketch — docs that are token
    permutations of each other collide)."""
    t = F.array_sort(F.array_distinct(tokens(col)))
    return F.md5(F.concat_ws(" ", t))


def minhash_expr(shingles: Column, seed: int) -> Column:
    """One MinHash value: lexicographic min of md5('<seed>|'+shingle).
    String-min keeps Spark and the SQL oracle bit-identical."""
    return F.array_min(
        F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{seed}|"), s)))
    )


# Universal-hash coefficients for permutation MinHash: h_s(x) =
# (A_s * (x mod 2^32) + B_s) mod (2^61 - 1). A_s odd and < 2^30 so the
# product stays below 2^62 — exact in int64 for BOTH Spark and DuckDB
# (the oracle mirrors the same arithmetic; no md5 per (seed, shingle)).
MINHASH_PRIME = (1 << 61) - 1
MINHASH_COEFFS: tuple[tuple[int, int], ...] = (
    (541238917, 113), (908209037, 40503), (176862553, 9176),
    (421412491, 278191), (721593323, 551707), (330251273, 726811),
    (646558883, 90017), (259117471, 359321), (835292341, 144203),
    (470881613, 621089), (997462823, 53267), (182838689, 415577),
    (613550911, 238729), (350940523, 789431), (786491237, 102913),
    (294718079, 667099),
)


def minhash_perm_expr(hashes: Column, seed_idx: int) -> Column:
    """One MinHash value from pre-hashed int64 shingles: min of a
    universal-hash permutation. Replaces per-seed md5 — one md5 per
    shingle total (in ``shingle_sets``), then pure integer math."""
    a, b = MINHASH_COEFFS[seed_idx]
    return F.array_min(
        F.transform(
            hashes,
            lambda h: (F.lit(a) * (h % F.lit(1 << 32)) + F.lit(b))
            % F.lit(MINHASH_PRIME),
        )
    )


def add_simhash(df: DataFrame, text_col: str, id_col: str, bits: int = 16) -> DataFrame:
    """Per-document SimHash signature (``bits`` wide, default 16).

    Token hash = first ``ceil(bits/4)`` hex chars of md5 → int (≤15 hex
    chars so the value stays sign-safe in an int64, capping ``bits`` at
    60); each bit position accumulates +1/−1 over tokens; the signature
    sets bits with positive sums. Pure DataFrame ops: one explode + one
    groupBy (map-side partial agg keeps the shuffle small: ≤ one row
    per doc)."""
    if not 1 <= bits <= 60:
        raise ValueError(f"bits must be in [1, 60], got {bits}")
    nhex = -(-bits // 4)
    tok = df.select(
        F.col(id_col), F.explode(F.array_distinct(tokens(text_col))).alias("_tok")
    )
    h = F.conv(F.substring(F.md5(F.col("_tok")), 1, nhex), 16, 10).cast("long")
    tok = tok.select(id_col, h.alias("_h"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"_b{b}")
        for b in range(bits)
    ]
    agg = tok.groupBy(id_col).agg(*bit_sums)
    sig = None
    for b in range(bits):
        term = F.when(F.col(f"_b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return agg.select(F.col(id_col), sig.cast("long").alias("simhash"))


def _kgram_hash(tok_slice: Column) -> Column:
    """md5-prefix int64 of a space-joined token slice (mirrored exactly
    by the SQL oracle)."""
    return F.conv(
        F.substring(F.md5(F.concat_ws(" ", tok_slice)), 1, 15), 16, 10
    ).cast("long")


def _let(val: Column, fn) -> Column:
    """Let-binding for an array-valued expression: evaluate ``val``
    ONCE per row and hand it to ``fn`` as a bound lambda variable.
    Spark expressions have no let — referencing an outer expression
    inside a higher-order-function lambda SUBSTITUTES its whole tree,
    re-evaluating it per element (the q47 winnow trap: the full k-gram
    hash array recomputed per window position, O(n²·k); measured 11.3 s
    → sub-second at sf0.1). Wrapping in a 1-element array and
    transforming binds the value to a variable instead."""
    return F.element_at(F.transform(F.array(val), fn), 1)


def winnow_fingerprints(col: Column | str, k: int = 4, w: int = 5) -> Column:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD'03 — the MOSS rolling-hash scheme): hash every k-token gram,
    then keep the minimum hash of each sliding window of w consecutive
    gram hashes; the distinct, sorted survivors are the document's
    fingerprint set. Guarantees any shared run of ≥ w+k-1 tokens between
    two documents produces at least one common fingerprint.

    Pure JVM-side array expressions (no UDF); short documents degrade to
    a single whole-text fingerprint. Tokens and gram hashes are staged
    through :func:`_let` so each array is computed once per row, not
    once per window position."""
    def grams_of(tk: Column) -> Column:
        n = F.size(tk)
        return F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(1), n - (k - 1)),
                lambda i: _kgram_hash(F.slice(tk, i, k)),
            ),
        ).otherwise(F.array(_kgram_hash(tk)))

    def fps_of(kg: Column) -> Column:
        m = F.size(kg)
        return F.when(
            m >= w,
            F.transform(
                F.sequence(F.lit(1), m - (w - 1)),
                lambda i: F.array_min(F.slice(kg, i, w)),
            ),
        ).otherwise(F.array(F.array_min(kg)))

    fps = _let(tokens(col), lambda tk: _let(grams_of(tk), fps_of))
    return F.array_sort(F.array_distinct(fps))


# -- repetition signals (Gopher-style quality rules) -----------------------

def word_ngrams(col: Column | str, n: int) -> Column:
    """ALL word n-grams (non-distinct, order kept) — the denominator for
    repetition ratios. Docs shorter than n collapse to one gram. Tokens
    are :func:`_let`-bound: referencing the split inside the transform
    lambda would re-tokenize the document per gram position."""
    def grams_of(w: Column) -> Column:
        return F.when(
            F.size(w) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(w) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(w, i, n)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", w)))

    return _let(tokens(col), grams_of)


def dup_ngram_ratio(col: Column | str, n: int = 3) -> Column:
    """Fraction of repeated word n-grams: 1 − distinct/total (rounded 4).
    High values flag boilerplate/looped generations (Gopher repetition
    rule); pure array expressions in the scan stage."""
    return _let(
        word_ngrams(col, n),
        lambda g: F.round(1 - F.size(F.array_distinct(g)) / F.size(g), 4))


# -- scrubbing (PII / link redaction) --------------------------------------

#: conservative patterns valid in both Java regex (Spark) and RE2 (DuckDB)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"


def count_matches(col: Column | str, pattern: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(pattern), 0))


def scrub_text(col: Column | str) -> Column:
    """Redact emails then URLs with typed placeholders — the standard
    pre-training scrub pass. regexp_replace is global in Spark; the SQL
    oracle mirrors with the RE2 'g' flag."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(c, URL_RE, "<URL>")


def corpus_unigram_logprob(df, text_col: str, id_col: str):
    """Per-document mean unigram log-probability under the corpus's own
    token distribution — the cheap stand-in for an LM quality filter
    (CCNet-style): boilerplate-ish docs made of common tokens score
    high, rare-token noise scores low.

    Two aggregations: explode → token frequency table (map-side combined
    count), then a token→logprob join back and one per-doc sum. The
    frequency join is a plain equi-join so AQE broadcasts a small
    vocabulary and shuffle-joins a 100M-row one — no manual hint needed.
    The grand total rides a broadcast of ONE row.

    Determinism: per-token log-probs are computed once on the frequency
    table and quantized to int64 (×1e6); per-doc scores are integer
    sums, so the result is aggregation-order-independent and
    SQL-oracle-checkable. Returns (id, lp6_sum, n_toks, avg_logprob).
    """

    toks = spread_for_cpu(df).select(
        F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("_tok"))
    # the frequency table feeds the totals broadcast AND the logprob
    # join; without a persist each branch re-tokenizes the corpus (the
    # broadcast subquery compiles separately, so ReusedExchange never
    # kicks in). It is vocab-sized — tiny next to the token stream.
    freq = tracked_persist(
        toks.groupBy("_tok").agg(F.count("*").alias("_n")))
    total = freq.agg(F.sum("_n").cast("double").alias("_total"))
    lp = freq.crossJoin(F.broadcast(total)).select(
        "_tok",
        F.round(F.log10(F.col("_n") / F.col("_total")) * 1_000_000, 0)
        .cast("long").alias("_lp6"),
    )
    return (
        toks.join(lp, "_tok")
        .groupBy("_id")
        .agg(F.sum("_lp6").alias("lp6_sum"), F.count("*").alias("n_toks"))
        .select(
            F.col("_id").alias(id_col), "lp6_sum", "n_toks",
            F.round(F.col("lp6_sum") / (F.col("n_toks") * 1_000_000), 4)
            .alias("avg_logprob"),
        )
    )


def dsir_logratio(df, text_col: str, id_col: str, target_flag):
    """DSIR-style data-selection weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): each
    document's log importance ratio ``log p_target(x)/p_corpus(x)``
    under bag-of-unigram models, where the target distribution is
    estimated from the rows where ``target_flag`` is true (e.g. a
    high-quality source) and the corpus distribution from everything.
    Rank or hash-sample by this weight to steer the mixture toward the
    target domain. Returns ``(id, li6_sum, n_toks, avg_log_ratio)``.

    Plan: ONE token-frequency aggregation serves both models — the
    target count rides along as a conditional sum, so the corpus is
    tokenized exactly once. Totals (corpus size, target size, vocab)
    ride a one-row broadcast; the token→logratio join is AQE-planned
    (broadcast for small vocabularies). Target counts are add-1
    smoothed over the corpus vocabulary so unseen-in-target tokens get
    finite weight; corpus counts need no smoothing (every token occurs).

    Determinism: per-token log-ratios are quantized to int64 (×1e6) on
    the frequency table; per-doc scores are integer sums —
    aggregation-order-independent and SQL-oracle-checkable."""

    toks = spread_for_cpu(df).select(
        F.col(id_col).alias("_id"), target_flag.alias("_tgt"),
        F.explode(tokens(text_col)).alias("_tok"))
    # persisted for the same reason as corpus_unigram_logprob's freq:
    # the totals broadcast and the ratio join both consume it, and each
    # would otherwise re-tokenize the corpus
    freq = tracked_persist(
        toks.groupBy("_tok").agg(
            F.count("*").alias("_nc"),
            F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).alias("_nt"),
        )
    )
    stats = freq.agg(
        F.sum("_nc").cast("double").alias("_c"),
        F.sum("_nt").cast("double").alias("_t"),
        F.count("*").cast("double").alias("_v"),
    )
    lp = freq.crossJoin(F.broadcast(stats)).select(
        "_tok",
        F.round(
            (F.log10((F.col("_nt") + 1) / (F.col("_t") + F.col("_v")))
             - F.log10(F.col("_nc") / F.col("_c"))) * 1_000_000, 0)
        .cast("long").alias("_li6"),
    )
    return (
        toks.join(lp, "_tok")
        .groupBy("_id")
        .agg(F.sum("_li6").alias("li6_sum"), F.count("*").alias("n_toks"))
        .select(
            F.col("_id").alias(id_col), "li6_sum", "n_toks",
            F.round(F.col("li6_sum") / (F.col("n_toks") * 1_000_000), 4)
            .alias("avg_log_ratio"),
        )
    )


def pmi_collocations(df, text_col: str, *, min_count: int = 5, k: int = 20):
    """Top-``k`` bigram collocations by pointwise mutual information —
    the classic phrase/term extraction pass over a corpus (word2vec's
    phrase detection, terminology mining, tokenizer-vocab seeding).

    ``PMI(x,y) = log10( p(x,y) / (p(x)·p(y)) )`` with ``p(x,y)`` over
    the bigram stream and ``p(x)`` over the unigram stream. Bigrams
    below ``min_count`` are dropped (the standard noise floor — PMI
    explodes for hapax pairs).

    Plan shape: two frequency aggregations (unigram, bigram) with
    map-side combine; the unigram table is persisted because the grand
    total AND both word-joins consume it (re-tokenizing the corpus per
    consumer otherwise). Totals ride one-row broadcasts; the
    bigram→unigram joins are vocabulary-sized equi-joins that AQE
    broadcasts when small. Final ranking is a distributed top-k
    (TakeOrderedAndProject) — the rank window orders only k rows.

    Determinism: PMI is quantized to int64 (×1e6) on the (small)
    filtered bigram table; ties break on the bigram string. Returns
    ``(bigram, pair_count, left_count, right_count, pmi6, pmi, rank)``.

    Persist lifetime: the unigram table stays cached for the session
    (vocab-sized); call ``spark.catalog.clearCache()`` between runs if
    that matters."""
    from pyspark.sql.window import Window as _W

    base = spread_for_cpu(df)
    uni = tracked_persist(
        base.select(F.explode(tokens(text_col)).alias("_tok"))
        .groupBy("_tok").agg(F.count("*").alias("_n"))
    )
    bigrams = _let(tokens(text_col), lambda w: F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.concat_ws(" ", F.slice(w, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>")))
    big = tracked_persist(
        base.select(F.explode(bigrams).alias("_bg"))
        .groupBy("_bg").agg(F.count("*").alias("_nbg"))
    )
    totals = (
        uni.agg(F.sum("_n").cast("double").alias("_N"))
        .crossJoin(big.agg(F.sum("_nbg").cast("double").alias("_M")))
    )
    lw = uni.select(F.col("_tok").alias("_lw"), F.col("_n").alias("left_count"))
    rw = uni.select(F.col("_tok").alias("_rw"), F.col("_n").alias("right_count"))
    scored = (
        big.where(F.col("_nbg") >= min_count)
        .withColumn("_lw", F.split(F.col("_bg"), " ")[0])
        .withColumn("_rw", F.split(F.col("_bg"), " ")[1])
        .join(lw, "_lw").join(rw, "_rw")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col("_bg").alias("bigram"),
            F.col("_nbg").alias("pair_count"),
            "left_count", "right_count",
            F.round(
                (F.log10(F.col("_nbg") / F.col("_M"))
                 - F.log10(F.col("left_count") / F.col("_N"))
                 - F.log10(F.col("right_count") / F.col("_N"))) * 1_000_000,
                0).cast("long").alias("pmi6"),
        )
    )
    top = scored.orderBy(F.desc("pmi6"), F.asc("bigram")).limit(k)
    rank_w = _W.orderBy(F.desc("pmi6"), F.asc("bigram"))
    return top.withColumn("rank", F.row_number().over(rank_w)).select(
        "bigram", "pair_count", "left_count", "right_count", "pmi6",
        F.round(F.col("pmi6") / 1_000_000, 4).alias("pmi"), "rank")


def bm25_topk(df, text_col: str, id_col: str, terms: tuple[str, ...],
              *, k1: float = 1.2, b: float = 0.75, k: int = 20):
    """BM25 lexical retrieval: top-``k`` documents for a bag of query
    ``terms`` — the sparse/lexical counterpart to the embedding ANN
    operators (hybrid retrieval = union both candidate sets).

    Plan shape: the exploded token stream filters to the query terms
    FIRST (a literal IN over a handful of strings, pushed into the scan
    stage), so everything downstream — tf, df, the score join — runs on
    |terms|-bounded data, not the corpus. Document length and corpus
    size ride one-row broadcasts; final ranking is a single top-k.

    Determinism: each (doc, term) BM25 contribution is quantized to
    int64 (×1e6) before the per-doc sum (order-independent); ranking
    ties break by doc id. Returns (id, score6_sum, bm25, rank)."""
    lens = df.select(
        F.col(id_col).alias("_id"), F.size(tokens(text_col)).alias("_len"))
    # corpus size and average length in ONE one-row aggregate: they
    # share the `lens` subtree, so splitting them into two aggs (as
    # r5-r9 did) re-derived the input — for a chunked caller like
    # q98 that meant re-running the whole chunk expansion per stat
    # job. Same values, one fewer pass over the corpus.
    stats_df = lens.agg(F.count("*").cast("double").alias("_ndocs"),
                        F.avg("_len").alias("_avglen"))

    toks = df.select(
        F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("_tok")
    ).where(F.col("_tok").isin(*terms))
    tf = toks.groupBy("_id", "_tok").agg(F.count("*").alias("_tf"))
    dfreq = tf.groupBy("_tok").agg(F.count("*").cast("double").alias("_df"))

    idf = dfreq.crossJoin(F.broadcast(stats_df)).select(
        "_tok",
        F.log((F.col("_ndocs") - F.col("_df") + 0.5) / (F.col("_df") + 0.5) + 1.0)
        .alias("_idf"),
    )
    contrib = (
        tf.join(F.broadcast(idf), "_tok")
        .join(lens, "_id")
        .crossJoin(F.broadcast(stats_df.select("_avglen")))
        .select(
            "_id",
            F.round(
                F.col("_idf") * (F.col("_tf") * (k1 + 1.0))
                / (F.col("_tf")
                   + k1 * (1.0 - b + b * F.col("_len") / F.col("_avglen")))
                * 1_000_000, 0,
            ).cast("long").alias("_c6"),
        )
    )
    from pyspark.sql.window import Window as _W

    scored = contrib.groupBy("_id").agg(F.sum("_c6").alias("score6_sum"))
    # distributed top-k (TakeOrderedAndProject) FIRST; the rank window
    # then orders only k rows — never a corpus-wide single partition
    top = scored.orderBy(F.desc("score6_sum"), F.asc("_id")).limit(k)
    w = _W.orderBy(F.desc("score6_sum"), F.asc("_id"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select(
            F.col("_id").alias(id_col), "score6_sum",
            F.round(F.col("score6_sum") / 1_000_000, 4).alias("bm25"), "rank")
    )


def chunk_windows(df, text_col: str, id_col: str, *,
                  window: int = 32, stride: int = 16):
    """Sliding token-window chunking (pretraining/RAG document
    splitting): windows of ``window`` tokens starting every ``stride``
    tokens (overlap = window − stride; the trailing windows are
    shorter). Emits ``(id, chunk_id, start_tok, n_chunk_tokens,
    chunk_text)``.

    Pure map-side: token array → per-start struct → posexplode, all in
    the scan stage — zero shuffle, trivially parallel at any corpus
    size (the one operation a 100 TB pipeline runs over every byte)."""
    # _let-bound: F.slice(w, ...) inside the transform lambda would
    # re-split the WHOLE document per chunk start (the q47 winnow trap
    # — O(doc_len²/stride) character work per doc)
    chunks = _let(tokens(text_col), lambda w: F.when(
        F.size(w) > 0,
        F.transform(
            F.sequence(F.lit(1), F.size(w), F.lit(stride)),
            lambda st: F.struct(
                st.alias("start"),
                F.slice(w, st, window).alias("toks")),
        ),
    ).otherwise(F.array().cast("array<struct<start:int,toks:array<string>>>")))
    ex = df.select(F.col(id_col), F.posexplode(chunks).alias("_k", "_c"))
    return ex.select(
        F.col(id_col),
        F.col("_k").cast("long").alias("chunk_id"),
        F.col("_c.start").cast("long").alias("start_tok"),
        F.size("_c.toks").alias("n_chunk_tokens"),
        F.concat_ws(" ", "_c.toks").alias("chunk_text"),
    )


#: closes each symbol in the boundary-safe segmentation encoding:
#: symbol sequence [ab, c] is stored as ``␟ab␞␟c␞`` (sep=␟ opens, ␞
#: closes). A merge pattern then spans FULL symbols only — a plain
#: sep-joined encoding let the substring replace match mid-symbol
#: (pattern ``a␟b`` inside ``…aa␟b``), silently corrupting segments
#: and breaking batched-vs-sequential equivalence (r4 review finding).
BPE_CLOSE = "\x1e"


def _safe_merge_batch(rows, sep: str, max_batch: int,
                      saw_all: bool) -> list[str]:
    """The maximal prefix of the (count desc, pair asc)-sorted pair list
    that sequential greedy BPE is PROVABLY going to pick in this exact
    order — so one pair-count job can emit a whole batch of merges with
    bit-identical results to the one-merge-per-job loop. Assumes the
    boundary-safe encoding (merges touch full symbols only).

    Safety argument. A pair's *footprint* is {left, right, left+right}
    — merging (a,b) can change the count of exactly the pairs whose own
    symbols meet that footprint: occurrences of (x,a)/(b,y) shrink,
    (x,ab)/(ab,y) appear or grow. Pairs are accepted while their
    footprints are pairwise disjoint, so accepted pairs stay mutually
    untouched and sequential application order equals sort order. The
    first non-accepted row (an interacting row, or — after a
    ``max_batch`` cutoff — the first later row whose symbols meet the
    accepted footprints; or any unseen row when the collected list was
    truncated) yields a ceiling C on every pre-merge count sequential
    could newly prefer. A post-merge count is bounded by the sum of at
    most FOUR pre-merge interacting counts (a new (ab,cd) occurrence
    comes from an old (ab,cd), (ab,c), (b,cd), or (b,c) context), i.e.
    by 4·C — EXCEPT pairs spawned by a SELF-pair (a,a), whose source is
    the accepted pair itself ((aa,a) ⇐ old (a,a)) and is bounded only
    by its own count, so a self-pair terminates the batch (found by the
    randomized property test: {'ccc':7,'bbb':2} has sequential order
    c·c, cc·c, b·b — (cc,c) outruns (b,b)). With that, accepted pairs
    with count strictly above 4·C are un-overtakable at every
    intermediate sequential step. The global argmax is kept
    unconditionally; ties among accepted pairs resolve by the
    lexicographic order the sort already applied, and any equal-count
    non-accepted row sorts lexicographically after."""
    accepted: list[tuple[str, int]] = []
    syms: set[str] = set()
    ceiling = None
    cut = None
    for idx, (pr, cnt) in enumerate(rows):
        left, _, right = pr.partition(sep)
        footprint = {left, right, left + right}
        if accepted and (footprint & syms):
            # also stops on a merged-symbol collision: such a row's
            # count is stable, so sequential would pick it mid-batch —
            # it must terminate acceptance AND act as a ceiling
            ceiling = cnt
            break
        if left == right:
            # self-pair: nothing after it is provably safe (see above)
            if not accepted:
                accepted.append((pr, cnt))
                syms |= footprint
            else:
                ceiling = cnt  # stable count — sequential's next pick
            break
        accepted.append((pr, cnt))
        syms |= footprint
        if len(accepted) == max_batch:
            cut = idx + 1
            break
    if ceiling is None and cut is not None:
        # max_batch cutoff: the remaining collected rows were never
        # checked for interactions — find the first whose count the
        # batch can change (r4 review finding)
        for pr, cnt in rows[cut:]:
            if set(pr.split(sep)) & syms:
                ceiling = cnt
                break
    if not saw_all:
        last_seen = rows[-1][1]
        ceiling = last_seen if ceiling is None else max(ceiling, last_seen)
    if ceiling is None:
        # entire pair list seen, zero interactions ⇒ no count can
        # change and no new pair can arise
        return [pr for pr, _ in accepted]
    return [accepted[0][0]] + [pr for pr, cnt in accepted[1:]
                               if cnt > 4 * ceiling]


def bpe_segment(df, text_col: str, *, n_merges: int = 3, sep: str = "\x1f",
                max_batch: int = 64, job_stats: dict | None = None):
    """Distributed BPE tokenizer fitting (the byte-pair-encoding merge
    loop, word-level): split every distinct corpus word into characters,
    then ``n_merges`` times pick the globally most frequent adjacent
    symbol pair (weighted by word frequency, ties to the lexicographic
    smallest) and merge it everywhere. Returns ``(words_df, merges)``
    where ``words_df`` is one row per distinct word —
    ``(word, n, segments)`` with segments sep-joined — and ``merges``
    the ordered merge list.

    Scale shape: the loop runs on the DISTINCT-words table (vocabulary,
    not corpus — ~10⁸ rows at web scale, shuffled once per batch as a
    (pair, weight) partial-agg). The merge itself is a map-side string
    ``replace`` over a **boundary-safe encoding** (every symbol wrapped
    ``␟sym␞``, see :data:`BPE_CLOSE`): a merge pattern spans full
    symbols only, so left-to-right non-overlapping replace IS exact
    greedy BPE application — r1-r3's bare sep-joined encoding let the
    pattern ``a␟b`` match mid-symbol inside ``…aa␟b`` (r4 review
    finding) — and behaves identically in the JVM and in SQL, which
    makes the whole training loop oracle-checkable.

    **Batched merges** (r3 VERDICT #5, lifting the documented
    one-job-per-merge ceiling): each pair-count job collects the top
    pairs (driver traffic stays parameter-bounded: ≤ ~4·max_batch+1
    rows per job) and applies the provably-safe prefix of
    non-interacting merges in one map-side pass —
    :func:`_safe_merge_batch` guarantees the merge list is
    bit-identical to the sequential loop, it only amortizes jobs. The
    honest amortization profile: a batch beyond one merge requires the
    head pairs' footprints to be disjoint AND their counts to clear 4×
    the first interacting count, which character-stage merges on
    natural text essentially never do (measured ~1.0 merges/job on the
    synthetic documents table; the multi-merge case is pinned by a unit
    test on a footprint-disjoint corpus). Exactness is the contract
    here — a trainer happy with the standard approximate batching
    (merge every pair above a frequency threshold per round,
    sequential-inequivalent) can raise throughput ~batch-size-fold, but
    then the fit is no longer SQL-oracle-checkable nor
    order-deterministic. ``max_batch=1`` short-circuits the batch scan;
    pass a dict as ``job_stats`` to read back ``{"jobs": J,
    "merges": M}``.
    """
    close = BPE_CLOSE
    words = (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .where(F.length("word") > 0)
        .groupBy("word").agg(F.count("*").alias("n"))
    )
    # boundary-safe encoding: every symbol wrapped ``<sep>sym<close>``,
    # so a merge pattern can only match FULL adjacent symbols — see
    # BPE_CLOSE. Pair counting splits the wrapper seam (close+sep).
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.substring(F.col("word"), i, F.lit(1)))
    base = words.withColumn(
        "s", F.concat(F.lit(sep), F.concat_ws(close + sep, chars),
                      F.lit(close))).persist()
    core = F.expr("substring(s, 2, length(s) - 2)")
    cur = base
    merges: list[str] = []
    jobs = 0
    top_k = max(4 * max_batch, 64)
    try:
        while len(merges) < n_merges:
            prs = _let(F.split(core, close + sep), lambda arr: F.when(
                F.size(arr) >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size(arr) - 1),
                    lambda i: F.concat(F.element_at(arr, i), F.lit(sep),
                                       F.element_at(arr, i + 1)),
                ),
            ).otherwise(F.array().cast("array<string>")))
            top = (
                cur.select("n", F.explode(prs).alias("pr"))
                .groupBy("pr").agg(F.sum("n").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("pr"))
                .limit(top_k + 1)
                .collect()  # bounded-collect: ≤ 4·max_batch+1 rows/job
            )
            jobs += 1
            if not top:
                break
            batch = _safe_merge_batch(
                [(r["pr"], r["cnt"]) for r in top], sep,
                min(max_batch, n_merges - len(merges)),
                saw_all=len(top) <= top_k)
            for pr in batch:
                merges.append(pr)
                pattern = sep + pr.replace(sep, close + sep) + close
                cur = cur.withColumn(
                    "s", F.replace("s", F.lit(pattern),
                                   F.lit(sep + pr.replace(sep, "") + close)))
    finally:
        base.unpersist()
    if job_stats is not None:
        job_stats.update({"jobs": jobs, "merges": len(merges)})
    # public segments format stays sep-joined (unwrap the encoding)
    return (
        cur.select("word", "n",
                   F.replace(core, F.lit(close + sep), F.lit(sep))
                   .alias("segments")),
        merges,
    )


def bpe_apply(df, text_col: str, id_col: str, merges: list[str],
              *, sep: str = "\x1f"):
    """Apply a TRAINED BPE merge list to a corpus — the production
    counterpart to :func:`bpe_segment`'s fit loop. Where the fit runs
    one Spark job per merge (documented ceiling), application is ONE
    pass regardless of vocabulary size: Python segmentation work is
    proportional to the corpus's **distinct words**, never the corpus.

    Plan shape: explode → distinct words (map-combined) → an
    Arrow-batched ``mapInPandas`` segments each vocabulary word once
    (the merge list rides a broadcast; a per-task dict caches repeats
    across batches) → the (word, n_segments) table joins back to the
    token stream (AQE broadcasts small vocabularies) → one per-doc sum.
    At 30k merges the per-word cost is the merge-loop replay, amortized
    over every occurrence of the word in the corpus.

    Segmentation semantics are identical to the fit (sequential
    left-to-right non-overlapping ``replace`` per merge, in merge
    order), so a fit→apply round-trip is SQL-oracle-checkable. Returns
    ``(id, n_words, n_bpe_tokens, bpe_ratio)``; docs with no non-empty
    words drop (no tokens to count)."""
    import pandas as pd
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType)

    bc = df.sparkSession.sparkContext.broadcast(tuple(merges))

    toks = (
        spread_for_cpu(df)
        .select(F.col(id_col).alias("_id"),
                F.explode(tokens(text_col)).alias("_w"))
        .where(F.length("_w") > 0)
    )
    vocab = toks.select("_w").distinct()
    seg_schema = StructType([StructField("_w", StringType()),
                             StructField("_nseg", LongType())])

    def _segment(batches):
        # identical boundary-safe encoding + replace semantics as the
        # fit (BPE_CLOSE), so fit→apply round-trips bit-exactly
        close = BPE_CLOSE
        mg = [(sep + p.replace(sep, close + sep) + close,
               sep + p.replace(sep, "") + close) for p in bc.value]
        cache: dict[str, int] = {}

        def count(w: str) -> int:
            c = cache.get(w)
            if c is None:
                s = "".join(sep + ch + close for ch in w)
                for a, b in mg:
                    s = s.replace(a, b)
                c = s.count(sep)
                cache[w] = c
            return c

        for pdf in batches:
            yield pd.DataFrame({
                "_w": pdf["_w"],
                "_nseg": [count(w) for w in pdf["_w"]],
            })

    seg = vocab.mapInPandas(_segment, seg_schema)
    return (
        toks.join(seg, "_w")
        .groupBy("_id")
        .agg(F.count("*").alias("n_words"),
             F.sum("_nseg").alias("n_bpe_tokens"))
        .select(
            F.col("_id").alias(id_col), "n_words", "n_bpe_tokens",
            F.round(F.col("n_bpe_tokens") / F.col("n_words"), 4)
            .alias("bpe_ratio"),
        )
    )


def frequent_ngrams(df, text_col: str, group_col: str, *,
                    n: int = 3, k: int = 5):
    """Corpus boilerplate detection: the top-``k`` word ``n``-grams per
    group by DOCUMENT frequency (how many distinct docs contain the
    gram — repetition inside one doc doesn't inflate it). The grams a
    large share of a source's docs all contain are its templates,
    headers, and footers; the output feeds a removal pass (e.g.
    ``line_dedup`` or a literal filter).

    Plan shape: per-doc distinct grams (map-side array op) → explode →
    ONE (group, gram) count with map-side partial agg, then a TWO-phase
    top-k: a salted local top-k (window partitioned by (group, salt) —
    a group's billions of distinct grams never meet in one partition)
    keeps ≤ k·n_salts candidates per group, and the final rank window
    runs over only those. Ties break lexicographically for determinism.
    Returns (group, gram, n_docs, rank)."""
    grams = word_ngrams(text_col, n)
    counts = (
        spread_for_cpu(df)
        .select(F.col(group_col).alias("group"),
                F.explode(F.array_distinct(grams)).alias("gram"))
        .groupBy("group", "gram")
        .agg(F.count("*").alias("n_docs"))
    )
    from pyspark.sql.window import Window as _W

    n_salts = 32
    # each (group, gram) row is unique, so any global top-k member is in
    # its salt bucket's local top-k — the pre-filter loses nothing
    salted = counts.withColumn(
        "_salt", F.abs(F.hash("gram")) % F.lit(n_salts))
    lw = _W.partitionBy("group", "_salt").orderBy(
        F.desc("n_docs"), F.asc("gram"))
    cand = (
        salted.withColumn("_lr", F.row_number().over(lw))
        .where(F.col("_lr") <= k)
    )
    w = _W.partitionBy("group").orderBy(F.desc("n_docs"), F.asc("gram"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("group", "gram", "n_docs", "rank")
    )


def source_kl_divergence(df, text_col: str, group_col: str):
    """Per-source distribution drift: ``D_KL(P_source ‖ P_corpus)``
    over unigram distributions — the standard "which source is pulling
    the training mix away from the mixture" monitor (high KL = niche
    vocabulary; ~0 = representative). Every source token exists in the
    corpus by construction, so no smoothing is needed and the log is
    always finite.

    One pass over text: explode → ``groupBy(source, token)`` counts
    (map-combined, the only data-sized shuffle); the global token
    table is a RE-aggregation of that table (never a second
    tokenization), totals ride one-row broadcasts, and the
    source→global join is vocabulary-sized (AQE broadcasts small
    vocabs). Per-token contributions ``p_s·log10(p_s/p_c)`` are
    quantized to int64 (×1e9) so the per-source sum is
    aggregation-order-independent and SQL-replicable.

    Returns ``(source, n_toks, n_vocab, kl9_sum, kl_divergence)``."""

    sf = tracked_persist(
        spread_for_cpu(df)
        .select(F.col(group_col).alias("_g"),
                F.explode(tokens(text_col)).alias("_tok"))
        .groupBy("_g", "_tok").agg(F.count("*").alias("_n"))
    )
    gf = sf.groupBy("_tok").agg(F.sum("_n").alias("_ng"))
    stot = sf.groupBy("_g").agg(F.sum("_n").alias("_ts"))
    gtot = gf.agg(F.sum("_ng").cast("double").alias("_tg"))
    contrib = (
        sf.join(gf, "_tok")
        .join(F.broadcast(stot), "_g")
        .crossJoin(F.broadcast(gtot))
        .select(
            "_g", "_n",
            F.round(
                (F.col("_n") / F.col("_ts"))
                * F.log10((F.col("_n") / F.col("_ts"))
                          / (F.col("_ng") / F.col("_tg")))
                * 1_000_000_000, 0).cast("long").alias("_c9"),
        )
    )
    return (
        contrib.groupBy(F.col("_g").alias(group_col))
        .agg(
            F.sum("_n").alias("n_toks"),
            F.count("*").alias("n_vocab"),
            F.sum("_c9").alias("kl9_sum"),
        )
        .select(
            group_col, "n_toks", "n_vocab", "kl9_sum",
            F.round(F.col("kl9_sum") / 1_000_000_000, 4)
            .alias("kl_divergence"),
        )
    )


def bigram_logprob(df, text_col: str, id_col: str, *, lam: float = 0.7):
    """Per-document interpolated bigram log-probability under the
    corpus's own bigram model — the KenLM-style fluency signal one
    notch above :func:`corpus_unigram_logprob`: word-ORDER violations
    (shuffled/garbled text) now score low even when the unigram mix
    looks normal.

    Model (derived entirely from the corpus bigram table):
    ``P(b|a) = lam·c(a,b)/c(a,·) + (1−lam)·c(·,b)/N`` with ``c(a,·)``/
    ``c(·,b)`` the bigram-table marginals and ``N`` the corpus bigram
    count. Docs shorter than 2 tokens carry no bigram and are omitted.

    Shuffle story: bigrams are extracted MAP-SIDE from the token array
    (no self-join, no window over positions); one corpus-sized exchange
    builds the bigram count table (map-side combined), marginals and
    the log term are computed once per DISTINCT bigram
    (vocabulary²-bounded), and the scoring join back to the bigram
    stream is a plain equi-join AQE broadcasts when the vocabulary is
    small. Per-(doc,position) contributions are int64-quantized (×1e6)
    before the per-doc sum — order-independent, SQL-replayable.
    Returns ``(id, n_bigrams, blp6_sum, avg_logprob)``.
    """
    bigrams = _let(tokens(text_col), lambda w: F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(2), F.size(w)),
            lambda i: F.struct(
                F.element_at(w, i - 1).alias("a"),
                F.element_at(w, i).alias("b")),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>")))
    pairs = tracked_persist(
        spread_for_cpu(df)
        .select(F.col(id_col).alias("_id"), F.explode(bigrams).alias("_bg"))
        .select("_id", F.col("_bg.a").alias("_a"), F.col("_bg.b").alias("_b"))
    )
    big = tracked_persist(
        pairs.groupBy("_a", "_b").agg(F.count("*").alias("_cab")))
    ca = big.groupBy("_a").agg(F.sum("_cab").alias("_ca"))
    cb = big.groupBy("_b").agg(F.sum("_cab").alias("_cb"))
    n = big.agg(F.sum("_cab").cast("double").alias("_n"))
    scored = (
        big.join(ca, "_a").join(cb, "_b").crossJoin(F.broadcast(n))
        .select(
            "_a", "_b",
            F.round(
                F.log(
                    F.lit(lam) * F.col("_cab") / F.col("_ca")
                    + F.lit(1.0 - lam) * F.col("_cb") / F.col("_n")
                ) * 1_000_000, 0,
            ).cast("long").alias("_blp6"),
        )
    )
    return (
        pairs.join(scored, ["_a", "_b"])
        .groupBy("_id")
        .agg(F.sum("_blp6").alias("blp6_sum"),
             F.count("*").alias("n_bigrams"))
        .select(
            F.col("_id").alias(id_col), "n_bigrams", "blp6_sum",
            F.round(F.col("blp6_sum") / (F.col("n_bigrams") * 1_000_000), 4)
            .alias("avg_logprob"),
        )
    )
