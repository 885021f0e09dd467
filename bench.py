#!/usr/bin/env python
"""Benchmark: run the suite's headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (noop-sink action, so results are
fully materialized but never collected to the driver) and timed
wall-clock, REPS (default 3) times back-to-back; the reported number is
the per-query MIN (see the timing-loop comment for why min, not median,
on this burstable host — observed effective parallelism 0.11-0.6 of
advertised cores, with 6x swings WITHIN one query's reps). Intra-query
persists stay warm across a query's reps (the operators' documented
cache discipline — rep 1 populates, reps 2+ measure steady state), and
the cache is cleared between queries so nothing leaks across.
"queries_median" and the raw per-rep "rep_seconds" are emitted
alongside so the distribution and cold-start cost stay visible.

BENCH ARTIFACT CONTRACT (r5 VERDICT #1 — binding; the harness that
records this process keeps only a bounded ~2,000-char tail of stdout):
the FINAL stdout line must be COUNT-INVARIANT in len(BENCH_QUERIES) —
it carries totals, host/methodology fields, the ~12 fixed micro-
metrics, and a FROZEN flagship "queries" subset (HEADLINE_QUERIES —
never append there; suite growth lands only in BENCH_DETAIL.json and
the full-detail first line). build_headline() asserts the line stays
under HEADLINE_MAX_CHARS (1,500 — margin under the 2,000 capture cap)
before printing; tests/test_bench_contract.py pins the invariance with
a fake 1,000-query timings dict. r4 and r5 both shipped unparseable
artifacts because the per-query dict on the last line grew with the
suite — do not reattach it.

A FITS-scan microbenchmark is included:
it writes a ~64 MB bintable once to a temp dir and measures the
vectorized scan+agg, to compare with the reference's ~16 MB/s/task
decode note (FitsRecordReader.scala:379).

RATIO POLICY (r9 VERDICT #3 — binding): the bench host is burstable
and its credit state is externally driven (same-evening peff probes
read 0.318/0.616/0.395 minutes apart in r9), so ABSOLUTE seconds are
comparable across rounds ONLY between runs whose self-reported
host_gate_ok is true (decode >= HOST_GATE_DECODE_MBPS and
parallel_efficiency >= HOST_GATE_PEFF, both measured in-run). Every
artifact — throttled or not — additionally carries the frozen
unitless ratio set from compute_ratios() (rice/plain,
compressed/plain, comptable/plain codec ratios, q22/core, the
q51-q48 delta), whose numerator and denominator depress together
under throttle and therefore stay comparable regardless of host
state. Round-over-round narratives must lead with the ratios and the
gate verdict; absolute rows from a host_gate_ok=false run are
telemetry, not evidence.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
# r6 VERDICT #3 (the 42-query perf blind spot): every registered query
# NOT in BENCH_QUERIES is also timed, at EXTRA_REPS reps, into the
# detail artifact ONLY ("queries_extra" in BENCH_DETAIL.json / the
# first stdout line) — never the frozen final line, whose
# count-invariance contract stands, and never the suite totals, which
# stay comparable round-over-round.
EXTRA_REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_EXTRA_REPS",
                                       "2")))

# headline subset: every operator family, weighted toward the scan/join/
# agg/window/dedup paths that dominate a 100 TB pipeline
BENCH_QUERIES = [
    "q01_pricing_summary",
    "q02_filter_project",
    "q03_top_building_orders",
    "q05_supplier_nation_revenue",
    "q07_region_rollup",
    "q08_window_running",
    "q17_events_hourly",
    "q19_sessionize",
    "q35_asof_join",
    "q36_range_join_pairs",
    "q39_explode_tokens",
    "q20_dedup_exact",
    "q22_dedup_minhash_lsh",
    "q23_dedup_ngram_jaccard",
    # q48 (clusters) stays out of the headline set: it re-runs q22's
    # pair pipeline and adds only ~2s of label propagation — no new
    # bench signal for double the dominant cost
    "q24_dedup_simhash",
    "q25_embedding_near_dup",
    "q26_ann_cosine_topk",
    "q27_text_stats",
    "q29_text_quality",
    "q30_multimodal_meta",
    # round-2 additions (sampling/packing/line-dedup/kmeans/quantize):
    # appended at the end so earlier per-query numbers stay comparable
    # round-over-round
    "q54_stratified_sample",
    "q56_pack_sequences",
    "q57_line_dedup",
    "q58_kmeans_assign",
    "q59_quantize_error",
    "q64_decontaminate",
    "q65_semdedup",
    "q66_shuffle_shards",
    "q67_boilerplate_ngrams",
    "q68_multimodal_features",
    "q69_bpe_segment",
    "q70_chunk_windows",
    "q71_corpus_report",
    "q72_fixed_n_sample",
    "q73_temperature_mix",
    "q75_dsir_weights",
    "q76_shard_manifest",
    "q77_gopher_filter",
    "q78_incremental_dedup",
    "q79_exact_substring_dedup",
    # round-3 additions, appended for round-over-round comparability
    "q82_pmi_collocations",
    "q83_kmv_source_overlap",
    "q84_mrl_truncated_recall",
    "q85_pq_encode",
    "q86_bpe_apply",
    "q87_minhash_estimator_error",
    "q88_ivfpq_recall",
    "q89_quality_top_fraction",
    "q90_hard_negatives",
    "q91_lm_fluency_gate",
    "q92_source_kl_drift",
    # round-4 additions, appended for round-over-round comparability
    "q46_approx_stats",
    "q93_stream_shard_sink",
    "q94_quality_classifier",
    "q95_simhash_hamming_pairs",
    "q96_weighted_sample",
    "q97_heavy_hitters",
    "q98_rag_chunk_retrieval",
    "q99_cluster_balanced_sample",
    "q100_bloom_decontaminate",
    "q102_zone_crossmatch",
    "q103_bigram_logprob",
    "q105_late_supplier_blame",
    # round-5 addition: the composed survey pipeline (FITS sink with
    # checksums -> audit -> streaming source -> zone crossmatch)
    "q106_survey_pipeline",
    # late-r5 additions: distributed image writing (RICE sink), forced
    # photometry, source extraction, and the pure-JVM HEALPix sky map
    "q109_fits_image_sink_roundtrip",
    "q110_aperture_photometry",
    "q111_source_detection",
    "q112_healpix_skymap",
    "q113_lomb_scargle",
    "q114_phase_fold",
    "q115_coadd_planes",
    "q116_wcs_solve",
    "q117_variability_features",
    "q118_reproject_mosaic",
    "q119_mosaic_stack",
    "q120_cone_search",
    "q121_epoch_crossmatch",
    "q122_periodogram_peaks",
    "q123_zone_partitioned_cone",
    "q124_galactic_skymap",
    "q125_photometric_calibration",
    "q126_transient_detection",
    "q127_astrometric_solve",
    "q128_best_match_crossmatch",
    "q129_psf_convolution",
    "q130_two_point_correlation",
    "q131_median_stack",
    "q132_clipped_stack",
    "q133_structure_function",
    "q134_equivalent_width",
    "q135_composite_spectrum",
    "q136_injection_recovery",
    "q137_local_background",
    "q138_tracklet_linking",
    "q139_header_table",
    "q140_matched_filter_detection",
    "q141_xcorr_redshift",
    "q142_stream_cone_alerts",
    "q143_source_shapes",
    "q144_defect_columns",
    "q145_transient_light_curve",
    "q146_bls_transit_search",
    "q147_proper_motion_fit",
    "q148_frame_calibration",
    "q149_gls_periodogram",
    "q150_image_pipeline_end_to_end",
    "q151_defect_repair",
    "q152_xi_jackknife",
    "q153_weighted_coadd",
    "q154_distortion_solve",
    "q155_relative_photometry",
    "q156_coadd_variance_map",
]


# FROZEN flagship subset for the final stdout line (count-invariant:
# NEVER append here — new queries are covered by BENCH_DETAIL.json and
# the full-detail first line). One row per dominant cost family:
# scan->agg, window, as-of join, MinHash-LSH, line dedup, exact-substr,
# zones crossmatch, source detection, HEALPix map, xi jackknife.
HEADLINE_QUERIES = [
    "q01_pricing_summary", "q08_window_running", "q35_asof_join",
    "q22_dedup_minhash_lsh", "q57_line_dedup",
    "q79_exact_substring_dedup", "q102_zone_crossmatch",
    "q111_source_detection", "q112_healpix_skymap", "q152_xi_jackknife",
]
HEADLINE_MAX_CHARS = 1500  # hard self-check; capture cap is ~2000


def extra_query_names(all_names) -> list:
    """The full-coverage detail set: every registered query outside the
    frozen BENCH_QUERIES subset, registry order. Computed, not listed,
    so a query can never silently fall outside every timing artifact
    (tests/test_bench_contract.py pins the partition is exact)."""
    return [n for n in all_names if n not in BENCH_QUERIES]


# Host-validity gate (r6, formalized r10 per r9 VERDICT #3): a run's
# ABSOLUTE seconds are only comparable round-over-round when the same
# run clears both thresholds; below them the burstable host is
# throttled and absolute numbers fabricate regressions (r6 q105/q67
# scare; r9's peff-0.299 driver artifact). The RATIOS below survive
# throttle — both sides of each ratio depress together (measured:
# rice/plain read 0.71 under hard throttle vs 0.56 healthy, a 1.3x
# drift, while absolute rows drifted >2x) — so every artifact,
# throttled or not, carries them and a self-reported gate verdict.
HOST_GATE_DECODE_MBPS = 1100.0  # single-thread decode, MB/s/task
HOST_GATE_PEFF = 0.4            # measured cores / advertised cores


def compute_ratios(timings: dict, extra_timings: dict,
                   metrics: dict, core: float) -> dict:
    """The frozen unitless ratio set (r9 VERDICT #3) recorded in EVERY
    artifact including throttled ones: same-run numerator/denominator
    pairs whose host-credit sensitivity cancels. Fixed key set (pinned
    by tests/test_bench_contract.py); missing inputs yield None rather
    than dropping the key, so artifacts stay schema-stable.

    - ratio_rice_plain / ratio_compressed_plain / ratio_comptable_plain:
      codec-path MB/s over the same-run plain-scan MB/s (rice target
      >=0.69 — the open watch item; see PLANS.md).
    - ratio_q22_core: the dominant LSH-dedup query's seconds over the
      same-run r1-core serial set's seconds (suite-shape drift signal).
    - delta_q51_q48_sec: corpus-dedup minus its strict subset's cluster
      pipeline — pins the anti-join tail that made the r8/r9 q51 scare
      (healthy reading ~ +0.5 s; a strongly negative value is the
      single-rep-luck signature, not a speedup).
    - host_gate_ok: decode >= HOST_GATE_DECODE_MBPS and peff >=
      HOST_GATE_PEFF, the artifact's own validity verdict."""
    def _div(num, den):
        if num is None or den is None or not den:
            return None
        return round(num / den, 3)

    plain = metrics.get("fits_scan_mb_per_s")
    q48 = extra_timings.get("q48_dedup_clusters")
    q51 = extra_timings.get("q51_dedup_corpus")
    decode = metrics.get("decode_mb_per_s_per_task") or 0.0
    peff = metrics.get("parallel_efficiency") or 0.0
    return {
        "ratio_rice_plain": _div(metrics.get("fits_scan_rice_mb_per_s"),
                                 plain),
        "ratio_compressed_plain": _div(
            metrics.get("fits_scan_compressed_mb_per_s"), plain),
        "ratio_comptable_plain": _div(
            metrics.get("fits_scan_comptable_mb_per_s"), plain),
        "ratio_q22_core": _div(timings.get("q22_dedup_minhash_lsh"),
                               core),
        "delta_q51_q48_sec": (round(q51 - q48, 3)
                              if q51 is not None and q48 is not None
                              else None),
        "host_gate_ok": bool(decode >= HOST_GATE_DECODE_MBPS
                             and peff >= HOST_GATE_PEFF),
    }


def build_headline(total: float, core: float, sf: float, warmed: bool,
                   timings: dict, metrics: dict) -> str:
    """The machine-read FINAL stdout line. Count-invariant by
    construction: per-query content is restricted to the frozen
    HEADLINE_QUERIES (short qNN keys) plus the fixed fits_* micro rows;
    everything else lives in BENCH_DETAIL.json. Asserts the length
    budget so a future growth spurt fails loudly HERE instead of
    shipping a third truncated BENCH_rN.json."""
    short = {}
    for k, v in timings.items():
        if k.startswith("q") and k not in HEADLINE_QUERIES:
            continue
        key = k.split("_", 1)[0] if k.startswith("q") else k
        if key in short:  # raise, not assert: must survive python -O
            raise ValueError(f"headline key collision: {k}")
        short[key] = v
    n_benched = sum(1 for k in timings if k.startswith("q"))
    line = json.dumps({
        "metric": "suite_total_seconds",
        "value": total,
        "core_total_seconds_r1set": core,
        "unit": "sec",
        "queries": short,
        "n_queries_benched": n_benched,
        "key_style": "frozen flagship subset; all queries + medians "
                     "+ reps in BENCH_DETAIL.json",
        "sf": sf,
        "cpus": CPUS,
        "warmed": warmed,
        "reps": REPS,
        **metrics,
    }, separators=(",", ":"))
    if len(line) > HEADLINE_MAX_CHARS:
        # raise, not assert: the length budget is the artifact contract
        # (r4/r5 shipped truncated BENCH_rN.json) and must survive -O
        raise ValueError(
            f"headline line {len(line)} chars > {HEADLINE_MAX_CHARS}: "
            "the final stdout line must stay count-invariant (see "
            "module docstring); move whatever grew into "
            "BENCH_DETAIL.json")
    return line


def _noop_consume(df) -> None:
    """Materialize every row without driver collect. (r4 fix: this used
    to be `save() or df.count()` — save() returns None, so every timed
    query silently materialized TWICE, a full redundant count per rep
    in r1-r3 rows. One noop sink pass is the honest cost.)"""
    df.write.format("noop").mode("overwrite").save()


def decode_mb_per_s(path: str) -> float:
    """Single-thread pure-decode throughput over the bench file — the
    per-task number to hold against the reference's ~16 MB/s/task
    (FitsRecordReader.scala:379). Spark-free: reads the HDU bytes once
    and times decode_bintable over 8 MB batches (the scan's default
    partition batch shape)."""
    from pyspark.sql.pandas.types import to_arrow_schema

    from spark_fits_spark.fitscore.decode import decode_bintable
    from spark_fits_spark.fitscore.file import open_hdu
    from spark_fits_spark.sources.fits_datasource import _bintable_schema

    with open(path, "rb") as f:
        hdu = open_hdu(f, path, 1)
        f.seek(hdu.boundaries.data_start)
        buf = f.read(hdu.n_rows * hdu.row_bytes)
    aschema = to_arrow_schema(_bintable_schema(hdu))
    idx = list(range(len(hdu.col_names)))
    rows_per = 8 * 1024 * 1024 // hdu.row_bytes
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for s in range(0, hdu.n_rows, rows_per):
            decode_bintable(
                buf[s * hdu.row_bytes:(s + rows_per) * hdu.row_bytes],
                hdu, idx, aschema)
        best = min(best, time.perf_counter() - t0)
    return round(len(buf) / 1e6 / best, 1)


def fits_scan_seconds(spark) -> tuple[float, float, float]:
    """(seconds, MB, pure-decode MB/s/thread) for a full vectorized
    scan+agg of a generated bintable (~64 MB)."""
    import numpy as np

    from spark_fits_spark.fitscore import writer

    d = tempfile.mkdtemp(prefix="fitsbench")
    path = os.path.join(d, "bench.fits")
    n = 2_000_000  # 32 B/row → 64 MB
    rng = np.random.RandomState(0)
    cols = [
        ("target", "10A", np.array([f"OBJ{i:07d}" for i in range(n)])),
        ("RA", "E", rng.uniform(0, 6.28, n).astype(">f4")),
        ("Dec", "D", rng.uniform(-1.57, 1.57, n)),
        ("Index", "K", np.arange(n, dtype=">i8")),
        ("RunId", "I", np.ones(n, dtype=">i2")),
    ]
    writer.write_fits(path, [writer.bintable_hdu(cols)])
    mb = os.path.getsize(path) / 1e6
    from pyspark.sql import functions as F

    df = (
        spark.read.format("fits").option("hdu", 1)
        .option("partitionbytes", 8 * 1024 * 1024).load(path)
    )
    df.count()  # warm-up: python workers + plan cache
    t0 = time.perf_counter()
    got = df.agg(F.sum("Index"), F.count("*")).collect()[0]
    sec = time.perf_counter() - t0
    assert got[1] == n, got
    decode_rate = decode_mb_per_s(path)
    try:
        os.remove(path)
        os.rmdir(d)
    except OSError:
        pass
    return sec, mb, decode_rate


def fits_scan_compressed_seconds(spark) -> tuple[float, float]:
    """(seconds, logical MB) for a full scan+agg of a GZIP_2
    tile-compressed image (~64 MB logical int32 pixels, 16 files × 32
    row-tiles each): pins the tiled-decompression path (r4) — per-tile
    heap window reads + zlib inflate inside the Arrow batch loop."""
    import numpy as np

    from spark_fits_spark.fitscore import writer

    d = tempfile.mkdtemp(prefix="fitsbench_comp")
    n_files, rows, width = 16, 512, 2048  # 16 x 4 MB logical
    for fi in range(n_files):
        base = np.arange(rows * width, dtype=np.int64) + fi
        img = ((base % 1000) + (base // width)).astype("i4").reshape(rows, width)
        writer.write_fits(
            os.path.join(d, f"part{fi:03d}.fits"),
            [writer.compressed_image_hdu(img, "GZIP_2", tile_rows=16)])
    logical_mb = n_files * rows * width * 4 / 1e6
    from pyspark.sql import functions as F

    df = spark.read.format("fits").option("hdu", 1).load(d)
    df.count()  # warm-up
    t0 = time.perf_counter()
    got = df.agg(
        F.sum(F.aggregate("Image", F.lit(0).cast("long"),
                          lambda a, x: a + x)).alias("s"),
        F.count("*")).collect()[0]
    sec = time.perf_counter() - t0
    assert got[1] == n_files * rows, got
    try:
        for f in os.listdir(d):
            os.remove(os.path.join(d, f))
        os.rmdir(d)
    except OSError:
        pass
    return sec, logical_mb


def fits_scan_comptable_seconds(spark) -> tuple[float, float, float]:
    """(seconds, logical MB, compressed/logical ratio) for a scan+agg
    of the SAME 64 MB bintable payload as fits_scan_64mb, written as a
    tiled-compressed table (fpack table convention, GZIP_2 per column,
    r5) — the compressed-catalog scan path, directly comparable to the
    uncompressed row."""
    import numpy as np

    from spark_fits_spark.fitscore import writer

    d = tempfile.mkdtemp(prefix="fitsbench_ctab")
    path = os.path.join(d, "bench.fits")
    n = 2_000_000
    rng = np.random.RandomState(0)
    cols = [
        ("target", "10A", np.array([f"OBJ{i:07d}" for i in range(n)])),
        ("RA", "E", rng.uniform(0, 6.28, n).astype(">f4")),
        ("Dec", "D", rng.uniform(-1.57, 1.57, n)),
        ("Index", "K", np.arange(n, dtype=">i8")),
        ("RunId", "I", np.ones(n, dtype=">i2")),
    ]
    logical_mb = n * 32 / 1e6
    writer.write_fits(path, [writer.compressed_bintable_hdu(
        cols, tile_rows=50_000, ctypes="GZIP_2")])
    ratio = os.path.getsize(path) / (n * 32)
    from pyspark.sql import functions as F

    df = (spark.read.format("fits").option("hdu", 1)
          .option("partitionbytes", 8 * 1024 * 1024).load(path))
    df.count()  # warm-up
    t0 = time.perf_counter()
    got = df.agg(F.sum("Index"), F.count("*")).collect()[0]
    sec = time.perf_counter() - t0
    assert got[1] == n and got[0] == n * (n - 1) // 2, got
    try:
        os.remove(path)
        os.rmdir(d)
    except OSError:
        pass
    return sec, logical_mb, round(ratio, 3)


def fits_scan_rice_seconds(spark) -> tuple[float, float]:
    """(seconds, logical MB) for a full scan+agg of a RICE_1
    tile-compressed image — fpack's DEFAULT codec for integer images,
    so a real compressed archive is mostly this path (r4 VERDICT #3).
    Same shape as the GZIP_2 row (16 files × 32 row-tiles, ~64 MB
    logical int32) so the two logical-MB/s numbers compare directly;
    the pixel data is a smooth ramp + texture, the fs-coded case a sky
    image mostly hits."""
    import numpy as np

    from spark_fits_spark.fitscore import writer

    d = tempfile.mkdtemp(prefix="fitsbench_rice")
    n_files, rows, width = 16, 512, 2048  # 16 x 4 MB logical
    for fi in range(n_files):
        base = np.arange(rows * width, dtype=np.int64) + fi
        img = ((base % 1000) + (base // width)).astype("i4").reshape(rows, width)
        writer.write_fits(
            os.path.join(d, f"part{fi:03d}.fits"),
            [writer.compressed_image_hdu(img, "RICE_1", tile_rows=16)])
    logical_mb = n_files * rows * width * 4 / 1e6
    from pyspark.sql import functions as F

    df = spark.read.format("fits").option("hdu", 1).load(d)
    df.count()  # warm-up
    t0 = time.perf_counter()
    got = df.agg(
        F.sum(F.aggregate("Image", F.lit(0).cast("long"),
                          lambda a, x: a + x)).alias("s"),
        F.count("*")).collect()[0]
    sec = time.perf_counter() - t0
    assert got[1] == n_files * rows, got
    try:
        for f in os.listdir(d):
            os.remove(os.path.join(d, f))
        os.rmdir(d)
    except OSError:
        pass
    return sec, logical_mb


def fits_scan_multifile_seconds(spark) -> tuple[float, float]:
    """(seconds, MB) for the same ~64 MB bintable payload split across
    32 separate FITS files (32 scan partitions): pins multi-file
    planning cost — the driver-side header walk (thread-pooled in
    plan_for_files) plus 32-task scheduling — against the single-file
    number. Python-datasource planning re-runs per action, so the timed
    agg carries the full planning + scheduling path, not just decode."""
    import numpy as np

    from spark_fits_spark.fitscore import writer

    d = tempfile.mkdtemp(prefix="fitsbench_multi")
    n_files, rows = 32, 62_500  # 32 x 2 MB = the single-file 64 MB
    rng = np.random.RandomState(0)
    for fi in range(n_files):
        base = fi * rows
        cols = [
            ("target", "10A",
             np.array([f"OBJ{base + i:07d}" for i in range(rows)])),
            ("RA", "E", rng.uniform(0, 6.28, rows).astype(">f4")),
            ("Dec", "D", rng.uniform(-1.57, 1.57, rows)),
            ("Index", "K", np.arange(base, base + rows, dtype=">i8")),
            ("RunId", "I", np.ones(rows, dtype=">i2")),
        ]
        writer.write_fits(
            os.path.join(d, f"part{fi:03d}.fits"),
            [writer.bintable_hdu(cols)])
    mb = sum(os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)) / 1e6
    from pyspark.sql import functions as F

    df = spark.read.format("fits").option("hdu", 1).load(d)
    df.count()  # warm-up: python workers + schema inference
    t0 = time.perf_counter()
    got = df.agg(F.sum("Index"), F.count("*")).collect()[0]
    sec = time.perf_counter() - t0
    total = n_files * rows
    assert got[1] == total and got[0] == total * (total - 1) // 2, got
    try:
        for f in os.listdir(d):
            os.remove(os.path.join(d, f))
        os.rmdir(d)
    except OSError:
        pass
    return sec, mb


def fits_plan_manyfile_seconds() -> tuple[float, float, float, int]:
    """Driver-side planning cost over 2048 part files (r3 VERDICT #7 —
    the 100x scale-up knob that bites first on real catalogs: planning
    happens per action, and a 100 TB table is thousands of part files).
    Spark-free: times plan_for_files (thread-pooled header walk +
    row-aligned partition generation) directly; file generation is
    untimed. Third number: cold planning FROM THE MANIFEST
    (_fits_manifest.json, r5) — one metadata read + a stat per file
    instead of a header read per file."""
    import numpy as np

    from spark_fits_spark.fitscore import writer as fw
    from spark_fits_spark.fitscore.vfs import LOCAL
    from spark_fits_spark.sources.fits_datasource import FitsScanReader
    from spark_fits_spark.sources.fits_writer import (
        build_manifest_entry, write_manifest,
    )

    d = tempfile.mkdtemp(prefix="fitsbench_plan")
    n_files, rows = 2048, 50
    cols = [("Index", "K", np.arange(rows, dtype=">i8")),
            ("RA", "E", np.zeros(rows, dtype=">f4"))]
    hdu = fw.bintable_hdu(cols)
    for i in range(n_files):
        fw.write_fits(os.path.join(d, f"f{i:04d}.fits"), [hdu])
    files = sorted(os.path.join(d, f) for f in os.listdir(d)
                   if f.endswith(".fits"))
    from spark_fits_spark.sources.fits_datasource import _HDU_CACHE

    r = FitsScanReader(d, 1, None, None, None, "PERMISSIVE",
                       8 * 1024 * 1024, False, use_manifest=False)
    _HDU_CACHE.clear()
    t0 = time.perf_counter()
    parts = r.plan_for_files(files)
    cold = time.perf_counter() - t0
    assert len(parts) == n_files
    # warm re-plan: the (path, hdu, size, mtime) header LRU turns the
    # per-action replanning of the Python DS API into stats
    warm = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        parts = r.plan_for_files(files)
        warm = min(warm, time.perf_counter() - t0)
        assert len(parts) == n_files
    # manifest path: entry build is untimed (the sink does it at write)
    entry = build_manifest_entry(LOCAL, files[0])
    write_manifest(LOCAL, d, {os.path.basename(f): entry for f in files})
    rm = FitsScanReader(d, 1, None, None, None, "PERMISSIVE",
                        8 * 1024 * 1024, False)
    _HDU_CACHE.clear()
    t0 = time.perf_counter()
    parts = rm.plan_for_files(files)
    mani = time.perf_counter() - t0
    assert len(parts) == n_files
    try:
        for f in os.listdir(d):
            os.remove(os.path.join(d, f))
        os.rmdir(d)
    except OSError:
        pass
    return cold, warm, mani, n_files


def main() -> None:
    from spark_fits_spark.plans import build_session
    from spark_fits_spark.suite import QUERIES

    unknown = [n for n in BENCH_QUERIES if n not in QUERIES]
    assert not unknown, f"BENCH_QUERIES names not in the suite: {unknown}"
    extra_queries = extra_query_names(QUERIES)

    # The suite accumulates ~100 queries' worth of broadcast variables
    # (Bloom filters, PQ codebooks, LSH band tables) whose JVM blocks
    # are only reclaimed when the ContextCleaner's weak refs are GC'd.
    # At the session default (16g) the late-suite queries measured GC
    # thrash, not code (q102 grew 4.5->8.4 s across its own reps while
    # a fresh session runs it at 1.0 s steady) — give the bench JVM
    # headroom on the 128 GiB host unless the caller pinned a size.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    spark = build_session(app_name="spark-fits-spark-bench",
                          shuffle_partitions=CPUS * 2)
    spark.sparkContext.setLogLevel("ERROR")

    # warm up the JVM/python-worker pool and the parquet reader path
    # outside timing (codegen + reader init otherwise lands on the
    # first timed query)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1000).count()
    # the pandas-UDF machinery (Arrow eval classes + one python worker
    # per core) is a one-time ~6s cost otherwise charged entirely to
    # the first applyInPandas query in the list; warm it for the whole
    # worker pool with a spread of trivial groups
    from pyspark.sql import functions as F

    (spark.range(CPUS * 100)
     .withColumn("g", F.pmod("id", F.lit(CPUS)))
     .groupBy("g")
     .applyInPandas(lambda k, p: p, "id long, g long")
     .write.format("noop").mode("overwrite").save())

    # codegen warm-up: run every benched query once at the smallest SF.
    # Whole-stage-codegen compiles once per unique generated class and
    # is data-independent, so this removes the one-shot compile cost
    # (measured ~5 s of q22's first run, ~1-2 s for other multi-stage
    # queries) from the timed sf0.1 runs while leaving their DATA path
    # cold (clearCache drops every cached block between runs). This is
    # standard JIT-warm benchmarking — the 100 TB number a plan audit
    # cares about amortizes compile to zero anyway.
    warm_sf = "/root/testdata/sf0.001"
    warmed = (os.path.isdir(warm_sf)
              and os.path.abspath(warm_sf) != os.path.abspath(SF_DIR))
    if warmed:
        for name in BENCH_QUERIES + extra_queries:
            try:
                _noop_consume(QUERIES[name](spark, warm_sf))
            except Exception:
                pass  # warm-up must never fail the bench
            spark.catalog.clearCache()

    # per-query REPS back-to-back runs (r3 VERDICT #3): one run is
    # hostage to the burstable host AND to materialization-order races
    # around operator-internal persists (q22's band table). Reps share
    # the query's own caches — rep 1 pays population, reps 2+ are the
    # steady state a pipeline that follows the documented persist
    # discipline actually sees. Headline per-query number = MIN of
    # reps, the standard noise-robust estimator for deterministic code
    # (timeit convention): measured host-credit swings reach 6x WITHIN
    # one query's reps ([10.4, 11.0, 1.8] on q23), so even the median
    # can land on a throttled window; the min is the closest observable
    # to the code's cost. Medians and raw reps are emitted alongside so
    # nothing is hidden. clearCache between queries so a long suite
    # doesn't accumulate MEMORY_AND_DISK blocks.
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    rep_seconds: dict[str, list[float]] = {}
    for q_idx, name in enumerate(BENCH_QUERIES):
        fn = QUERIES[name]
        reps = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            _noop_consume(fn(spark, SF_DIR))
            reps.append(round(time.perf_counter() - t0, 3))
        timings[name] = min(reps)
        # true median (ADVICE r10: the upper-middle element was
        # reported for even rep counts, overstating 2-rep rows)
        medians[name] = round(statistics.median(reps), 3)
        rep_seconds[name] = reps
        spark.catalog.clearCache()
        # Drop the Python-side plan handles and force one JVM GC every
        # few queries: the ContextCleaner only reclaims dead broadcast
        # blocks when their weak refs are collected, and without an
        # explicit nudge a 100-query suite runs its tail under heap
        # pressure that belongs to queries long finished (outside
        # timing: this runs after the reps are recorded).
        if (q_idx + 1) % 8 == 0:
            import gc as _gc

            _gc.collect()
            spark.sparkContext._jvm.System.gc()

    # full-coverage detail pass over the out-of-subset queries (r6
    # VERDICT #3). Same discipline as the main loop — min of reps,
    # clearCache between queries, periodic GC nudge — but the numbers
    # land only in the detail artifact, never in totals/headline.
    extra_timings: dict[str, float] = {}
    extra_medians: dict[str, float] = {}
    extra_rep_seconds: dict[str, list[float]] = {}
    for q_idx, name in enumerate(extra_queries):
        fn = QUERIES[name]
        reps = []
        for _ in range(EXTRA_REPS):
            t0 = time.perf_counter()
            _noop_consume(fn(spark, SF_DIR))
            reps.append(round(time.perf_counter() - t0, 3))
        extra_timings[name] = min(reps)
        extra_medians[name] = round(statistics.median(reps), 3)
        extra_rep_seconds[name] = reps
        spark.catalog.clearCache()
        if (q_idx + 1) % 8 == 0:
            import gc as _gc

            _gc.collect()
            spark.sparkContext._jvm.System.gc()

    # Scan micros run TWICE in mirrored order, keeping each micro's
    # best pass (r10): the micros execute at the END of a long run,
    # where this host's progressive credit drain is steepest, and a
    # single sequential pass biases the RATIO set — plain (measured
    # first) samples a healthier epoch than rice (measured later),
    # which is exactly how the r9 "quiet 0.519" and the r10 attempt-2
    # 0.485 rice/plain readings were manufactured while an
    # interleaved ABBA micro of the same build read 0.664-0.711. The
    # mirrored second pass samples both sides of the drain; max-MB/s
    # (min-seconds) per micro is the same estimator the per-query
    # reps already use.
    fits_sec, fits_mb, decode_rate = fits_scan_seconds(spark)
    multi_sec, multi_mb = fits_scan_multifile_seconds(spark)
    comp_sec, comp_mb = fits_scan_compressed_seconds(spark)
    rice_sec, rice_mb = fits_scan_rice_seconds(spark)
    ctab_sec, ctab_mb, ctab_ratio = fits_scan_comptable_seconds(spark)
    ctab_sec2, _, ctab_ratio2 = fits_scan_comptable_seconds(spark)
    if ctab_sec2 < ctab_sec:
        ctab_sec, ctab_ratio = ctab_sec2, ctab_ratio2
    rice_sec = min(rice_sec, fits_scan_rice_seconds(spark)[0])
    comp_sec = min(comp_sec, fits_scan_compressed_seconds(spark)[0])
    multi_sec = min(multi_sec, fits_scan_multifile_seconds(spark)[0])
    fits_sec2, _, decode_rate2 = fits_scan_seconds(spark)
    if fits_sec2 < fits_sec:
        fits_sec = fits_sec2
    decode_rate = max(decode_rate, decode_rate2)
    timings["fits_scan_64mb"] = round(fits_sec, 3)
    timings["fits_scan_multifile"] = round(multi_sec, 3)
    timings["fits_scan_compressed"] = round(comp_sec, 3)
    timings["fits_scan_rice"] = round(rice_sec, 3)
    timings["fits_scan_comptable"] = round(ctab_sec, 3)
    plan_sec, plan_warm_sec, plan_mani_sec, plan_files = (
        fits_plan_manyfile_seconds())
    timings["fits_plan_2048files"] = round(plan_sec, 3)
    timings["fits_plan_2048files_cached"] = round(plan_warm_sec, 3)
    timings["fits_plan_2048files_manifest"] = round(plan_mani_sec, 3)

    total = round(sum(timings.values()), 3)
    # the round-1 headline set, for apples-to-apples round-over-round
    # totals after queries were appended to BENCH_QUERIES in round 2
    core = round(sum(v for k, v in timings.items()
                     if not k.startswith(("q54", "q56", "q57", "q58", "q59",
                                          "q64", "q65", "q66", "q67",
                                          "q68", "q69", "q70", "q71",
                                          "q72", "q73", "q75", "q76",
                                          "q77", "q78", "q79",
                                          "q82", "q83", "q84", "q85",
                                          "q86", "q87", "q88",
                                          "q89", "q90", "q91", "q92",
                                          "q46", "q93", "q94",
                                          "q95", "q96", "q97", "q98",
                                          "q99", "q100", "q101", "q102",
                                          "q103", "q105", "q106",
                                          "q109", "q110", "q111",
                                          "q112", "q113", "q114",
                                          "q115", "q116", "q117",
                                          "q118", "q119", "q120",
                                          "q121", "q122", "q123",
                                          "q124", "q125", "q126",
                                          "q127", "q128", "q129", "q130",
                                          "q131", "q132", "q133", "q134",
                                          "q135", "q136", "q137", "q138",
                                          "q139", "q140", "q141", "q142",
                                          "q143", "q144", "q145", "q146",
                                          "q147", "q148", "q149", "q150",
                                          "q151", "q152", "q153", "q154",
                                          "q155", "q156",
                                          "fits_scan_multifile",
                                          "fits_scan_compressed",
                                          "fits_scan_rice",
                                          "fits_scan_comptable",
                                          "fits_plan"))), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    metrics = {
        "fits_scan_mb_per_s": round(fits_mb / fits_sec, 1),
        # same payload over 32 files / 32 scan partitions: multi-file
        # planning (thread-pooled driver header walk) + scheduling cost
        "fits_scan_multifile_mb_per_s": round(multi_mb / multi_sec, 1),
        # GZIP_2 / RICE_1 tile-compressed image scans, in LOGICAL
        # (decompressed) MB/s: per-tile heap windows + codec inflate +
        # pixel-sum agg. RICE is fpack's default int codec (r4 VERDICT
        # #3: measure it, not just GZIP).
        "fits_scan_compressed_mb_per_s": round(comp_mb / comp_sec, 1),
        "fits_scan_rice_mb_per_s": round(rice_mb / rice_sec, 1),
        # tiled-compressed TABLE scan (r5): same 64 MB logical payload
        # as fits_scan_64mb, column-wise GZIP_2 cells
        "fits_scan_comptable_mb_per_s": round(ctab_mb / ctab_sec, 1),
        "fits_comptable_ratio": ctab_ratio,
        # single-thread pure decode (no Spark overhead): the honest
        # per-task comparison against the reference's ~16 MB/s/task.
        # At 68 MB the distributed scan wall is dominated by fixed
        # job/scheduling cost (~0.3 s), not decode.
        "decode_mb_per_s_per_task": decode_rate,
        # driver planning throughput over 2048 part files: cold = pooled
        # header walk; cached = stat-validated header LRU re-plan (what
        # the 2nd..Nth action over an unchanged catalog pays); manifest
        # = cold plan from _fits_manifest.json (r5 — one metadata read
        # + a stat per file, no header reads)
        "fits_plan_files_per_s": round(plan_files / plan_sec, 1),
        "fits_plan_cached_files_per_s": round(plan_files / plan_warm_sec, 1),
        "fits_plan_manifest_files_per_s": round(
            plan_files / plan_mani_sec, 1),
        # host-condition telemetry: the benchmark box is burstable —
        # effective parallelism has been observed anywhere from ~4 to 32
        # cores with zero code change; this contextualizes run-to-run
        # variance (1.0 = all CPUS really available)
        "parallel_efficiency": _parallel_efficiency(),
    }
    # the frozen throttle-robust ratio set + the run's own host-gate
    # verdict (r9 VERDICT #3) — recorded in every artifact, throttled
    # or not; see compute_ratios
    metrics.update(compute_ratios(timings, extra_timings, metrics, core))
    # Full-detail record (long query names, medians, raw per-rep
    # timings): printed FIRST and also written to BENCH_DETAIL.json so
    # the distribution stays inspectable. The harness that captures
    # this process's stdout keeps only a bounded tail (r4 AND r5
    # post-mortems: any per-query content that grows with the suite
    # eventually pushes the last line past the capture window), so the
    # machine-read line printed LAST is count-invariant: totals +
    # micro-metrics + the frozen HEADLINE_QUERIES subset only (see
    # build_headline).
    detail = {
        "metric": "suite_total_seconds",
        "value": total,
        "core_total_seconds_r1set": core,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "cpus": CPUS,
        # methodology flags (r3 ADVICE): warmed = codegen warm-up pass
        # ran at sf0.001 (since r3; r1/r2 rows include one-shot compile
        # cost). Since r4 each query runs REPS times with warm
        # intra-query caches: "queries" = per-query MIN (see the loop
        # comment: host-credit swings reach 6x within one query's reps,
        # so min is the closest observable to the code's cost),
        # "queries_median" and "rep_seconds" keep the distribution
        # honest. r1-r3 rows were single cold runs.
        "warmed": warmed,
        "reps": REPS,
        "queries_median": medians,
        "rep_seconds": rep_seconds,
        # full coverage (r6 VERDICT #3): every registered query outside
        # BENCH_QUERIES, timed at EXTRA_REPS reps — detail-only, not in
        # "value"/"core" totals (round-over-round comparability) nor
        # the frozen final line (count-invariance contract)
        "extra_reps": EXTRA_REPS,
        "queries_extra": extra_timings,
        "queries_extra_median": extra_medians,
        "rep_seconds_extra": extra_rep_seconds,
        **metrics,
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json")
    try:
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1)
    except OSError:
        pass  # read-only checkout: the stdout detail line still has it
    print(json.dumps(detail))
    sys.stdout.flush()
    # Headline line (LAST, machine-read): COUNT-INVARIANT — see the
    # module-docstring contract and build_headline's length assert.
    print(build_headline(total, core, float(sf), warmed, timings,
                         metrics))
    spark.stop()


def _burn(_):
    s = 0
    for i in range(2_000_000):
        s += i * i
    return s


def _parallel_efficiency() -> float:
    """Measured speedup of CPUS concurrent CPU-bound tasks vs one task,
    normalized by CPUS (1.0 = linear scaling, i.e. the advertised cores
    are truly available)."""
    from concurrent.futures import ProcessPoolExecutor

    t0 = time.perf_counter(); _burn(0); one = time.perf_counter() - t0
    with ProcessPoolExecutor(CPUS) as ex:
        t0 = time.perf_counter()
        list(ex.map(_burn, range(CPUS)))
        par = time.perf_counter() - t0
    return round(one / par, 3) if par > 0 else 1.0


if __name__ == "__main__":
    main()
