"""Pins the bench-artifact contract (r5 VERDICT #1): the FINAL stdout
line bench.py prints must be count-invariant in the size of
BENCH_QUERIES — r4 and r5 both shipped unparseable BENCH_rN.json
because per-query content on the last line grew with the suite and
blew past the harness's ~2,000-char stdout tail capture. Spark-free:
exercises build_headline directly."""

import json

import pytest

import bench


def _fake_metrics():
    # mirror of main()'s metrics dict: fixed key set, worst-case-ish
    # float widths
    return {
        "fits_scan_mb_per_s": 1234.5,
        "fits_scan_multifile_mb_per_s": 1234.5,
        "fits_scan_compressed_mb_per_s": 1234.5,
        "fits_scan_rice_mb_per_s": 1234.5,
        "fits_scan_comptable_mb_per_s": 1234.5,
        "fits_comptable_ratio": 0.389,
        "decode_mb_per_s_per_task": 1137.4,
        "fits_plan_files_per_s": 8540.3,
        "fits_plan_cached_files_per_s": 8540.3,
        "fits_plan_manifest_files_per_s": 8540.3,
        "parallel_efficiency": 0.217,
        # frozen ratio set (r9 VERDICT #3) — merged into metrics by
        # main() before build_headline, worst-case-ish widths
        "ratio_rice_plain": 0.545,
        "ratio_compressed_plain": 0.707,
        "ratio_comptable_plain": 0.88,
        "ratio_q22_core": 0.3,
        "delta_q51_q48_sec": -12.345,
        "host_gate_ok": False,
    }


def _fake_timings(n_queries):
    t = {f"q{i:03d}_some_generated_query_name_{i}": 123.456
         for i in range(1, n_queries + 1)}
    # the frozen flagship rows + fixed micro rows, as in a real run
    for k in bench.HEADLINE_QUERIES:
        t[k] = 12.345
    for k in ("fits_scan_64mb", "fits_scan_multifile",
              "fits_scan_compressed", "fits_scan_rice",
              "fits_scan_comptable", "fits_plan_2048files",
              "fits_plan_2048files_cached",
              "fits_plan_2048files_manifest"):
        t[k] = 1.234
    return t


@pytest.mark.parametrize("n_queries", [10, 154, 1000])
def test_headline_is_count_invariant(n_queries):
    line = bench.build_headline(
        total=12345.678, core=999.999, sf=0.1, warmed=True,
        timings=_fake_timings(n_queries), metrics=_fake_metrics())
    assert len(line) <= bench.HEADLINE_MAX_CHARS
    parsed = json.loads(line)
    assert parsed["metric"] == "suite_total_seconds"
    assert parsed["unit"] == "sec"
    assert parsed["n_queries_benched"] >= n_queries
    # per-query content is exactly the frozen subset (short keys) —
    # never the full suite
    expected = {k.split("_", 1)[0] for k in bench.HEADLINE_QUERIES}
    qkeys = {k for k in parsed["queries"] if k.startswith("q")}
    assert qkeys == expected


def test_headline_lengths_identical_across_growth():
    """The invariance itself: +990 queries must not change the line
    length at all (modulo the n_queries_benched counter width)."""
    small = bench.build_headline(1.0, 1.0, 0.1, True,
                                 _fake_timings(10), _fake_metrics())
    big = bench.build_headline(1.0, 1.0, 0.1, True,
                               _fake_timings(1000), _fake_metrics())
    assert abs(len(big) - len(small)) <= 2  # counter digits only


def test_headline_queries_frozen():
    """HEADLINE_QUERIES is a contract: it must stay exactly this set
    (append-freeze). If you are editing this test to add a name, you
    are repeating the r4/r5 artifact bug — put it in BENCH_DETAIL.json
    coverage instead."""
    assert bench.HEADLINE_QUERIES == [
        "q01_pricing_summary", "q08_window_running", "q35_asof_join",
        "q22_dedup_minhash_lsh", "q57_line_dedup",
        "q79_exact_substring_dedup", "q102_zone_crossmatch",
        "q111_source_detection", "q112_healpix_skymap",
        "q152_xi_jackknife",
    ]
    assert set(bench.HEADLINE_QUERIES) <= set(bench.BENCH_QUERIES)


def test_headline_overflow_fails_loudly():
    """A future edit that reattaches growing content must die loudly,
    not ship truncated — and as ValueError, not assert, so the
    contract survives `python -O` (r6 ADVICE: the r4/r5 truncated
    artifacts are exactly what an optimized-out assert would re-allow)."""
    huge = _fake_metrics()
    huge["padding"] = "x" * 2000
    with pytest.raises(ValueError, match="count-invariant"):
        bench.build_headline(1.0, 1.0, 0.1, True, _fake_timings(10),
                             huge)


def test_every_registered_query_is_timed_somewhere():
    """r6 VERDICT #3 (the 42-query perf blind spot): BENCH_QUERIES plus
    bench.extra_query_names() must partition the live registry exactly
    — every query gets a timing in BENCH_DETAIL.json ("queries" at REPS
    reps, or "queries_extra" at EXTRA_REPS), none twice, none dropped."""
    from spark_fits_spark.suite import QUERIES

    extra = bench.extra_query_names(QUERIES)
    assert set(bench.BENCH_QUERIES) <= set(QUERIES)
    assert set(bench.BENCH_QUERIES).isdisjoint(extra)
    assert set(bench.BENCH_QUERIES) | set(extra) == set(QUERIES)
    assert bench.EXTRA_REPS >= 1


def test_headline_key_collision_fails_loudly(monkeypatch):
    """Two HEADLINE entries sharing a short qNN prefix must raise
    ValueError (assert-free for the same -O reason as the length
    budget). Only a future edit to the frozen list can create this, so
    the test plants one via monkeypatch."""
    name = bench.HEADLINE_QUERIES[0]
    twin = name.split("_", 1)[0] + "_shadow_copy"
    monkeypatch.setattr(bench, "HEADLINE_QUERIES",
                        list(bench.HEADLINE_QUERIES) + [twin])
    t = _fake_timings(10)
    t[twin] = 1.0
    with pytest.raises(ValueError, match="collision"):
        bench.build_headline(1.0, 1.0, 0.1, True, t, _fake_metrics())


def test_ratio_set_is_frozen_and_schema_stable():
    """r9 VERDICT #3: the throttle-robust ratio set is a contract —
    fixed keys in every artifact, None (never a dropped key) when an
    input is missing, and a self-reported host-gate verdict computed
    from the documented thresholds."""
    timings = {"q22_dedup_minhash_lsh": 4.4, "fits_scan_64mb": 0.4}
    extras = {"q48_dedup_clusters": 5.3, "q51_dedup_corpus": 5.8}
    metrics = {
        "fits_scan_mb_per_s": 176.3,
        "fits_scan_rice_mb_per_s": 96.1,
        "fits_scan_compressed_mb_per_s": 124.7,
        "fits_scan_comptable_mb_per_s": 155.2,
        "decode_mb_per_s_per_task": 1137.4,
        "parallel_efficiency": 0.41,
    }
    r = bench.compute_ratios(timings, extras, metrics, core=14.6)
    assert set(r) == {
        "ratio_rice_plain", "ratio_compressed_plain",
        "ratio_comptable_plain", "ratio_q22_core",
        "delta_q51_q48_sec", "host_gate_ok",
    }
    assert r["ratio_rice_plain"] == round(96.1 / 176.3, 3)
    assert r["ratio_q22_core"] == round(4.4 / 14.6, 3)
    assert r["delta_q51_q48_sec"] == 0.5
    assert r["host_gate_ok"] is True

    # gate fails on either threshold alone
    lo = dict(metrics, parallel_efficiency=0.299)
    assert bench.compute_ratios(timings, extras, lo, 14.6)[
        "host_gate_ok"] is False
    lo = dict(metrics, decode_mb_per_s_per_task=900.0)
    assert bench.compute_ratios(timings, extras, lo, 14.6)[
        "host_gate_ok"] is False

    # missing inputs -> None, keys never dropped
    r = bench.compute_ratios({}, {}, {}, core=0.0)
    assert r["ratio_rice_plain"] is None
    assert r["ratio_q22_core"] is None
    assert r["delta_q51_q48_sec"] is None
    assert r["host_gate_ok"] is False


def test_ratios_reach_the_headline_line():
    """The ratio set must survive onto the count-invariant final line
    (it is the only round-over-round comparable signal on a throttled
    run), within the length budget."""
    line = bench.build_headline(1.0, 1.0, 0.1, True,
                                _fake_timings(1000), _fake_metrics())
    d = json.loads(line)
    for k in ("ratio_rice_plain", "ratio_compressed_plain",
              "ratio_comptable_plain", "ratio_q22_core",
              "delta_q51_q48_sec", "host_gate_ok"):
        assert k in d
    assert len(line) <= bench.HEADLINE_MAX_CHARS
