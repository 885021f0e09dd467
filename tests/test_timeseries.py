"""Time-domain operators (`operators/timeseries.py`): the one-pass
Lomb–Scargle must equal the textbook two-pass formula exactly, find a
planted frequency, and phase folding must reveal structure only at the
true period."""

import numpy as np

from spark_fits_spark.operators.timeseries import lomb_scargle, phase_fold


def _ls_ref(t, y, f):
    w = 2 * np.pi * f
    dy = y - y.mean()
    var = y.var()
    tau = np.arctan2(np.sum(np.sin(2 * w * t)),
                     np.sum(np.cos(2 * w * t))) / (2 * w)
    c = np.cos(w * (t - tau))
    s = np.sin(w * (t - tau))
    return ((dy @ c) ** 2 / (c @ c) + (dy @ s) ** 2 / (s @ s)) / (2 * var)


def test_lomb_scargle_matches_two_pass_reference(spark):
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 100, 400))
    f_true = 0.213
    y = 3.0 + 1.5 * np.sin(2 * np.pi * f_true * t + 0.7) \
        + rng.normal(0, 0.3, 400)
    freqs = [0.05, 0.1, 0.213, 0.3, 0.4]
    df = spark.createDataFrame(
        [(1, float(a), float(b)) for a, b in zip(t, y)],
        "oid long, t double, y double")
    out = {r["freq"]: r["power"]
           for r in lomb_scargle(df, "t", "y", "oid", freqs).collect()}
    for f in freqs:
        ref = _ls_ref(t, y, f)
        assert abs(out[f] - ref) < 1e-8 * max(1.0, ref), (f, out[f], ref)
    # the planted frequency dominates by >25x
    assert out[f_true] > 50
    assert all(out[f] < 5 for f in freqs if f != f_true)


def test_lomb_scargle_degenerate_series(spark):
    # constant series (zero variance) and a singleton: NULL power
    df = spark.createDataFrame(
        [(1, float(i), 5.0) for i in range(10)] + [(2, 0.0, 1.0)],
        "oid long, t double, y double")
    rows = lomb_scargle(df, "t", "y", "oid", [0.1]).collect()
    assert {r["object_id"]: r["power"] for r in rows} == {1: None, 2: None}


def test_phase_fold(spark):
    rng = np.random.default_rng(1)
    t = np.sort(rng.uniform(0, 100, 600))
    period = 4.7
    y = 2.0 * np.sin(2 * np.pi * t / period)
    df = spark.createDataFrame(
        [(1, float(a), float(b)) for a, b in zip(t, y)],
        "oid long, t double, y double")
    right = phase_fold(df, "t", "y", "oid", period=period,
                       n_bins=8).collect()
    wrong = phase_fold(df, "t", "y", "oid", period=3.33,
                       n_bins=8).collect()

    def spread(rows):
        m = [r["mean_y"] for r in rows]
        return max(m) - min(m)

    assert all(0 <= r["phase_bin"] < 8 for r in right)
    assert sum(r["n_obs"] for r in right) == 600
    assert spread(right) > 3.0          # coherent fold ≈ full amplitude
    assert spread(wrong) < 1.0          # incoherent fold averages out
