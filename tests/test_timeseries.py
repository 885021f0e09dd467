"""Time-domain operators (`operators/timeseries.py`): the one-pass
Lomb–Scargle must equal the textbook two-pass formula exactly, find a
planted frequency, and phase folding must reveal structure only at the
true period."""

import numpy as np

from spark_fits_spark.operators.timeseries import (lomb_scargle, phase_fold,
                                                   variability_features)


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


def _vf_ref(t, y):
    """Direct numpy computation of every feature for one series."""
    order = np.argsort(t, kind="stable")
    ys = y[order]
    n = len(ys)
    sig = ys.std(ddof=1)
    d = np.diff(ys)
    eta = (d * d).sum() / ((n - 1) * sig * sig)
    dy = np.sqrt(n / (n - 1)) * (ys - ys.mean()) / sig
    p = dy[:-1] * dy[1:]
    j = (np.sign(p) * np.sqrt(np.abs(p))).sum() / (n - 1)
    return {"n_obs": n, "mean_y": ys.mean(), "sigma_y": sig,
            "amplitude": (ys.max() - ys.min()) / 2, "eta": eta,
            "stetson_j": j}


def test_variability_features_matches_numpy(spark):
    rng = np.random.default_rng(7)
    series = {
        1: (np.sort(rng.uniform(0, 50, 200)), None),   # smooth sinusoid
        2: (np.sort(rng.uniform(0, 50, 150)), None),   # white noise
    }
    t1 = series[1][0]
    y1 = 4.0 + 2.0 * np.sin(2 * np.pi * t1 / 7.0)
    y2 = rng.normal(0, 1, 150)
    rows = ([(1, float(a), float(b)) for a, b in zip(t1, y1)]
            + [(2, float(a), float(b)) for a, b in zip(series[2][0], y2)])
    df = spark.createDataFrame(rows, "oid long, t double, y double")
    out = {r["object_id"]: r
           for r in variability_features(df, "t", "y", "oid").collect()}
    for oid, (t, y) in ((1, (t1, y1)), (2, (series[2][0], y2))):
        ref = _vf_ref(t, y)
        for k, v in ref.items():
            got = out[oid][k]
            assert abs(got - v) < 1e-9 * max(1.0, abs(v)), (oid, k, got, v)
    # discrimination: the smooth curve is sub-Poisson and correlated,
    # the noise is not
    assert out[1]["eta"] < 0.5 and out[1]["stetson_j"] > 0.5
    assert 1.5 < out[2]["eta"] < 2.5 and abs(out[2]["stetson_j"]) < 0.3


def test_variability_features_degenerate(spark):
    # constant series and singleton: NULL eta / stetson_j, rest defined
    df = spark.createDataFrame(
        [(1, float(i), 5.0) for i in range(10)] + [(2, 0.0, 1.0)],
        "oid long, t double, y double")
    out = {r["object_id"]: r
           for r in variability_features(df, "t", "y", "oid").collect()}
    assert out[1]["eta"] is None and out[1]["stetson_j"] is None
    assert out[1]["amplitude"] == 0.0 and out[1]["mean_y"] == 5.0
    assert out[2]["eta"] is None and out[2]["n_obs"] == 1


def test_variability_features_single_exchange(spark):
    """The lag window and the closing groupBy share the object-key
    partitioning: exactly ONE Exchange in the plan."""
    df = spark.createDataFrame(
        [(1, 0.0, 1.0), (1, 1.0, 2.0)], "oid long, t double, y double")
    plan = variability_features(df, "t", "y", "oid")._jdf \
        .queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


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


def test_periodogram_peaks(spark):
    import math

    from spark_fits_spark.operators.timeseries import periodogram_peaks

    rng = np.random.default_rng(5)
    t = np.sort(rng.uniform(0, 100, 300))
    y = 2.0 * np.sin(2 * np.pi * 0.3 * t) + rng.normal(0, 0.2, 300)
    freqs = [0.1, 0.2, 0.3, 0.4]
    df = spark.createDataFrame(
        [(1, float(a), float(b)) for a, b in zip(t, y)]
        + [(2, float(i), 7.0) for i in range(10)],   # constant: NULLs
        "oid long, t double, y double")
    pg = lomb_scargle(df, "t", "y", "oid", freqs)
    got = periodogram_peaks(pg, n_trials=len(freqs)).collect()
    assert len(got) == 1                    # degenerate object drops
    r = got[0]
    assert r["object_id"] == 1 and r["best_freq"] == 0.3
    # planted signal: huge power -> FAP numerically 0
    assert r["power"] > 50 and r["fap"] < 1e-12
    want = 1.0 - (1.0 - math.exp(-r["power"])) ** 4
    assert abs(r["fap"] - want) < 1e-15

    import pytest as _pt
    with _pt.raises(ValueError, match="n_trials"):
        periodogram_peaks(pg, n_trials=0)


def test_structure_function(spark):
    """SF == brute force over all same-object ordered pairs with
    0 < lag < max_lag (cell-edge pairs included exactly once, equal
    timestamps excluded), per-bin mean of squared diffs; a pure
    sinusoid's SF rises from the smallest lags to half-period lags."""
    import numpy as np

    from spark_fits_spark.operators.timeseries import structure_function

    rng = np.random.default_rng(5)
    rows = []
    for k in range(4):
        ts = np.sort(rng.choice(5000, 80, replace=False))
        ys = np.sin(2 * np.pi * ts / 1000.0) + 0.05 * k
        rows += [(k, int(t), float(y)) for t, y in zip(ts, ys)]
    rows.append((0, int(rows[5][1]), 0.37))  # duplicate timestamp
    df = spark.createDataFrame(rows, "k long, t long, y double")
    max_lag, nbins = 600, 6
    got = {r["bin"]: r for r in structure_function(
        df, "t", "y", "k", max_lag=max_lag, nbins=nbins).collect()}

    acc = {}
    for k1, t1, y1 in rows:
        for k2, t2, y2 in rows:
            if k1 == k2 and 0 < t2 - t1 < max_lag:
                b = (t2 - t1) * nbins // max_lag
                acc.setdefault(b, []).append((y2 - y1) ** 2)
    for b, vals in acc.items():
        assert got[b]["n_pairs"] == len(vals), b
        assert abs(got[b]["sf6"] - round(float(np.mean(vals)), 6)) \
            < 2e-6, b
    assert set(got) == set(acc)
    # sinusoid: SF grows toward the half-period (500) lags
    assert got[5]["sf6"] > got[0]["sf6"] * 3
    import pytest as _pt
    with _pt.raises(ValueError, match="max_lag"):
        structure_function(df, "t", "y", "k", max_lag=0, nbins=4)
    with _pt.raises(ValueError, match="nbins"):
        structure_function(df, "t", "y", "k", max_lag=10, nbins=0)


def test_bls_search(spark):
    """Planted box transits recovered at the true period for every
    object (harmonics lose: their wider bins dilute the dip), depth
    matches the brute-force fold, ties break toward the smaller
    period, guards raise."""
    import numpy as np

    from spark_fits_spark.operators.timeseries import bls_search

    periods = [20, 25, 30, 40, 50, 60]
    rows = []
    true = {0: 20, 1: 30, 2: 50}
    rng = np.random.default_rng(8)
    for o, P in true.items():
        for t in range(300):
            y = 100.0 + float(rng.integers(0, 3))
            if (t % P) < P / 8:
                y -= 50.0
            rows.append((o, t, y))
    df = spark.createDataFrame(rows, "obj long, t long, y double")
    got = {r["object"]: r for r in bls_search(
        df, "t", "y", "obj", periods=periods, nbins=8).collect()}
    for o, P in true.items():
        assert got[o]["best_period"] == P, (o, got[o])
        assert got[o]["transit_bin"] == 0
        # brute force depth at the true period
        ys = np.array([r[2] for r in rows if r[0] == o])
        ts = np.array([r[1] for r in rows if r[0] == o])
        b = (ts % P) * 8 // P
        means = [ys[b == i].mean() for i in range(8)]
        assert abs(got[o]["depth"] - (ys.mean() - min(means))) < 1e-9
    import pytest as _pt
    with _pt.raises(ValueError, match="non-empty"):
        bls_search(df, "t", "y", "obj", periods=[])
    with _pt.raises(ValueError, match="nbins"):
        bls_search(df, "t", "y", "obj", periods=[10], nbins=1)


def test_gls_periodogram(spark):
    """GLS == direct numpy Zechmeister-Kurster (weighted, floating
    mean) at every frequency; the planted frequency dominates; 0..1
    bounded; degenerate series NULL; weights matter (down-weighted
    outliers recover the clean spectrum)."""
    import numpy as np

    from spark_fits_spark.operators.timeseries import gls_periodogram

    rng = np.random.default_rng(3)
    t = np.sort(rng.uniform(0, 80, 250))
    y = 5.0 + 2.0 * np.sin(2 * np.pi * 0.25 * t + 0.4) \
        + rng.normal(0, 0.3, 250)
    err = np.where(rng.random(250) < 0.1, 5.0, 0.5)
    freqs = [0.05, 0.1, 0.25, 0.4]
    rows = [(1, float(a), float(b), float(c))
            for a, b, c in zip(t, y, err)]
    rows += [(2, float(i), 7.0, 1.0) for i in range(10)]  # constant
    df = spark.createDataFrame(rows, "oid long, t double, y double, "
                                     "e double")
    got = {(r["object_id"], r["freq"]): r["power"] for r in
           gls_periodogram(df, "t", "y", "oid", freqs, "e").collect()}

    def ref(f):
        w = 1.0 / (err * err)
        w = w / w.sum()
        wt = 2 * np.pi * f * t
        c, s = np.cos(wt), np.sin(wt)
        Y = (w * y).sum(); C = (w * c).sum(); S = (w * s).sum()
        YY = (w * y * y).sum() - Y * Y
        YC = (w * y * c).sum() - Y * C
        YS = (w * y * s).sum() - Y * S
        CC = (w * c * c).sum() - C * C
        SS = (w * s * s).sum() - S * S
        CS = (w * c * s).sum() - C * S
        D = CC * SS - CS * CS
        return (SS * YC**2 + CC * YS**2 - 2 * CS * YC * YS) / (YY * D)

    for f in freqs:
        assert abs(got[(1, f)] - ref(f)) < 1e-9, f
        assert -1e-12 <= got[(1, f)] <= 1.0 + 1e-12
    assert got[(1, 0.25)] > 0.8
    assert all(got[(1, f)] < 0.2 for f in freqs if f != 0.25)
    assert all(got[(2, f)] is None for f in freqs)
    import pytest as _pt
    with _pt.raises(ValueError, match="non-empty"):
        gls_periodogram(df, "t", "y", "oid", [])
