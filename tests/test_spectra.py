"""Spectroscopy operator tests: continuum fit + equivalent widths."""
import numpy as np
import pytest

from spark_fits_spark.operators.spectra import (equivalent_width,
                                                fit_continuum)


def test_fit_continuum_numpy_parity(spark):
    rng = np.random.default_rng(2)
    rows = []
    for k in range(3):
        wl = 4000 + 2.0 * np.arange(120)
        fx = (k + 1) * 0.01 * wl + 5 + k + rng.normal(0, 0.01, 120)
        rows += [(k, float(w), float(f)) for w, f in zip(wl, fx)]
    rows += [(9, 5000.0, 1.0), (9, 5000.0, 3.0)]   # degenerate
    df = spark.createDataFrame(rows, "obj long, wl double, flux double")
    got = {r["object"]: r for r in
           fit_continuum(df, "obj", "wl", "flux").collect()}
    for k in range(3):
        wl = 4000 + 2.0 * np.arange(120)
        fx = np.array([f for o, w, f in rows if o == k])
        a, b = np.polyfit(wl, fx, 1)
        assert abs(got[k]["a"] - a) < 1e-9, k
        assert abs(got[k]["b"] - b) < 1e-6, k
    assert got[9]["a"] is None and got[9]["b"] is None


def test_equivalent_width(spark):
    """A planted rectangular absorption dip: EW == depth/continuum
    summed over the window (exact integers); emission comes back
    negative; red-edge sample contributes nothing; line list joined
    broadcast (plan-pinned)."""
    rows = []
    # flat continuum 1000, dip of 200 at wl in [4100, 4110] (6 samples
    # spaced 2), emission +100 at [4200, 4204]
    for i in range(200):
        wl = 4000 + 2 * i
        f = 1000
        if 4100 <= wl <= 4110:
            f -= 200
        if 4200 <= wl <= 4204:
            f += 100
        rows.append((1, float(wl), float(f)))
    df = spark.createDataFrame(rows, "obj long, wl double, flux double")
    lines = spark.createDataFrame(
        [("dip", 4105.0, 6.0), ("emi", 4202.0, 3.0)],
        "line string, center double, halfwidth double")
    out = {r["line"]: r for r in equivalent_width(
        df, lines, "obj", "wl", "flux").collect()}
    # continuum fit over the full spectrum is slightly tilted by the
    # planted features -> replay the closed form exactly
    wl = np.array([r[1] for r in rows])
    fx = np.array([r[2] for r in rows])
    n = len(wl)
    det = n * (wl * wl).sum() - wl.sum() ** 2
    a = (n * (wl * fx).sum() - wl.sum() * fx.sum()) / det
    b = (fx.sum() - a * wl.sum()) / n

    def ew(lo, hi):
        s = 0.0
        for w, f in zip(wl, fx):
            if lo <= w <= hi and w < wl[-1]:
                s += (1 - f / (a * w + b)) * 2.0
        return s

    assert abs(out["dip"]["ew"] - ew(4099, 4111)) < 1e-9
    assert out["dip"]["n_window"] == 6
    assert out["dip"]["ew"] > 0 and out["emi"]["ew"] < 0
    plan = (equivalent_width(df, lines, "obj", "wl", "flux")
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_resample_linear(spark):
    """Interpolation == numpy.interp on every in-range grid point,
    grid points outside the sampled range absent, no extrapolation,
    irregular sampling handled, exact grid-point hits exact."""
    rows = []
    for k in range(3):
        wls = [100 + 4 * i + (i % 3) for i in range(40)]
        for i, w in enumerate(wls):
            rows.append((k, w, float((k + 1) * w + (i % 7))))
    df = spark.createDataFrame(rows, "obj long, wl long, flux double")
    from spark_fits_spark.operators.spectra import resample_linear
    out = resample_linear(df, "obj", "wl", "flux",
                          wl0=90, step=7, n_grid=30)
    got = {(r["object"], r["k"]): r for r in out.collect()}
    for k in range(3):
        wls = np.array([100 + 4 * i + (i % 3) for i in range(40)],
                       dtype=float)
        fxs = np.array([(k + 1) * w + (i % 7)
                        for i, w in enumerate(wls)])
        for kk in range(30):
            g = 90 + 7 * kk
            if wls[0] <= g < wls[-1]:
                assert (k, kk) in got, (k, kk)
                want = float(np.interp(g, wls, fxs))
                assert abs(got[(k, kk)]["flux"] - want) < 1e-9, (k, kk)
                assert got[(k, kk)]["wl_grid"] == g
            else:
                assert (k, kk) not in got, (k, kk)
    with pytest.raises(ValueError, match="step"):
        resample_linear(df, "obj", "wl", "flux",
                        wl0=90, step=0, n_grid=5)


def test_xcorr_lag(spark):
    """Recovered lag == numpy argmax of the sliding dot product for
    every planted shift in range; tie toward smaller lag; overlap
    counts exact; guards raise."""
    rng = np.random.default_rng(4)
    tmpl = rng.integers(0, 50, 48).astype(float)
    rows = []
    shifts = {0: -3, 1: 0, 2: 5}
    for o, sh in shifts.items():
        for k in range(48):
            src = k + sh
            v = tmpl[src] if 0 <= src < 48 else 0.0
            rows.append((o, k, float(v)))
    df = spark.createDataFrame(rows, "object long, k long, flux double")
    from spark_fits_spark.operators.spectra import xcorr_lag
    got = {r["object"]: r for r in
           xcorr_lag(df, list(tmpl), max_lag=6).collect()}

    for o, sh in shifts.items():
        flux = np.array([r[2] for r in rows if r[0] == o])
        best, bscore, bn = None, None, None
        for lag in range(-6, 7):
            ks = np.arange(48)
            sel = (ks + lag >= 0) & (ks + lag < 48)
            sc = float((flux[sel] * tmpl[ks[sel] + lag]).sum())
            if best is None or sc > bscore:
                best, bscore, bn = lag, sc, int(sel.sum())
        assert got[o]["best_lag"] == best == sh, (o, got[o], best)
        assert abs(got[o]["best_score"] - bscore) < 1e-9
        assert got[o]["n_overlap"] == bn
    with pytest.raises(ValueError, match="max_lag"):
        xcorr_lag(df, list(tmpl), max_lag=48)
    with pytest.raises(ValueError, match="non-empty"):
        xcorr_lag(df, [], max_lag=0)
