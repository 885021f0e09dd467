"""Relative photometry (ubercal) ALS solver."""
import numpy as np
import pytest

from spark_fits_spark.operators.calibration import relative_photometry


def test_relative_photometry(spark):
    """On an incomplete but connected observation graph the ALS
    iterations match a numpy replay exactly, and with enough rounds
    the planted zero points are recovered (gauge mean(zp)=0)."""
    rng = np.random.default_rng(2)
    n_stars, n_epochs = 40, 8
    s = rng.uniform(10, 20, n_stars)
    z = rng.uniform(-0.5, 0.5, n_epochs)
    z -= z.mean()
    rows = []
    vis = {}
    for i in range(n_stars):
        for e in range(n_epochs):
            if (i + e) % 3 != 0:
                rows.append((i, e, float(s[i] + z[e])))
                vis[(i, e)] = s[i] + z[e]
    df = spark.createDataFrame(rows, "star long, epoch long, m double")

    def ref(iters):
        zp = np.zeros(n_epochs)
        for _ in range(iters):
            ms = np.array([
                np.mean([m - zp[e] for (i2, e), m in vis.items()
                         if i2 == i]) for i in range(n_stars)])
            zr = np.array([
                np.mean([m - ms[i] for (i, e2), m in vis.items()
                         if e2 == e]) for e in range(n_epochs)])
            zp = zr - zr.mean()
        return zp

    for iters in (1, 3):
        got = {r["epoch"]: r["zp"] for r in relative_photometry(
            df, "star", "epoch", "m", iters=iters).collect()}
        want = ref(iters)
        for e in range(n_epochs):
            assert abs(got[e] - want[e]) < 1e-10, (iters, e)
    # convergence: 6 rounds recover the planted zero points
    got6 = {r["epoch"]: r["zp"] for r in relative_photometry(
        df, "star", "epoch", "m", iters=6).collect()}
    for e in range(n_epochs):
        assert abs(got6[e] - z[e]) < 1e-3, e
    with pytest.raises(ValueError, match="iters"):
        relative_photometry(df, "star", "epoch", "m", iters=0)
