"""HEALPix RING pixelization (`functions/healpix.py`).

Validation strategy (healpy is not in this environment): the nside=1
base-pixel structure is exact by the published geometry (north cap →
0-3, equatorial belt → 4-7, south cap → 8-11); equal-area uniformity
over a uniform sphere is the pixelization's defining property; and the
SQL twin must agree bit-for-bit with the column-expression form on a
large random sample (the oracle-replay contract)."""

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from spark_fits_spark.functions.healpix import (
    ang2pix_ring,
    ang2pix_ring_sql,
    healpix_map,
)


def test_nside1_base_pixels(spark):
    pts = ([(45.0 + 90 * i, 80.0) for i in range(4)]
           + [(0.1 + 90 * i, 0.0) for i in range(4)]
           + [(45.0 + 90 * i, -80.0) for i in range(4)])
    df = spark.createDataFrame(pts, "ra double, dec double")
    got = [r[0] for r in df.select(ang2pix_ring(1, "ra", "dec")).collect()]
    assert got[:4] == [0, 1, 2, 3]          # north cap, by azimuth
    assert sorted(got[4:8]) == [4, 5, 6, 7]  # equatorial belt
    assert got[8:] == [8, 9, 10, 11]        # south cap


def test_equal_area_and_range(spark):
    n, nside = 120_000, 8
    rng = np.random.default_rng(7)
    ra = rng.uniform(0, 360, n)
    dec = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))  # uniform sphere
    df = spark.createDataFrame(
        list(zip(ra.tolist(), dec.tolist())), "ra double, dec double")
    m = healpix_map(df, "ra", "dec", nside=nside).collect()
    counts = {r["hpx"]: r["n_obj"] for r in m}
    npix = 12 * nside * nside
    assert all(0 <= p < npix for p in counts)
    assert len(counts) == npix              # every pixel populated
    arr = np.array(list(counts.values()))
    mean = n / npix
    assert arr.min() > 0.5 * mean and arr.max() < 1.8 * mean


def test_sql_twin_bit_for_bit(spark):
    """The DuckDB oracle expression must reproduce the JVM pixel for
    every point — including both polar caps and the belt edges."""
    n = 50_000
    rng = np.random.default_rng(3)
    ra = rng.uniform(-360, 720, n)          # exercises the pmod wrap
    dec = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    pdf = pd.DataFrame({"ra": ra, "dec": dec})
    df = spark.createDataFrame(pdf)
    spix = np.array(
        [r[0] for r in df.select(ang2pix_ring(16, "ra", "dec")).collect()])
    con = duckdb.connect()
    con.register("pts", pdf)
    opix = con.execute(
        f"SELECT {ang2pix_ring_sql(16, 'ra', 'dec')} AS p FROM pts"
    ).df()["p"].to_numpy()
    assert (spix == opix).all()


def test_codegen_no_udf(spark):
    """The pixelization must stay JVM-side: no BatchEvalPython /
    ArrowEvalPython node in the plan."""
    df = spark.range(100).select(
        (F.col("id") * 3.6).alias("ra"), (F.col("id") % 90).alias("dec"))
    plan = df.select(ang2pix_ring(16, "ra", "dec"))._jdf \
        .queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_nest_scheme_bijection_and_hierarchy(spark):
    """NESTED validation without healpy: (1) RING and NESTED index the
    SAME cells, so over a dense point sample the ring→nest map must be
    single-valued and invertible across all 12·nside² pixels (given
    the RING tests above, this pins the NESTED partition exactly);
    (2) the defining NESTED property — the pixel at nside right-
    shifted by 2 is the parent pixel at nside/2."""
    from spark_fits_spark.functions.healpix import ang2pix_nest

    n, nside = 250_000, 8
    rng = np.random.default_rng(2)
    ra = rng.uniform(0, 360, n)
    dec = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    df = spark.createDataFrame(
        list(zip(ra.tolist(), dec.tolist())), "ra double, dec double")
    rows = df.select(
        ang2pix_ring(nside, "ra", "dec").alias("r"),
        ang2pix_nest(nside, "ra", "dec").alias("n"),
        ang2pix_nest(nside // 2, "ra", "dec").alias("p")).collect()
    npix = 12 * nside * nside
    r2n = {}
    for x in rows:
        assert 0 <= x["n"] < npix
        assert r2n.setdefault(x["r"], x["n"]) == x["n"]
        assert x["n"] >> 2 == x["p"]
    assert len(r2n) == npix
    assert len(set(r2n.values())) == npix
