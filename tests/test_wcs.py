"""WCS TAN transforms (`functions/wcs.py`): exact reference-point
mapping, forward/inverse round trips (including a near-pole frame),
CD-matrix linearity at small offsets, SQL-twin parity, and the header
constructor's card handling."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from spark_fits_spark.functions.wcs import (
    TanWcs,
    pixel_to_sky,
    sky_to_pixel,
    tan_pixel_to_sky_sql,
)

W = TanWcs(crval1=150.1163, crval2=2.2058, crpix1=512.5, crpix2=512.5,
           cd1_1=-7.3e-5, cd1_2=1.1e-6, cd2_1=1.2e-6, cd2_2=7.3e-5)


def test_reference_point_and_linearity(spark):
    df = spark.createDataFrame(
        [(511.5, 511.5), (512.5, 511.5)], "x double, y double")
    ra, dec = pixel_to_sky(W, "x", "y")
    rows = df.orderBy("x").select(ra.alias("ra"), dec.alias("dec")).collect()
    # CRPIX (1-based 512.5 → 0-based 511.5) maps exactly to CRVAL
    assert abs(rows[0]["ra"] - W.crval1) < 1e-12
    assert abs(rows[0]["dec"] - W.crval2) < 1e-12
    # one pixel along x moves ~CD1_1 degrees of true angle in RA
    dra = (rows[1]["ra"] - W.crval1) * math.cos(math.radians(W.crval2))
    assert abs(dra - W.cd1_1) < 1e-8


@pytest.mark.parametrize("wcs", [
    W,
    TanWcs(10.0, 89.5, 100.0, 100.0, -3e-4, 0.0, 0.0, 3e-4),  # near pole
])
def test_roundtrip(spark, wcs):
    rng = np.random.default_rng(0)
    pts = [(float(a), float(b)) for a, b in rng.uniform(0, 1024, (1000, 2))]
    g = spark.createDataFrame(pts, "x double, y double")
    ra, dec = pixel_to_sky(wcs, "x", "y")
    s = g.select("x", "y", ra.alias("ra"), dec.alias("dec"))
    xb, yb = sky_to_pixel(wcs, "ra", "dec")
    back = s.select("x", "y", xb.alias("xb"), yb.alias("yb")).collect()
    err = max(max(abs(r["x"] - r["xb"]), abs(r["y"] - r["yb"]))
              for r in back)
    assert err < 1e-7


def test_sql_twin(spark):
    rng = np.random.default_rng(1)
    pdf = pd.DataFrame({"x": rng.uniform(0, 1024, 5000),
                        "y": rng.uniform(0, 1024, 5000)})
    ra, dec = pixel_to_sky(W, "x", "y")
    srows = (spark.createDataFrame(pdf)
             .select(ra.alias("ra"), dec.alias("dec")).collect())
    con = duckdb.connect()
    con.register("pts", pdf)
    rs, ds = tan_pixel_to_sky_sql(W, "x", "y")
    orows = con.execute(f"SELECT {rs} AS ra, {ds} AS dec FROM pts").df()
    sr = np.array([r["ra"] for r in srows])
    sd = np.array([r["dec"] for r in srows])
    assert np.abs(sr - orows["ra"].to_numpy()).max() < 1e-11
    assert np.abs(sd - orows["dec"].to_numpy()).max() < 1e-11


def test_from_header():
    h = {"CTYPE1": "RA---TAN", "CRVAL1": 10.0, "CRVAL2": -5.0,
         "CRPIX1": 1.0, "CRPIX2": 2.0, "CDELT1": -1e-4, "CDELT2": 1e-4}
    w = TanWcs.from_header(h)
    assert (w.cd1_1, w.cd2_2, w.cd1_2, w.cd2_1) == (-1e-4, 1e-4, 0.0, 0.0)
    with pytest.raises(NotImplementedError, match="TAN"):
        TanWcs.from_header({**h, "CTYPE1": "RA---SIN"})
    with pytest.raises(NotImplementedError, match="CROTA2"):
        TanWcs.from_header({**h, "CROTA2": 30.0})
    with pytest.raises(ValueError, match="CRVAL1"):
        TanWcs.from_header({k: v for k, v in h.items() if k != "CRVAL1"})


def test_fit_tangent_affine(spark):
    import numpy as np

    from spark_fits_spark.functions.wcs import fit_tangent_affine

    rng = np.random.default_rng(11)
    u = rng.integers(0, 1000, 60).astype(float)
    v = rng.integers(0, 1000, 60).astype(float)
    xi = 2e-4 * u - 3e-5 * v + 0.01 + rng.normal(0, 1e-7, 60)
    eta = 2.5e-5 * u + 1.9e-4 * v - 0.02 + rng.normal(0, 1e-7, 60)
    rows = [(0, float(a), float(b), float(c), float(d))
            for a, b, c, d in zip(u, v, xi, eta)]
    rows += [(1, 1.0, 1.0, 0.5, 0.5), (1, 2.0, 2.0, 1.0, 1.0)]  # singular
    df = spark.createDataFrame(
        rows, "plane long, u double, v double, xi double, eta double")
    out = {r["plane"]: r for r in
           fit_tangent_affine(df, "plane", "u", "v", "xi", "eta").collect()}
    # numpy lstsq reference
    A = np.column_stack([u, v, np.ones_like(u)])
    ref_x = np.linalg.lstsq(A, xi, rcond=None)[0]
    ref_e = np.linalg.lstsq(A, eta, rcond=None)[0]
    got = out[0]
    for k, w in zip("abc", ref_x):
        assert abs(got[k] - w) < 1e-10, (k, got[k], w)
    for k, w in zip("def", ref_e):
        assert abs(got[k] - w) < 1e-10, (k, got[k], w)
    assert out[1]["a"] is None and out[1]["f"] is None   # singular


def test_sky_to_pixel_scalar_roundtrip():
    from spark_fits_spark.functions.wcs import TanWcs, sky_to_pixel_scalar

    w = TanWcs(crval1=150.1163, crval2=2.2058, crpix1=512.5,
               crpix2=512.5, cd1_1=-7.3e-5, cd1_2=1.1e-6,
               cd2_1=1.2e-6, cd2_2=7.3e-5)
    # the reference pixel maps back to itself
    x, y = sky_to_pixel_scalar(w, 150.1163, 2.2058)
    assert abs(x - 511.5) < 1e-9 and abs(y - 511.5) < 1e-9


def test_read_sky_cutout(spark, tmp_path):
    """Cutout around a sky position: exact pixel window (value = y*W+x
    makes any offset visible), edge clipping, fully-outside empty,
    and the scan reads ONLY the rowrange-pruned rows."""
    import numpy as np

    from spark_fits_spark import read_sky_cutout
    from spark_fits_spark.fitscore import writer as fw
    from spark_fits_spark.functions.wcs import (TanWcs, pixel_to_sky,
                                                sky_to_pixel_scalar)

    H, W = 64, 80
    img = (np.arange(H * W, dtype="i4")).reshape(H, W)
    w = TanWcs(crval1=150.0, crval2=2.0, crpix1=40.5, crpix2=32.5,
               cd1_1=-7.3e-5, cd1_2=0.0, cd2_1=0.0, cd2_2=7.3e-5)
    cards = [
        f"{k:8s}= {v:>20}".ljust(80).encode()
        for k, v in [("CRVAL1", 150.0), ("CRVAL2", 2.0),
                     ("CRPIX1", 40.5), ("CRPIX2", 32.5),
                     ("CD1_1", -7.3e-5), ("CD1_2", 0.0),
                     ("CD2_1", 0.0), ("CD2_2", 7.3e-5),
                     ("CTYPE1", "'RA---TAN'"), ("CTYPE2", "'DEC--TAN'")]]
    p = str(tmp_path / "sky.fits")
    fw.write_fits(p, [fw.image_hdu(img, extra_cards=cards)])

    # target the exact sky position of pixel (x=20, y=50)
    df = spark.createDataFrame([(20.0, 50.0)], "px double, py double")
    ra, dec = pixel_to_sky(w, "px", "py")
    r = df.select(ra.alias("ra"), dec.alias("dec")).first()
    cut = read_sky_cutout(spark, p, ra=r["ra"], dec=r["dec"], half=3)
    rows = {rr["y"]: rr for rr in cut.collect()}
    assert sorted(rows) == list(range(47, 54))
    for y in range(47, 54):
        assert rows[y]["x0"] == 17
        assert rows[y]["Image"] == [y * W + x for x in range(17, 24)]
    # edge clip: position near (0, 0)
    xy = sky_to_pixel_scalar(w, 150.0, 2.0)  # center pixel sanity
    assert abs(xy[0] - 39.5) < 1e-9
    df2 = spark.createDataFrame([(1.0, 1.0)], "px double, py double")
    ra2, dec2 = pixel_to_sky(w, "px", "py")
    r2 = df2.select(ra2.alias("ra"), dec2.alias("dec")).first()
    clip = read_sky_cutout(spark, p, ra=r2["ra"], dec=r2["dec"], half=4)
    ys = sorted(rr["y"] for rr in clip.collect())
    assert ys == list(range(0, 6))
    # fully outside
    assert read_sky_cutout(spark, p, ra=10.0, dec=-60.0,
                           half=3).count() == 0


def test_sin_projection(spark):
    """Orthographic SIN: exact roundtrip over a pixel grid, center
    maps to CRVAL, and agreement with TAN to first order on a small
    field (they differ only at second order in the field angle)."""
    from spark_fits_spark.functions.wcs import (TanWcs, pixel_to_sky,
                                                sin_pixel_to_sky,
                                                sin_sky_to_pixel)

    w = TanWcs(crval1=201.3, crval2=-43.0, crpix1=256.5, crpix2=256.5,
               cd1_1=-2.8e-4, cd1_2=1.0e-5, cd2_1=1.1e-5, cd2_2=2.8e-4)
    pts = [(float(x), float(y)) for x in (0, 100, 255.5, 511)
           for y in (0, 127, 256, 511)]
    df = spark.createDataFrame(pts, "px double, py double")
    ra, dec = sin_pixel_to_sky(w, "px", "py")
    back = sin_sky_to_pixel(w, ra, dec)
    rows = df.select("px", "py", back[0].alias("bx"),
                     back[1].alias("by"),
                     ra.alias("ra"), dec.alias("dec")).collect()
    for r in rows:
        assert abs(r["bx"] - r["px"]) < 1e-8, r
        assert abs(r["by"] - r["py"]) < 1e-8, r
    # center pixel -> CRVAL
    from pyspark.sql import functions as F
    c = df.limit(1).select(
        *sin_pixel_to_sky(w, F.lit(255.5), F.lit(255.5))).first()
    assert abs(c[0] - 201.3) < 1e-9 and abs(c[1] - (-43.0)) < 1e-9
    # small-field agreement with TAN (few-arcsec at ~0.1 deg field)
    tra, tdec = pixel_to_sky(w, "px", "py")
    t = df.select(ra.alias("sra"), dec.alias("sdec"),
                  tra.alias("tra"), tdec.alias("tdec")).collect()
    for r in t:
        assert abs(r["sra"] - r["tra"]) < 0.01
        assert abs(r["sdec"] - r["tdec"]) < 0.01


def test_fit_tangent_quadratic(spark):
    import numpy as np

    from spark_fits_spark.functions.wcs import fit_tangent_quadratic

    rng = np.random.default_rng(13)
    u = rng.uniform(-500, 500, 80)
    v = rng.uniform(-500, 500, 80)
    true_xi = [2e-4, -3e-5, 0.01, 1e-9, -2e-9, 3e-9]
    true_eta = [2.5e-5, 1.9e-4, -0.02, -1e-9, 2e-9, -3e-9]

    def apply(c):
        return (c[0] * u + c[1] * v + c[2]
                + c[3] * u * u + c[4] * u * v + c[5] * v * v)

    xi = apply(true_xi) + rng.normal(0, 1e-8, 80)
    eta = apply(true_eta) + rng.normal(0, 1e-8, 80)
    rows = [(0, float(a), float(b), float(c), float(d))
            for a, b, c, d in zip(u, v, xi, eta)]
    rows += [(1, 1.0, 1.0, 0.5, 0.5), (1, 2.0, 2.0, 1.0, 1.0)]
    df = spark.createDataFrame(
        rows, "plane long, u double, v double, xi double, eta double")
    got = {r["plane"]: r for r in fit_tangent_quadratic(
        df, "plane", "u", "v", "xi", "eta").collect()}
    A = np.column_stack([u, v, np.ones_like(u), u * u, u * v, v * v])
    ref_xi = np.linalg.lstsq(A, xi, rcond=None)[0]
    ref_eta = np.linalg.lstsq(A, eta, rcond=None)[0]
    for i in range(6):
        assert abs(got[0]["xi_coef"][i] - ref_xi[i]) \
            < 1e-9 * max(1.0, abs(ref_xi[i])), i
        assert abs(got[0]["eta_coef"][i] - ref_eta[i]) \
            < 1e-9 * max(1.0, abs(ref_eta[i])), i
    assert got[1]["xi_coef"] is None    # singular: 2 points, 6 params
