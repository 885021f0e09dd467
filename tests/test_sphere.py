"""Spherical geometry (`functions/sphere.py`): haversine separations
against known exact values, and the cone predicate's band+radius
semantics."""

import math

import pytest
from pyspark.sql import functions as F

from spark_fits_spark.functions.sphere import (angular_sep, angular_sep_sql,
                                               cone_filter)


def test_angular_sep_known_values(spark):
    cases = [
        # ra1, dec1, ra2, dec2, expected degrees
        (10.0, 20.0, 10.0, 20.0, 0.0),          # coincident
        (0.0, 0.0, 90.0, 0.0, 90.0),            # equator quarter turn
        (0.0, -90.0, 0.0, 90.0, 180.0),         # pole to pole
        (0.0, 0.0, 180.0, 0.0, 180.0),          # antipode on equator
        (45.0, 30.0, 45.0, 31.0, 1.0),          # pure dec offset
        (359.9, 0.0, 0.1, 0.0, 0.2),            # RA wrap across 0
    ]
    df = spark.createDataFrame(
        [(i, *c[:4]) for i, c in enumerate(cases)],
        "i long, ra1 double, dec1 double, ra2 double, dec2 double")
    got = {r["i"]: r["s"] for r in df.select(
        "i", angular_sep("ra1", "dec1", "ra2", "dec2").alias("s")).collect()}
    for i, c in enumerate(cases):
        assert abs(got[i] - c[4]) < 1e-9, (c, got[i])


def test_angular_sep_sql_twin_parity(spark):
    import duckdb
    import numpy as np
    rng = np.random.default_rng(3)
    rows = [(float(a), float(d), float(a2), float(d2))
            for a, d, a2, d2 in zip(rng.uniform(0, 360, 200),
                                    rng.uniform(-89, 89, 200),
                                    rng.uniform(0, 360, 200),
                                    rng.uniform(-89, 89, 200))]
    df = spark.createDataFrame(
        rows, "ra1 double, dec1 double, ra2 double, dec2 double")
    got = [r[0] for r in df.select(
        angular_sep("ra1", "dec1", "ra2", "dec2")).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(ra1 double, dec1 double,"
                " ra2 double, dec2 double)")
    con.executemany("INSERT INTO t VALUES (?,?,?,?)", rows)
    sql = angular_sep_sql("ra1", "dec1", "ra2", "dec2")
    want = [r[0] for r in con.execute(f"SELECT {sql} FROM t").fetchall()]
    for g, w in zip(got, want):
        assert abs(g - w) < 1e-11, (g, w)


def test_cone_filter(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 0.0), (2, 10.4, 0.0), (3, 10.0, 0.6),
         (4, 10.3, 0.3)],
        "i long, ra double, dec double")
    kept = sorted(r["i"] for r in df.where(
        cone_filter("ra", "dec", 10.0, 0.0, 0.5)).collect())
    assert kept == [1, 2, 4]                    # 3 is outside the band
    with pytest.raises(ValueError, match="positive"):
        cone_filter("ra", "dec", 10.0, 0.0, 0.0)


def test_epoch_propagate(spark):
    from spark_fits_spark.functions.sphere import epoch_propagate

    # 100 mas/yr for 36 years = 3.6 arcsec = 1e-3 deg
    df = spark.createDataFrame(
        [(0.0, 0.0, 100.0, -100.0),      # equator: no cos-dec factor
         (10.0, 60.0, 100.0, 0.0)],      # dec 60: mu_a* / cos(60) = 2x
        "ra double, dec double, pmra double, pmdec double")
    ra2, dec2 = epoch_propagate("ra", "dec", "pmra", "pmdec", 36.0)
    rows = df.select(ra2.alias("ra2"), dec2.alias("dec2")).collect()
    assert abs(rows[0]["ra2"] - 1e-3) < 1e-12
    assert abs(rows[0]["dec2"] - (-1e-3)) < 1e-12
    assert abs(rows[1]["ra2"] - (10.0 + 2e-3)) < 1e-9
    assert rows[1]["dec2"] == 60.0


def test_zone_partitioned_pruning(spark, tmp_path):
    """A zone range predicate on a partitionBy(zone) layout must land
    in PartitionFilters (plan-time directory pruning), not just data
    filters over a full scan."""
    rows = [(i, 10.0 + i * 0.01, float(i % 10)) for i in range(200)]
    df = spark.createDataFrame(rows, "obj_id long, ra double, dec double")
    d = str(tmp_path / "zones")
    (df.withColumn("zone", F.floor(F.col("dec") / 1.0).cast("long"))
       .write.partitionBy("zone").parquet(d))
    cat = spark.read.parquet(d)
    q = cat.where(F.col("zone").cast("long").between(3, 5))
    plan = q._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf, plan
    assert "zone" in pf[0].split("PartitionFilters")[1].split("]")[0], pf[0]
    assert q.count() == 60           # zones 3,4,5 x 20 rows each


def test_equatorial_to_galactic(spark):
    from spark_fits_spark.functions.sphere import equatorial_to_galactic

    df = spark.createDataFrame(
        [(0, 192.85948, 27.12825),      # north galactic pole
         (1, 266.40499, -28.93617),     # galactic center (J2000)
         (2, 83.63308, 22.01450)],      # Crab nebula: l~184.56, b~-5.78
        "i long, ra double, dec double")
    l, b = equatorial_to_galactic("ra", "dec")
    got = {r["i"]: (r["l"], r["b"]) for r in
           df.select("i", l.alias("l"), b.alias("b")).collect()}
    assert abs(got[0][1] - 90.0) < 1e-9             # pole: b = 90
    assert abs(got[1][0] - 0.0) < 0.01 or abs(got[1][0] - 360.0) < 0.01
    assert abs(got[1][1] - 0.0) < 0.01              # GC: l ~ 0, b ~ 0
    assert abs(got[2][0] - 184.557) < 0.01
    assert abs(got[2][1] + 5.784) < 0.01
