"""FITS writer sink round-trips and image helpers."""

import numpy as np
import pytest
from pyspark.sql import functions as F

REF = "/root/reference/src/test/resources"


def test_fits_write_roundtrip(spark, tmp_path):
    src = spark.range(5000).select(
        F.col("id").alias("Index"),
        F.concat(F.lit("OBJ"), F.lpad(F.col("id").cast("string"), 7, "0")).alias("target"),
        (F.col("id") * 0.5).cast("float").alias("RA"),
        (F.col("id") % 2 == 0).alias("Flag"),
        F.array((F.col("id") % 100).cast("smallint"),
                ((F.col("id") + 1) % 100).cast("smallint")).alias("Vec"),
    )
    out = str(tmp_path / "outdir")
    src.repartition(4).write.format("fits").mode("overwrite").save(out)

    back = spark.read.format("fits").option("hdu", 1).load(out)
    assert back.count() == 5000
    types = {f.name: f.dataType.simpleString() for f in back.schema.fields}
    assert types == {"Index": "bigint", "target": "string", "RA": "float",
                     "Flag": "boolean", "Vec": "array<smallint>"}
    assert back.agg(F.sum("Index")).first()[0] == sum(range(5000))
    assert back.where(F.col("Flag")).count() == 2500
    row = back.where(F.col("Index") == 42).first()
    assert row["target"] == "OBJ0000042"
    assert row["Vec"] == [42, 43]
    # overwrite replaces, not appends
    src.limit(100).repartition(1).write.format("fits").mode("overwrite").save(out)
    assert spark.read.format("fits").option("hdu", 1).load(out).count() == 100


def test_fits_write_roundtrip_parquet_table(spark, tmp_path):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet") \
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    out = str(tmp_path / "li_fits")
    li.write.format("fits").mode("append").save(out)
    back = spark.read.format("fits").option("hdu", 1).load(out)
    assert back.count() == li.count()
    a = li.agg(F.sum("l_quantity"), F.sum("l_orderkey")).first()
    b = back.agg(F.sum("l_quantity"), F.sum("l_orderkey")).first()
    assert a == b


def test_reassemble_images(spark):
    from spark_fits_spark.operators.images import image_stats, reassemble_images

    df = spark.read.format("fits").option("hdu", 2).load(f"{REF}/toTest/tst0009.fits")
    planes = reassemble_images(df).collect()
    assert len(planes) == 5
    by_idx = {p["ImgIndex"]: p for p in planes}
    for i in range(5):
        assert by_idx[i]["n_rows"] == 31
        assert all(len(r) == 73 for r in by_idx[i]["image"])
    stats = image_stats(df).collect()
    assert len(stats) == 5
    assert all(s["n_px"] == 31 * 73 for s in stats)
