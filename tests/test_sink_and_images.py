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


def test_fits_write_mixed_width_partitions(spark, tmp_path):
    """Partitions with different max string/array lengths write part
    files with different TFORM widths; the reader must still see ALL
    rows (r1 ADVICE: raw-TFORM conformance silently dropped files)."""
    src = spark.range(2000).select(
        F.col("id").alias("Index"),
        # partition by parity → one partition has ~3-char names, the
        # other ~13-char names → different nA widths per part file
        F.when(F.col("id") % 2 == 0, F.concat(F.lit("LONGNAME__"), F.col("id")))
        .otherwise(F.col("id").cast("string")).alias("name"),
        # variable-length arrays → different repeat counts per part file
        F.when(F.col("id") % 2 == 0,
               F.array(F.col("id"), F.col("id") + 1, F.col("id") + 2))
        .otherwise(F.array(F.col("id"))).alias("vec"),
    ).repartition(2, F.col("Index") % 2 == 0)
    out = str(tmp_path / "mixed")
    src.write.format("fits").mode("overwrite").save(out)

    back = spark.read.format("fits").option("hdu", 1).load(out)
    assert back.count() == 2000  # no silently-skipped part files
    assert back.agg(F.sum("Index")).first()[0] == sum(range(2000))
    r = back.where(F.col("Index") == 4).first()
    assert r["name"] == "LONGNAME__4"
    assert r["vec"] == [4, 5, 6]
    # ragged arrays round-trip losslessly (VLA, not zero-padded)
    assert back.where(F.col("Index") == 5).first()["vec"] == [5]
    # FAILFAST must also accept width-only TFORM differences
    assert (spark.read.format("fits").option("hdu", 1)
            .option("mode", "FAILFAST").load(out).count() == 2000)


def test_fits_write_append_no_overwrite(spark, tmp_path):
    """append into an existing dir must not clobber earlier part files
    (task ids restart at 0 per job — names carry a uuid)."""
    out = str(tmp_path / "appended")
    base = spark.range(300).select(F.col("id").alias("Index"))
    base.repartition(2).write.format("fits").mode("append").save(out)
    base.repartition(2).write.format("fits").mode("append").save(out)
    back = spark.read.format("fits").option("hdu", 1).load(out)
    assert back.count() == 600
    assert back.agg(F.sum("Index")).first()[0] == 2 * sum(range(300))


def test_fits_write_pinned_widths(spark, tmp_path):
    """stringwidth/colwidths pin uniform TFORMs across part files; an
    overflow refuses to truncate."""
    src = spark.range(100).select(
        F.col("id").alias("Index"),
        F.col("id").cast("string").alias("name"),
        F.array(F.col("id")).alias("vec"),
    )
    out = str(tmp_path / "pinned")
    (src.repartition(3).write.format("fits").mode("overwrite")
     .option("stringwidth", "8").option("colwidths", "vec=4").save(out))
    import glob

    from spark_fits_spark.fitscore.file import open_hdu

    tforms = set()
    for fp in glob.glob(out + "/*.fits"):
        with open(fp, "rb") as f:
            hdu = open_hdu(f, fp, 1)
        tforms.add(tuple(hdu.col_tforms))
    assert len(tforms) == 1  # uniform across part files
    assert "8A" in next(iter(tforms))
    back = spark.read.format("fits").option("hdu", 1).load(out)
    assert back.count() == 100
    assert back.where(F.col("Index") == 7).first()["vec"] == [7, 0, 0, 0]

    with pytest.raises(Exception, match="exceeds pinned width"):
        (src.repartition(1).write.format("fits").mode("overwrite")
         .option("stringwidth", "1").save(str(tmp_path / "trunc")))


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
