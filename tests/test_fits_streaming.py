"""Streaming FITS source: new files in a directory become micro-batches."""

import numpy as np


def _write_catalog(path, n, seed):
    from spark_fits_spark.fitscore import writer

    r = np.random.RandomState(seed)
    cols = [
        ("target", "10A", np.array([f"NGC{i:07d}" for i in range(n)])),
        ("RA", "E", r.uniform(0, 6.28, n).astype(">f4")),
        ("Index", "K", np.arange(n, dtype=">i8")),
    ]
    writer.write_fits(path, [writer.bintable_hdu(cols)])


def _run_once(spark, src_dir, out_dir, ckpt):
    q = (
        spark.readStream.format("fits").option("hdu", 1).load(src_dir)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()


def test_fits_stream_ingests_files(spark, tmp_path):
    d = tmp_path / "incoming"
    d.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_catalog(str(d / "a.fits"), 1000, 0)
    _write_catalog(str(d / "b.fits"), 500, 1)

    _run_once(spark, str(d), out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == 1500
    assert set(got.columns) == {"target", "RA", "Index"}

    # a new file arrives; restart from checkpoint → only it is ingested
    _write_catalog(str(d / "c.fits"), 250, 2)
    _run_once(spark, str(d), out, ckpt)
    assert spark.read.parquet(out).count() == 1750
