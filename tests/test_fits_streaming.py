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


def test_stream_offsets_bounded(tmp_path):
    """The checkpoint offset payload must NOT grow with the directory's
    lifetime file count — only files inside the mtime slack window ride
    in the explicit tail (r1 verdict: full-list offsets grow forever)."""
    import json
    import os
    import time

    from spark_fits_spark.sources.fits_datasource import (
        STREAM_MTIME_SLACK_S,
        FitsDataSource,
    )

    d = tmp_path / "lots"
    d.mkdir()
    old = time.time() - 10 * STREAM_MTIME_SLACK_S
    for i in range(200):
        _write_catalog(str(d / f"f{i:04d}.fits"), 5, i)
        os.utime(str(d / f"f{i:04d}.fits"), (old + i * 0.001, old + i * 0.001))
    # one fresh file inside the slack window
    _write_catalog(str(d / "fresh.fits"), 5, 999)

    ds = FitsDataSource(options={"path": str(d), "hdu": "1"})
    reader = ds.streamReader(ds.schema())
    off = reader.latestOffset()
    # 200 settled files are covered by the watermark, not listed
    assert len(off["tail"]) == 1 and off["tail"][0].endswith("fresh.fits")
    assert len(json.dumps(off)) < 500
    # the batch from scratch still covers every file exactly once
    parts = reader.partitions(reader.initialOffset(), off)
    rows = sum(p.row_end - p.row_start for p in parts)
    assert rows == 201 * 5
    # and a subsequent empty batch plans nothing
    parts2 = reader.partitions(off, reader.latestOffset())
    assert sum(p.row_end - p.row_start for p in parts2) == 0
    # legacy full-list offsets from a pre-watermark checkpoint still work
    legacy = {"files": sorted(str(p) for p in d.glob("*.fits"))}
    parts3 = reader.partitions(legacy, reader.latestOffset())
    assert sum(p.row_end - p.row_start for p in parts3) == 0


def test_fits_stream_to_training_shards(spark, tmp_path):
    """End-to-end streaming ingest: FITS files arriving in a directory
    → the streaming source → the hash-stable shard sink. Every row
    lands exactly once across epochs and its shard is the deterministic
    batch hash rule — the 'telescope drops files, training shards
    appear' pipeline with zero custom glue."""
    from pyspark.sql import functions as F

    from spark_fits_spark.operators.sample import hash_bucket
    from spark_fits_spark.streaming.events import stream_to_shards

    d = tmp_path / "incoming2"
    d.mkdir()
    _write_catalog(str(d / "a.fits"), 400, 0)
    _write_catalog(str(d / "b.fits"), 300, 1)

    stream = (
        spark.readStream.format("fits").option("hdu", 1)
        .load(str(d))
        .withColumn("doc_id", F.col("Index"))
    )
    out = str(tmp_path / "shards2")
    q = stream_to_shards(
        stream, out, str(tmp_path / "ckpt2"), n_shards=4, salt="fits")
    q.awaitTermination(120)

    got = spark.read.option("basePath", out).parquet(out)
    # Index overlaps between files (both start at 0) — count rows, and
    # check shard assignment matches the pure-batch rule per row
    assert got.count() == 700
    expect = {r["doc_id"]: r["s"] for r in
              got.select("doc_id").distinct().select(
                  "doc_id",
                  hash_bucket("doc_id", "fits", buckets=4).alias("s"))
              .collect()}
    for r in got.select("doc_id", "shard").collect():
        assert r["shard"] == expect[r["doc_id"]]


def test_fits_stream_over_compressed_images(spark, tmp_path):
    """The streaming source composes with tiled compression: compressed
    image files landing in the directory stream out as the same
    (Image, ImgIndex) rows the batch scan produces."""
    from spark_fits_spark.fitscore import writer

    src = tmp_path / "in"
    src.mkdir()
    cubes = []
    for i in range(3):
        cube = (np.arange(2 * 4 * 5, dtype="i4") + 100 * i).reshape(2, 4, 5)
        writer.write_fits(
            str(src / f"c{i}.fits"),
            [writer.compressed_image_hdu(
                cube, ["GZIP_1", "GZIP_2", "RICE_1"][i], tile_rows=3)])
        cubes.append(cube)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _run_once(spark, str(src), out, ckpt)
    back = spark.read.parquet(out)
    assert back.count() == 3 * 2 * 4
    got = sum(int(sum(r["Image"])) for r in back.collect())
    assert got == int(sum(c.sum() for c in cubes))


# ---------- exactly-once offset property (hypothesis) ----------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False


class _StubScan:
    """plan_for_files identity stub: lets the property observe exactly
    which files each micro-batch plans."""

    def plan_for_files(self, files):
        return list(files)


if _HAVE_HYP:
    @settings(max_examples=80, deadline=None)
    @given(data=st.data())
    def test_stream_offsets_exactly_once_property(data):
        """SOUNDNESS of the watermark+tail offset scheme: simulate a
        random append-only arrival sequence — files become VISIBLE
        some delay after their mtime, with equal mtimes, mtimes inside
        the slack window, and out-of-order visibility all drawn — with
        micro-batches cut at random points. Contract (the module
        docstring's invariant): a file visible within SLACK of its
        mtime is read in EXACTLY one batch; a file that materializes
        later than that may be missed (documented) but must NEVER be
        read twice."""
        from spark_fits_spark.sources.fits_datasource import (
            STREAM_MTIME_SLACK_S, FitsStreamReader,
        )

        n = data.draw(st.integers(1, 25))
        # per file: mtime spacing and visibility delay (late > slack
        # sometimes — the documented miss case)
        mtimes, vis = [], []
        t = 0.0
        for i in range(n):
            t += data.draw(st.sampled_from(
                [0.0, 0.5, 1.0, STREAM_MTIME_SLACK_S,
                 STREAM_MTIME_SLACK_S + 1]))
            delay = data.draw(st.sampled_from(
                [0.0, 1.0, STREAM_MTIME_SLACK_S - 0.5,
                 STREAM_MTIME_SLACK_S + 3]))
            mtimes.append(t)
            vis.append(t + delay)

        # batch trigger times: strictly increasing, random gaps, plus
        # a final drain long after everything is visible
        k = data.draw(st.integers(1, 8))
        triggers = []
        bt = 0.0
        for _ in range(k):
            bt += data.draw(st.sampled_from([0.5, 1.0, 4.0, 10.0]))
            triggers.append(bt)
        triggers.append(max(vis) + 2 * STREAM_MTIME_SLACK_S + 1)

        r = FitsStreamReader(_StubScan())
        now = {"t": 0.0}
        files = list(zip([f"f{i:03d}" for i in range(n)], mtimes, vis))
        r._listing = lambda: [(p, m) for p, m, v in files
                              if v <= now["t"]]

        read_count = {p: 0 for p, _, _ in files}
        offset = r.initialOffset()
        for bt in triggers:
            now["t"] = bt
            end = r.latestOffset()
            for p in r.partitions(offset, end):
                if isinstance(p, str):  # stub plan output
                    read_count[p] += 1
            offset = end

        for p, m, v in files:
            assert read_count[p] <= 1, (
                f"{p} read {read_count[p]} times — duplicates break "
                "exactly-once")
            if v - m <= STREAM_MTIME_SLACK_S:
                assert read_count[p] == 1, (
                    f"{p} (visible {v - m:.1f}s after mtime, within "
                    f"slack) was never read")
