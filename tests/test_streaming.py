"""Structured Streaming tests: file-source micro-batches, watermarked
windowed agg, and stateful sessionization — cross-checked against the
batch equivalents."""

import os
import time

import pytest
from pyspark.sql import functions as F

from spark_fits_spark.streaming import events as se

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def events_batch(spark):
    # suite._t handles the ts physical-type drift across testdata
    # generations (nanos-as-long vs TIMESTAMP_NTZ micros)
    from spark_fits_spark.suite import _t

    return _t(spark, SF, "events")


@pytest.fixture()
def stream_dir(tmp_path, events_batch):
    # 3 micro-batches of consecutive time ranges (streams arrive roughly
    # in time order — a random split would race the watermark)
    d = str(tmp_path / "stream_in")
    splits = [
        events_batch.where(F.col("ts") < "2024-01-11"),
        events_batch.where((F.col("ts") >= "2024-01-11") & (F.col("ts") < "2024-01-21")),
        events_batch.where(F.col("ts") >= "2024-01-21"),
    ]
    for part in splits:
        part.coalesce(1).write.mode("append").parquet(d)
        time.sleep(0.1)
    return d


def _run_stream(df, tmp_path, mode="append"):
    q = (
        df.writeStream.format("memory").queryName("sink")
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_hourly_counts_stream_matches_batch(spark, stream_dir, tmp_path, events_batch):
    stream = se.read_events_stream(spark, stream_dir)
    assert stream.isStreaming
    q = _run_stream(se.hourly_counts(stream), tmp_path, mode="append")
    got = {tuple(r) for r in spark.sql("SELECT * FROM sink").collect()}
    expected = {tuple(r) for r in se.hourly_counts(events_batch).collect()}
    # append mode only emits windows below the watermark; with
    # availableNow the final watermark is max(ts)-2h, so the last
    # windows stay open — check emitted ⊆ batch and substantial overlap
    assert got.issubset(expected)
    assert len(got) >= len(expected) * 0.8
    q.stop()


def test_sessionize_stream_emits_closed_sessions(spark, stream_dir, tmp_path, events_batch):
    stream = se.read_events_stream(spark, stream_dir, max_files_per_trigger=1)
    q = _run_stream(se.sessionize_stream(stream), tmp_path, mode="append")
    got = spark.sql("SELECT * FROM sink").collect()
    # closed sessions must agree with the batch sessionization
    from spark_fits_spark.suite import QUERIES

    batch = {
        (r["user_id"], r["start_ms"], r["end_ms"], r["n_events"])
        for r in QUERIES["q19_sessionize"](spark, SF).collect()
    }
    for r in got:
        key = (r["user_id"], r["session_start_ms"], r["session_end_ms"], r["n_events"])
        assert key in batch, f"stream session {key} not found in batch result"
    # with 3 micro-batches over 30 days of data, plenty of sessions close
    assert len(got) > 50
    q.stop()


def test_dedup_stream_drops_replayed_file(spark, tmp_path, events_batch):
    import shutil

    d = str(tmp_path / "dup_in")
    os.makedirs(d)
    one = events_batch.where(F.col("ts") < "2024-01-08").coalesce(1)
    one.write.mode("append").parquet(d)
    # replay the same rows as a second file (duplicate arrivals)
    part = [f for f in os.listdir(d) if f.endswith(".parquet")][0]
    shutil.copy(os.path.join(d, part), os.path.join(d, "replay.parquet"))

    stream = se.read_events_stream(spark, d)
    q = (
        se.dedup_stream(stream).writeStream.format("memory")
        .queryName("dedup_sink").outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT event_id FROM dedup_sink").collect()
    ids = [r["event_id"] for r in got]
    assert len(ids) == len(set(ids)) == one.count()
    q.stop()
    # batch analog gives the same distinct set
    assert se.dedup_stream(one.union(one)).count() == one.count()


def test_stream_to_shards_exactly_once_and_stable(spark, tmp_path, events_batch):
    """Every event lands exactly once across epochs; shard assignment
    equals the batch hash_bucket rule (arrival-batch-independent)."""
    from spark_fits_spark.operators.sample import hash_bucket

    d = str(tmp_path / "docs_in")
    splits = [
        events_batch.where(F.col("event_id") % 3 == i) for i in range(3)
    ]
    for part in splits:
        part.coalesce(1).write.mode("append").parquet(d)
        time.sleep(0.1)

    stream = se.read_events_stream(spark, d, max_files_per_trigger=1)
    out = str(tmp_path / "shards_out")
    q = se.stream_to_shards(
        stream, out, str(tmp_path / "ckpt2"),
        id_col="event_id", n_shards=4, salt="t")
    q.awaitTermination(120)

    got = spark.read.option("basePath", out).parquet(out)
    n_total = events_batch.count()
    assert got.count() == n_total  # exactly once, across all epochs
    assert got.select("event_id").distinct().count() == n_total
    # shard is the deterministic batch rule, independent of epoch
    expect = {r["event_id"]: r["s"] for r in events_batch.select(
        "event_id", hash_bucket("event_id", "t", buckets=4).alias("s")
    ).collect()}
    for r in got.select("event_id", "shard").collect():
        assert r["shard"] == expect[r["event_id"]], r


def test_enrich_stream_matches_batch(spark, stream_dir, tmp_path, events_batch):
    """Stream-static broadcast enrichment: every micro-batch event joins
    the dimension; result set equals the batch left join exactly
    (no watermark semantics involved)."""
    dim = (
        events_batch.select("user_id").distinct()
        .where(F.col("user_id") % 2 == 0)   # half the keys: NULL path too
        .withColumn("segment", (F.col("user_id") % 3).cast("string"))
    )
    stream = se.read_events_stream(spark, stream_dir)
    q = (
        se.enrich_stream(stream, dim)
        .writeStream.format("memory").queryName("enrich_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in
           spark.sql("SELECT event_id, user_id, segment FROM enrich_sink")
           .collect()}
    want = {tuple(r) for r in
            se.enrich_stream(events_batch, dim)
            .select("event_id", "user_id", "segment").collect()}
    assert got == want
    q.stop()


def test_correlate_streams_matches_batch_interval_join(
        spark, stream_dir, tmp_path, events_batch):
    """Watermarked stream-stream interval join vs the identical batch
    join: appended pairs are a subset (the final watermark leaves the
    last horizon open under availableNow) with substantial overlap."""
    lf = F.col("event_id") % 2 == 0
    rf = F.col("event_id") % 2 == 1
    stream_l = se.read_events_stream(spark, stream_dir).where(lf)
    stream_r = se.read_events_stream(spark, stream_dir).where(rf)
    q = (
        se.correlate_streams(stream_l, stream_r, within_minutes=10)
        .writeStream.format("memory").queryName("corr_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_corr"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {tuple(r) for r in
           spark.sql("SELECT l_id, r_id FROM corr_sink").collect()}
    want = {tuple(r) for r in
            se.correlate_streams(
                events_batch.where(lf), events_batch.where(rf),
                within_minutes=10).select("l_id", "r_id").collect()}
    assert got.issubset(want)
    assert len(want) > 0
    assert len(got) >= len(want) * 0.8, (len(got), len(want))
    q.stop()
