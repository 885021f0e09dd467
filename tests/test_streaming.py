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
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{SF}/events.parquet")
    return df.withColumn(
        "ts", F.timestamp_micros(F.expr("ts div 1000").cast("long")))


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
