"""Structured Streaming operators over event streams.

The reference is batch-only (no StreamSourceProvider anywhere — SURVEY.md
§2.3), so this module is beyond-reference surface: the streaming shapes a
training-data pipeline needs, built on Structured Streaming primitives:

- :func:`read_events_stream` — file-based stream over the events table's
  schema (drop parquet files into a directory → micro-batches).
- :func:`hourly_counts` — watermarked tumbling-window aggregation
  (late data handled by the watermark; state is bounded).
- :func:`sessionize_stream` — custom stateful operator via
  ``applyInPandasWithState`` (30-min-gap sessions, the streaming twin of
  the batch ``q19_sessionize`` query).

All transformations also work on a batch DataFrame of the same schema
(except the stateful one, which is streaming-only by API), which is how
the tests cross-check results against the batch suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])


def read_events_stream(spark: SparkSession, path: str,
                       max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream: each new parquet file in ``path`` becomes a
    micro-batch."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def hourly_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour windowed aggregation per event_type with a
    watermark bounding state for late data. Works on both streaming and
    batch inputs (watermark is a no-op in batch)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 10000, 0).cast("long")).alias("sum_value_e4"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type", "n_events", "sum_value_e4",
        )
    )


SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start_ms", LongType()),
    StructField("session_end_ms", LongType()),
    StructField("n_events", LongType()),
])

_STATE_SCHEMA = StructType([
    StructField("open_start_ms", LongType()),
    StructField("open_end_ms", LongType()),
    StructField("open_count", LongType()),
])

SESSION_GAP_MS = 30 * 60 * 1000


def sessionize_stream(events: DataFrame, timeout_minutes: int = 45) -> DataFrame:
    """Streaming sessionization via ``applyInPandasWithState``: per-user
    state holds the open session; a 30-min event gap (or state timeout)
    closes it and emits a session row.

    State per key is three longs — bounded regardless of stream length;
    the groupBy shuffles once on user_id."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        user_id = key[0]
        if state.hasTimedOut:
            if state.exists:
                s, e, c = state.get
                state.remove()
                yield pd.DataFrame({
                    "user_id": [user_id], "session_start_ms": [s],
                    "session_end_ms": [e], "n_events": [c]})
            return
        ms_list = []
        for pdf in pdfs:
            ms_list.extend((pdf["ts"].astype("int64") // 1_000_000).tolist())
        ms_list.sort()
        if state.exists:
            start, end, count = state.get
        else:
            start = end = count = None
        out = []
        for ms in ms_list:
            if start is None:
                start, end, count = ms, ms, 1
            elif ms - end > SESSION_GAP_MS:
                out.append((start, end, count))
                start, end, count = ms, ms, 1
            else:
                end = ms
                count += 1
        state.update((start, end, count))
        state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        if out:
            yield pd.DataFrame({
                "user_id": [user_id] * len(out),
                "session_start_ms": [o[0] for o in out],
                "session_end_ms": [o[1] for o in out],
                "n_events": [o[2] for o in out]})

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact deduplication on event_id.

    ``dropDuplicatesWithinWatermark`` keeps per-key state only within
    the watermark horizon — bounded state, unlike a plain
    ``dropDuplicates`` on a stream which grows forever. The batch analog
    of this operator is ``dedup.exact_dedup_groups`` / ``distinct()``.
    """
    deduped = events.withWatermark("ts", watermark)
    if events.isStreaming:
        return deduped.dropDuplicatesWithinWatermark(["event_id"])
    return events.dropDuplicates(["event_id"])


def stream_to_shards(
    docs: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    *,
    id_col: str = "doc_id",
    n_shards: int = 8,
    salt: str = "shards",
    available_now: bool = True,
):
    """Continuously land a document stream into training shards — the
    streaming twin of the batch shard manifest (``q76``): each
    micro-batch is appended under ``out_dir/epoch=<id>/shard=<s>/`` as
    parquet, with the shard a **pure function of the id** (the same
    salted-md5 bucket rule as :func:`~spark_fits_spark.operators.sample.
    hash_bucket`), so a document's shard never depends on arrival
    batch, partitioning, or cluster size, and per-shard readers see a
    stable hash-partitioned layout.

    Exactly-once (eventual): ``foreachBatch`` may replay an epoch after
    failure; the write targets the epoch's own subdirectory with
    ``mode("overwrite")``, so a replay REPLACES that epoch instead of
    duplicating rows. Note the overwrite is delete-then-write, not
    atomic: a reader scanning ``out_dir`` DURING a replay can observe
    the epoch partially rewritten — gate consumers on stream quiesce
    (or on the ``_SUCCESS`` marker inside each epoch dir, which the
    parquet committer writes last). State is zero (stateless sink) —
    the only streaming state is the file-source offset log in
    ``checkpoint_dir``.

    Returns the started ``StreamingQuery`` (``availableNow`` drains the
    current backlog then stops — the batch-backfill mode; pass
    ``available_now=False`` for a continuous micro-batch trigger)."""
    from spark_fits_spark.operators.sample import hash_bucket

    def _write(batch_df: DataFrame, epoch_id: int) -> None:
        (batch_df
         .withColumn("shard", hash_bucket(id_col, salt, buckets=n_shards))
         .write.mode("overwrite")
         .partitionBy("shard")
         .parquet(f"{out_dir}/epoch={epoch_id}"))

    writer = (
        docs.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def text_dedup_stream(docs: DataFrame, watermark: str = "1 hour",
                      ts_col: str = "ts", text_col: str = "text") -> DataFrame:
    """Streaming content deduplication: fingerprint the text (md5 of
    sorted distinct tokens — same normalization as the batch
    ``q21_dedup_normalized``) and keep the first arrival per fingerprint
    within the watermark horizon."""
    fp = F.md5(F.concat_ws(
        " ", F.array_sort(F.array_distinct(F.split(F.col(text_col), " ")))))
    with_fp = docs.withColumn("_fp", fp).withWatermark(ts_col, watermark)
    if docs.isStreaming:
        return with_fp.dropDuplicatesWithinWatermark(["_fp"]).drop("_fp")
    return with_fp.dropDuplicates(["_fp"]).drop("_fp")


def enrich_stream(events: DataFrame, dim: DataFrame,
                  on: str = "user_id") -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins the static
    dimension (re-read per batch, so slowly-changing dims pick up
    updates). Spark plans the static side as a broadcast when it fits
    `autoBroadcastJoinThreshold` — the per-batch cost is a map-side
    hash join, no stream-side shuffle. Left join keeps events whose key
    has no dimension row (NULL-extended), matching the batch analog
    exactly."""
    return events.join(F.broadcast(dim), on, "left")


def correlate_streams(
    left: DataFrame,
    right: DataFrame,
    *,
    within_minutes: int = 10,
    watermark: str = "30 minutes",
    on: str = "user_id",
) -> DataFrame:
    """Watermarked stream-stream INTERVAL join: pair each left event
    with the right-stream events of the same key within
    ``[0, within_minutes]`` AFTER it (click→purchase attribution, the
    canonical funnel correlation). Both sides carry watermarks and the
    join predicate bounds the time skew, so each side's buffered state
    is limited to the watermark + interval horizon — the requirement
    for a stream-stream join to run with bounded memory at all.

    Works identically on batch frames (watermarks no-op), which is how
    the tests cross-check the streaming answer against a plain SQL
    interval join."""
    l = left.select(
        F.col(on).alias("_k"), F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_id"),
        F.col("event_type").alias("l_type"))
    r = right.select(
        F.col(on).alias("_rk"), F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_id"),
        F.col("event_type").alias("r_type"))
    if left.isStreaming:
        l = l.withWatermark("l_ts", watermark)
    if right.isStreaming:
        r = r.withWatermark("r_ts", watermark)
    cond = (
        (l["_k"] == r["_rk"])
        & (r["r_ts"] >= l["l_ts"])
        & (r["r_ts"] <= l["l_ts"] + F.expr(f"INTERVAL {within_minutes} MINUTES"))
    )
    return (
        l.join(r, cond)
        .select(F.col("_k").alias(on), "l_id", "l_type", "l_ts",
                "r_id", "r_type", "r_ts")
    )
