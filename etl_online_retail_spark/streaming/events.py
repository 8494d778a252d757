"""Structured Streaming over the events table.

readStream -> transformations -> writeStream with watermarked event-time
windows; the batch twins in workload.py (events_hourly, session_stats) give
these oracle-checked semantics, and tests/test_streaming.py asserts
stream-vs-batch equivalence with Trigger.AvailableNow on the same files.

Scale notes: tumbling/sliding windows + watermark keep state bounded by
(watermark horizon x key cardinality); session_window state is per active
session only. All aggregation state lives in the state store, partitioned
by the grouping keys - the same shuffle layout as the batch twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_online_retail_spark.catalog import (
    _EVENTS_NANOS_SCHEMA,
    SCHEMAS,
    events_stores_nanos,
    table_path,
)
from etl_online_retail_spark.session import ensure_session_confs


def _as_stream_dir(path: str) -> str:
    """Spark's file stream source watches DIRECTORIES. The testdata table
    is a single parquet file, so stage a scratch dir containing a symlink
    to it (real deployments land files into a directory anyway)."""
    import hashlib
    import os
    import tempfile

    if os.path.isdir(path):
        return path
    # deterministic per source path: streaming checkpoints record the source
    # directory, so re-creating the stream must yield the SAME directory
    tag = hashlib.sha256(path.encode()).hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), f"events-stream-{tag}")
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, os.path.basename(path))
    if not os.path.exists(link):
        os.symlink(path, link)
    return d


def read_event_stream(spark: SparkSession, sf_dir: str,
                      max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream of the events table (same flavor handling as
    the batch catalog loader)."""
    ensure_session_confs(spark)
    path = table_path(sf_dir, "events")
    nanos = events_stores_nanos(spark, path)  # batch footer sniff, driver-side
    raw = (spark.readStream
           .schema(_EVENTS_NANOS_SCHEMA if nanos else SCHEMAS["events"])
           .option("maxFilesPerTrigger", max_files_per_trigger)
           .parquet(_as_stream_dir(path)))
    # Watermarks demand TIMESTAMP (not NTZ): with the session pinned to UTC
    # (ensure_session_confs) the LTZ instant's wall-clock rendering equals
    # the batch loader's NTZ values — timestamp_micros for legacy nano
    # longs, a plain NTZ->LTZ cast for the micros flavor.
    ts = (F.timestamp_micros(F.expr("ts DIV 1000")) if nanos
          else F.col("ts").cast("timestamp")).alias("ts")
    return raw.select("event_id", ts, "user_id", "event_type", "value", "props")


def hourly_event_counts(events: DataFrame,
                        watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour windows per event_type; late rows beyond the
    watermark are dropped and window state is evicted past it."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", "1 hour").start.alias("hour_start"),
                     "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast("decimal(18,2)"))
                  .cast("double").alias("total_value")))


def sliding_value_avg(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Sliding 1-hour windows every 15 minutes: average event value."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", "1 hour", "15 minutes").start
                      .alias("window_start"))
            .agg((F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                  / F.count(F.lit(1))).alias("avg_value"),
                 F.count(F.lit(1)).alias("n_events")))


def session_window_stats(events: DataFrame, gap: str = "30 minutes",
                         watermark: str = "2 hours") -> DataFrame:
    """Native session windows (gap-based) — the streaming sibling of
    the BATCH session_window query (workload.session_windows_native),
    with which it shares Spark's boundary rule: a gap of EXACTLY `gap`
    STARTS a new session (the window is half-open [start, prev+gap)).
    operators/sessionize.py deliberately keeps the strict-> rule on
    both engines instead — the two surfaces differ on boundary-exact
    gaps (r7 review; also noted on session_windows_native's oracle)."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy("user_id", F.session_window("ts", gap))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast("decimal(18,2)"))
                  .cast("double").alias("total_value"))
            .select("user_id",
                    F.col("session_window.start").alias("session_start"),
                    F.col("session_window.end").alias("session_end"),
                    "n_events", "total_value"))


def run_to_memory(stream_df: DataFrame, table_name: str) -> None:
    """Drain the whole file source into an in-memory sink (test/dev helper):
    Trigger.AvailableNow processes everything then stops."""
    q = (stream_df.writeStream
         .format("memory")
         .queryName(table_name)
         .outputMode("complete")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
