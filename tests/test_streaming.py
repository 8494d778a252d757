"""Structured Streaming: stream results must equal the batch twins
(the oracle-checked workload queries) on the same files."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_online_retail_spark.catalog import load_events
from etl_online_retail_spark.streaming.events import (
    hourly_event_counts,
    read_event_stream,
    run_to_memory,
    session_window_stats,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def batch_events(spark):
    return load_events(spark, SF).cache()


def test_stream_hourly_equals_batch(spark, batch_events):
    stream = read_event_stream(spark, SF)
    run_to_memory(hourly_event_counts(stream), "stream_hourly")
    got = {(r.hour_start, r.event_type): (r.n_events, r.total_value)
           for r in spark.table("stream_hourly").collect()}
    want = {(r.hour_start, r.event_type): (r.n_events, r.total_value)
            for r in (batch_events
                      .groupBy(F.window("ts", "1 hour").start.alias("hour_start"),
                               "event_type")
                      .agg(F.count(F.lit(1)).alias("n_events"),
                           F.sum(F.col("value").cast("decimal(18,2)"))
                            .cast("double").alias("total_value"))
                      .collect())}
    assert got == want


def test_stream_session_windows_cover_all_events(spark, batch_events):
    stream = read_event_stream(spark, SF)
    run_to_memory(session_window_stats(stream, gap="30 minutes"),
                  "stream_sessions")
    sessions = spark.table("stream_sessions")
    total_events = sessions.agg(F.sum("n_events")).collect()[0][0]
    assert total_events == batch_events.count()
    # session windows never overlap per user
    overlaps = (sessions.alias("a").join(
        sessions.alias("b"),
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.session_start") < F.col("b.session_start"))
        & (F.col("b.session_start") < F.col("a.session_end"))).count())
    assert overlaps == 0
