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
    # session windows never overlap per user (checked in Python: Spark
    # cannot self-join a memory-sink view - its watermark column metadata
    # breaks attribute resolution)
    by_user: dict[int, list[tuple]] = {}
    for r in sessions.collect():
        by_user.setdefault(r.user_id, []).append((r.session_start, r.session_end))
    for windows in by_user.values():
        windows.sort()
        for (s1, e1), (s2, _) in zip(windows, windows[1:]):
            assert s2 >= e1, f"overlapping sessions: {(s1, e1)} vs {s2}"
