"""Structured Streaming surface (absent in the reference - SURVEY.md §2.10
notes the DAG is batch-only; this is the M6 extension)."""

from etl_online_retail_spark.streaming.events import (  # noqa: F401
    hourly_event_counts,
    read_event_stream,
    session_window_stats,
    sliding_value_avg,
)
