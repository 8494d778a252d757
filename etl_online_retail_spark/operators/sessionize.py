"""Gap-based event sessionization (events table; streaming twin in
streaming/events.py).

Classic two-window construction, fully distributed: lag(ts) per user ->
session-start flag when the gap exceeds the timeout -> running SUM of flags
is the per-user session index. Both windows partition by user_id (high
cardinality), so state per partition is one user's events - this scales
linearly and shuffles exactly once (both windows share the same
partitioning, Catalyst reuses the exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, user_col: str = "user_id", ts_col: str = "ts",
               gap_minutes: int = 30) -> DataFrame:
    """Attach session_seq (1-based per user) to every event.

    The gap test uses timestampdiff on TIMESTAMP_NTZ - pure wall-clock
    arithmetic, no session-timezone dependence (unlike unix_timestamp).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    # Exact microsecond gap test: second-granularity diffs truncate/count
    # boundaries differently across engines; at microseconds (the storage
    # resolution) the diff is exact integer arithmetic everywhere.
    gap_us = gap_minutes * 60 * 1_000_000
    return (events
            .withColumn("_prev", F.lag(ts_col).over(w))
            .withColumn(
                "_new",
                F.when(
                    F.col("_prev").isNull()
                    | (F.expr(f"timestampdiff(MICROSECOND, _prev, {ts_col})") > gap_us),
                    1,
                ).otherwise(0))
            .withColumn("session_seq",
                        F.sum("_new").over(
                            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .drop("_new", "_prev"))


def session_stats(events: DataFrame, user_col: str = "user_id", ts_col: str = "ts",
                  gap_minutes: int = 30) -> DataFrame:
    """One row per session: bounds, event count, value sum.

    Columns: user_id, session_seq, session_start, session_end, n_events,
    total_value (exact decimal sum cast to double).
    """
    s = sessionize(events, user_col, ts_col, gap_minutes)
    return (s.groupBy(user_col, "session_seq")
             .agg(F.min(ts_col).alias("session_start"),
                  F.max(ts_col).alias("session_end"),
                  F.count(F.lit(1)).alias("n_events"),
                  F.sum(F.col("value").cast("decimal(18,2)"))
                   .cast("double").alias("total_value")))
