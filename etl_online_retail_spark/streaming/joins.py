"""Streaming joins: stream-static enrichment and stream-stream correlation.

Stream-static: each micro-batch hash-joins against the (broadcastable)
static side - the streaming form of the J1/J2 dimension lookup; no state.

Stream-stream: both sides watermarked, with a time-range join condition so
Spark can bound the buffered state (events outside the range expire). The
example correlates each user's purchase with a signup in the preceding
hour - the standard funnel join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_static(events: DataFrame, dim: DataFrame,
                       on: str = "user_id") -> DataFrame:
    """Stream-static broadcast enrichment (no streaming state)."""
    return events.join(F.broadcast(dim), on=on, how="left")


def dedup_within_watermark(events: DataFrame, key: str = "event_id",
                           watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup: drop repeats of key arriving within the
    watermark horizon (at-least-once source -> effectively-once stream).
    State = one entry per key seen inside the horizon, then evicted."""
    return (events
            .withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark([key]))


def purchases_after_signup(events: DataFrame, within_minutes: int = 60,
                           watermark: str = "2 hours",
                           how: str = "inner") -> DataFrame:
    """Stream-stream join: purchases within N minutes of the same user's
    signup. Both sides carry watermarks + a bounded time-range predicate,
    so buffered state expires (state ~ events inside the watermark horizon).

    how='left_outer' emits unmatched purchases with NULL signup columns -
    but only once the watermark has passed their join window (purchases
    newer than max_event_time - watermark - range stay pending at stream
    end; that is correct streaming semantics, not data loss).
    """
    signups = (events.filter(F.col("event_type") == "signup")
               .select(F.col("user_id").alias("s_user"),
                       F.col("ts").alias("signup_ts"))
               .withWatermark("signup_ts", watermark))
    purchases = (events.filter(F.col("event_type") == "purchase")
                 .select(F.col("user_id").alias("p_user"),
                         F.col("ts").alias("purchase_ts"),
                         F.col("value").alias("purchase_value"))
                 .withWatermark("purchase_ts", watermark))
    cond = (
        (signups.s_user == purchases.p_user)
        & (purchases.purchase_ts > signups.signup_ts)
        & (purchases.purchase_ts
           <= signups.signup_ts + F.expr(f"INTERVAL {within_minutes} MINUTES"))
    )
    return (purchases.join(signups, cond, how)
            .select(F.col("p_user").alias("user_id"),
                    "signup_ts", "purchase_ts", "purchase_value"))
