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

    Boundary rule: a gap of EXACTLY gap_minutes stays in the SAME
    session (strict >) — Spark's native session_window splits there
    (half-open [start, prev+gap)); see session_windows_native /
    streaming.events.session_window_stats for that convention. Pick by
    the boundary semantics you need; each is oracle-verified under its
    own rule (r7 review).
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


def linear_attribution_credit(events: DataFrame,
                              touch_types: tuple[str, ...] = ("click",
                                                              "view"),
                              conversion_type: str = "purchase",
                              window_hours: int = 24,
                              user_col: str = "user_id",
                              ts_col: str = "ts") -> DataFrame:
    """Linear (equal-share) multi-touch attribution: every qualifying
    touch in the lookback window splits the conversion's value evenly —
    the complement of last_touch_attribution's winner-takes-all, and the
    version marketing mix analysis usually starts from.

    Needs the full touches x conversions pair set (not just the latest
    carry), so it uses the bounded range-join shape
    (joins.range_self_join_within): window-sized time bins, touches
    duplicated into their own + next bin, equi-join on (user, bin), then
    the exact [0, window] + strictly-before predicate. Candidates are
    bounded by bin population, never the per-user cross product.

    Output: (attributed_type, n_credits BIGINT, credit DOUBLE) — one row
    per touch type plus a 'none' row carrying the full value of
    conversions no touch reaches. Per-pair credit = value / n_touches is
    rounded to 9dp and summed as DECIMAL(18,9) (order-independent), so
    the result is oracle-hash-exact.
    """
    us = F.expr(f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01', "
                f"{ts_col})")
    window_us = window_hours * 3600 * 1_000_000
    base = events.select(F.col(user_col).alias("_u"), "event_id",
                         "event_type", F.col("value"), us.alias("_us"))
    bin_ = F.floor(F.col("_us") / F.lit(window_us))
    touches = (base.filter(F.col("event_type").isin(*touch_types))
               .select("_u", F.col("event_id").alias("_tid"),
                       F.col("event_type").alias("attributed_type"),
                       F.col("_us").alias("_tus"),
                       F.explode(F.array(bin_, bin_ + 1)).alias("_bin")))
    convs = (base.filter(F.col("event_type") == conversion_type)
             .select("_u", F.col("event_id").alias("_cid"),
                     F.col("value"), F.col("_us").alias("_cus"),
                     bin_.alias("_bin"))
             .cache())  # feeds the pair join AND the unattributed anti-join
    gap = F.col("_cus") - F.col("_tus")
    strictly_before = ((F.col("_tus") < F.col("_cus"))
                       | ((F.col("_tus") == F.col("_cus"))
                          & (F.col("_tid") < F.col("_cid"))))
    # cache: pairs feed the per-conversion count window, the credit agg
    # AND the attributed-conversion set (rule 7)
    pairs = (touches.join(convs, ["_u", "_bin"])
             .filter(strictly_before & (gap >= 0) & (gap <= window_us))
             .select("_cid", "attributed_type", "value",
                     F.count(F.lit(1)).over(
                         Window.partitionBy("_cid")).alias("_nt"))
             .cache())
    contrib = (F.round(F.col("value") / F.col("_nt"), 9)
               .cast("decimal(18,9)"))
    touched = (pairs
               .groupBy("attributed_type")
               .agg(F.count(F.lit(1)).alias("n_credits"),
                    F.round(F.sum(contrib).cast("double"), 6)
                     .alias("credit")))
    # alias the probe side's id: pairs descends from convs, so a
    # convs._cid == pairs._cid condition trips self-join attribute
    # disambiguation (the excise_spans lesson)
    attributed_ids = (pairs.select(F.col("_cid").alias("_pcid"))
                      .distinct())
    unattributed = (convs
                    .join(attributed_ids,
                          F.col("_cid") == F.col("_pcid"), "left_anti")
                    .agg(F.count(F.lit(1)).alias("n_credits"),
                         # COALESCE: zero unreached conversions must
                         # yield credit 0.0, not NULL (consumers sum it)
                         F.round(F.coalesce(
                             F.sum(F.col("value").cast("decimal(18,2)")),
                             F.lit(0).cast("decimal(18,2)"))
                             .cast("double"), 6).alias("credit"))
                    .select(F.lit("none").alias("attributed_type"),
                            "n_credits", "credit"))
    return touched.unionByName(unattributed)


def last_touch_attribution(events: DataFrame,
                           touch_types: tuple[str, ...] = ("click", "view"),
                           conversion_type: str = "purchase",
                           window_hours: int = 24,
                           user_col: str = "user_id",
                           ts_col: str = "ts") -> DataFrame:
    """Last-touch marketing attribution: credit each conversion to the
    most recent preceding touch event by the same user within the lookback
    window, or to 'none' when no touch qualifies.

    Single ordered pass per user (the sessionize shape — one shuffle on
    user_col, both carried values share the exchange): each row carries
    the last touch's (type, ts) via last(ignorenulls) over the strictly
    preceding frame; conversion rows then test the lookback bound in exact
    microsecond arithmetic (the module's cross-engine gap discipline).
    No self-join of conversions against touches — at 100 TB the windowed
    pass is one shuffle, vs a range join whose per-user fan-out is
    touches x conversions.

    Output: one row per conversion event — (event_id, user_col,
    attributed_type STRING, lag_us BIGINT nullable, value). Aggregate
    downstream for per-channel credit.
    """
    w = (Window.partitionBy(user_col).orderBy(ts_col, "event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    is_touch = F.col("event_type").isin(*touch_types)
    touch_ts = F.when(is_touch, F.col(ts_col))
    touch_type = F.when(is_touch, F.col("event_type"))
    window_us = window_hours * 3600 * 1_000_000
    carried = (events
               .withColumn("_t_ts", F.last(touch_ts, ignorenulls=True).over(w))
               .withColumn("_t_type",
                           F.last(touch_type, ignorenulls=True).over(w)))
    lag_us = F.expr(f"timestampdiff(MICROSECOND, _t_ts, {ts_col})")
    in_window = F.col("_t_ts").isNotNull() & (lag_us <= window_us)
    return (carried
            .filter(F.col("event_type") == conversion_type)
            .select("event_id", user_col,
                    F.when(in_window, F.col("_t_type"))
                     .otherwise(F.lit("none")).alias("attributed_type"),
                    F.when(in_window, lag_us).cast("bigint").alias("lag_us"),
                    "value"))
