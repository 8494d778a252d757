"""Time-series resampling: gap-fill to a regular grid + LOCF, and
gaps-and-islands streak detection.

The reference's event analytics (SURVEY §2.6/§2.8: hourly rollups, rolling
windows, sessionization) all aggregate the rows that EXIST; a dashboard or
feature pipeline consuming them also needs the rows that DON'T — a sensor
that went quiet still has an hourly row (carrying the last observation
forward), and "how many consecutive days was this user active" is a
question about the holes, not the rows. These are the two canonical
hypertable operators (Timescale's time_bucket_gapfill/locf and the classic
gaps-and-islands pattern), expressed Spark-first.

Scale shape (100 TB lens):
  * gapfill_locf: one groupBy per (key, bucket) for the observed grid
    (map-side combinable), one per-key min/max agg (tiny), a spine explode
    whose row count is keys x buckets (the OUTPUT size — nothing is
    amplified beyond what the result needs), and ONE window pass
    partitioned by key for the carry-forward. Every stage shuffles on the
    key, so AQE coalesces them onto one exchange layout; per-key state in
    the window is a single value (the last observation), never the series.
  * activity_streaks: distinct (key, day) -> one window (row_number per
    key) -> two aggregations. The row_number-minus-date trick turns
    consecutive-run detection into a groupBy — no self-join, no
    iteration; integer/date arithmetic only, so it is oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# Per-key series ceiling for the batch sequential folds (ewma_last /
# holt_last). The folds are bit-exact BECAUSE they replay the key's
# whole series in IEEE order — any chunked/associative re-combination
# reassociates float additions and breaks the oracle hash — so the
# per-key aggregation state is the series itself. This cap turns the
# silent OOM a 10^8-event hot key would cause into a loud, actionable
# error BEFORE the collect buffers anything (a count pre-pass + a
# broadcast of the over-cap keys, normally empty).
MAX_SERIES_DEFAULT = 1_000_000


def _series_cap_guard(events: DataFrame, key_col: str, op: str,
                      cap: int | None) -> DataFrame:
    """Fail loudly if any key's series exceeds `cap` observations.

    One map-combinable count aggregation (state: one int64 per key, never
    the series) finds over-cap keys; the normally-EMPTY over-cap relation
    broadcasts back and a raise_error fires on the first matching row —
    before collect_list has buffered an unbounded series. cap=None skips
    the pre-pass for callers that have bounded series by construction."""
    if cap is None:
        return events
    over = (events.groupBy(key_col)
            .agg(F.count(F.lit(1)).alias("_series_n"))
            .filter(F.col("_series_n") > cap)
            .select(key_col, "_series_n"))
    guarded = events.join(F.broadcast(over), [key_col], "left")
    msg = F.concat(
        F.lit(f"{op}: series for key '"), F.col(key_col).cast("string"),
        F.lit("' has "), F.col("_series_n").cast("string"),
        F.lit(f" observations (> max_series={cap}). The batch fold "
              "holds the whole series per key; route unbounded series "
              "to the streaming twin (streaming/stateful.py) or raise "
              "max_series explicitly."))
    return (guarded
            .withColumn("_series_ok",
                        F.when(F.col("_series_n").isNull(), F.lit(True))
                         .otherwise(F.raise_error(msg)))
            .filter(F.col("_series_ok"))
            .drop("_series_n", "_series_ok"))


def gapfill_locf(events: DataFrame, key_col: str, ts_col: str,
                 value_col: str, tiebreak_col: str,
                 step: str = "hour") -> DataFrame:
    """Regularize an event stream to one row per (key, bucket) with gaps
    filled by last-observation-carried-forward.

    The observed value of a bucket is the value of the LAST event inside
    it (ordered by (ts, tiebreak) so ties are deterministic); buckets
    between a key's first and last event with no observation inherit the
    previous bucket's value. The spine starts at each key's first active
    bucket, so every output row has a defined value (no leading NULLs).

    Output: (key_col, bucket TIMESTAMP_NTZ, value_filled, is_observed).
    """
    bucket = F.date_trunc(step, F.col(ts_col)).alias("bucket")
    ev = events.select(F.col(key_col), bucket, F.col(ts_col),
                       F.col(tiebreak_col), F.col(value_col))
    observed = ev.groupBy(key_col, "bucket").agg(
        F.max_by(F.col(value_col),
                 F.struct(F.col(ts_col), F.col(tiebreak_col))).alias("_obs"))
    bounds = ev.groupBy(key_col).agg(F.min("bucket").alias("_b0"),
                                     F.max("bucket").alias("_b1"))
    spine = bounds.select(
        key_col,
        F.explode(F.sequence("_b0", "_b1",
                             F.expr(f"INTERVAL 1 {step}"))).alias("bucket"))
    w = (Window.partitionBy(key_col).orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (spine
            .join(observed, [key_col, "bucket"], "left")
            .select(F.col(key_col), F.col("bucket"),
                    F.last("_obs", ignorenulls=True).over(w)
                     .alias("value_filled"),
                    F.col("_obs").isNotNull().alias("is_observed")))


def activity_streaks(events: DataFrame, key_col: str,
                     ts_col: str) -> DataFrame:
    """Per-key streak summary over consecutive ACTIVE DAYS.

    A streak is a maximal run of consecutive calendar days each containing
    at least one event. Detection is the gaps-and-islands identity: over a
    key's distinct active days in order, `day - row_number` is constant
    exactly within a consecutive run, so one window plus one groupBy finds
    every island without self-joins.

    Output: (key_col, n_active_days INT, n_streaks INT, longest_streak INT,
    longest_streak_start DATE — earliest start among maximal streaks).
    """
    days = (events
            .select(F.col(key_col), F.to_date(F.col(ts_col)).alias("day"))
            .distinct())
    rn = F.row_number().over(
        Window.partitionBy(key_col).orderBy("day"))
    anchored = days.withColumn("_anchor", F.date_sub(F.col("day"), rn))
    islands = anchored.groupBy(key_col, "_anchor").agg(
        F.count(F.lit(1)).alias("_len"),
        F.min("day").alias("_start"))
    return islands.groupBy(key_col).agg(
        F.sum("_len").cast("int").alias("n_active_days"),
        F.count(F.lit(1)).cast("int").alias("n_streaks"),
        F.max("_len").cast("int").alias("longest_streak"),
        F.min_by(F.col("_start"),
                 F.struct((-F.col("_len")).alias("l"),
                          F.col("_start").alias("s")))
         .alias("longest_streak_start"))


def time_weighted_avg(events: DataFrame, key_col: str, ts_col: str,
                      value_col: str, tiebreak_col: str,
                      end_ts: Column) -> DataFrame:
    """Per-key time-weighted average of a step series (LOCF semantics):
    each observation's value is weighted by the time it REMAINED current —
    until the next observation, or `end_ts` for the last one. The metric a
    billing/utilization pipeline wants from irregular samples, where the
    plain AVG over-weights bursts of frequent updates.

    Exactness: the whole accumulation is int64 — values become CENTS
    (the corpus convention: value is 2dp-representable, cast through
    DECIMAL(18,2)), weights are MILLISECOND gaps, and cents x ms stays
    under 2^63 for any month-scale horizon (micros x cents would not).
    The single final division runs in DOUBLE on both engines. Updates
    inside the same millisecond get weight 0 and drop out — on both
    engines identically (documented semantics: only the last sub-ms
    update holds the value). One window pass (lead) per key, one
    aggregation; scales like any keyed window.

    Output: (key_col, twa DOUBLE, total_ms BIGINT).
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col),
                                            F.col(tiebreak_col))
    # clamp to the horizon BOTH ways (r7 review): an observation at or
    # after end_ts contributes nothing (ts < _end filter), and the last
    # in-horizon observation's weight stops AT end_ts even when a later
    # out-of-horizon observation exists (least(..., _end)) — otherwise a
    # late event silently extends the previous value's weight past the
    # averaging window. No-op when end_ts >= max(ts), the registered
    # query's global-max idiom.
    nxt = F.least(F.coalesce(F.lead(F.col(ts_col)).over(w), F.col("_end")),
                  F.col("_end"))
    weighted = (events
                .select(F.col(key_col), F.col(ts_col), F.col(value_col),
                        F.col(tiebreak_col), end_ts.alias("_end"))
                .withColumn("_next", nxt)
                .filter(F.col(ts_col) < F.col("_end"))
                .withColumn("_gap", F.expr(
                    f"timestampdiff(MILLISECOND, {ts_col}, _next)")
                    .cast("bigint"))
                .filter(F.col("_gap") > 0))
    cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast("bigint")
    num = F.sum(cents * F.col("_gap"))
    den = F.sum("_gap")
    return weighted.groupBy(key_col).agg(
        F.round(num.cast("double") / den.cast("double") / F.lit(100.0), 6)
         .alias("twa"),
        den.cast("bigint").alias("total_ms"))


def holt_last(events: DataFrame, key_col: str, ts_col: str,
              tiebreak_col: str, value_col: str,
              alpha: float = 0.5, beta: float = 0.5,
              max_series: int | None = MAX_SERIES_DEFAULT) -> DataFrame:
    """Per-key Holt double exponential smoothing (level + linear trend)
    over the event-time order — the forecasting step past ewma_last,
    which tracks level only and lags any trending series:

        l_1 = x_1,  b_1 = 0
        l_i = alpha * x_i + (1 - alpha) * (l_{i-1} + b_{i-1})
        b_i = beta * (l_i - l_{i-1}) + (1 - beta) * b_{i-1}

    Output: (key_col, level, trend, forecast_1, n_obs) — forecast_1 =
    level + trend, the one-step-ahead prediction a capacity/demand
    pipeline reads per series.

    Same exactness argument as ewma_last: a sequential fold expressed AS
    a sequential fold, identical order and identical IEEE ops on both
    engines, so the recursive definition is hash-verifiable; default
    alpha = beta = 0.5 keeps every multiply an exact halving. Same scale
    note too: per-key state is the key's own collected series, so the
    max_series guard (count pre-pass, loud error) bounds it; unbounded
    series use the streaming twin (streaming/stateful.holt_stream)
    carrying TWO numbers of state.
    """
    events = _series_cap_guard(events, key_col, "holt_last", max_series)
    arr = F.array_sort(F.collect_list(
        F.struct(F.col(ts_col), F.col(tiebreak_col),
                 F.col(value_col).alias("_v"))))
    vals = F.transform(arr, lambda s: s["_v"])
    zero = F.struct(F.lit(None).cast("double").alias("l"),
                    F.lit(None).cast("double").alias("t"))

    def step(acc, x):
        new_l = (F.lit(alpha) * x
                 + F.lit(1.0 - alpha) * (acc["l"] + acc["t"]))
        new_t = (F.lit(beta) * (new_l - acc["l"])
                 + F.lit(1.0 - beta) * acc["t"])
        return F.when(acc["l"].isNull(),
                      F.struct(x.alias("l"), F.lit(0.0).alias("t"))) \
                .otherwise(F.struct(new_l.alias("l"), new_t.alias("t")))

    fold = F.aggregate(vals, zero, step)
    return (events.groupBy(key_col)
            .agg(F.round(fold["l"], 6).alias("level"),
                 F.round(fold["t"], 6).alias("trend"),
                 F.round(fold["l"] + fold["t"], 6).alias("forecast_1"),
                 F.count(F.lit(1)).alias("n_obs")))


def rolling_zscore_anomalies(events: DataFrame, key_col: str, ts_col: str,
                             tiebreak_col: str, value_col: str,
                             lookback: int = 10, min_obs: int = 5,
                             threshold: float = 3.0) -> DataFrame:
    """Per-key rolling z-score anomaly gate: flag an observation whose
    value sits more than `threshold` sample standard deviations from the
    mean of its own trailing window — the classic self-calibrating
    monitor for metric streams (each key learns its own level/volatility,
    unlike a global cutoff; the MAD gate in operators/aggregates.py is
    the batch-robust sibling, this is the ROLLING per-point one).

    The baseline frame is the `lookback` rows STRICTLY BEFORE the row
    (never the row itself — a spike must not inflate the baseline that
    judges it) and needs >= min_obs observations, so series heads go
    unjudged rather than wrongly judged.

    Exactness: window sums accumulate int64 CENTS and cents² (exact;
    the cents² frame sum stays under 2^63 for |value| up to
    sqrt(2^63 / lookback) cents — ~$9.6M at the default lookback of
    10; beyond that, pre-scale the value or shrink the frame). Mean,
    sample variance and the z-score then run in DOUBLE as row-local
    arithmetic on those exact integers, z rounds to 6dp — deterministic
    on both engines (no float reduction order anywhere). Zero-variance
    baselines emit no row (any deviation from a flat baseline is
    infinite-z; callers wanting that case filter _sd = 0 upstream).

    One keyed window pass (three frame aggregates share one exchange +
    sort), then a pure filter — scales like sessionization.

    Output: (key_col, event_id/tiebreak, ts, value DOUBLE, baseline_n
    BIGINT, zscore DOUBLE) for anomalous rows only.
    """
    w = (Window.partitionBy(key_col)
         .orderBy(F.col(ts_col), F.col(tiebreak_col))
         .rowsBetween(-lookback, -1))
    cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast("bigint")
    base = (events
            .withColumn("_c", cents)
            # pre-project the square: a computed expression INSIDE a
            # window aggregate forces Catalyst to split a second Window
            # node off for it; over a plain column all three frame
            # aggregates plan into ONE Window pass (plan-asserted)
            .withColumn("_c2", F.col("_c") * F.col("_c"))
            .withColumn("_n", F.count("_c").over(w))
            .withColumn("_s", F.sum("_c").over(w))
            .withColumn("_s2", F.sum("_c2").over(w)))
    n = F.col("_n").cast("double")
    mean = F.col("_s").cast("double") / n
    # sample variance in cents^2: (s2 - s^2/n) / (n - 1), exact inputs
    var = ((F.col("_s2").cast("double")
            - F.col("_s").cast("double") * F.col("_s").cast("double") / n)
           / (n - F.lit(1.0)))
    sd = F.sqrt(var)
    z = (F.col("_c").cast("double") - mean) / sd
    return (base
            .filter((F.col("_n") >= min_obs) & (sd > 0)
                    & (F.abs(z) > threshold))
            .select(F.col(key_col), F.col(tiebreak_col), F.col(ts_col),
                    F.col(value_col),
                    F.col("_n").cast("bigint").alias("baseline_n"),
                    F.round(z, 6).alias("zscore")))


def ewma_last(events: DataFrame, key_col: str, ts_col: str,
              tiebreak_col: str, value_col: str,
              alpha: float = 0.5,
              max_series: int | None = MAX_SERIES_DEFAULT) -> DataFrame:
    """Per-key exponentially weighted moving average over the event-time
    order, seeded with the first observation:

        ewma_1 = x_1;   ewma_i = alpha * x_i + (1 - alpha) * ewma_{i-1}

    Output: (key_col, ewma DOUBLE 6dp, n_obs BIGINT) — the smoothed
    "current level" a monitoring/forecasting pipeline reads per series.

    EWMA is inherently a SEQUENTIAL fold (each step depends on the
    last), so it is expressed as exactly that: collect the key's values
    in (ts, tiebreak) order and fold once — the same fold, in the same
    order, with the same float ops on both engines, which makes a
    recursive definition hash-verifiable (the repo's sequential-fold
    rule). alpha = 0.5 keeps every multiply an exact halving.

    Scale note: per-key state is the key's OWN series (collect_list),
    bounded by the max_series guard — a key past the cap fails loudly
    BEFORE the collect buffers it (one count pre-pass + broadcast of
    the normally-empty over-cap keys). An unbounded series wants the
    incremental form (carry the previous EWMA in streaming state,
    streaming/stateful.py's shape) rather than a bigger collect.
    """
    events = _series_cap_guard(events, key_col, "ewma_last", max_series)
    arr = F.array_sort(F.collect_list(
        F.struct(F.col(ts_col), F.col(tiebreak_col),
                 F.col(value_col).alias("_v"))))
    vals = F.transform(arr, lambda s: s["_v"])
    fold = F.aggregate(
        vals, F.lit(None).cast("double"),
        lambda acc, x: F.coalesce(F.lit(alpha) * x
                                  + F.lit(1.0 - alpha) * acc, x))
    return (events.groupBy(key_col)
            .agg(F.round(fold, 6).alias("ewma"),
                 F.count(F.lit(1)).alias("n_obs")))
