"""Ops / data-quality demo: the day-2 loop a platform team runs on a
warehouse this engine serves.

    profile  ->  suggest constraints  ->  measure key skew
             ->  mitigate (salted join, result-identical)
             ->  time-series health views (gap-fill, streaks, TWA)

Each stage is a first-class operator with an oracle-verified query twin
(orders_profile, orders_constraint_suggestions, user_key_skew,
salted_revenue_by_nation, events_gapfill_locf, user_activity_streaks,
user_value_twa). Run: python scripts/demo_ops.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from etl_online_retail_spark.catalog import load_table
from etl_online_retail_spark.operators.profile import (
    key_skew_stats,
    profile_table,
    suggest_constraints,
)
from etl_online_retail_spark.operators.timeseries import (
    activity_streaks,
    gapfill_locf,
)
from etl_online_retail_spark.session import get_spark


def run_ops(spark, sf_dir: str) -> dict:
    """The loop as data: returns each stage's result for assertions."""
    orders = load_table(spark, "orders", sf_dir)
    events = load_table(spark, "events", sf_dir)

    prof = profile_table(orders).collect()
    sugg = suggest_constraints(profile_table(orders)).collect()
    skew = key_skew_stats(events, "user_id").collect()[0]

    gaps = gapfill_locf(events.filter(F.col("user_id") % 10 == 0),
                        "user_id", "ts", "value", tiebreak_col="event_id")
    gap_share = (gaps.agg(
        (F.sum(F.when(~F.col("is_observed"), 1).otherwise(0))
         / F.count(F.lit(1))).alias("s")).collect()[0].s)
    streaks = activity_streaks(events, "user_id", "ts")
    longest = streaks.agg(F.max("longest_streak").alias("m")).collect()[0].m

    return {"profile": prof, "suggestions": sugg, "skew": skew,
            "gap_share": gap_share, "longest_streak": longest}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("demo-ops")
    out = run_ops(spark, sf_dir)

    print("\n== column profile (orders, one scan) ==")
    for r in out["profile"]:
        rng = (f"[{r.numeric_min}, {r.numeric_max}]"
               if r.numeric_min is not None else
               f"['{r.str_min}'..'{r.str_max}']")
        print(f"  {r.col_name:16s} nulls={r.n_null:<4d} "
              f"distinct={r.n_distinct:<7d} range={rng}")

    print("== suggested constraints ==")
    for r in out["suggestions"]:
        det = f" ({r.detail})" if r.detail else ""
        print(f"  {r.col_name:16s} {r.rule}{det}")

    s = out["skew"]
    print("== key skew: events.user_id ==")
    print(f"  {s.n_keys} keys over {s.n_rows} rows; max={s.max_key_rows} "
          f"p50={s.p50_key_rows} p99={s.p99_key_rows} "
          f"top_share={s.top_share} gini={s.gini}")
    verdict = ("uniform enough — no salting needed"
               if s.gini < 0.4 else "skewed — consider salted_join")
    print(f"  -> {verdict}")

    print("== time-series health ==")
    print(f"  gap-filled share of hourly buckets: {out['gap_share']:.1%}")
    print(f"  longest user activity streak: {out['longest_streak']} days")


if __name__ == "__main__":
    main()
