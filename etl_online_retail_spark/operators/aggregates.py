"""Aggregation / ordering operators (SURVEY.md §2.5, §2.7, §2.8).

Grouped SUM (A1), global aggregates (A2), COUNT DISTINCT (A3/A4), ROLLUP
(A5), HAVING (F7), ORDER BY/LIMIT/top-k (O1-O3), month-grain series (T1).
All are single groupBy/rollup plans: Catalyst plans partial (map-side) +
final hash aggregation automatically, and top-k compiles to
TakeOrderedAndProject - no full sort is ever materialized for a LIMIT.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_online_retail_spark.functions.datetime_fns import month_start


def grouped(df: DataFrame, keys: Sequence[Column | str],
            aggs: Sequence[Column]) -> DataFrame:
    """A1/A3/A4: GROUP BY keys with aliased aggregate columns."""
    return df.groupBy(*keys).agg(*aggs)


def global_agg(df: DataFrame, aggs: Sequence[Column]) -> DataFrame:
    """A2: aggregate without keys (e.g. total revenue, MIN/MAX bounds)."""
    return df.agg(*aggs)


def rollup_agg(df: DataFrame, keys: Sequence[Column | str],
               aggs: Sequence[Column]) -> DataFrame:
    """A5: GROUP BY ROLLUP(keys) - hierarchy subtotals + grand total.

    The reference's ROLLUP(year, month, day) returned 323 rows =
    307 days + 13 months + 2 years + 1 total (superset.db#query[7]).
    """
    return df.rollup(*keys).agg(*aggs)


def having(df: DataFrame, keys: Sequence[Column | str],
           aggs: Sequence[Column], predicate: Column) -> DataFrame:
    """F7: post-aggregation filter (SQL HAVING)."""
    return df.groupBy(*keys).agg(*aggs).filter(predicate)


def top_k(df: DataFrame, keys: Sequence[Column | str], aggs: Sequence[Column],
          order: Sequence[Column], k: int) -> DataFrame:
    """O3: group, aggregate, ORDER BY ... LIMIT k.

    Callers pass a total order (metric DESC + key tiebreaker) so the k rows
    are deterministic under ties; Spark executes TakeOrderedAndProject
    (per-partition heaps, no global sort).
    """
    return df.groupBy(*keys).agg(*aggs).orderBy(*order).limit(k)


def monthly_series(df: DataFrame, ts_col: str, aggs: Sequence[Column]) -> DataFrame:
    """T1: DATE_TRUNC('month') time series (Superset P1M grain)."""
    return (df.groupBy(month_start(ts_col).alias("month_start"))
              .agg(*aggs)
              .orderBy("month_start"))


def count_distinct(col: str, alias: str) -> Column:
    """A3 exact COUNT(DISTINCT col). Use approx_count_distinct at the
    100 TB scale path when a ~2% error is acceptable (single pass, no
    per-group distinct expansion)."""
    return F.countDistinct(F.col(col)).alias(alias)


def approx_count_distinct(col: str, alias: str, rsd: float = 0.02) -> Column:
    """Scale variant of A3: HyperLogLog++ sketch, mergeable map-side."""
    return F.approx_count_distinct(F.col(col), rsd).alias(alias)
