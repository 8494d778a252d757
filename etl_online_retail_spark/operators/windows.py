"""Window-function operators (SURVEY.md §2.6).

The reference implies two window needs - keep-last dedup (etl.py:104,114 ->
operators/dedup.py) and Superset's series-limit top-N - and has nothing
else; Spark gives the full surface, exposed here: ranking, lag/lead, frame
running totals, top-n per group.

Scale note: every window shuffles on its partition keys. Partition by a
high-cardinality key (customer, user) so state per partition stays small;
an ORDER BY window without PARTITION BY is a single-partition sort and is
deliberately not offered here (see surrogate.py for the one justified use).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ranked(df: DataFrame, partition: Sequence[str], order: Sequence[Column],
           alias: str = "rn", method: str = "row_number") -> DataFrame:
    """Attach row_number/rank/dense_rank over partition/order."""
    fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[method]
    w = Window.partitionBy(*partition).orderBy(*order)
    return df.withColumn(alias, fn().over(w))


def top_n_per_group(df: DataFrame, partition: Sequence[str],
                    order: Sequence[Column], n: int) -> DataFrame:
    """Superset 'series limit': keep the n best rows per group."""
    return (ranked(df, partition, order, "_rn")
            .filter(F.col("_rn") <= n)
            .drop("_rn"))


def running_total(df: DataFrame, partition: Sequence[str], order: Sequence[Column],
                  value: Column, alias: str) -> DataFrame:
    """Cumulative sum: rowsBetween(unboundedPreceding, currentRow)."""
    w = (Window.partitionBy(*partition).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return df.withColumn(alias, F.sum(value).over(w))


def with_lag(df: DataFrame, partition: Sequence[str], order: Sequence[Column],
             col: str, alias: str, offset: int = 1) -> DataFrame:
    """lag(col, offset) over partition/order (basis for sessionization)."""
    w = Window.partitionBy(*partition).orderBy(*order)
    return df.withColumn(alias, F.lag(col, offset).over(w))
