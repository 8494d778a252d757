"""Exact money arithmetic (SURVEY.md §1.2, §7 "DECIMAL(8,2) money").

The reference stores unit_price as DECIMAL(8,2) (init_db.sql:40) and every
BI metric is SUM(quantity * unit_price) (superset.db). The testdata carries
prices/discounts as float64; we cast to decimal BEFORE multiplying and
summing so aggregation is exact and therefore order-independent - a double
SUM differs in last-ulp between any two engines (and between two Spark runs
with different partitioning), an exact decimal SUM never does. The final
metric is cast back to double for a stable, engine-neutral column type.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# SQL fragments with identical semantics in Spark SQL and DuckDB; kept next
# to the Column builders so the two can never drift.
REVENUE_SQL = ("CAST(l_extendedprice AS DECIMAL(18,2)) * "
               "CAST(1.0 - l_discount AS DECIMAL(18,4))")
PRICE_SQL = "CAST({col} AS DECIMAL(18,2))"


def exact(col: Column | str, scale: int = 2) -> Column:
    """Cast a float money column to exact decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def net_revenue(price: str = "l_extendedprice", discount: str = "l_discount") -> Column:
    """price * (1 - discount), exact: decimal(18,2) * decimal(18,4)."""
    return exact(price, 2) * (F.lit(1.0) - F.col(discount)).cast("decimal(18,4)")


def sum_money(expr: Column, alias: str) -> Column:
    """Exact SUM then a deterministic cast to double for the result column."""
    return F.sum(expr).cast("double").alias(alias)


def avg_money(expr: Column, alias: str) -> Column:
    """Order-independent average: exact SUM / COUNT, divided as doubles."""
    return (F.sum(expr).cast("double") / F.count(expr)).alias(alias)
