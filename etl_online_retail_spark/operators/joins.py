"""Join operators (SURVEY.md §2.4 J1-J3).

The reference does pandas hash-merges for surrogate-key lookups
(etl.py:216-225) and Postgres hash joins for the BI star queries
(superset.db#tables[2].sql). Spark-first translation: dimension sides get an
explicit broadcast() hint so the fact table never shuffles for a dim lookup
- at 100 TB a shuffled fact join is the single most expensive mistake this
workload could make, while every dim here is MBs.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_lookup(facts: DataFrame, dim: DataFrame, on: str | list[str],
                     how: str = "left") -> DataFrame:
    """J1/J2: surrogate-key lookup - broadcast hash join, fact side unmoved.

    Mirrors tbl_invoices.merge(df_dim, how='left', on=key)
    (etl.py:216-225): dim is unique on the key so fact row count is
    preserved.
    """
    return facts.join(F.broadcast(dim), on=on, how=how)


def star_join(fact: DataFrame, dims: Iterable[tuple[DataFrame, str | list[str]]],
              how: str = "inner") -> DataFrame:
    """J3: fact joined to N dimensions, each broadcast.

    The BI virtual dataset is fct ⋈ dim_dates ⋈ dim_customers ⋈ dim_products
    (superset.db#tables[2].sql); here any (dim, key) list. All dims
    broadcast => one stage over the fact scan, zero shuffles before the
    downstream aggregation.
    """
    out = fact
    for dim, key in dims:
        out = out.join(F.broadcast(dim), on=key, how=how)
    return out


def semi_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """EXISTS(...) - rows of left with a match in right (left_semi)."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """NOT EXISTS(...) - rows of left with no match in right (left_anti)."""
    return left.join(right, on=on, how="left_anti")
