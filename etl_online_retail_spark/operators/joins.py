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


def salted_join(left: DataFrame, right: DataFrame, on: str,
                salt_buckets: int = 8, how: str = "inner") -> DataFrame:
    """Skew-buster equi-join: split each hot key into salt_buckets.

    The skewed (left) side gets a deterministic salt from a hash of its
    whole row; the right side is exploded into salt_buckets replicas. The
    shuffle key becomes (key, salt), so one hot key spreads over
    salt_buckets reducers at the cost of replicating the right side.
    Prefer AQE skew-join (on by default in session.py) when it applies;
    salting is for the cases AQE cannot split (e.g. aggregations keyed on
    the hot key downstream, or deliberate bucketing of a known-hot key).
    """
    l_salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
                    F.lit(salt_buckets)).alias("_salt")
    salted_left = left.select("*", l_salt)
    salted_right = right.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
             .alias("_salt"))
    return (salted_left.join(salted_right, on=[on, "_salt"], how=how)
                       .drop("_salt"))


def semi_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """EXISTS(...) - rows of left with a match in right (left_semi)."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """NOT EXISTS(...) - rows of left with no match in right (left_anti)."""
    return left.join(right, on=on, how="left_anti")
