"""Row-cleaning operators (SURVEY.md §2.2 P1-P5, §2.3 F1-F3).

The reference's initial_clean task (etl.py:43-89): rename, cast+fill
unknown keys, positivity filters, fixed-width digit-key filters (which drop
cancelled 'C'-prefix invoices and alphanumeric stock codes), derive the
smart date key, drop the raw timestamp. All pure Column expressions -
Catalyst pushes them into the scan (PushedFilters) and prunes columns; the
hand-rolled pandas orderings the reference uses for the same effect
(SURVEY.md §4) are unnecessary here.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_online_retail_spark.functions.datetime_fns import date_key

UNKNOWN_KEY = "00000"  # unknown-member natural key (etl.py:67-68; init_db.sql:12)


def rename(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """P1: bulk column rename (etl.py:53-64)."""
    return df.withColumnsRenamed(dict(mapping))


def fill_unknown_key(df: DataFrame, cols: list[str],
                     value: str = UNKNOWN_KEY) -> DataFrame:
    """P2: cast key columns to string and default nulls to the unknown
    member (etl.py:67-68)."""
    out = df
    for c in cols:
        out = out.withColumn(c, F.coalesce(F.col(c).cast("string"), F.lit(value)))
    return out


def positive(col: str) -> Column:
    """F1: quantity > 0 / unit_price > 0 (etl.py:71-72)."""
    return F.col(col) > 0


def digit_key(col: str, width: int) -> Column:
    """F2: fixed-width all-digits key predicate (etl.py:73-81).

    Reproduces pandas str.len()==width & str.isdigit(): drops cancelled
    'C'-prefix invoices and alphanumeric stock codes like '85123A'. [0-9]
    not \\d: isdigit() is Unicode but the source is ASCII (SURVEY.md F2).
    """
    c = F.col(col)
    return (F.length(c) == width) & c.rlike("^[0-9]+$")


def not_unknown(col: str, value: str = UNKNOWN_KEY) -> Column:
    """F3: exclude the unknown member before dim builds (etl.py:103,113)."""
    return F.col(col) != value


def clean_invoices(df: DataFrame,
                   renames: Mapping[str, str] | None = None,
                   invoice_col: str = "invoice_id",
                   stock_col: str = "stock_code",
                   customer_col: str = "customer_id",
                   qty_col: str = "quantity",
                   price_col: str = "unit_price",
                   ts_col: str = "invoice_date") -> DataFrame:
    """The full initial_clean task (etl.py:43-89) as one lazy plan:

    rename -> fill unknown keys -> positivity + digit-key filters ->
    derive invoice_date_dim_id -> drop the raw timestamp.
    """
    out = rename(df, renames) if renames else df
    out = fill_unknown_key(out, [stock_col, customer_col])
    out = out.filter(
        positive(qty_col) & positive(price_col)
        & digit_key(invoice_col, 6) & digit_key(stock_col, 5)
        & digit_key(customer_col, 5)
    )
    out = out.withColumn("invoice_date_dim_id", date_key(ts_col))
    return out.drop(ts_col)
