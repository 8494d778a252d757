"""Date/time column expressions (SURVEY.md §2.8 T1-T3, §2.2 P5).

The reference derives a yyyymmdd smart date key (etl.py:84,139), calendar
attributes incl. ISO day-of-week/week for the date spine (etl.py:140-144),
and Superset emits DATE_TRUNC('month', ...) for the monthly series
(superset.db#slices[3,5].params).

All expressions are arithmetic on year()/month()/day() etc. so they evaluate
identically on TIMESTAMP_NTZ and DATE inputs with no session-timezone
dependence, and have exact ANSI-SQL twins for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def date_key(col: Column | str) -> Column:
    """Smart integer date key yyyymmdd (etl.py:84,139; init_db.sql:24).

    Pure integer arithmetic (not date_format) so the same expression text
    works in any SQL dialect and never touches timezone formatting.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (F.year(c) * 10000 + F.month(c) * 100 + F.dayofmonth(c)).cast("int")


def iso_day_of_week(col: Column | str) -> Column:
    """ISO day-of-week Mon=1..Sun=7 (pandas isocalendar().day, etl.py:143).

    Spark's dayofweek() is Sunday=1; remap with ((dow + 5) % 7) + 1.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (((F.dayofweek(c) + 5) % 7) + 1).cast("int")


def iso_week(col: Column | str) -> Column:
    """ISO week number (pandas isocalendar().week, etl.py:144)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.weekofyear(c).cast("int")


def month_start(col: Column | str) -> Column:
    """DATE_TRUNC('month', ...) as a DATE (Superset T1 grain)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_trunc("month", c).cast("date")


def calendar_attrs(col: Column | str) -> dict[str, Column]:
    """The full dim_dates attribute set (etl.py:139-144; init_db.sql:23-31)."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        "date_dim_id": date_key(c),
        "date": c.cast("date"),
        "year": F.year(c).cast("int"),
        "month": F.month(c).cast("int"),
        "day": F.dayofmonth(c).cast("int"),
        "day_of_week": iso_day_of_week(c),
        "week": iso_week(c),
    }
