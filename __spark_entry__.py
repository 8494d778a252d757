"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)       flagship star-join query on sf0.001 (smoke check)
queries()          every implemented SURVEY.md §2 operator as a named query
oracle_sql()       DuckDB ANSI-SQL twin per query (the correctness gate)

Implementations live in etl_online_retail_spark/ (workload.py holds the
registry; operators/, functions/ the building blocks).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_online_retail_spark import workload  # noqa: E402
from etl_online_retail_spark import workload_bi  # noqa: E402,F401  (registers BI surface)
from etl_online_retail_spark import workload_ext  # noqa: E402,F401  (registers extensions)
from etl_online_retail_spark import workload_sampling  # noqa: E402,F401  (registers sampling/sketches)
from etl_online_retail_spark import workload_serving  # noqa: E402,F401  (registers serving/privacy/graph)
from etl_online_retail_spark import workload_ts  # noqa: E402,F401  (registers timeseries/graph/cleaning)
from etl_online_retail_spark.session import ensure_session_confs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the 4-way star join with
    month-grain revenue (the reference dashboard's core shape, SURVEY §2.9).
    """
    ensure_session_confs(spark)
    return workload.queries()["star_revenue_by_nation_month"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return workload.queries()


def oracle_sql() -> dict[str, str]:
    return workload.oracles()
