"""Semantic (chart) layer + SQL front-end (SURVEY.md §3.2-3.3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from etl_online_retail_spark.catalog import register_views
from etl_online_retail_spark.plans.semantic import ChartSpec, Metric, chart_query
from etl_online_retail_spark.plans.sql_frontend import run_sql

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def views(spark):
    register_views(spark, SF)
    return spark


def test_big_number_chart(views, spark):
    # slice 2 analogue: global SUM, no groupby
    li = spark.table("lineitem")
    spec = ChartSpec(metrics=(Metric("SUM", F.col("l_extendedprice"), "total"),))
    out = chart_query(li, spec).collect()
    want = li.agg(F.sum("l_extendedprice")).collect()[0][0]
    assert len(out) == 1 and abs(out[0].total - want) < 1e-6


def test_timeseries_chart_with_grain(views, spark):
    # slice 3 analogue: P1M grain revenue series
    li = spark.table("lineitem")
    spec = ChartSpec(
        metrics=(Metric("SUM", F.col("l_extendedprice"), "revenue"),),
        time_column="l_shipdate", time_grain="P1M",
    )
    out = chart_query(li, spec)
    assert set(out.columns) == {"__timestamp", "revenue"}
    n_months = li.select(F.date_trunc("month", "l_shipdate")).distinct().count()
    assert out.count() == n_months


def test_topk_chart_with_filter_and_limit(views, spark):
    # slice 6 analogue: COUNT DISTINCT by group, filtered, top-5
    o = spark.table("orders")
    spec = ChartSpec(
        metrics=(Metric("COUNT_DISTINCT", F.col("o_custkey"), "n_customers"),),
        groupby=("o_orderpriority",),
        filters=(F.col("o_totalprice") > 1000,),
        row_limit=5,
    )
    out = chart_query(o, spec).collect()
    assert len(out) <= 5
    # ordered by metric desc
    vals = [r.n_customers for r in out]
    assert vals == sorted(vals, reverse=True)


def test_series_limit(views, spark):
    li = spark.table("lineitem")
    spec = ChartSpec(
        metrics=(Metric("SUM", F.col("l_extendedprice"), "revenue"),),
        groupby=("l_returnflag",),
        time_column="l_shipdate", time_grain="P1M",
        series_limit=2,
    )
    out = chart_query(li, spec)
    assert out.select("l_returnflag").distinct().count() <= 2


def test_sql_frontend_enforced_limit(views, spark):
    out = run_sql(spark, "SELECT * FROM lineitem", enforced_limit=10)
    assert out.count() == 10


def test_sql_frontend_surfaces_analysis_errors(views, spark):
    # the reference's failed-query history: unknown column -> analysis error
    with pytest.raises(AnalysisException):
        run_sql(spark, "SELECT not_a_column FROM lineitem").collect()


def test_sql_lab_runs_ansi_sql_over_the_catalog(spark):
    """End-to-end ad-hoc SQL: catalog tables auto-registered, ANSI
    constructs (CTE + join + grouping + window) execute, results match
    the DataFrame path, and the enforced limit applies."""
    from etl_online_retail_spark.plans.sql_frontend import sql_lab

    sf = "/root/testdata/sf0.001"
    out = sql_lab(spark, sf, """
        WITH per_nation AS (
          SELECT n_name AS nation, COUNT(DISTINCT c_custkey) AS n_cust
          FROM customer JOIN nation ON c_nationkey = n_nationkey
          GROUP BY n_name)
        SELECT nation, n_cust,
               RANK() OVER (ORDER BY n_cust DESC, nation) AS rnk
        FROM per_nation
    """)
    rows = out.collect()
    assert len(rows) > 0
    assert rows[0].__fields__ == ["nation", "n_cust", "rnk"]
    total = sum(r.n_cust for r in rows)
    from etl_online_retail_spark.catalog import load_table
    assert total == load_table(spark, "customer", sf).count()
    # the enforced limit plans as a limit, and a tiny cap truncates
    capped = sql_lab(spark, sf, "SELECT * FROM lineitem",
                     enforced_limit=7)
    assert capped.count() == 7
    # the reference's SQL Lab failure surface: analysis errors raise
    import pytest as _pytest
    from pyspark.errors import AnalysisException

    with _pytest.raises(AnalysisException):
        sql_lab(spark, sf, "SELECT no_such_column FROM orders").collect()
