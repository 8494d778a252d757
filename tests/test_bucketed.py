"""Bucketed co-located join: the physical plan must contain no Exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_online_retail_spark.catalog import load_table
from etl_online_retail_spark.sources.bucketed import cobucket_fact_tables

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark):
    # bucketed tables require a warehouse catalog entry; AQE must not
    # coalesce away the bucket layout for the assertion to be readable
    li = load_table(spark, "lineitem", SF)
    o = load_table(spark, "orders", SF)
    bl, bo = cobucket_fact_tables(spark, li, o, n_buckets=4,
                                  prefix="t_bucketed")
    yield bl, bo
    spark.sql("DROP TABLE IF EXISTS t_bucketed_lineitem")
    spark.sql("DROP TABLE IF EXISTS t_bucketed_orders")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    bl, bo = bucketed
    # force the sort-merge path: at test scale Spark would rather broadcast
    # tiny orders; at 100 TB neither side broadcasts and SMJ-over-buckets
    # is exactly the plan this asserts
    joined = bl.join(bo.hint("merge"), bl.l_orderkey == bo.o_orderkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:2000]}"


def test_bucketed_join_matches_plain_join(spark, bucketed):
    bl, bo = bucketed
    li = load_table(spark, "lineitem", SF)
    o = load_table(spark, "orders", SF)
    a = (bl.join(bo, bl.l_orderkey == bo.o_orderkey)
         .agg(F.count(F.lit(1)),
              F.sum(F.col("l_quantity").cast("decimal(18,2)"))).collect()[0])
    b = (li.join(o, li.l_orderkey == o.o_orderkey)
         .agg(F.count(F.lit(1)),
              F.sum(F.col("l_quantity").cast("decimal(18,2)"))).collect()[0])
    assert tuple(a) == tuple(b)