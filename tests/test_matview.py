"""Materialized-view rewrite: serving plan must equal the base plan.

The oracle gate only ever sees the base plan (the driver does not stage
views), so this test is the correctness bridge for the rewrite path that
the bench exercises.
"""

from __future__ import annotations

import pytest

from etl_online_retail_spark.operators import matview

from conftest import SF_SMALL


def _rows(df):
    return sorted((r["nation"], r["month_start"], round(r["revenue"], 6))
                  for r in df.collect())


@pytest.fixture
def staged_matview(spark):
    matview.materialize(spark, SF_SMALL)
    yield
    spark.conf.unset(matview.MATVIEW_DIR_CONF)
    for name in matview.MATVIEWS:
        view = f"{matview.MATVIEW_PREFIX}_{name}"
        spark.table(view).unpersist()
        spark.catalog.dropTempView(view)


def test_star_rollup_serves_and_matches_base(spark, staged_matview):
    from etl_online_retail_spark.workload import _REGISTRY

    build = _REGISTRY["star_revenue_by_nation_month"].build
    served = build(spark, SF_SMALL)
    # the rewrite actually engaged: the serving plan reads the in-memory
    # rollup (the cached-plan *lineage* text still names the fact table,
    # but execution hits InMemoryTableScan, not a parquet scan of it)
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    got = _rows(served)

    spark.conf.unset(matview.MATVIEW_DIR_CONF)
    base = build(spark, SF_SMALL)
    assert got == _rows(base)
    assert served.columns == base.columns


def test_serve_refuses_other_directory(spark, staged_matview):
    assert matview.serve(spark, "/root/testdata/sf0.01",
                         "star_month_rollup") is None
