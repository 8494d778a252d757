"""The warehouse fact is written partitioned by smart-key year; the F5
range-filter pattern must prune partitions at the scan (SURVEY.md §4)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from tests.test_pipeline_golden import RAW_SCHEMA, ROWS


@pytest.fixture(scope="module")
def warehouse_dir(spark):
    from etl_online_retail_spark.pipeline.retail import run_pipeline

    raw = spark.createDataFrame(ROWS, RAW_SCHEMA)
    with tempfile.TemporaryDirectory() as d:
        run_pipeline(raw, warehouse_dir=d)
        yield d


def test_smart_key_filter_prunes_partitions(spark, warehouse_dir):
    fct = spark.read.parquet(f"{warehouse_dir}/fct_invoices")
    pruned = fct.filter(F.col("_year") == 2009)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(_year" in plan or "_year#" in plan.split(
        "PartitionFilters: [")[1].split("]")[0], plan[:1500]
    # all fixture sales are Dec 2009, so the pruned scan sees every row
    assert pruned.count() == fct.count()
    # a non-matching year scans zero partitions -> zero rows, no error
    assert fct.filter(F.col("_year") == 1999).count() == 0


def test_fact_roundtrip_schema(spark, warehouse_dir):
    fct = spark.read.parquet(f"{warehouse_dir}/fct_invoices")
    assert {"invoice_id", "invoice_date_dim_id", "product_dim_id",
            "customer_dim_id", "unit_price", "quantity", "_year"} \
        == set(fct.columns)
    assert dict(fct.dtypes)["unit_price"] == "decimal(8,2)"
