"""Oracle-differential gate inside pytest (fast subset at sf0.001).

The full gate is scripts/verify_local.py at sf0.01; this keeps a
representative cross-section of SURVEY §2 + extensions under `pytest -q`
so a regression in any layer fails the suite.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"

SUBSET = [
    "total_revenue",
    "revenue_rollup",
    "star_revenue_by_nation_month",
    "top_products_by_revenue",
    "latest_order_per_customer",
    "customer_dim_build",
    "date_spine",
    "smart_key_range",
    "session_stats",
    "events_hourly",
    "exact_dup_groups",
    "minhash_near_dups",
    "simhash_near_dups",
    "lang_id",
    "knn_bruteforce",
    "media_features",
    "virtual_dataset_window",
    "fact_table_build",
]


@pytest.fixture(scope="module")
def harness(spark):
    import __spark_entry__ as entrymod
    from etl_online_retail_spark.oracle import duckdb_connection

    return entrymod, duckdb_connection(SF)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, harness, name):
    entrymod, con = harness
    from etl_online_retail_spark.oracle import compare_frames

    # pandas canonicalization on both sides = the driver's comparison path
    sdf = entrymod.queries()[name](spark, SF)
    dpdf = con.sql(entrymod.oracle_sql()[name]).df()
    r = compare_frames(name, sdf.toPandas(), dpdf)
    assert r.ok, (f"{name}: rows {r.spark_rows}/{r.duck_rows} "
                  f"schema_ok={r.schema_ok} hash_ok={r.hash_ok} "
                  f"spark_only={r.spark_only} duck_only={r.duck_only}")
