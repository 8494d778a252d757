"""Boundary sources: CSV staging round-trip, warehouse DDL, catalog."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from etl_online_retail_spark.catalog import SCHEMAS, load_table
from etl_online_retail_spark.sources.ddl import init_warehouse
from etl_online_retail_spark.sources.staging import (
    read_staging_csv,
    read_staging_parquet,
    write_staging_csv,
    write_staging_parquet,
)

SF = "/root/testdata/sf0.001"


def test_catalog_schemas_enforced(spark):
    for name in ("lineitem", "orders", "customer", "events"):
        df = load_table(spark, name, SF)
        assert df.schema.fieldNames()  # loads
        if name != "events":
            assert df.schema == SCHEMAS[name]


def test_parquet_staging_roundtrip_preserves_types(spark):
    orders = load_table(spark, "orders", SF)
    with tempfile.TemporaryDirectory() as d:
        write_staging_parquet(orders, f"{d}/orders")
        back = read_staging_parquet(spark, f"{d}/orders")
        assert back.schema == orders.schema
        assert back.count() == orders.count()


def test_csv_staging_requires_schema_and_roundtrips_values(spark):
    # CSV degrades types (SURVEY.md §1.3) - the reader re-pins the schema,
    # mirroring the reference's dtype maps on every read.
    orders = load_table(spark, "orders", SF).select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    with tempfile.TemporaryDirectory() as d:
        write_staging_csv(orders, f"{d}/orders")
        back = read_staging_csv(
            spark, f"{d}/orders",
            schema="o_orderkey long, o_orderstatus string, o_totalprice double")
        assert back.schema.simpleString() == orders.schema.simpleString()
        a = orders.agg(F.sum("o_orderkey"), F.count(F.lit(1))).collect()[0]
        b = back.agg(F.sum("o_orderkey"), F.count(F.lit(1))).collect()[0]
        assert tuple(a) == tuple(b)


def test_init_warehouse_ddl_and_seeds(spark):
    init_warehouse(spark, drop_first=True)
    try:
        tables = {r.tableName for r in spark.sql("SHOW TABLES IN retail").collect()}
        assert {"dim_customers", "dim_products", "dim_dates",
                "fct_invoices"} <= tables
        seed = spark.sql(
            "SELECT customer_dim_id, customer_id, country "
            "FROM retail.dim_customers").collect()
        assert len(seed) == 1
        assert (seed[0].customer_dim_id, seed[0].customer_id,
                seed[0].country) == (1, "00000", None)
    finally:
        spark.sql("DROP DATABASE IF EXISTS retail CASCADE")
