"""S6/S7: warehouse DDL + literal seed inserts (init_db.sql via spark.sql).

The reference's init_db task drops and recreates schema `retail` with four
tables, PK/FK constraints, and seeded unknown members (init_db.sql:1-42).
Spark SQL DDL creates the same namespace/tables; PK/FK are informational
only in Spark, so integrity is asserted by check queries instead
(fk_violations below) - the same guarantee, enforced at load time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RETAIL_DDL = [
    "CREATE DATABASE IF NOT EXISTS retail",
    """CREATE TABLE IF NOT EXISTS retail.dim_customers (
        customer_dim_id INT, customer_id STRING NOT NULL, country STRING)
        USING parquet""",
    """CREATE TABLE IF NOT EXISTS retail.dim_products (
        product_dim_id INT, stock_code STRING NOT NULL, description STRING)
        USING parquet""",
    """CREATE TABLE IF NOT EXISTS retail.dim_dates (
        date_dim_id INT, date DATE, year INT, month INT, day INT,
        day_of_week INT, week INT) USING parquet""",
    """CREATE TABLE IF NOT EXISTS retail.fct_invoices (
        invoice_id STRING, invoice_date_dim_id INT, product_dim_id INT,
        customer_dim_id INT, unit_price DECIMAL(8,2) NOT NULL,
        quantity INT NOT NULL) USING parquet""",
]

SEED_INSERTS = [
    # unknown members at dim id 1 (init_db.sql:12-13, 20-21)
    "INSERT INTO retail.dim_customers VALUES (1, '00000', NULL)",
    "INSERT INTO retail.dim_products VALUES (1, '00000', NULL)",
]


def init_warehouse(spark: SparkSession, drop_first: bool = True) -> None:
    """init_db: DROP SCHEMA CASCADE + CREATE (etl.py:36-39).

    The drop also clears a stale `retail.db` directory under the
    warehouse location: a previous session that died between write and
    catalog commit leaves files the catalog no longer tracks, and
    CREATE TABLE then fails with LOCATION_ALREADY_EXISTS — the
    reference's `DROP SCHEMA CASCADE` has no such half-state, so ours
    must not either."""
    if drop_first:
        spark.sql("DROP DATABASE IF EXISTS retail CASCADE")
        import shutil
        from urllib.parse import urlparse

        loc = urlparse(spark.conf.get(
            "spark.sql.warehouse.dir", "")).path
        if loc:
            shutil.rmtree(f"{loc}/retail.db", ignore_errors=True)
    for stmt in RETAIL_DDL:
        spark.sql(stmt)
    for stmt in SEED_INSERTS:
        spark.sql(stmt)


def fk_violations(fact: DataFrame, dim: DataFrame, fact_key: str,
                  dim_key: str) -> int:
    """FK check: count of fact rows whose key misses the dim (replaces the
    reference's Postgres FK constraints, init_db.sql:37-39)."""
    return (fact.join(F.broadcast(dim.select(F.col(dim_key).alias(fact_key))),
                      on=fact_key, how="left_anti")
            .count())
