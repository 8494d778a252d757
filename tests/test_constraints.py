"""Integrity-check operators + the full warehouse constraint sweep."""

from __future__ import annotations

import pytest

from etl_online_retail_spark.operators.constraints import (
    check_warehouse,
    fixed_width_violations,
    not_null_violations,
    unique_key_violations,
)


def test_individual_checks(spark):
    df = spark.createDataFrame(
        [("12345", 1), (None, 2), ("1234", 3), ("12345", 4), ("12345", 4)],
        "key string, id int")
    assert not_null_violations(df, ["key"]) == 1
    assert fixed_width_violations(df, "key", 5) == 1  # '1234'; null ignored
    assert unique_key_violations(df, ["id"]) == 2     # two rows share id 4
    assert unique_key_violations(df, ["key", "id"]) == 2


@pytest.fixture(scope="module")
def warehouse(spark):
    from etl_online_retail_spark.pipeline.retail import build_warehouse
    from tests.test_pipeline_golden import RAW_SCHEMA, ROWS

    return build_warehouse(spark.createDataFrame(ROWS, RAW_SCHEMA))


def test_warehouse_satisfies_all_reference_constraints(warehouse):
    assert check_warehouse(warehouse) == {}


def test_check_warehouse_flags_seeded_violations(spark):
    """Each rule family actually fires: a warehouse with a broken PK,
    a wrong-width id, a NULL measure and an orphan FK reports exactly
    those rules with the right counts."""
    from decimal import Decimal

    from etl_online_retail_spark.pipeline.retail import RetailWarehouse

    dimc = spark.createDataFrame(
        [(1, "00000", None), (1, "1234", "UK")],   # dup PK + CHAR(5) break
        "customer_dim_id INT, customer_id STRING, country STRING")
    dimp = spark.createDataFrame(
        [(1, "00000", None)],
        "product_dim_id INT, stock_code STRING, description STRING")
    dimd = spark.createDataFrame(
        [(20100101, "2010-01-01")], "date_dim_id INT, date STRING")
    fct = spark.createDataFrame(
        [("536365", 20100101, 1, 1, None, 6),     # NULL unit_price
         ("53636", 20100101, 9, 1, Decimal("2.55"), 6)],     # CHAR(6) + orphan product
        "invoice_id STRING, invoice_date_dim_id INT, product_dim_id INT, "
        "customer_dim_id INT, unit_price DECIMAL(8,2), quantity INT")
    got = check_warehouse(RetailWarehouse(dimc, dimp, dimd, fct))
    assert got == {
        "dim_customers.customer_id CHAR(5)": 1,
        "dim_customers PK": 2,
        "fct.invoice_id CHAR(6)": 1,
        "fct.unit_price NOT NULL": 1,
        "fct->dim_products FK": 1,
    }


def test_check_warehouse_is_one_scan_per_table(spark, tmp_path):
    """The sweep's plan scans the fact parquet ONCE — the three FK
    probes are broadcast lookups folded into the same pass, not
    separate anti-join actions (round-5 verdict: the naive form cost
    ~5 fact scans per load)."""
    from etl_online_retail_spark.operators.constraints import (
        warehouse_check_plan,
    )
    from etl_online_retail_spark.pipeline.retail import (
        RetailWarehouse,
        run_pipeline,
    )
    from tests.test_pipeline_golden import RAW_SCHEMA, ROWS

    wdir = str(tmp_path / "wh")
    run_pipeline(spark.createDataFrame(ROWS, RAW_SCHEMA), wdir)
    wh = RetailWarehouse(
        spark.read.parquet(f"{wdir}/dim_customers"),
        spark.read.parquet(f"{wdir}/dim_products"),
        spark.read.parquet(f"{wdir}/dim_dates"),
        spark.read.parquet(f"{wdir}/fct_invoices"))
    plan = (warehouse_check_plan(wh)
            ._jdf.queryExecution().executedPlan().toString())
    # the fact parquet is the only scan whose schema reads invoice_id
    assert plan.count("invoice_id:string") == 1, plan
    # dim_dates: its own PK scan + one FK broadcast build, nothing more
    assert plan.count("struct<date_dim_id") <= 2, plan
    assert plan.count("BroadcastHashJoin") == 3  # the three FK lookups


def test_fact_write_observes_constraint_counts(spark, tmp_path):
    """run_pipeline's persisted load reports the row-level rule counts
    gathered DURING the fact write (Observation API, no extra scan)."""
    from etl_online_retail_spark.pipeline.retail import run_pipeline
    from tests.test_pipeline_golden import RAW_SCHEMA, ROWS

    wh = run_pipeline(spark.createDataFrame(ROWS, RAW_SCHEMA),
                      str(tmp_path / "wh2"))
    assert wh.load_metrics == {
        "fct.invoice_id CHAR(6)": 0,
        "fct.unit_price NOT NULL": 0,
        "fct.quantity NOT NULL": 0,
    }


def test_observed_rules_counts_violations_during_action(spark):
    from pyspark.sql import functions as F

    from etl_online_retail_spark.operators.constraints import observed_rules

    df = spark.createDataFrame(
        [("123456", 1.0), ("12345", None), (None, 2.0)],
        "invoice_id STRING, unit_price DOUBLE")
    rules = [
        ("width6", F.count(F.when(F.col("invoice_id").isNotNull()
                                  & (F.length("invoice_id") != 6), 1))),
        ("price_nn", F.count(F.when(F.col("unit_price").isNull(), 1))),
    ]
    out, fetch = observed_rules(df, rules)
    out.write.format("noop").mode("overwrite").save()
    assert fetch() == {"width6": 1, "price_nn": 1}


def test_count_distinct_or_count_rewrites_only_declared_keys(spark):
    """The constraint-informed rewrite (r10): a DECLARED unique key gets
    a plain COUNT (no two-phase distinct Expand in the plan) while a
    non-key column keeps the literal COUNT(DISTINCT) — and on the real
    relation both forms agree, re-proving the enforced premise."""
    from pyspark.sql import functions as F

    from etl_online_retail_spark.catalog import load_table
    from etl_online_retail_spark.operators.constraints import (
        count_distinct_or_count,
    )

    c = load_table(spark, "customer", "/root/testdata/sf0.001")

    keyed = c.agg(count_distinct_or_count("customer", "c_custkey", "n"))
    plan = keyed._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan and "distinct" not in plan.lower()
    want = c.agg(F.countDistinct("c_custkey").alias("n")).collect()[0].n
    assert keyed.collect()[0].n == want

    nonkey = c.agg(count_distinct_or_count("customer", "c_nationkey", "m"))
    assert nonkey.collect()[0].m == \
        c.agg(F.countDistinct("c_nationkey").alias("m")).collect()[0].m
    assert nonkey.collect()[0].m < want   # genuinely repeating column

    # an undeclared relation never rewrites
    other = c.agg(count_distinct_or_count("events", "c_custkey", "n"))
    assert "count(distinct" in \
        other._jdf.queryExecution().analyzed().toString().lower()
