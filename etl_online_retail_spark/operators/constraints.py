"""Warehouse integrity checks (init_db.sql's declarative constraints,
enforced as load-time checks - SURVEY.md §2.1 S6: Spark treats PK/FK/NOT
NULL as informational, so the engine asserts them instead).

Each check returns a violation COUNT (0 = constraint holds) computed as
one aggregation - cheap enough to run on every load, and each maps to the
exact constraint the reference declares:

    not_null_violations     NOT NULL (init_db.sql:9,17,36,40-41)
    fixed_width_violations  CHAR(5)/CHAR(6) width semantics (SURVEY §7)
    unique_key_violations   PRIMARY KEY uniqueness (init_db.sql:8,16,24)
    fk_violations           FOREIGN KEY (sources/ddl.py; init_db.sql:37-39)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_online_retail_spark.sources.ddl import fk_violations  # noqa: F401  (re-export)


def not_null_violations(df: DataFrame, cols: list[str]) -> int:
    pred = None
    for c in cols:
        p = F.col(c).isNull()
        pred = p if pred is None else (pred | p)
    return df.filter(pred).count()


def fixed_width_violations(df: DataFrame, col: str, width: int) -> int:
    """CHAR(n) semantics: every non-null value exactly n characters."""
    return df.filter(F.col(col).isNotNull()
                     & (F.length(col) != width)).count()


def unique_key_violations(df: DataFrame, key_cols: list[str]) -> int:
    """Rows participating in a duplicated key (0 = key is unique)."""
    dups = (df.groupBy(*key_cols)
              .agg(F.count(F.lit(1)).alias("_n"))
              .filter(F.col("_n") > 1)
              .agg(F.coalesce(F.sum("_n"), F.lit(0)).alias("_total")))
    return int(dups.collect()[0]._total)


def check_warehouse(wh) -> dict[str, int]:
    """All reference constraints over a RetailWarehouse; {} means clean."""
    out = {
        "dim_customers.customer_id NOT NULL":
            not_null_violations(wh.dim_customers, ["customer_id"]),
        "dim_customers.customer_id CHAR(5)":
            fixed_width_violations(wh.dim_customers, "customer_id", 5),
        "dim_customers PK":
            unique_key_violations(wh.dim_customers, ["customer_dim_id"]),
        "dim_products PK":
            unique_key_violations(wh.dim_products, ["product_dim_id"]),
        "dim_dates PK":
            unique_key_violations(wh.dim_dates, ["date_dim_id"]),
        "fct.invoice_id CHAR(6)":
            fixed_width_violations(wh.fct_invoices, "invoice_id", 6),
        "fct.unit_price NOT NULL":
            not_null_violations(wh.fct_invoices, ["unit_price", "quantity"]),
        "fct->dim_customers FK":
            fk_violations(wh.fct_invoices, wh.dim_customers,
                          "customer_dim_id", "customer_dim_id"),
        "fct->dim_products FK":
            fk_violations(wh.fct_invoices, wh.dim_products,
                          "product_dim_id", "product_dim_id"),
        "fct->dim_dates FK":
            fk_violations(wh.fct_invoices.withColumnRenamed(
                "invoice_date_dim_id", "date_dim_id"), wh.dim_dates,
                "date_dim_id", "date_dim_id"),
    }
    return {k: v for k, v in out.items() if v > 0}


def quarantine(df: DataFrame,
               rules: "list[tuple[str, F.Column]]") \
        -> tuple[DataFrame, DataFrame]:
    """Split a load into (valid, invalid) by a rule list — the ACTION
    the violation counts above inform: instead of failing the load or
    silently keeping bad rows, route them to a quarantine table with an
    explanation a steward can triage (the Deequ/DLT "expectations with
    drop + log" pattern).

    rules: [(rule_name, predicate_that_holds_for_GOOD_rows), ...].
    Returns (valid, invalid) where invalid carries one extra column
    `violations` — a comma-joined list of every rule the row breaks
    (a row failing two rules appears ONCE with both names, not twice).

    One pass, no shuffle: both outputs are filters over the same
    projection, and the violation list is a pure row expression
    (concat of CASE WHENs). A NULL predicate result counts as a
    violation (unknown != proven good — the SQL three-valued-logic trap
    a naive `filter(pred)` + `filter(~pred)` split silently drops rows
    into neither side).
    """
    flags = [
        F.when(pred.isNull() | ~pred, F.lit(name)).alias(f"_viol_{i}")
        for i, (name, pred) in enumerate(rules)
    ]
    tagged = df.withColumn(
        "violations",
        F.concat_ws(",", *[f for f in flags]))
    valid = (tagged.filter(F.col("violations") == "")
             .drop("violations"))
    invalid = tagged.filter(F.col("violations") != "")
    return valid, invalid
