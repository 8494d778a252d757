"""End-to-end demo: what a user of the reference project runs here instead.

Builds the retail star schema from a raw invoice table (the reference's
Airflow DAG as one Spark job), registers the Superset-style virtual
dataset, and renders the five dashboard queries (SURVEY.md §2.9) through
the semantic layer. Run: python scripts/demo_retail.py

build_virtual_dataset/dashboard_charts are importable so the golden test
(tests/test_demo_retail_golden.py) pins the SAME chart layer the demo
renders — the reference's only human-visible outputs, end-to-end.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from etl_online_retail_spark.pipeline.retail import build_warehouse
from etl_online_retail_spark.plans.semantic import ChartSpec, Metric, chart_query
from etl_online_retail_spark.session import get_spark


def build_virtual_dataset(wh):
    """The Superset virtual dataset (superset.db#tables[2].sql) over a
    built warehouse."""
    return (wh.fct_invoices
            .join(F.broadcast(wh.dim_dates),
                  wh.fct_invoices.invoice_date_dim_id
                  == wh.dim_dates.date_dim_id)
            .join(F.broadcast(wh.dim_customers), "customer_dim_id")
            .join(F.broadcast(wh.dim_products), "product_dim_id")
            .select("date", "invoice_id",
                    F.col("customer_id").alias("cust_id"),
                    F.col("country").alias("cust_country"),
                    "stock_code",
                    F.col("description").alias("prod_name"),
                    (F.col("quantity") * F.col("unit_price"))
                    .alias("revenue")))


def dashboard_charts() -> dict[str, ChartSpec]:
    """The five dashboard slices (SURVEY.md §2.9) as chart specs."""
    return {
        "Total Revenue (slice 2)": ChartSpec(
            metrics=(Metric("SUM", F.col("revenue"), "total_revenue"),)),
        "Revenue by month (slice 3)": ChartSpec(
            metrics=(Metric("SUM", F.col("revenue"), "revenue"),),
            time_column="date", time_grain="P1M"),
        "Top 10 products (slice 5)": ChartSpec(
            metrics=(Metric("SUM", F.col("revenue"), "revenue"),),
            groupby=("prod_name",), row_limit=10),
        "Customer location (slice 6)": ChartSpec(
            metrics=(Metric("COUNT_DISTINCT", F.col("cust_id"),
                            "n_customers"),),
            groupby=("cust_country",), row_limit=10),
        "Invoices lacking customer info (slice 7)": ChartSpec(
            metrics=(Metric("COUNT_DISTINCT", F.col("invoice_id"),
                            "n_invoices"),),
            filters=(F.col("cust_country").isNull(),)),
    }


def main() -> None:
    spark = get_spark("demo-retail")

    # raw invoices: in production this is the ingested-once xlsx
    # (sources/excel.py); here the pipeline test fixture
    from tests.test_pipeline_golden import RAW_SCHEMA, ROWS

    raw = spark.createDataFrame(ROWS, RAW_SCHEMA)
    vds = build_virtual_dataset(build_warehouse(raw))
    vds.cache()

    for title, spec in dashboard_charts().items():
        print(f"\n== {title}")
        chart_query(vds, spec).show(10, truncate=False)


if __name__ == "__main__":
    main()
