"""End-to-end pipelines (the reference Airflow DAG, Spark-first)."""

from etl_online_retail_spark.pipeline.retail import (  # noqa: F401
    RAW_RENAMES,
    RetailWarehouse,
    build_warehouse,
    run_pipeline,
)
