"""S1: Excel ingestion boundary (etl.py:46-52).

Spark has no native xlsx reader; the reference's pd.read_excel with dtype
overrides (Invoice forced string, Customer ID nullable Int32) stays at the
boundary: driver-side pandas -> Arrow -> DataFrame, ingested ONCE to
Parquet, never inside the engine (SURVEY.md §7 "Excel ingestion").

Gated behind an import-try: the harness container ships no openpyxl; the
rest of the engine never depends on this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

RAW_SCHEMA = T.StructType([
    T.StructField("Invoice", T.StringType()),
    T.StructField("StockCode", T.StringType()),
    T.StructField("Description", T.StringType()),
    T.StructField("Quantity", T.IntegerType()),
    T.StructField("InvoiceDate", T.TimestampNTZType()),
    T.StructField("Price", T.DoubleType()),
    T.StructField("Customer ID", T.IntegerType()),
    T.StructField("Country", T.StringType()),
])


def ingest_excel(spark: SparkSession, xlsx_path: str,
                 sheet: int | str = 0) -> DataFrame:
    """One-shot xlsx -> DataFrame through pandas/Arrow.

    Mirrors etl.py:46-52: sheet 0 only by default, Invoice/StockCode as
    strings (the int parser mangles codes like '85123A'), Customer ID
    nullable int.
    """
    try:
        import pandas as pd
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("pandas required for Excel ingestion") from e
    try:
        pdf = pd.read_excel(
            xlsx_path, sheet_name=sheet,
            dtype={"Invoice": "string", "StockCode": "string",
                   "Description": "string", "Country": "string"},
        )
    except ImportError as e:  # openpyxl missing in this container
        raise NotImplementedError(
            "xlsx parsing needs openpyxl, not present in this environment; "
            "pre-convert to Parquet at the boundary instead") from e
    pdf["Customer ID"] = pdf["Customer ID"].astype("Int32")
    return spark.createDataFrame(pdf, schema=RAW_SCHEMA)


def ingest_excel_to_parquet(spark: SparkSession, xlsx_path: str,
                            parquet_path: str, sheet: int | str = 0) -> None:
    """The recommended pattern: convert once, then the engine only ever
    sees Parquet."""
    ingest_excel(spark, xlsx_path, sheet).write.mode("overwrite").parquet(parquet_path)
