"""Staging IR readers/writers (SURVEY.md §2.1 S2/S3).

The reference hands DataFrames between Airflow tasks as CSV temp files with
dtype maps re-applied on every read because CSV silently degrades types
(etl.py:88-118, 191-197; SURVEY.md §1.3). Both formats are offered here,
always schema-pinned, but Parquet is the engine's staging IR: types survive,
scans prune columns and push filters, and row groups parallelize. CSV
support exists for boundary compatibility only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_staging_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).parquet(path)


def read_staging_parquet(spark: SparkSession, path: str,
                         schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def write_staging_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S2: to_csv(index=False) equivalent; header on, type loss accepted."""
    df.write.mode(mode).option("header", "true").csv(path)


def read_staging_csv(spark: SparkSession, path: str,
                     schema: T.StructType) -> DataFrame:
    """S3: pd.read_csv with dtype overrides - schema is REQUIRED, never
    inferred (the reference re-stringifies keys on every read for the same
    reason, etl.py:97)."""
    return (spark.read
            .schema(schema)
            .option("header", "true")
            .csv(path))
