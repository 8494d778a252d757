"""Boundary sources/sinks (SURVEY.md §2.1 S1-S9).

    excel     S1: ingest-once xlsx -> DataFrame (driver-side Arrow boundary)
    staging   S2/S3: schema-pinned CSV and Parquet staging IR
    jdbc      S4/S5: JDBC scan/append (gated - no driver jar in harness)
    ddl       S6/S7: warehouse DDL + seed-row inserts via spark.sql
"""

from etl_online_retail_spark.sources.staging import (  # noqa: F401
    read_staging_csv,
    read_staging_parquet,
    write_staging_csv,
    write_staging_parquet,
)
