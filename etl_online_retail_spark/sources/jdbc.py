"""S4/S5: JDBC scan and append (etl.py:145-179, 198-205, 245-259).

The reference loads dims/facts into Postgres over SQLAlchemy and reads dims
back to observe SERIAL keys. In this engine surrogate keys are assigned
in-plan (operators/surrogate.py), so the read-back disappears; JDBC remains
as an optional boundary for deployments with a real warehouse.

Integration-tested against the embedded Derby warehouse Spark itself
ships (tests/test_sources.py::test_jdbc_roundtrip_serial_parity_...):
the full write -> DB-assigned IDENTITY -> partitioned read-back loop runs
for real and matches the in-plan dense_keys surrogate path exactly.
Partitioning options are surfaced because an unpartitioned JDBC scan is a
single-task bottleneck; pass partition_column+bounds for any real table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(spark: SparkSession, url: str, table: str,
              partition_column: str | None = None,
              num_partitions: int = 8,
              lower_bound: int | None = None,
              upper_bound: int | None = None,
              **options: str) -> DataFrame:
    """JDBC scan; pass partition_column+bounds or the scan runs in ONE task."""
    reader = (spark.read.format("jdbc")
              .option("url", url)
              .option("dbtable", table))
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            # str(None) would reach the JDBC source as the literal "None"
            # and fail deep inside the scan with an opaque parse error
            raise ValueError(
                "read_jdbc: partition_column requires explicit "
                "lower_bound and upper_bound")
        reader = (reader
                  .option("partitionColumn", partition_column)
                  .option("numPartitions", str(num_partitions))
                  .option("lowerBound", str(lower_bound))
                  .option("upperBound", str(upper_bound)))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def append_jdbc(df: DataFrame, url: str, table: str,
                batch_size: int = 10_000, **options: str) -> None:
    """if_exists='append' equivalent (etl.py:149,171,249)."""
    writer = (df.write.format("jdbc")
              .option("url", url)
              .option("dbtable", table)
              .option("batchsize", str(batch_size))
              .mode("append"))
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()
