"""Bucketed staging tables: the zero-shuffle fact-fact join path.

At 100 TB the lineitem ⋈ orders join is the workload's dominant shuffle
(PERFORMANCE.md "what to watch"). The fix is paid once at ingest: write
both tables bucketed by the join key with the same bucket count
(DataFrameWriter.bucketBy + saveAsTable). Spark then plans the join as a
sort-merge join over co-located buckets with NO Exchange on either side -
verified by tests/test_bucketed.py inspecting the physical plan.

Bucket-count sizing: buckets ~= total_size / target_partition_size
(~128-256 MB); both sides MUST use the same count or Spark re-shuffles the
mismatched side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int, sort_col: str | None = None) -> None:
    """Persist as a bucketed managed table (overwrites)."""
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # the in-memory catalog forgets tables between sessions but the files
    # remain; clear the location or saveAsTable fails LOCATION_ALREADY_EXISTS
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "").removeprefix("file:")
    if warehouse:
        shutil.rmtree(f"{warehouse}/{table.lower()}", ignore_errors=True)
    # Pre-shuffle onto the bucket key so each write task holds exactly one
    # bucket: without this, every input partition writes one file PER
    # bucket it touches (tasks x buckets small files, fragmented row
    # groups - measured 2x slower scans on the staged bench layout). With
    # it, files == buckets, each one full-size row groups. Same rule a
    # production ingest applies at 100 TB, where the file explosion is
    # tasks x buckets x partitions.
    from pyspark.sql import functions as F
    pre = df.repartition(n_buckets, F.col(bucket_col))
    writer = pre.write.bucketBy(n_buckets, bucket_col)
    writer = writer.sortBy(sort_col or bucket_col)
    writer.mode("overwrite").saveAsTable(table)


def cobucket_fact_tables(spark: SparkSession, lineitem: DataFrame,
                         orders: DataFrame, n_buckets: int = 8,
                         prefix: str = "bucketed") -> tuple[DataFrame, DataFrame]:
    """Write lineitem/orders bucketed by orderkey; return the table scans.

    Joining the two returned DataFrames on the orderkey is shuffle-free.
    """
    write_bucketed(lineitem, f"{prefix}_lineitem", "l_orderkey", n_buckets)
    write_bucketed(orders, f"{prefix}_orders", "o_orderkey", n_buckets)
    return (spark.table(f"{prefix}_lineitem"), spark.table(f"{prefix}_orders"))
