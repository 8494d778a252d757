"""Additional interchange formats: JSONL (documents/corpora) and ORC.

JSONL is how document corpora actually arrive in training pipelines (one
JSON object per line; splittable when uncompressed, trivially shardable).
ORC is Spark's other native columnar format — included so a warehouse
standardized on ORC can use the engine without conversion.

Both piggyback on Spark's native readers: schema always pinned (never
inferred — inference costs a full extra pass over 100 TB and can drift
between shards), predicate pushdown and column pruning work out of the box
for ORC, and JSON scans prune unreferenced fields at parse time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """One JSON object per line, one file per partition (splittable)."""
    df.write.mode(mode).json(path)


def read_jsonl(spark: SparkSession, path: str,
               schema: T.StructType) -> DataFrame:
    """Schema-pinned JSONL scan. Malformed lines land in a
    `_corrupt_record` column when the schema declares one; otherwise
    PERMISSIVE mode nulls the unparseable fields (never drops rows
    silently — count the nulls to audit)."""
    return spark.read.schema(schema).json(path)


def read_jsonl_strict(spark: SparkSession, path: str,
                      schema: T.StructType) -> DataFrame:
    """FAILFAST variant: any malformed line aborts the scan — the right
    default for one-off backfills where silent nulls would poison training
    data downstream."""
    return spark.read.schema(schema).option("mode", "FAILFAST").json(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str,
             schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)
