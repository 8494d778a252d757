"""Table catalog: explicit schemas + schema-enforced parquet loaders.

The reference pins dtypes at every boundary because inference breaks
(etl.py:48-51, 97, 151-159, 193-196; SURVEY.md §1.3). We do the same with
StructType per table and never rely on inference; Parquet is the only at-rest
format so types survive end-to-end.

Tables are the driver-generated TPC-H-ish star schema plus the extension
tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_online_retail_spark.session import ensure_session_confs

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType([
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]),
    "nation": T.StructType([
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]),
    "customer": T.StructType([
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]),
    "supplier": T.StructType([
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]),
    "part": T.StructType([
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]),
    "orders": T.StructType([
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampNTZType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]),
    "lineitem": T.StructType([
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampNTZType()),
    ]),
    # events.ts: TIMESTAMP(MICROS, isAdjustedToUTC=false) scans directly as
    # timestamp_ntz. Files from the legacy generator carry INT64
    # TIMESTAMP(NANOS) instead — load_events sniffs the footer and converts
    # (see _EVENTS_NANOS_SCHEMA); either flavor yields this logical schema.
    "events": T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]),
    "documents": T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]),
    "embeddings": T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]),
}

TABLE_NAMES = tuple(SCHEMAS)

# Dimension-sized tables: always broadcast-join these against facts.
DIM_TABLES = frozenset({"region", "nation", "customer", "supplier", "part"})

# Fact tables that the staged warehouse co-buckets on the join key: the
# lineitem ⋈ orders join then plans as a sort-merge over co-located buckets
# with NO Exchange on either side (PERFORMANCE.md, measured 8x). A stager
# (bench.stage_tables) publishes the layout by setting BUCKETED_DIR_CONF to
# the staged directory; load_table transparently serves the bucketed table
# whenever the caller asks for that same directory.
BUCKETED_TABLES = {"lineitem": "l_orderkey", "orders": "o_orderkey"}
BUCKETED_DIR_CONF = "spark.graft.bucketed.dir"
BUCKETED_PREFIX = "graft_bucketed"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Schema-enforced parquet scan for one catalog table."""
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {sorted(SCHEMAS)}")
    ensure_session_confs(spark)
    if name == "events":
        return load_events(spark, sf_dir)
    if name in BUCKETED_TABLES:
        staged = spark.conf.get(BUCKETED_DIR_CONF, None)
        table = f"{BUCKETED_PREFIX}_{name}"
        if (staged and os.path.abspath(staged) == os.path.abspath(sf_dir)
                and spark.catalog.tableExists(table)):
            return spark.table(table)
    return spark.read.schema(SCHEMAS[name]).parquet(table_path(sf_dir, name))


# Physical schema of the legacy events flavor: INT64 TIMESTAMP(NANOS),
# which Spark's reader only admits as LongType (nanosAsLong conf).
_EVENTS_NANOS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])

# keyed on (path, mtime): a regenerated events file with the other flavor
# at the same path must re-sniff, not serve the stale answer
_EVENTS_FLAVOR_CACHE: dict[tuple[str, float], bool] = {}


def events_stores_nanos(spark: SparkSession, path: str) -> bool:
    """Footer sniff (driver-side, one footer — standard catalog discovery).

    Under the nanosAsLong conf, INT64 TIMESTAMP(NANOS) infers as bigint
    while TIMESTAMP(MICROS) infers as a timestamp type, so the inferred
    dtype of `ts` identifies the stored flavor. The conf is ensured HERE
    (not only in load_events) so a direct call on a fresh session can't hit
    'Illegal Parquet type' before the sniff answers.
    """
    ensure_session_confs(spark)
    try:
        mtime = os.path.getmtime(path)
    except OSError:
        mtime = -1.0
    key = (path, mtime)
    cached = _EVENTS_FLAVOR_CACHE.get(key)
    if cached is None:
        inferred = spark.read.parquet(path).schema["ts"].dataType
        cached = isinstance(inferred, T.LongType)
        _EVENTS_FLAVOR_CACHE[key] = cached
    return cached


def load_events(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """events scan normalized to ts: TIMESTAMP_NTZ (no session-tz dependence).

    The current generator stores TIMESTAMP(MICROS, isAdjustedToUTC=false),
    which scans as timestamp_ntz directly; legacy nanosecond files get the
    explicit ns->us conversion on a TIMESTAMP_NTZ epoch literal.
    """
    ensure_session_confs(spark)
    path = table_path(sf_dir, "events")
    if not events_stores_nanos(spark, path):
        return spark.read.schema(SCHEMAS["events"]).parquet(path)
    raw = spark.read.schema(_EVENTS_NANOS_SCHEMA).parquet(path)
    # Integer division: ts/1000 would promote to double and lose precision
    # above 2^53 (epoch nanos are ~1.7e18), shifting some stamps by 1us.
    ts = F.expr(
        "timestampadd(MICROSECOND, ts DIV 1000, "
        "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
    ).alias("ts")
    return raw.select("event_id", ts, "user_id", "event_type", "value", "props")


def load_all(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every catalog table as a temp view for spark.sql queries."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
