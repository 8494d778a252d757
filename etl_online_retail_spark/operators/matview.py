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


def _build_ship_day_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue + row count by ship DATE: the calendar-hierarchy grain.

    One map-side-combined pass over lineitem into ~|distinct ship dates|
    rows (a few thousand for years of data — independent of fact size).
    Both measures are composable partials: the DECIMAL revenue sum
    re-aggregates exactly at any coarser calendar grain (year/month/day
    are functions of the date), and the row COUNT re-aggregates as a
    sum of counts — so this one view serves the whole y/m/d hierarchy
    incl. ROLLUP shapes bit-identically to the base plan.
    """
    li = catalog.load_table(spark, "lineitem", sf_dir)
    return (li.groupBy(F.col("l_shipdate").alias("ship_date"))
              .agg(F.sum(money.net_revenue()).alias("revenue"),
                   F.count(F.lit(1)).alias("n_rows")))


def _build_product_revenue_rollup(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Revenue + row count by product NAME: the reference dashboard's
    top-products chart grain (its Superset slice is GROUP BY p_name).
    Cardinality = |distinct product names| — a reporting grain, not a
    fact grain — built with one broadcast dim lookup and one
    map-side-combined pass over lineitem."""
    li = catalog.load_table(spark, "lineitem", sf_dir)
    p = catalog.load_table(spark, "part", sf_dir).select(
        "p_partkey", "p_name")
    return (li.join(joins.size_guarded_broadcast(p),
                    li.l_partkey == p.p_partkey)
              .groupBy("p_name")
              .agg(F.sum(money.net_revenue()).alias("revenue"),
                   F.count(F.lit(1)).alias("n_rows")))


MATVIEWS: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "star_month_rollup": _build_star_month_rollup,
    "ship_day_rollup": _build_ship_day_rollup,
    "product_revenue_rollup": _build_product_revenue_rollup,
}

# Navigator metadata: each view's GRAIN (the columns it is grouped by)
# and the measures it carries as exact-decimal PARTIAL sums. A measure
# kept as a decimal partial re-aggregates exactly at any coarser grain
# (sum-of-sums — the money.py discipline), which is what makes automatic
# rewrite SOUND: the navigator only ever rolls partials up, never
# apportions them down.
MATVIEW_META: dict[str, dict] = {
    "star_month_rollup": {
        "grain": ("nationkey", "month_start"),
        "measures": {"revenue": "revenue"},
    },
    "ship_day_rollup": {
        "grain": ("ship_date",),
        "measures": {"revenue": "revenue", "n_rows": "n_rows"},
    },
    "product_revenue_rollup": {
        "grain": ("p_name",),
        "measures": {"revenue": "revenue", "n_rows": "n_rows"},
    },
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


def navigate(spark: SparkSession, sf_dir: str, dims: list[str],
             measures: list[str]) -> DataFrame | None:
    """Aggregate navigator (the Kimball "aggregate navigator" / Oracle
    query-rewrite pattern): given the DIMENSIONS a query groups by and
    the MEASURES it sums, return a relation answering it from the
    smallest registered materialized view whose grain covers the
    request — re-aggregated from the view's exact decimal partials when
    the request is coarser — or None when no staged view qualifies (the
    caller then runs its base-table plan unchanged).

    Soundness: a view qualifies only if dims ⊆ its grain and every
    measure is one of its decimal partial sums; partial sums compose
    exactly under re-aggregation (order-independent decimal addition),
    so view-served results are bit-identical to the base plan —
    asserted in tests/test_matview.py. Measures come back still
    DECIMAL; consumers cast at the edge exactly as with the base plan.

    One additional assumption for views BUILT WITH JOINS
    (star_month_rollup joins orders+customer, product_revenue_rollup
    joins part): serving a request coarser than the join dimension is
    only exact when the join loses no fact rows — i.e. FK integrity
    holds, which this warehouse enforces (operators/constraints.py's
    check_warehouse FK rules ride every load). A deployment that
    tolerates orphaned fact rows must register such views with the
    orphans bucketed (left join + a sentinel key), or restrict them to
    requests naming the join dimension.

    At 100 TB this is the difference between scanning the fact table
    and scanning a ~(25 x months)-row summary the incremental writer
    maintains — the navigator makes that substitution automatic for
    every dashboard-grain query instead of hand-wired per call site.
    """
    want_dims, want_measures = set(dims), set(measures)
    candidates = []
    for name, meta in MATVIEW_META.items():
        grain = set(meta["grain"])
        if want_dims <= grain and want_measures <= set(meta["measures"]):
            candidates.append((len(grain), name, meta))
    for _, name, meta in sorted(candidates):      # smallest grain first
        mv = serve(spark, sf_dir, name)
        if mv is None:
            continue
        # measures come back under their REQUESTED names (the mapping's
        # whole point): a view whose internal column is `_sum` must
        # still serve `revenue`, or the rewrite changes the schema
        pairs = [(m, meta["measures"][m]) for m in measures]
        if want_dims == set(meta["grain"]):
            return mv.select(*dims,
                             *[F.col(c).alias(m) for m, c in pairs])
        return (mv.groupBy(*dims)
                .agg(*[F.sum(c).alias(m) for m, c in pairs]))
    return None
