"""Semantic (chart) layer: Superset query-object -> DataFrame (SURVEY §3.2).

The reference's five dashboard charts are JSON chart params
(superset.db#slices[2-7]) that Superset compiles to SQL over a virtual
dataset: metrics (SUM / COUNT DISTINCT / COUNT), groupbys, a time grain
(DATE_TRUNC), adhoc filters, ORDER BY metric DESC, row_limit. ChartSpec is
that query object; chart_query compiles it onto any source DataFrame.

Catalyst sees one declarative plan per chart, so the virtual-dataset
subquery + chart aggregation fuse: filters push into the scan and the
grain/groupby becomes a single hash aggregate.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_online_retail_spark.functions.datetime_fns import month_start

GRAINS = {
    "P1D": lambda c: F.col(c).cast("date"),
    "P1M": lambda c: month_start(c),
    "P1Y": lambda c: F.date_trunc("year", F.col(c)).cast("date"),
}

AGGREGATES = {
    "SUM": lambda c: F.sum(c),
    "AVG": lambda c: F.avg(c),
    # order-independent average: exact decimal SUM / COUNT (float AVG
    # differs in last ulps under re-partitioning; this one never does)
    "AVG_EXACT": lambda c: (F.sum(c.cast("decimal(18,4)")).cast("double")
                            / F.count(c)),
    "MIN": lambda c: F.min(c),
    "MAX": lambda c: F.max(c),
    "COUNT": lambda c: F.count(c),
    "COUNT_DISTINCT": lambda c: F.countDistinct(c),
}


@dataclass(frozen=True)
class Metric:
    agg: str           # key into AGGREGATES
    column: str | Column
    label: str
    # semantic measure name (operators/matview.py MATVIEW_META key) when
    # this metric is navigable off a materialized summary: "revenue" for
    # the exact decimal revenue term, "n_rows" for row counts. None =
    # the metric only exists on the base relation.
    measure: str | None = None


@dataclass(frozen=True)
class ChartSpec:
    """One chart = one Superset query object (slices[*].params)."""
    metrics: tuple[Metric, ...]
    groupby: tuple[str, ...] = ()
    time_column: str | None = None      # granularity_sqla
    time_grain: str | None = None       # time_grain_sqla, e.g. "P1M"
    filters: tuple[Column, ...] = ()    # adhoc_filters
    order_desc: bool = True
    row_limit: int | None = None        # Superset always enforces one
    series_limit: int | None = None     # top-N series via ranking window
    # logical dataset name ("lineitem", ...) when the chart's source is a
    # base fact relation the aggregate navigator knows time dims for
    dataset: str | None = None


def chart_query(source: DataFrame, spec: ChartSpec) -> DataFrame:
    """Compile a ChartSpec over the (virtual-dataset) source DataFrame."""
    df = source
    for flt in spec.filters:
        df = df.filter(flt)

    keys: list[Column] = [F.col(g) for g in spec.groupby]
    if spec.time_column is not None:
        grain = spec.time_grain or "P1D"
        keys.append(GRAINS[grain](spec.time_column).alias("__timestamp"))

    aggs = [AGGREGATES[m.agg](m.column).alias(m.label) for m in spec.metrics]
    out = df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)

    if spec.series_limit and spec.groupby:
        # Superset "series limit": keep top-N groups by the first metric.
        from pyspark.sql import Window

        first = spec.metrics[0].label
        totals = (out.groupBy(*[F.col(g) for g in spec.groupby])
                     .agg(F.sum(first).alias("__series_total")))
        w = Window.orderBy(F.desc("__series_total"), *[F.asc(g) for g in spec.groupby])
        top = (totals.withColumn("__rn", F.row_number().over(w))
                     .filter(F.col("__rn") <= spec.series_limit)
                     .select(*spec.groupby))
        out = out.join(F.broadcast(top), list(spec.groupby), "left_semi")

    if spec.metrics and spec.row_limit is not None:
        first = spec.metrics[0].label
        order = [F.desc(first) if spec.order_desc else F.asc(first)]
        order += [F.asc(g) for g in spec.groupby]
        out = out.orderBy(*order).limit(spec.row_limit)
    return out


def _navigated_spec(spark, sf_dir: str, spec: ChartSpec) -> DataFrame | None:
    """Rewrite a navigable chart onto a materialized summary, or None.

    A chart navigates when (a) it declares its dataset and every metric's
    semantic measure, (b) every metric is SUM-decomposable over the
    view's partials (SUM -> sum of decimal partial sums, COUNT -> sum of
    count partials — both exact, the matview soundness argument), (c) it
    has no ad-hoc filters or extra groupbys (those would need dimension
    mappings the registry doesn't carry), and (d) its time column maps to
    a registered view grain date (matview.SEMANTIC_TIME_DIMS). Any time
    GRAIN then composes: day/month/year are functions of the view's date
    column. The rewritten spec runs through the SAME chart_query
    compiler over the summary relation, so ordering/limit semantics are
    identical by construction.
    """
    from etl_online_retail_spark.operators import matview

    if spec.filters or spec.groupby or spec.dataset is None \
            or spec.time_column is None:
        return None
    date_col = matview.SEMANTIC_TIME_DIMS.get(
        (spec.dataset, spec.time_column))
    if date_col is None:
        return None
    rewritten = []
    for m in spec.metrics:
        # SUM only: a COUNT(column) metric skips NULLs, while the view's
        # count partial counts every row (COUNT(*) semantics) — rewriting
        # COUNT would silently change results on a nullable column, and
        # the oracle gate never sees served plans. A chart wanting the
        # row count declares it as SUM over the "n_rows" measure.
        if m.measure is None or m.agg != "SUM":
            return None
        rewritten.append(Metric("SUM", m.measure, m.label))
    nav = matview.navigate(spark, sf_dir, [date_col],
                           [m.column for m in rewritten])
    if nav is None:
        return None
    respec = ChartSpec(metrics=tuple(rewritten),
                       time_column=date_col, time_grain=spec.time_grain,
                       order_desc=spec.order_desc,
                       row_limit=spec.row_limit)
    return chart_query(nav, respec)


def chart_query_navigated(spark, sf_dir: str, source: DataFrame,
                          spec: ChartSpec) -> DataFrame:
    """chart_query with automatic aggregate navigation: serve the chart
    from a materialized summary when one is staged and the spec is
    navigable, else compile over the base source unchanged (the oracle
    path — the driver never stages views)."""
    nav = _navigated_spec(spark, sf_dir, spec)
    return nav if nav is not None else chart_query(source, spec)
