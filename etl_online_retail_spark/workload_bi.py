"""BI-surface workload: the reference's virtual dataset, chart queries
through the semantic layer, multi-dim grouping variants, and the complete
star-schema fact build (SURVEY.md §2.9, §3.2).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_online_retail_spark.functions import money
from etl_online_retail_spark.functions.datetime_fns import date_key
from etl_online_retail_spark.operators import joins
from etl_online_retail_spark.operators.windows import top_n_per_group
from etl_online_retail_spark.workload import REV, YMD_KEY, _t, register

# ---------------------------------------------------------------------------
# §2.9 / §3.2 — the virtual dataset: star projection + date-window filter
# (superset.db#tables[2].sql re-expressed on the TPC-H-ish tables)

_VDS_ORACLE = f"""
SELECT CAST(o_orderdate AS DATE) AS order_date,
       o_orderkey AS invoice_id,
       c_custkey AS cust_id,
       n_name AS cust_country,
       l_partkey AS stock_code,
       p_name AS prod_name,
       CAST({REV} AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN part ON l_partkey = p_partkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
"""


@register("virtual_dataset_window", _VDS_ORACLE, "§2.9-vds,P3,P7,F4,J3")
def q_virtual_dataset(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    p = _t(spark, sf_dir, "part")
    star = (li.join(o.filter((F.col("o_orderdate") >= "1996-01-01")
                             & (F.col("o_orderdate") < "1997-01-01")),
                    li.l_orderkey == o.o_orderkey)
              .join(joins.size_guarded_broadcast(c), o.o_custkey == c.c_custkey)
              .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
              .join(joins.size_guarded_broadcast(p), li.l_partkey == p.p_partkey))
    return star.select(
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.col("o_orderkey").alias("invoice_id"),
        F.col("c_custkey").alias("cust_id"),
        F.col("n_name").alias("cust_country"),
        F.col("l_partkey").alias("stock_code"),
        F.col("p_name").alias("prod_name"),
        money.net_revenue().cast("double").alias("revenue"),
    )


# §2.5 A5 variants — CUBE and GROUPING SETS (free in Spark, documented absent
# in the reference; ROLLUP is in workload.py)

@register(
    "revenue_cube",
    "SELECT l_returnflag, l_linestatus, "
    f"CAST(SUM({REV}) AS DOUBLE) AS revenue, COUNT(*) AS n_rows "
    "FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)",
    "A5-cube",
)
def q_revenue_cube(spark, sf_dir):
    # Navigator rewrite (r10): the CUBE composes from the flag-day
    # rollup's partials (sums of revenue partials + sums of counts) —
    # the cube expansion then runs over a handful of summary rows
    # instead of the fact. Base plan stays the oracle path.
    from etl_online_retail_spark.operators import matview

    nav = matview.navigate(spark, sf_dir,
                           ["l_returnflag", "l_linestatus"],
                           ["revenue", "n_rows"])
    if nav is not None:
        return (nav.cube("l_returnflag", "l_linestatus")
                   .agg(F.sum("revenue").cast("double").alias("revenue"),
                        F.sum("n_rows").alias("n_rows")))
    li = _t(spark, sf_dir, "lineitem")
    return (li.select("l_returnflag", "l_linestatus",
                      money.net_revenue().alias("_rev"))
              .cube("l_returnflag", "l_linestatus")
              .agg(F.sum("_rev").cast("double").alias("revenue"),
                   F.count(F.lit(1)).alias("n_rows")))


@register(
    "revenue_grouping_sets",
    "SELECT l_returnflag, CAST(year(l_shipdate) AS INTEGER) AS year, "
    f"CAST(SUM({REV}) AS DOUBLE) AS revenue "
    "FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (year), ())",
    "A5-grouping-sets",
)
def q_revenue_grouping_sets(spark, sf_dir):
    # Navigator rewrite (r10): every grouping set — (returnflag),
    # (ship year), () — is coarser than the flag-day rollup's grain, so
    # the expansion runs over the re-aggregated summary partials.
    from etl_online_retail_spark.operators import matview

    nav = matview.navigate(spark, sf_dir, ["l_returnflag", "ship_date"],
                           ["revenue"])
    if nav is not None:
        pre = nav.select("l_returnflag",
                         F.year("ship_date").cast("int").alias("year"),
                         F.col("revenue").alias("_rev"))
        pre.createOrReplaceTempView("_gs_lineitem_mv")
        return spark.sql(
            "SELECT l_returnflag, year, "
            "CAST(SUM(_rev) AS DOUBLE) AS revenue FROM _gs_lineitem_mv "
            "GROUP BY GROUPING SETS ((l_returnflag), (year), ())")
    li = (_t(spark, sf_dir, "lineitem")
          .select("l_returnflag",
                  F.year("l_shipdate").cast("int").alias("year"),
                  money.net_revenue().alias("_rev")))
    li.createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        "SELECT l_returnflag, year, "
        "CAST(SUM(_rev) AS DOUBLE) AS revenue FROM _gs_lineitem "
        "GROUP BY GROUPING SETS ((l_returnflag), (year), ())")


# §2.6 — Superset "series limit": top-N rows per group via ranking window

@register(
    "top3_orders_per_priority",
    "SELECT o_orderpriority, o_orderkey, "
    "CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price FROM ("
    "  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority "
    "    ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders) "
    "WHERE rn <= 3",
    "§2.6-topn-per-group",
)
def q_top3_per_priority(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    top = top_n_per_group(o, ["o_orderpriority"],
                          [F.desc("o_totalprice"), F.asc("o_orderkey")], 3)
    return top.select("o_orderpriority", "o_orderkey",
                      money.exact("o_totalprice").cast("double")
                           .alias("total_price"))


# set operations (documented absent in the reference, §2.10; native in Spark)

@register(
    "segment_set_ops",
    "SELECT c_custkey, 'both' AS tag FROM ("
    "  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING' "
    "  INTERSECT "
    "  SELECT c_custkey FROM customer WHERE c_acctbal > 0) "
    "UNION ALL "
    "SELECT c_custkey, 'only_building' AS tag FROM ("
    "  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING' "
    "  EXCEPT "
    "  SELECT c_custkey FROM customer WHERE c_acctbal > 0)",
    "set-ops",
)
def q_segment_set_ops(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    positive = c.filter(F.col("c_acctbal") > 0).select("c_custkey")
    both = building.intersect(positive).select(
        "c_custkey", F.lit("both").alias("tag"))
    only_b = building.exceptAll(positive).distinct().select(
        "c_custkey", F.lit("only_building").alias("tag"))
    return both.unionByName(only_b)


# §2.4 J1/J2 + M4 — the complete fact build: clean -> dim lookups -> fact.
# The full output (one row per lineitem) is hash-compared, proving the
# surrogate-key pipeline end-to-end.

_FACT_ORACLE = f"""
WITH dim_c AS (
  SELECT 1 AS customer_dim_id, '00000' AS customer_id
  UNION ALL
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY c_custkey) + 1 AS INTEGER),
         lpad(CAST(c_custkey AS VARCHAR), 5, '0') FROM customer),
dim_p AS (
  SELECT 1 AS product_dim_id, '00000' AS part_id
  UNION ALL
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY p_partkey) + 1 AS INTEGER),
         lpad(CAST(p_partkey AS VARCHAR), 5, '0') FROM part)
SELECT l_orderkey AS invoice_id, l_linenumber,
       {YMD_KEY.format(c='o_orderdate')} AS invoice_date_dim_id,
       dim_p.product_dim_id, dim_c.customer_dim_id,
       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS unit_price,
       CAST(l_quantity AS INTEGER) AS quantity
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN dim_c ON lpad(CAST(o_custkey AS VARCHAR), 5, '0') = dim_c.customer_id
JOIN dim_p ON lpad(CAST(l_partkey AS VARCHAR), 5, '0') = dim_p.part_id
"""


@register("fact_table_build", _FACT_ORACLE, "J1,J2,M4,§7-SERIAL")
def q_fact_table_build(spark, sf_dir):
    from etl_online_retail_spark.operators.joins import broadcast_lookup
    from etl_online_retail_spark.operators.surrogate import (
        dense_keys,
        with_unknown_member,
    )

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")

    cust = (_t(spark, sf_dir, "customer")
            .select(F.lpad(F.col("c_custkey").cast("string"), 5, "0")
                     .alias("customer_id"), "c_custkey"))
    dim_c = with_unknown_member(
        dense_keys(cust, ["c_custkey"], "customer_dim_id", offset=1)
        .select("customer_dim_id", "customer_id"),
        "customer_dim_id", "customer_id")

    prod = (_t(spark, sf_dir, "part")
            .select(F.lpad(F.col("p_partkey").cast("string"), 5, "0")
                     .alias("part_id"), "p_partkey"))
    dim_p = with_unknown_member(
        dense_keys(prod, ["p_partkey"], "product_dim_id", offset=1)
        .select("product_dim_id", "part_id"),
        "product_dim_id", "part_id")

    staged = (li.join(o, li.l_orderkey == o.o_orderkey)
                .withColumn("customer_id",
                            F.lpad(F.col("o_custkey").cast("string"), 5, "0"))
                .withColumn("part_id",
                            F.lpad(F.col("l_partkey").cast("string"), 5, "0")))
    staged = broadcast_lookup(staged, dim_c, on="customer_id", how="inner")
    staged = broadcast_lookup(staged, dim_p, on="part_id", how="inner")
    return staged.select(
        F.col("l_orderkey").alias("invoice_id"), "l_linenumber",
        date_key("o_orderdate").alias("invoice_date_dim_id"),
        "product_dim_id", "customer_dim_id",
        money.exact("l_extendedprice").cast("double").alias("unit_price"),
        F.col("l_quantity").cast("int").alias("quantity"),
    )


# SCD Type 2 — the history-keeping dimension build the reference's
# drop-and-reload dims (etl.py:150-170) cannot express. The events table is
# the change log; event_type plays the tracked attribute ("segment").

_SCD2_VER = """
WITH obs AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER w AS prev_type,
         lag(ts) OVER w AS prev_ts
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
opens AS (
  SELECT user_id, ts, event_id, event_type FROM obs
  WHERE prev_ts IS NULL OR event_type IS DISTINCT FROM prev_type),
ver AS (
  SELECT user_id, event_type AS segment, ts AS effective_from,
         CAST(ROW_NUMBER() OVER w2 AS INTEGER) AS version,
         lead(ts) OVER w2 AS effective_to
  FROM opens WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id))
"""

_SCD2_ORACLE = _SCD2_VER + """
SELECT user_id, version, segment, effective_from, effective_to,
       effective_to IS NULL AS is_current
FROM ver
"""


@register("user_segment_scd2", _SCD2_ORACLE, "M4-scd2-build")
def q_user_segment_scd2(spark, sf_dir):
    from etl_online_retail_spark.operators.scd import scd2_from_changelog

    ev = _t(spark, sf_dir, "events")
    dim = scd2_from_changelog(ev, key_col="user_id",
                              attr_cols=["event_type"], ts_col="ts",
                              tiebreak_col="event_id")
    return dim.select("user_id", "version",
                      F.col("event_type").alias("segment"),
                      "effective_from", "effective_to", "is_current")


_SCD2_PIT_ORACLE = _SCD2_VER + """
SELECT e.event_id, e.user_id, v.version AS segment_version,
       v.segment AS segment_at_ts
FROM events e
LEFT JOIN ver v
  ON e.user_id = v.user_id
 AND e.ts >= v.effective_from
 AND (v.effective_to IS NULL OR e.ts < v.effective_to)
"""


@register("events_pit_segment", _SCD2_PIT_ORACLE, "M4-scd2-point-in-time")
def q_events_pit_segment(spark, sf_dir):
    from etl_online_retail_spark.operators.scd import (
        scd2_from_changelog,
        scd2_lookup,
    )

    ev = _t(spark, sf_dir, "events")
    dim = (scd2_from_changelog(ev, key_col="user_id",
                               attr_cols=["event_type"], ts_col="ts",
                               tiebreak_col="event_id")
           .select("user_id", "version",
                   F.col("event_type").alias("segment"),
                   "effective_from", "effective_to"))
    facts = ev.select("event_id", "user_id", "ts")
    out = scd2_lookup(dim, facts, key_col="user_id", ts_col="ts")
    return out.select("event_id", "user_id",
                      F.col("version").alias("segment_version"),
                      F.col("segment").alias("segment_at_ts"))


# scale variant of A3: HyperLogLog++ sketch (approximate - no value oracle;
# the driver records a rows-only check and tests assert the error bound)

@register("approx_customers_by_nation", None, "A3-approx-scale")
def q_approx_customers_by_nation(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
             .groupBy(F.col("n_name").alias("nation"))
             .agg(F.approx_count_distinct("c_custkey", 0.02)
                   .alias("approx_customers")))


# monthly revenue through the semantic (chart) layer - proves the Superset
# query-object path compiles to the same result as the direct SQL

@register(
    "chart_monthly_revenue",
    "SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS __timestamp, "
    f"CAST(SUM({REV}) AS DOUBLE) AS revenue FROM lineitem GROUP BY 1",
    "§3.2-semantic-layer,T1",
)
def q_chart_monthly_revenue(spark, sf_dir):
    # The chart declares its dataset + semantic measure, so when the
    # staged warehouse has the ship-day rollup materialized the compiler
    # routes it through the aggregate navigator automatically (month is
    # a function of the view's ship date; the decimal partials
    # re-aggregate exactly) — otherwise it compiles over the base fact
    # unchanged, which stays the driver's oracle path.
    from etl_online_retail_spark.plans.semantic import (
        ChartSpec,
        Metric,
        chart_query_navigated,
    )

    li = _t(spark, sf_dir, "lineitem")
    spec = ChartSpec(
        metrics=(Metric("SUM", money.net_revenue(), "revenue",
                        measure="revenue"),),
        time_column="l_shipdate", time_grain="P1M",
        dataset="lineitem",
    )
    out = chart_query_navigated(spark, sf_dir, li, spec)
    return out.select("__timestamp", F.col("revenue").cast("double"))


# ---------------------------------------------------------------------------
# §2.6 window completions (r5): relative-rank forms. percent_rank and
# cume_dist are (rank-1)/(n-1) and rank_with_ties/n — exact small-integer
# divisions in DOUBLE, identical on both engines when the ORDER BY is a
# total order (custkey tie-break), so no rounding is needed.

@register(
    "customer_balance_relrank",
    "SELECT c_custkey, c_mktsegment, "
    "percent_rank() OVER w AS pr, "
    "cume_dist() OVER w AS cd "
    "FROM customer "
    "WINDOW w AS (PARTITION BY c_mktsegment "
    "             ORDER BY c_acctbal, c_custkey)",
    "W-percent-rank-cume-dist",
)
def q_customer_balance_relrank(spark, sf_dir):
    from pyspark.sql import Window

    w = (Window.partitionBy("c_mktsegment")
         .orderBy(F.col("c_acctbal"), F.col("c_custkey")))
    return (_t(spark, sf_dir, "customer")
            .select("c_custkey", "c_mktsegment",
                    F.percent_rank().over(w).alias("pr"),
                    F.cume_dist().over(w).alias("cd")))


# LATERAL correlated subquery (the SQL-frontend parity row): per nation,
# its top-2 customers by balance. Both engines execute the correlated
# derived table natively (Spark 3.4+ LATERAL; DuckDB LATERAL); the inner
# ORDER BY carries the custkey tie-break so the LIMIT is a deterministic
# set. The Spark side goes through sql_lab — the reference's ad-hoc SQL
# surface — rather than the DataFrame API, pinning that the SQL text a
# user brings runs unchanged.

_LATERAL_SQL = """
SELECT n_name AS nation, t.c_custkey, t.c_name,
       CAST(CAST(t.c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
FROM nation,
LATERAL (SELECT c_custkey, c_name, c_acctbal
         FROM customer
         WHERE c_nationkey = n_nationkey
         ORDER BY c_acctbal DESC, c_custkey
         LIMIT 2) t
"""


@register("lateral_top_customers", _LATERAL_SQL, "SQL-lateral-correlated")
def q_lateral_top_customers(spark, sf_dir):
    from etl_online_retail_spark.plans.sql_frontend import sql_lab

    return sql_lab(spark, sf_dir, _LATERAL_SQL, enforced_limit=None)
