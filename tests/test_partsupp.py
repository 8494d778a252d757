"""Synthesized partsupp invariants (sources/partsupp.py).

The relation is a pure integer function of (p_partkey, |supplier|);
these pin the spec-shaped guarantees the TPC-H queries over it rely on.
Cross-engine row equality is covered by the partsupp_build oracle twin.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_online_retail_spark.sources.partsupp import (
    SUPPLIERS_PER_PART,
    load_partsupp,
)

SF = "/root/testdata/sf0.001"


def test_exactly_four_distinct_suppliers_per_part(spark):
    ps = load_partsupp(spark, SF)
    per_part = (ps.groupBy("ps_partkey")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.count_distinct("ps_suppkey").alias("nd")))
    bad = per_part.filter((F.col("n") != SUPPLIERS_PER_PART)
                          | (F.col("nd") != SUPPLIERS_PER_PART)).count()
    assert bad == 0


def test_keys_cover_real_dimension_ranges(spark):
    from etl_online_retail_spark.catalog import load_table

    ps = load_partsupp(spark, SF)
    s_cnt = load_table(spark, "supplier", SF).count()
    p_cnt = load_table(spark, "part", SF).count()
    row = ps.agg(
        F.min("ps_suppkey").alias("min_sk"), F.max("ps_suppkey").alias("max_sk"),
        F.count_distinct("ps_partkey").alias("n_parts"),
        F.min("ps_availqty").alias("min_q"), F.max("ps_availqty").alias("max_q"),
        F.min("ps_supplycost_cents").alias("min_c"),
        F.max("ps_supplycost_cents").alias("max_c")).first()
    assert row.min_sk >= 0 and row.max_sk < s_cnt
    assert row.n_parts == p_cnt
    assert 1 <= row.min_q and row.max_q <= 9999
    assert 100 <= row.min_c and row.max_c <= 100099


def test_derivation_is_deterministic(spark):
    a = sorted(map(tuple, load_partsupp(spark, SF).collect()))
    b = sorted(map(tuple, load_partsupp(spark, SF).collect()))
    assert a == b


def test_build_plan_has_no_data_sized_shuffle(spark):
    """4 x |part| rows from one part scan cross two broadcast
    singletons — materializing the relation must never shuffle the
    part-sized data (no hash/range repartitioning). The only exchanges
    allowed are broadcasts and the supplier COUNT's one-row
    SinglePartition pair (a global aggregate's partial->final step over
    a single row — bounded by construction). Asserted on the AQE FINAL
    plan after an action; the r7 review found the original disjunctive
    assertion vacuously true."""
    df = load_partsupp(spark, SF)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert plan.count("Exchange SinglePartition") <= 2, plan


def test_suppkey_formula_distinct_for_any_catalog_shape():
    """Pure-formula property (no Spark): for every supplier count
    S >= 4 and any part key, the four assigned suppliers are distinct
    and in range — the stride S div 4 makes i*(S div 4) pairwise
    distinct mod S for i in 0..3 (3*(S div 4) < S)."""
    from hypothesis import given
    from hypothesis import strategies as st

    @given(st.integers(min_value=4, max_value=100_000),
           st.integers(min_value=0, max_value=10**13))
    def check(s_cnt, pk):
        sks = {(pk + pk // s_cnt + i * (s_cnt // 4)) % s_cnt
               for i in range(4)}
        assert len(sks) == 4
        assert all(0 <= sk < s_cnt for sk in sks)

    check()


def test_supplycost_is_cents_over_100(spark):
    ps = load_partsupp(spark, SF)
    bad = ps.filter(
        F.col("ps_supplycost")
        != F.col("ps_supplycost_cents").cast("double") / 100.0).count()
    assert bad == 0
