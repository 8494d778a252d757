"""Plan-shape guards against single-partition global sorts.

An ORDER BY window with no PARTITION BY compiles to
`Exchange SinglePartition` + WindowExec — the whole relation moves to
one reducer. Fine over a bounded relation (a stamped top-k result);
a scale-killer over anything that grows with the data. These tests pin
the three queries the round-5 verdict flagged (customer_spend_deciles,
zorder_locality_stats, hybrid_search_rrf's lexical leg) to plans with
NO SinglePartition exchange over an unbounded relation, and pin the
distributed_ntile operator's exactness against the naive global window.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_online_retail_spark.operators.windows import (
    distributed_ntile,
    distributed_rank,
)

SF = "/root/testdata/sf0.01"


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_spend_deciles_plan_has_no_single_partition_exchange(spark):
    from etl_online_retail_spark.workload import q_customer_spend_deciles

    plan = _executed(q_customer_spend_deciles(spark, SF))
    assert "SinglePartition" not in plan, plan
    assert "ntile" not in plan        # closed-form, not a global window


def test_zorder_stats_plan_has_no_single_partition_exchange(spark):
    from etl_online_retail_spark.workload_ext import q_zorder_locality_stats

    plan = _executed(q_zorder_locality_stats(spark, SF))
    assert "SinglePartition" not in plan, plan
    assert "ntile" not in plan


def test_hybrid_rrf_lexical_leg_is_take_ordered(spark):
    """The corpus-fraction-sized ranked relation must be cut with
    TakeOrderedAndProject (per-partition heaps) BEFORE any rank stamp;
    the only windows left operate on the bounded top-k results."""
    from etl_online_retail_spark.workload_ext import q_hybrid_search_rrf

    plan = _executed(q_hybrid_search_rrf(spark, SF))
    assert "TakeOrderedAndProject" in plan, plan


def test_distributed_rank_equals_global_window(spark):
    df = spark.createDataFrame(
        [((i * 37) % 101, i) for i in range(1000)], "v INT, id INT")
    got, total = distributed_rank(
        df, order=[F.asc("v"), F.asc("id")], shard_by=F.col("v"),
        n_shards=8, alias="r")
    assert total == 1000
    w = Window.orderBy(F.asc("v"), F.asc("id"))
    want = df.withColumn("r", F.row_number().over(w).cast("bigint"))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))
    assert "SinglePartition" not in _executed(got)


def test_distributed_ntile_equals_global_ntile_with_remainder(spark):
    # 1003 rows % 7 buckets: first 2 buckets get 144, rest 143
    df = spark.createDataFrame(
        [((i * 17) % 211, i) for i in range(1003)], "v INT, id INT")
    got = distributed_ntile(df, order=[F.desc("v"), F.asc("id")],
                            shard_by=-F.col("v"), n=7, n_shards=8,
                            alias="b")
    w = Window.orderBy(F.desc("v"), F.asc("id"))
    want = df.withColumn("b", F.ntile(7).over(w))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))


def test_distributed_ntile_fewer_rows_than_buckets(spark):
    df = spark.createDataFrame([(i, i) for i in range(4)], "v INT, id INT")
    got = distributed_ntile(df, order=[F.asc("v"), F.asc("id")],
                            shard_by=F.col("v"), n=10, n_shards=4,
                            alias="b")
    assert sorted(r["b"] for r in got.collect()) == [1, 2, 3, 4]


def test_dense_keys_distributed_equals_dense_keys(spark):
    """The monster-dim SERIAL variant: same 1..N+offset ids over the
    same natural order as the single-window dense_keys, with no
    SinglePartition exchange in the plan."""
    from etl_online_retail_spark.operators.surrogate import (
        dense_keys,
        dense_keys_distributed,
    )

    dim = spark.createDataFrame(
        [((i * 37) % 101, f"n{i}") for i in range(500)],
        "nk INT, name STRING").distinct()
    want = sorted(map(tuple, dense_keys(
        dim, ["nk", "name"], "id", offset=1).collect()))
    got_df = dense_keys_distributed(
        dim, ["nk", "name"], "id", shard_by=F.col("nk"), offset=1)
    assert sorted(map(tuple, got_df.collect())) == want
    assert "SinglePartition" not in _executed(got_df)


def test_distributed_rank_constant_key_single_shard_still_exact(spark):
    # degenerate: every shard_by value equal -> one shard, ranks exact
    df = spark.createDataFrame([(5, i) for i in range(50)], "v INT, id INT")
    got, total = distributed_rank(df, order=[F.asc("v"), F.asc("id")],
                                  shard_by=F.col("v"), n_shards=8,
                                  alias="r")
    assert total == 50
    assert sorted(r["r"] for r in got.collect()) == list(range(1, 51))


def test_distributed_rank_null_shard_values_nulls_first(spark):
    """NULL shard_by rows crashed the driver-side offset fold (ADVICE
    r6: NULL _shard vs int in sorted()); they must instead land in a
    dedicated shard matching the order's null placement — here Spark's
    asc default, NULLS FIRST."""
    rows = [((i * 37) % 101, i) for i in range(200)] + \
           [(None, 1000 + i) for i in range(13)]
    df = spark.createDataFrame(rows, "v INT, id INT")
    got, total = distributed_rank(
        df, order=[F.asc("v"), F.asc("id")], shard_by=F.col("v"),
        n_shards=8, alias="r")
    assert total == 213
    w = Window.orderBy(F.asc("v"), F.asc("id"))
    want = df.withColumn("r", F.row_number().over(w).cast("bigint"))
    by_id = lambda rows_: sorted(map(tuple, rows_), key=lambda t: t[1])
    assert by_id(got.collect()) == by_id(want.collect())


def test_distributed_rank_null_shard_values_nulls_last(spark):
    rows = [((i * 37) % 101, i) for i in range(200)] + \
           [(None, 1000 + i) for i in range(13)]
    df = spark.createDataFrame(rows, "v INT, id INT")
    got, _ = distributed_rank(
        df, order=[F.asc_nulls_last("v"), F.asc("id")], shard_by=F.col("v"),
        n_shards=8, alias="r", nulls="last")
    w = Window.orderBy(F.asc_nulls_last("v"), F.asc("id"))
    want = df.withColumn("r", F.row_number().over(w).cast("bigint"))
    by_id = lambda rows_: sorted(map(tuple, rows_), key=lambda t: t[1])
    assert by_id(got.collect()) == by_id(want.collect())


def test_distributed_ntile_by_null_shard_values(spark):
    """Per-group variant with NULL quality scores in one group — the
    curriculum_order/perplexity_buckets caller shape (ADVICE r6)."""
    from etl_online_retail_spark.operators.windows import (
        distributed_ntile_by,
    )

    rows = ([("a", i if i % 7 else None, i) for i in range(60)]
            + [("b", i, 100 + i) for i in range(40)])
    df = spark.createDataFrame(rows, "g string, v int, id int") \
        .repartition(8)
    got = {(r.g, r.id): r.bucket for r in
           distributed_ntile_by(df, ["g"], order=[F.asc("v"), F.asc("id")],
                                shard_by=F.col("v"), n=3,
                                n_shards=4).collect()}
    w = Window.partitionBy("g").orderBy(F.asc("v"), F.asc("id"))
    want = {(r.g, r.id): r.want for r in
            df.withColumn("want", F.ntile(3).over(w)).collect()}
    assert got == want


def test_distributed_ntile_by_desc_order_with_nulls_last(spark):
    """The perplexity/curriculum caller shape: DESC order (Spark's
    F.desc = desc_nulls_last) with NULL scores — nulls='last' must
    reproduce the window's placement exactly (r7 review: the wrappers
    previously could not express it)."""
    from etl_online_retail_spark.operators.windows import (
        distributed_ntile_by,
    )

    rows = ([("a", None if i % 9 == 0 else float(i * 37 % 101), i)
             for i in range(80)]
            + [("b", float(i), 100 + i) for i in range(30)])
    df = spark.createDataFrame(rows, "g string, v double, id int") \
        .repartition(8)
    got = {(r.g, r.id): r.bucket for r in
           distributed_ntile_by(df, ["g"],
                                order=[F.desc("v"), F.asc("id")],
                                shard_by=-F.col("v"), n=3,
                                n_shards=4, nulls="last").collect()}
    w = Window.partitionBy("g").orderBy(F.desc("v"), F.asc("id"))
    want = {(r.g, r.id): r.want for r in
            df.withColumn("want", F.ntile(3).over(w)).collect()}
    assert got == want


def test_distributed_ntile_by_equals_partitioned_ntile(spark):
    """The partitioned variant must reproduce NTILE(n) OVER (PARTITION BY
    g ORDER BY ...) bit-for-bit, including groups with remainders, groups
    smaller than n, and a NULL group key."""
    from etl_online_retail_spark.operators.windows import (
        distributed_ntile_by,
    )

    rows = ([("a", i) for i in range(103)]         # remainder group
            + [("b", i) for i in range(60)]        # exact-split group
            + [("c", i) for i in range(2)]         # fewer rows than n
            + [(None, i) for i in range(7)])       # NULL group
    df = spark.createDataFrame(rows, "g string, v int").repartition(8)
    got = {((r.g, r.v)): r.bucket for r in
           distributed_ntile_by(df, ["g"], order=[F.asc("v")],
                                shard_by=F.col("v"), n=3,
                                n_shards=4).collect()}
    w = Window.partitionBy("g").orderBy(F.asc("v"))
    want = {((r.g, r.v)): r.want for r in
            df.withColumn("want", F.ntile(3).over(w)).collect()}
    assert got == want


def test_perplexity_buckets_windows_are_all_sharded(spark):
    """The LM relation legitimately reduces to one partition for the
    single-row corpus-total aggregate (KB of data), so a blanket
    SinglePartition assertion would be wrong here; what must never
    appear is a WINDOW over an unsharded relation — every window spec
    in the plan has to carry the range-shard key."""
    import re

    from etl_online_retail_spark.workload_ext import q_perplexity_buckets

    plan = _executed(q_perplexity_buckets(spark, SF))
    assert "ntile" not in plan
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    for spec in specs:
        assert "_shard" in spec, spec


def test_distributed_rank_by_offset_cardinality_guard(spark, monkeypatch):
    """Misusing a KEY column as part_cols must fail loudly (ValueError
    naming the bound) BEFORE the offset collect — never a silent driver
    OOM. The bound is monkeypatched down so the test stays tiny."""
    import pytest

    from etl_online_retail_spark.operators import windows
    from etl_online_retail_spark.operators.windows import distributed_rank_by

    df = spark.createDataFrame(
        [(i, (i * 7) % 97) for i in range(200)], "key INT, v INT")
    monkeypatch.setattr(windows, "MAX_OFFSET_ROWS", 50)
    with pytest.raises(ValueError, match="MAX_OFFSET_ROWS"):
        # part_cols is the 200-value key -> >= 200 offset rows > 50
        distributed_rank_by(df, ["key"], order=[F.asc("v")],
                            shard_by=F.col("v"), n_shards=4)
    # bounded part_cols still work under the same patched bound
    got = distributed_rank_by(
        df.withColumn("g", F.col("key") % 2), ["g"],
        order=[F.asc("v"), F.asc("key")], shard_by=F.col("v"), n_shards=4)
    assert got.count() == 200
