"""Statistics-driven join planning (operators/planner.py): the decision
ladder picks the right physical strategy and every strategy returns the
identical result set."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_online_retail_spark.operators.planner import plan_equi_join


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_small_side_broadcasts(spark):
    facts = spark.range(1000).select(F.col("id").alias("k"),
                                     (F.col("id") * 2).alias("v"))
    dim = spark.range(50).select(F.col("id").alias("dk"),
                                 F.col("id").cast("string").alias("name"))
    joined, dec = plan_equi_join(facts, dim, "k", "dk")
    assert dec.strategy == "broadcast" and dec.build_side == "right"
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert joined.count() == 50


def test_skewed_probe_gets_salted_and_matches_plain(spark):
    # probe: 90% of rows share key 7 (hot); build side big by fiat
    # (broadcast bound forced to 0 so the ladder reaches the sketch)
    probe = spark.createDataFrame(
        [(7 if i % 10 else i, i) for i in range(2000)], "k INT, v INT")
    build = spark.createDataFrame(
        [(i, f"b{i}") for i in range(200)], "bk INT, name STRING")
    joined, dec = plan_equi_join(probe, build, "k", "bk",
                                 broadcast_max_bytes=0)
    assert dec.strategy == "salted", dec
    assert dec.top_key_share is not None and dec.top_key_share > 0.2
    plain = probe.join(build, probe.k == build.bk)
    assert _rows(joined) == _rows(plain)        # result-identical
    assert joined.columns == plain.columns
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "explode" in plan or "Generate" in plan  # build replicated


def test_uniform_big_sides_shuffle(spark):
    a = spark.createDataFrame([(i, i) for i in range(2000)], "k INT, v INT")
    b = spark.createDataFrame([(i, i * 3) for i in range(2000)],
                              "bk INT, w INT")
    joined, dec = plan_equi_join(a, b, "k", "bk", broadcast_max_bytes=0)
    assert dec.strategy == "shuffle", dec
    assert dec.top_key_share is not None and dec.top_key_share < 0.2
    assert joined.count() == 2000


def test_skew_share_is_conservative_upper_bound(spark):
    # uniform keys: the CMS share may overestimate (collisions only
    # add), but must stay far under a genuinely hot key's share
    from etl_online_retail_spark.operators.planner import _top_share
    uni = spark.createDataFrame([(i,) for i in range(5000)], "k INT")
    hot = spark.createDataFrame([(7 if i % 5 else i,) for i in range(5000)],
                                "k INT")
    s_uni, s_hot = _top_share(uni, "k"), _top_share(hot, "k")
    assert s_hot > 0.7                      # 80% hot key, CMS >= truth
    assert s_uni < s_hot / 3


def test_string_keyed_big_join_plans_without_ansi_cast_crash(spark):
    # regression: _top_share hardcoded numeric_keys=True, so under ANSI
    # mode the BIGINT cast threw CAST_INVALID_INPUT for any string-keyed
    # join whose sides both exceed the broadcast bound
    a = spark.createDataFrame([(f"u{i % 7}", i) for i in range(2000)],
                              "k STRING, v INT")
    b = spark.createDataFrame([(f"u{i}", i * 3) for i in range(500)],
                              "bk STRING, w INT")
    prev = spark.conf.get("spark.sql.ansi.enabled", None)
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        joined, dec = plan_equi_join(a, b, "k", "bk",
                                     broadcast_max_bytes=0)
        assert dec.strategy in ("salted", "shuffle")
        assert joined.count() == 2000
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.ansi.enabled")
        else:
            spark.conf.set("spark.sql.ansi.enabled", prev)


def test_salt_splits_fully_duplicate_hot_rows(spark):
    # regression: a content-hash salt sent every DUPLICATE row of the
    # hot key to one bucket (no split). The per-row-position salt must
    # spread identical rows across several buckets.
    from etl_online_retail_spark.operators.planner import (
        DEFAULT_SALT_BUCKETS, plan_equi_join as _pej)
    probe = spark.createDataFrame([(7, 1)] * 2000 + [(1, 2), (2, 3)],
                                  "k INT, v INT")
    build = spark.createDataFrame([(i, f"b{i}") for i in range(10)],
                                  "bk INT, name STRING")
    joined, dec = _pej(probe, build, "k", "bk", broadcast_max_bytes=0)
    assert dec.strategy == "salted", dec
    assert joined.count() == 2002
    # measure the split directly with the same salt expression
    salts = (probe.withColumn(
        "_s", F.pmod(F.monotonically_increasing_id(),
                     F.lit(DEFAULT_SALT_BUCKETS)))
        .where(F.col("k") == 7).select("_s").distinct().count())
    assert salts > 1


def test_outer_join_under_skew_refuses_salting_and_stays_correct(spark):
    # 90%-hot probe, LEFT join: salting would emit salt_buckets copies
    # of every unmatched preserved row — the ladder must fall through
    # to shuffle and stay row-identical to the plain join
    probe = spark.createDataFrame(
        [(7 if i % 10 else i, i) for i in range(2000)], "k INT, v INT")
    build = spark.createDataFrame(
        [(7, "hot"), (0, "cold")], "bk INT, name STRING")
    joined, dec = plan_equi_join(probe, build, "k", "bk", how="left",
                                 broadcast_max_bytes=0)
    assert dec.strategy == "shuffle", dec
    assert "salted" in dec.reason or "skew" in dec.reason
    plain = probe.join(build, probe.k == build.bk, "left")
    assert _rows(joined) == _rows(plain)
