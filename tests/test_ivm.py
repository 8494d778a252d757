"""Join-view incremental maintenance: the delta algebra must reproduce
the full recompute exactly (multiset), including duplicate join keys and
empty deltas."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from etl_online_retail_spark.operators.ivm import (
    append_join_delta,
    maintain_join_view,
)


def _rows(df):
    return Counter(tuple(r) for r in df.collect())


def test_append_join_delta_partitions_the_new_pairs(spark):
    a_old = spark.createDataFrame([(1, "a1"), (2, "a2")], "k INT, pa STRING")
    b_old = spark.createDataFrame([(1, "b1")], "k INT, pb STRING")
    a_new = spark.createDataFrame([(1, "a3"), (3, "a4")], "k INT, pa STRING")
    b_new = spark.createDataFrame([(2, "b2"), (3, "b3")], "k INT, pb STRING")

    delta = append_join_delta(a_old, a_new, b_old, b_new, "k")
    full_new = a_old.unionByName(a_new).join(b_old.unionByName(b_new), "k")
    full_old = a_old.join(b_old, "k")
    # delta == V_new - V_old as multisets
    want = _rows(full_new) - _rows(full_old)
    assert _rows(delta) == want
    # and it covers all three terms: new-a x old-b (1,a3,b1),
    # old-a x new-b (2,a2,b2), new-a x new-b (3,a4,b3)
    assert (1, "a3", "b1") in _rows(delta)
    assert (2, "a2", "b2") in _rows(delta)
    assert (3, "a4", "b3") in _rows(delta)


def test_maintained_view_equals_full_recompute_with_dup_keys(spark):
    # 4 append batches with REPEATED join keys (fan-out joins)
    batches = []
    for i in range(4):
        a = spark.createDataFrame(
            [(k % 3, f"a{i}_{k}") for k in range(i, i + 4)],
            "k INT, pa STRING")
        b = spark.createDataFrame(
            [(k % 3, f"b{i}_{k}") for k in range(i + 1, i + 4)],
            "k INT, pb STRING")
        batches.append((a, b))
    view = maintain_join_view(batches, "k")
    a_all = batches[0][0]
    b_all = batches[0][1]
    for a, b in batches[1:]:
        a_all = a_all.unionByName(a)
        b_all = b_all.unionByName(b)
    assert _rows(view) == _rows(a_all.join(b_all, "k"))
    assert view.count() > 20            # the fan-out actually happened


def test_empty_delta_contributes_nothing(spark):
    a_old = spark.createDataFrame([(1, "a")], "k INT, pa STRING")
    b_old = spark.createDataFrame([(1, "b")], "k INT, pb STRING")
    empty_a = spark.createDataFrame([], "k INT, pa STRING")
    empty_b = spark.createDataFrame([], "k INT, pb STRING")
    assert append_join_delta(a_old, empty_a, b_old, empty_b,
                             "k").count() == 0


def test_maintained_join_is_a_property(spark):
    """Property (hypothesis): for ANY multisets A, B (duplicate keys AND
    duplicate full rows) and ANY split into append batches, the
    maintained view is the multiset A ⋈ B — the delta algebra's claim
    checked beyond the hand-built schedules."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=5, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(st.data())
    def check(data):
        a_rows = data.draw(st.lists(
            st.tuples(st.integers(0, 3), st.sampled_from("pq")),
            min_size=1, max_size=10), label="a")
        b_rows = data.draw(st.lists(
            st.tuples(st.integers(0, 3), st.sampled_from("xy")),
            min_size=1, max_size=10), label="b")
        k = data.draw(st.integers(1, 3), label="k")
        # the split is salted with a python-side ordinal so IDENTICAL
        # duplicate rows can land in DIFFERENT batches — "ANY split"
        # includes a_old already holding a copy of a delta row
        a = spark.createDataFrame(
            [(i,) + r for i, r in enumerate(a_rows)],
            "i long, k long, va string")
        b = spark.createDataFrame(
            [(i,) + r for i, r in enumerate(b_rows)],
            "i long, k long, vb string")
        batches = [
            (a.filter(F.pmod(F.xxhash64("i", "va"), F.lit(k)) == i)
              .drop("i"),
             b.filter(F.pmod(F.xxhash64("i", "vb"), F.lit(k)) == i)
              .drop("i"))
            for i in range(k)]
        got = _rows(maintain_join_view(batches, "k"))
        want = _rows(a.drop("i").join(b.drop("i"), "k"))
        assert got == want, (a_rows, b_rows, k)

    check()


def test_cdc_join_delta_handles_retractions(spark):
    """Signed-delta IVM: inserts and retractions on BOTH sides of the
    join fold to exactly the recompute over the live rows — including a
    key whose rows fully retract (pairs GONE) and duplicate full rows
    (multiset multiplicities net correctly)."""
    from etl_online_retail_spark.operators.ivm import (
        cdc_join_delta,
        fold_signed_rows,
    )

    a0 = spark.createDataFrame(
        [(1, "p"), (1, "p"), (2, "q"), (3, "r")], "k long, va string")
    b0 = spark.createDataFrame(
        [(1, "x"), (2, "y"), (2, "y"), (3, "z")], "k long, vb string")
    log = a0.join(b0, "k").withColumn("_w", F.lit(1))

    # batch: retract one of the duplicate (1,p) rows and ALL of key 3's
    # A side; insert a new key-2 row on A and retract one (2,y) on B
    a_ins = spark.createDataFrame([(2, "s")], "k long, va string")
    a_del = spark.createDataFrame([(1, "p"), (3, "r")],
                                  "k long, va string")
    b_del = spark.createDataFrame([(2, "y")], "k long, vb string")
    delta = cdc_join_delta(a0, b0, "k", a_ins=a_ins, a_del=a_del,
                           b_del=b_del)
    view = fold_signed_rows(log.unionByName(delta))

    a_live = spark.createDataFrame(
        [(1, "p"), (2, "q"), (2, "s")], "k long, va string")
    b_live = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "k long, vb string")
    got = _rows(view)
    assert got == _rows(a_live.join(b_live, "k"))
    # key 3 fully gone; key 1 pair multiplicity dropped 2 -> 1
    assert not any(t[0] == 3 for t in got)


def test_cdc_join_maintenance_is_a_property(spark):
    """Property (hypothesis): for ANY schedule of CDC batches — inserts
    of new rows and retractions of currently-live rows, on either side,
    multiplicity-aware — folding the signed delta log reproduces the
    multiset join of the live rows."""
    from collections import Counter

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from etl_online_retail_spark.operators.ivm import (
        cdc_join_delta,
        fold_signed_rows,
    )

    def df_of(rows, side):
        schema = f"k long, v{side} string"
        if not rows:
            return None
        return spark.createDataFrame(rows, schema)

    def df_or_empty(rows, side):
        # old/live relations must be DataFrames even when empty (a side
        # can be fully retracted mid-schedule); None is only for the
        # optional ins/del args
        return (df_of(rows, side)
                or spark.createDataFrame([], f"k long, v{side} string"))

    @settings(max_examples=5, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(st.data())
    def check(data):
        live = {"a": Counter(), "b": Counter()}
        # seed rows so the initial view is non-trivial
        for side, vals in (("a", "pq"), ("b", "xy")):
            for row in data.draw(st.lists(
                    st.tuples(st.integers(0, 2), st.sampled_from(vals)),
                    min_size=1, max_size=6), label=f"seed_{side}"):
                live[side][row] += 1
        a = df_or_empty(sorted(live["a"].elements()), "a")
        b = df_or_empty(sorted(live["b"].elements()), "b")
        log = a.join(b, "k").withColumn("_w", F.lit(1))

        for step in range(data.draw(st.integers(1, 2), label="steps")):
            batch = {}
            for side, vals in (("a", "pq"), ("b", "xy")):
                ins = data.draw(st.lists(
                    st.tuples(st.integers(0, 2), st.sampled_from(vals)),
                    max_size=3), label=f"ins_{side}@{step}")
                pool = sorted(live[side].elements())
                n_del = data.draw(
                    st.integers(0, min(2, len(pool))),
                    label=f"ndel_{side}@{step}")
                dels = pool[:n_del]  # deterministic sub-multiset
                batch[side] = (ins, dels)
            if not any(batch[s][i] for s in ("a", "b") for i in (0, 1)):
                continue  # an empty CDC batch is a no-op by contract
            a_old = df_or_empty(sorted(live["a"].elements()), "a")
            b_old = df_or_empty(sorted(live["b"].elements()), "b")
            delta = cdc_join_delta(
                a_old, b_old, "k",
                a_ins=df_of(batch["a"][0], "a"),
                a_del=df_of(batch["a"][1], "a"),
                b_ins=df_of(batch["b"][0], "b"),
                b_del=df_of(batch["b"][1], "b"))
            log = log.unionByName(delta)
            for side in ("a", "b"):
                for row in batch[side][0]:
                    live[side][row] += 1
                for row in batch[side][1]:
                    live[side][row] -= 1
                live[side] += Counter()  # drop zeros

        a_live = df_of(sorted(live["a"].elements()), "a")
        b_live = df_of(sorted(live["b"].elements()), "b")
        # (None live side => empty join)
        got = _rows(fold_signed_rows(log))
        if a_live is None or b_live is None:
            assert got == Counter()
        else:
            assert got == _rows(a_live.join(b_live, "k"))

    check()


def test_cdc_join_delta_guards_and_strict_fold(spark):
    """r10 review finds: a payload column colliding with the weight
    column refuses loudly (withColumn would silently clobber it), and
    the strict fold refuses a log whose nets go negative (a retraction
    of a never-live row) instead of filtering the evidence away."""
    import pytest

    from etl_online_retail_spark.operators.ivm import (
        cdc_join_delta,
        fold_signed_rows,
    )

    a = spark.createDataFrame([(1, "p")], "k long, va string")
    b_w = spark.createDataFrame([(1, 2.0)], "k long, _w double")
    with pytest.raises(ValueError, match="collide"):
        cdc_join_delta(a, b_w, "k", a_ins=a)
    # a different weight_col sidesteps the clash
    delta = cdc_join_delta(a, b_w, "k", a_ins=a, weight_col="_sign")
    assert "_sign" in delta.columns

    log = spark.createDataFrame(
        [(1, "p", "x", 1), (1, "p", "x", -1), (1, "p", "y", -1)],
        "k long, va string, vb string, _w int")
    with pytest.raises(ValueError, match="NEGATIVE"):
        fold_signed_rows(log)
    # non-strict keeps the old filtering behavior for validated logs
    assert fold_signed_rows(log, strict=False).count() == 0


def test_fold_refuses_internal_column_clash(spark):
    """r10 advice: a payload column named `_i` would be silently
    clobbered by the fold's explode index (and dropped from the realized
    view — silent data loss); one named `_m` dies mid-fold with an
    ambiguous-column error. Both refuse loudly up front instead."""
    import pytest

    from etl_online_retail_spark.operators.ivm import fold_signed_rows

    for bad in ("_m", "_i"):
        log = spark.createDataFrame([(1, "x", 1)],
                                    f"k long, {bad} string, _w int")
        with pytest.raises(ValueError, match="collide"):
            fold_signed_rows(log)


def test_cdc_join_history_legs_never_shuffle(spark):
    """r11 plan find: with static size estimates Spark planned the
    delta joins as sort-merge and SHUFFLED the history side (AQE did
    not undo it) — the exact failure mode the module docstring's 100 TB
    shape forbids. The broadcast_delta hints pin the production plan:
    over a bucketed history layout, every history scan streams with NO
    exchange above it (the deltas broadcast). Asserted by walking the
    EXECUTED adaptive plan."""
    from pyspark.sql import functions as F

    from etl_online_retail_spark.catalog import load_table
    from etl_online_retail_spark.functions import money
    from etl_online_retail_spark.operators.ivm import cdc_join_delta
    from etl_online_retail_spark.sources.bucketed import (
        cobucket_fact_tables,
    )

    sf = "/root/testdata/sf0.001"
    li = load_table(spark, "lineitem", sf)
    o = load_table(spark, "orders", sf)
    spark.sql("DROP TABLE IF EXISTS t_ivmbkt_lineitem")
    spark.sql("DROP TABLE IF EXISTS t_ivmbkt_orders")
    bl, bo = cobucket_fact_tables(spark, li, o, n_buckets=4,
                                  prefix="t_ivmbkt")
    try:
        a_old = bl.select("l_orderkey", money.net_revenue().alias("_v"))
        b_old = bo.select(F.col("o_orderkey").alias("l_orderkey"),
                          "o_custkey", "o_orderdate")
        ins = (li.filter(F.col("l_orderkey") % 50 == 0)
               .select("l_orderkey", money.net_revenue().alias("_v")))
        dels = (li.filter(F.col("l_orderkey") % 50 == 1)
                .select("l_orderkey", money.net_revenue().alias("_v")))
        o_del = (o.filter(F.col("o_orderkey") % 70 == 3)
                 .select(F.col("o_orderkey").alias("l_orderkey"),
                         "o_custkey", "o_orderdate"))
        delta = cdc_join_delta(a_old, b_old, "l_orderkey",
                               a_ins=ins, a_del=dels, b_del=o_del)
        delta._jdf.count()  # materialize THIS dataset's adaptive plan

        scans, shuffled = [], []

        def walk(node, exch_above):
            cls = node.getClass().getSimpleName()
            if cls.startswith("AdaptiveSparkPlanExec"):
                walk(node.executedPlan(), exch_above)
                return
            if cls.endswith("QueryStageExec"):
                walk(node.plan(),
                     exch_above or cls.startswith("ShuffleQueryStage"))
                return
            if "ShuffleExchange" in cls or cls.startswith("ReusedExchange"):
                exch_above = True
            if "FileSourceScan" in cls or "BatchScan" in cls:
                if "t_ivmbkt" in node.toString():
                    scans.append(cls)
                    if exch_above:
                        shuffled.append(node.toString()[:120])
            kids = node.children()
            for i in range(kids.size()):
                walk(kids.apply(i), exch_above)

        walk(delta._jdf.queryExecution().executedPlan(), False)
        assert scans, "no bucketed history scan found in the plan"
        assert not shuffled, \
            f"history scan(s) under a shuffle exchange: {shuffled}"
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ivmbkt_lineitem")
        spark.sql("DROP TABLE IF EXISTS t_ivmbkt_orders")
