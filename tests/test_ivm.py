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
