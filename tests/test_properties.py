"""Property-based spot checks (SURVEY.md §5.4).

Kept cheap: few hypothesis examples, one Spark job per example, local data.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from etl_online_retail_spark.functions.hashing import PRIME
from etl_online_retail_spark.operators.dedup import keep_last

ASCII_TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40)


def _python_poly_hash(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % PRIME
    return h


@settings(max_examples=5, deadline=None)
@given(st.lists(ASCII_TEXT, min_size=1, max_size=8, unique=True))
def test_poly_hash_matches_reference_implementation(spark, strings):
    from etl_online_retail_spark.functions.hashing import poly_hash

    df = spark.createDataFrame([(s,) for s in strings], "s string")
    got = {r.s: r.h for r in df.select("s", poly_hash("s").alias("h")).collect()}
    assert got == {s: _python_poly_hash(s) for s in strings}


@settings(max_examples=5, deadline=None)
@given(st.integers(min_value=1, max_value=16))
def test_decimal_sum_invariant_under_repartition(spark, n_parts):
    li = (spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
          .select(F.col("l_extendedprice").cast("decimal(18,2)").alias("p")))
    base = li.agg(F.sum("p")).collect()[0][0]
    shuffled = li.repartition(n_parts).agg(F.sum("p")).collect()[0][0]
    assert base == shuffled  # exact decimal: bit-equal under any layout


@settings(max_examples=5, deadline=None)
@given(st.permutations(list(range(6))))
def test_keep_last_invariant_under_input_order(spark, perm):
    rows = [("k1", "v0", 0), ("k1", "v1", 1), ("k1", "v2", 2),
            ("k2", "a", 0), ("k2", "b", 1), ("k3", "x", 0)]
    shuffled = [rows[i] for i in perm]
    df = spark.createDataFrame(shuffled, "k string, v string, ord long")
    out = {r.k: r.v for r in
           keep_last(df, ["k"], [F.desc("ord"), F.desc("v")]).collect()}
    assert out == {"k1": "v2", "k2": "b", "k3": "x"}
