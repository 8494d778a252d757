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


@settings(max_examples=5, deadline=None)
@given(st.lists(
    st.tuples(st.sampled_from(["a", "b"]),      # source
              st.integers(0, 50),               # doc_id (deduped below)
              st.integers(0, 40)),              # token count (0 = empty doc)
    min_size=1, max_size=12))
def test_pack_sequences_matches_reference(spark, rows):
    from etl_online_retail_spark.operators.packing import pack_sequences

    # unique (source, doc_id): the operator orders by doc_id within source
    uniq = {(s, d): t for s, d, t in rows}
    data = [(s, d, t) for (s, d), t in uniq.items()]
    budget = 7
    df = spark.createDataFrame(data, "source string, doc_id long, tok int")
    got = {(r.source, r.doc_id): (r.start_offset, r.first_seq, r.last_seq)
           for r in pack_sequences(df, budget=budget,
                                   tokens_col="tok").collect()}
    # reference: cumulative offsets per source in doc_id order
    want = {}
    for src in {s for s, _, _ in data}:
        off = 0
        for s, d, t in sorted((x for x in data if x[0] == src),
                              key=lambda x: x[1]):
            first = off // budget
            last = first if t == 0 else (off + t - 1) // budget
            want[(s, d)] = (off, first, last)
            off += t
    assert got == want


@settings(max_examples=5, deadline=None)
@given(st.lists(
    st.tuples(st.integers(1, 3),                 # key
              st.integers(0, 5),                 # ts (coarse -> ties likely)
              st.sampled_from(["x", "y", None])),  # attr (nullable)
    min_size=1, max_size=12))
def test_scd2_matches_reference(spark, rows):
    import datetime as dt

    from etl_online_retail_spark.operators.scd import scd2_from_changelog

    data = [(str(k), dt.datetime(2024, 1, 1 + ts), i, a)
            for i, (k, ts, a) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "key string, ts timestamp, seq long, attr string")
    got = {(r.key, r.version): (r.attr, r.effective_from, r.effective_to)
           for r in scd2_from_changelog(df, "key", ["attr"], "ts",
                                        "seq").collect()}
    # reference: per key, walk (ts, seq)-sorted rows, open on change
    want = {}
    for key in {d[0] for d in data}:
        hist = sorted((d for d in data if d[0] == key),
                      key=lambda d: (d[1], d[2]))
        opens = []
        prev = object()  # sentinel != anything including None
        for _, ts, _, attr in hist:
            if attr != prev:
                opens.append([ts, attr])
            prev = attr
        for v, (ts, attr) in enumerate(opens, start=1):
            eff_to = opens[v][0] if v < len(opens) else None
            want[(key, v)] = (attr, ts, eff_to)
    assert got == want
