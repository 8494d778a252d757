"""SFT conversation prep (operators/conversations.py): turn-protocol
validation edges and template rendering. The registry query
(chat_sft_prep) hash-proves the composed parse -> validate -> flatten
path including the to_json/from_json round trip; these pin the protocol
rules the fixture's two shapes never reach."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from etl_online_retail_spark.operators.conversations import (
    flatten_chat,
    parse_conversations,
    sft_prep,
)

CASES = [
    # (turns, valid?)
    ([("system", "s"), ("user", "u"), ("assistant", "a")], True),
    ([("user", "u"), ("assistant", "a")], True),          # system optional
    ([("user", "u"), ("assistant", "a"),
      ("user", "u2"), ("assistant", "a2")], True),
    ([("system", "s"), ("assistant", "a"), ("user", "u")], False),
    ([("user", "u"), ("user", "u2")], False),             # no alternation
    ([("assistant", "a"), ("user", "u")], False),         # starts wrong
    # a user turn with no assistant completion is untrainable
    ([("system", "s"), ("user", "u")], False),
    # trailing unanswered user turn: alternates, but no completion
    ([("user", "u"), ("assistant", "a"), ("user", "u2")], False),
    ([("system", "s")], False),                           # no exchange
    ([("user", "u")], False),                             # lone turn
    ([], False),
    ([("system", "s"), ("user", "u"), (None, "x")], False),  # null role
    # NULL content (r12 review): flatten would silently DROP the turn
    # and loss spans would go null — must be invalid, not just ugly
    ([("user", None), ("assistant", "a")], False),
    ([("user", "u"), ("assistant", None)], False),
]


def test_alternation_protocol_edges(spark):
    rows = [(i, json.dumps([{"role": r, "content": c}
                            for r, c in turns]))
            for i, (turns, _) in enumerate(CASES)]
    rows.append((len(CASES), "not json at all {"))  # malformed doc
    df = spark.createDataFrame(rows, "doc_id long, raw_json string")
    got = {r.doc_id: r.alternation_ok for r in
           sft_prep(df, "raw_json").collect()}
    want = {i: ok for i, (_, ok) in enumerate(CASES)}
    want[len(CASES)] = False  # malformed -> NULL turns -> invalid
    assert got == want


def test_loss_spans_slice_exactly_the_assistant_contents(spark):
    from etl_online_retail_spark.operators.conversations import loss_spans

    convo = [{"role": "system", "content": "sys"},
             {"role": "user", "content": "question one"},
             {"role": "assistant", "content": "answer one"},
             {"role": "user", "content": "q2"},
             {"role": "assistant", "content": "the second answer"}]
    df = spark.createDataFrame([(1, json.dumps(convo))],
                               "doc_id long, raw_json string")
    parsed = parse_conversations(df, "raw_json")
    row = parsed.select(flatten_chat("turns").alias("flat"),
                        loss_spans("turns").alias("spans")).collect()[0]
    got = [row.flat[s.start:s.end] for s in row.spans]
    assert got == ["answer one", "the second answer"]
    # custom template shifts every offset; slices must still be exact
    row2 = (parsed.select(
        flatten_chat("turns", ("<<", ">>>")).alias("flat"),
        loss_spans("turns", ("<<", ">>>")).alias("spans"))
        .collect()[0])
    assert [row2.flat[s.start:s.end] for s in row2.spans] == got


def test_flatten_renders_in_stored_order(spark):
    df = spark.createDataFrame(
        [(1, json.dumps([{"role": "user", "content": "hi & <bye>"},
                         {"role": "assistant", "content": "ok"}]))],
        "doc_id long, raw_json string")
    out = (parse_conversations(df, "raw_json")
           .select(flatten_chat("turns").alias("flat"))
           .collect()[0].flat)
    # JSON escaping round-trips; the template wraps roles verbatim
    assert out == "<|user|>hi & <bye><|assistant|>ok"
    # custom template tokens
    out2 = (parse_conversations(df, "raw_json")
            .select(flatten_chat("turns", ("[", "]")).alias("f"))
            .collect()[0].f)
    assert out2 == "[user]hi & <bye>[assistant]ok"
