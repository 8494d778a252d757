"""as_of_join + range_self_join_within edge semantics.

The oracle gate (events_asof_orders / events_pairs_within) verifies the
bulk behavior against DuckDB's native ASOF JOIN; these tests pin the edge
cases the gate data may not exercise: equal-timestamp inclusivity, the
forward direction (no driver query), unmatched-left NULLs, and the exact
window boundary of the range join.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_online_retail_spark.operators.joins import (
    as_of_join,
    range_self_join_within,
)


def _ts(s: str):
    return dt.datetime.fromisoformat(s)


def _asof_fixture(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01 10:00:00")),
         (2, 10, _ts("2024-01-01 12:00:00")),
         (3, 10, _ts("2024-01-01 09:00:00")),   # before any right row
         (4, 20, _ts("2024-01-01 10:30:00"))],
        "eid long, k long, ts timestamp_ntz")
    right = spark.createDataFrame(
        [(10, _ts("2024-01-01 10:00:00"), 100.0),   # == left eid=1 ts
         (10, _ts("2024-01-01 11:00:00"), 200.0),
         (20, _ts("2024-01-01 11:00:00"), 300.0)],  # after left eid=4
        "k long, rts timestamp_ntz, v double")
    return left, right


def test_asof_backward_inclusive_and_null(spark):
    left, right = _asof_fixture(spark)
    out = {r["eid"]: r["v"]
           for r in as_of_join(left, right, "k", "k", "ts", "rts",
                               payload=["v"]).collect()}
    assert out[1] == 100.0       # equal timestamp matches (inclusive)
    assert out[2] == 200.0       # most recent prior, not first
    assert out[3] is None        # nothing at-or-before -> NULL
    assert out[4] is None        # right row exists but only AFTER
    assert len(out) == 4         # left row count preserved


def test_asof_forward(spark):
    left, right = _asof_fixture(spark)
    out = {r["eid"]: r["v"]
           for r in as_of_join(left, right, "k", "k", "ts", "rts",
                               payload=["v"],
                               direction="forward").collect()}
    assert out[1] == 100.0       # equal timestamp still inclusive
    assert out[2] is None        # nothing at-or-after
    assert out[3] == 100.0       # nearest following, not latest
    assert out[4] == 300.0


def test_asof_payload_fields_come_from_same_row(spark):
    left, right = _asof_fixture(spark)
    got = (as_of_join(left, right, "k", "k", "ts", "rts",
                      payload=["rts", "v"])
           .filter(F.col("eid") == 2).collect()[0])
    assert (got["rts"], got["v"]) == (_ts("2024-01-01 11:00:00"), 200.0)


def test_range_self_join_window_boundary(spark):
    df = spark.createDataFrame(
        [(1, 5, _ts("2024-01-01 10:00:00")),
         (2, 5, _ts("2024-01-01 10:05:00")),      # exactly the window away
         (3, 5, _ts("2024-01-01 10:05:00.000001")),  # 1us past from eid=1
         (4, 6, _ts("2024-01-01 10:00:00"))],     # other key: never pairs
        "eid long, k long, ts timestamp_ntz")
    window_us = 5 * 60 * 1_000_000
    pairs = {(r["id_a"], r["id_b"]): r["gap_us"]
             for r in range_self_join_within(df, "k", "ts", "eid",
                                             window_us).collect()}
    assert pairs[(1, 2)] == window_us          # boundary inclusive
    assert (1, 3) not in pairs                 # 1us beyond -> excluded
    assert pairs[(2, 3)] == 1                  # adjacent-bin pair found
    assert all(a != 4 and b != 4 for a, b in pairs)
    assert len(pairs) == 2                     # and found exactly once each


def test_range_self_join_equal_ts_ordered_by_id(spark):
    df = spark.createDataFrame(
        [(7, 1, _ts("2024-01-01 10:00:00")),
         (8, 1, _ts("2024-01-01 10:00:00"))],
        "eid long, k long, ts timestamp_ntz")
    rows = range_self_join_within(df, "k", "ts", "eid", 1_000_000).collect()
    assert [(r["id_a"], r["id_b"], r["gap_us"]) for r in rows] == [(7, 8, 0)]
