"""SCD Type-2 changelog collapse + point-in-time lookup edge cases."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_online_retail_spark.operators.scd import scd2_from_changelog, scd2_lookup


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "key string, ts timestamp, seq long, attr string")


def _t(s):
    return dt.datetime.fromisoformat(s)


def test_scd2_collapses_consecutive_duplicates(spark):
    log = _log(spark, [
        ("k1", _t("2024-01-01T00:00:00"), 1, "A"),
        ("k1", _t("2024-01-02T00:00:00"), 2, "A"),   # no change -> absorbed
        ("k1", _t("2024-01-03T00:00:00"), 3, "B"),
        ("k1", _t("2024-01-04T00:00:00"), 4, "A"),   # back to A = NEW version
    ])
    out = scd2_from_changelog(log, "key", ["attr"], "ts", "seq")
    rows = sorted(out.collect(), key=lambda r: r.version)
    assert [(r.version, r.attr) for r in rows] == [(1, "A"), (2, "B"), (3, "A")]
    assert rows[0].effective_to == rows[1].effective_from
    assert rows[2].effective_to is None and rows[2].is_current
    assert not rows[0].is_current


def test_scd2_same_instant_changes_use_tiebreaker(spark):
    ts = _t("2024-06-01T12:00:00")
    log = _log(spark, [("k1", ts, 2, "B"), ("k1", ts, 1, "A")])
    out = sorted(scd2_from_changelog(log, "key", ["attr"], "ts", "seq").collect(),
                 key=lambda r: r.version)
    # seq orders within the shared instant: A (v1, empty interval) then B
    assert [(r.version, r.attr) for r in out] == [(1, "A"), (2, "B")]
    assert out[0].effective_from == out[0].effective_to  # empty interval
    assert out[1].is_current


def test_scd2_null_attribute_transitions(spark):
    log = _log(spark, [
        ("k1", _t("2024-01-01T00:00:00"), 1, None),  # first obs, NULL attr
        ("k1", _t("2024-01-02T00:00:00"), 2, None),  # NULL == NULL: absorbed
        ("k1", _t("2024-01-03T00:00:00"), 3, "A"),   # NULL -> A
        ("k1", _t("2024-01-04T00:00:00"), 4, None),  # A -> NULL
    ])
    out = scd2_from_changelog(log, "key", ["attr"], "ts", "seq")
    assert [(r.version, r.attr) for r in
            sorted(out.collect(), key=lambda r: r.version)] == [
        (1, None), (2, "A"), (3, None)]


def test_scd2_multi_attribute_any_change_opens_version(spark):
    log = spark.createDataFrame(
        [("k1", _t("2024-01-01T00:00:00"), 1, "A", "x"),
         ("k1", _t("2024-01-02T00:00:00"), 2, "A", "y"),   # second attr only
         ("k1", _t("2024-01-03T00:00:00"), 3, "A", "y")],  # no change
        "key string, ts timestamp, seq long, a1 string, a2 string")
    out = scd2_from_changelog(log, "key", ["a1", "a2"], "ts", "seq")
    assert out.count() == 2


def test_scd2_lookup_point_in_time(spark):
    log = _log(spark, [
        ("k1", _t("2024-01-01T00:00:00"), 1, "A"),
        ("k1", _t("2024-02-01T00:00:00"), 2, "B"),
    ])
    dim = scd2_from_changelog(log, "key", ["attr"], "ts", "seq") \
        .select("key", "attr", "version", "effective_from", "effective_to")
    facts = spark.createDataFrame(
        [("f1", "k1", _t("2024-01-15T00:00:00")),   # inside v1
         ("f2", "k1", _t("2024-02-01T00:00:00")),   # boundary -> v2 (half-open)
         ("f3", "k1", _t("2024-03-01T00:00:00")),   # open-ended current
         ("f4", "k2", _t("2024-01-01T00:00:00"))],  # unknown key -> NULL
        "fact_id string, key string, ts timestamp")
    out = {r.fact_id: (r.attr, r.version)
           for r in scd2_lookup(dim, facts, "key", "ts").collect()}
    assert out == {"f1": ("A", 1), "f2": ("B", 2), "f3": ("B", 2),
                   "f4": (None, None)}
