"""Streaming joins must match their batch twins on the drained input."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_online_retail_spark.catalog import load_events
from etl_online_retail_spark.streaming.events import read_event_stream
from etl_online_retail_spark.streaming.joins import (
    enrich_with_static,
    purchases_after_signup,
)

SF = "/root/testdata/sf0.001"


def _drain(df, name):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()


def test_stream_static_enrichment(spark):
    dim = spark.createDataFrame(
        [(i, f"tier_{i % 3}") for i in range(100)], "user_id long, tier string")
    stream = read_event_stream(spark, SF)
    _drain(enrich_with_static(stream, dim), "enriched")
    out = spark.table("enriched")
    assert out.count() == load_events(spark, SF).count()  # left join keeps all
    assert out.filter(F.col("tier").isNull()).count() == \
        load_events(spark, SF).filter(F.col("user_id") >= 100).count()


def test_left_outer_stream_stream_join(spark):
    stream = read_event_stream(spark, SF)
    _drain(purchases_after_signup(stream, watermark="1 minute",
                                  how="left_outer"), "funnel_outer")
    out = spark.table("funnel_outer")
    matched = out.filter(F.col("signup_ts").isNotNull()).count()
    nulls = out.filter(F.col("signup_ts").isNull()).count()
    # the matched part equals the inner join; unmatched rows exist and are
    # a subset of the batch-unmatched purchases (late ones stay pending -
    # correct watermark semantics)
    _drain(purchases_after_signup(stream, watermark="1 minute"), "funnel_inner")
    assert matched == spark.table("funnel_inner").count()
    ev = load_events(spark, SF)
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("s_user"), F.col("ts").alias("signup_ts"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts"))
    batch_unmatched = p.join(
        s, (s.s_user == p.p_user)
        & (p.purchase_ts > s.signup_ts)
        & (p.purchase_ts <= F.expr("signup_ts + INTERVAL 60 MINUTES")),
        "left_anti").count()
    assert 0 < nulls <= batch_unmatched


def test_dedup_within_watermark(spark):
    from etl_online_retail_spark.streaming.joins import dedup_within_watermark

    stream = read_event_stream(spark, SF)
    # the source has unique event_ids; a duplicated stream (self-union)
    # must collapse back to the original count
    doubled = stream.union(stream)
    _drain(dedup_within_watermark(doubled), "deduped")
    assert spark.table("deduped").count() == load_events(spark, SF).count()


def test_stream_stream_funnel_join_matches_batch(spark):
    stream = read_event_stream(spark, SF)
    _drain(purchases_after_signup(stream), "funnel")
    got = spark.table("funnel").count()

    # batch twin: plain self-join with the same range predicate. The batch
    # ts column is TIMESTAMP_NTZ and the stream's is TIMESTAMP, but both
    # render the same UTC wall clock so counts must agree.
    ev = load_events(spark, SF)
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("s_user"), F.col("ts").alias("signup_ts"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts"))
    want = p.join(
        s, (s.s_user == p.p_user)
        & (p.purchase_ts > s.signup_ts)
        & (p.purchase_ts <= F.expr("signup_ts + INTERVAL 60 MINUTES"))).count()
    assert got == want and got > 0
