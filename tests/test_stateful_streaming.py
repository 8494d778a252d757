"""applyInPandasWithState custom stateful operator: final state after
draining the stream must equal the batch per-user aggregate."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_online_retail_spark.catalog import load_events
from etl_online_retail_spark.streaming.events import read_event_stream
from etl_online_retail_spark.streaming.stateful import running_user_totals

SF = "/root/testdata/sf0.001"


def test_running_totals_reach_batch_values(spark):
    stream = read_event_stream(spark, SF)
    q = (running_user_totals(stream)
         .writeStream.format("memory").queryName("user_totals")
         .outputMode("update")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    # update mode may emit one row per micro-batch per user; the LAST row
    # per user carries the final state
    final = {r.user_id: (r.events_so_far, r.value_so_far)
             for r in spark.sql(
                 "SELECT user_id, events_so_far, value_so_far FROM ("
                 "  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id "
                 "    ORDER BY events_so_far DESC) AS rn FROM user_totals) "
                 "WHERE rn = 1").collect()}
    want = {r.user_id: (r.n, round(r.v, 2))
            for r in (load_events(spark, SF)
                      .groupBy("user_id")
                      .agg(F.count(F.lit(1)).alias("n"),
                           F.sum("value").alias("v"))
                      .collect())}
    assert set(final) == set(want)
    for user, (n, v) in want.items():
        assert final[user][0] == n
        assert abs(final[user][1] - v) < 0.05  # float sum vs rounded state


def test_scd2_stream_matches_batch_collapse(spark):
    from etl_online_retail_spark.operators.scd import scd2_from_changelog
    from etl_online_retail_spark.streaming.stateful import scd2_stream

    stream = read_event_stream(spark, SF)
    q = (scd2_stream(stream)
         .writeStream.format("memory").queryName("scd2_live")
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    live = {(r.user_id, r.version, r.segment)
            for r in spark.sql("SELECT * FROM scd2_live").collect()}

    batch = scd2_from_changelog(load_events(spark, SF), "user_id",
                                ["event_type"], "ts", "event_id")
    want = {(r.user_id, r.version, r.event_type) for r in batch.collect()}
    assert live == want

    # effective_from timestamps agree too (compare as epoch micros to be
    # representation-agnostic)
    live_ts = {(r.user_id, r.version): r.effective_from
               for r in spark.sql("SELECT * FROM scd2_live").collect()}
    for r in batch.collect():
        assert live_ts[(r.user_id, r.version)] == r.effective_from
