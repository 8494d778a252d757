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


def test_scd2_reordered_stream_matches_batch_under_shuffled_arrival(
        spark, tmp_path):
    """ROADMAP 14: bounded out-of-order CDC arrival (content-hash shards,
    one file per micro-batch — arrival order unrelated to event time)
    still reproduces the batch SCD2 collapse exactly."""
    import datetime
    import os

    from etl_online_retail_spark.catalog import SCHEMAS
    from etl_online_retail_spark.operators.scd import scd2_from_changelog
    from etl_online_retail_spark.streaming.stateful import scd2_stream_reordered

    ev = load_events(spark, SF).cache()
    mn, mx = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    # the reorder delay must cover the full shuffle disorder (= data span)
    assert (mx - mn) < datetime.timedelta(days=300)

    sdir = str(tmp_path / "shuffled")
    os.makedirs(sdir)

    def land(df, name, mtime):
        scratch = str(tmp_path / f"_scratch_{name}")
        df.coalesce(1).write.parquet(scratch)
        part = next(f for f in os.listdir(scratch) if f.endswith(".parquet"))
        dst = os.path.join(sdir, f"{name}.parquet")
        os.rename(os.path.join(scratch, part), dst)
        os.utime(dst, (mtime, mtime))

    t0 = 1_000_000_000
    for b in range(4):
        shard = ev.filter(F.crc32(F.col("event_id").cast("string")) % 4 == b)
        land(shard, f"shard{b}", t0 + b)
    # two far-future sentinel rows for a dummy key, one per trigger: the
    # first advances the watermark past every real row, the second runs a
    # batch under that watermark so every key's EventTimeTimeout fires
    for i, days in enumerate((370, 740)):
        sentinel = spark.createDataFrame(
            [(10_000_000 + i, mx + datetime.timedelta(days=days), -1,
              "sentinel", 0.0, "{}")],
            schema=SCHEMAS["events"])
        land(sentinel, f"sentinel{i}", t0 + 100 + i)

    stream = (spark.readStream.schema(SCHEMAS["events"])
              .option("maxFilesPerTrigger", 1).parquet(sdir)
              .withColumn("ts", F.col("ts").cast("timestamp")))
    q = (scd2_stream_reordered(stream, delay="365 days")
         .writeStream.format("memory").queryName("scd2_reordered")
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()

    live = {(r.user_id, r.version, r.segment)
            for r in spark.sql("SELECT * FROM scd2_reordered "
                               "WHERE user_id >= 0").collect()}
    batch = scd2_from_changelog(ev, "user_id", ["event_type"], "ts",
                                "event_id")
    want = {(r.user_id, r.version, r.event_type) for r in batch.collect()}
    assert live == want

    live_ts = {(r.user_id, r.version): r.effective_from
               for r in spark.sql("SELECT * FROM scd2_reordered "
                                  "WHERE user_id >= 0").collect()}
    for r in batch.collect():
        assert live_ts[(r.user_id, r.version)] == r.effective_from


def test_gapfill_stream_matches_batch_under_shuffled_arrival(
        spark, tmp_path):
    """Streaming hourly gap-fill emits exactly the batch gapfill_locf
    relation once the stream is complete — under content-hash-shuffled
    micro-batch arrival (file order unrelated to event time)."""
    import datetime
    import os

    from etl_online_retail_spark.catalog import SCHEMAS
    from etl_online_retail_spark.operators.timeseries import gapfill_locf
    from etl_online_retail_spark.streaming.stateful import gapfill_stream

    ev = load_events(spark, SF).filter(F.col("user_id") % 5 == 0).cache()
    mn, mx = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    assert (mx - mn) < datetime.timedelta(days=300)

    sdir = str(tmp_path / "shuffled")
    os.makedirs(sdir)

    def land(df, name, mtime):
        scratch = str(tmp_path / f"_scratch_{name}")
        df.coalesce(1).write.parquet(scratch)
        part = next(f for f in os.listdir(scratch) if f.endswith(".parquet"))
        dst = os.path.join(sdir, f"{name}.parquet")
        os.rename(os.path.join(scratch, part), dst)
        os.utime(dst, (mtime, mtime))

    t0 = 1_000_000_000
    for b in range(4):
        shard = ev.filter(F.crc32(F.col("event_id").cast("string")) % 4 == b)
        land(shard, f"shard{b}", t0 + b)
    # sentinel rows: first advances the watermark beyond every real
    # bucket, second runs a batch under it so EventTimeTimeouts fire
    for i, days in enumerate((370, 740)):
        sentinel = spark.createDataFrame(
            [(10_000_000 + i, mx + datetime.timedelta(days=days), -1,
              "sentinel", 0.0, "{}")],
            schema=SCHEMAS["events"])
        land(sentinel, f"sentinel{i}", t0 + 100 + i)

    stream = (spark.readStream.schema(SCHEMAS["events"])
              .option("maxFilesPerTrigger", 1).parquet(sdir)
              .withColumn("ts", F.col("ts").cast("timestamp")))
    q = (gapfill_stream(stream, delay="365 days")
         .writeStream.format("memory").queryName("gapfill_live")
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()

    live = {(r.user_id, r.bucket, round(r.value_filled, 9), r.is_observed)
            for r in spark.sql(
                "SELECT * FROM gapfill_live WHERE user_id >= 0").collect()}
    batch = gapfill_locf(ev.withColumn("ts", F.col("ts").cast("timestamp")),
                         "user_id", "ts", "value",
                         tiebreak_col="event_id", step="hour")
    want = {(r.user_id, r.bucket, round(r.value_filled, 9), r.is_observed)
            for r in batch.collect()}
    assert live == want


def test_ewma_stream_matches_batch_fold_under_shuffled_arrival(
        spark, tmp_path):
    """The streaming EWMA's final value per key equals the batch
    sequential fold (ewma_last) over the complete log, despite
    content-hash-shuffled micro-batch arrival."""
    import datetime
    import os

    from etl_online_retail_spark.catalog import SCHEMAS
    from etl_online_retail_spark.operators.timeseries import ewma_last
    from etl_online_retail_spark.streaming.stateful import ewma_stream

    ev = load_events(spark, SF).filter(F.col("user_id") % 5 == 0).cache()
    mn, mx = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    assert (mx - mn) < datetime.timedelta(days=300)

    sdir = str(tmp_path / "shuffled")
    os.makedirs(sdir)

    def land(df, name, mtime):
        scratch = str(tmp_path / f"_scratch_{name}")
        df.coalesce(1).write.parquet(scratch)
        part = next(f for f in os.listdir(scratch) if f.endswith(".parquet"))
        dst = os.path.join(sdir, f"{name}.parquet")
        os.rename(os.path.join(scratch, part), dst)
        os.utime(dst, (mtime, mtime))

    t0 = 1_000_000_000
    for b in range(4):
        shard = ev.filter(F.crc32(F.col("event_id").cast("string")) % 4 == b)
        land(shard, f"shard{b}", t0 + b)
    for i, days in enumerate((370, 740)):
        sentinel = spark.createDataFrame(
            [(10_000_000 + i, mx + datetime.timedelta(days=days), -1,
              "sentinel", 0.0, "{}")],
            schema=SCHEMAS["events"])
        land(sentinel, f"sentinel{i}", t0 + 100 + i)

    stream = (spark.readStream.schema(SCHEMAS["events"])
              .option("maxFilesPerTrigger", 1).parquet(sdir)
              .withColumn("ts", F.col("ts").cast("timestamp")))
    q = (ewma_stream(stream, delay="365 days")
         .writeStream.format("memory").queryName("ewma_live")
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()

    # last emitted row per key (max n_obs) vs the batch fold
    live = {r.user_id: (round(r.ewma, 6), r.n_obs) for r in
            spark.sql("""
              SELECT user_id, ewma, n_obs FROM ewma_live a
              WHERE user_id >= 0 AND n_obs = (
                SELECT MAX(n_obs) FROM ewma_live b
                WHERE b.user_id = a.user_id)""").collect()}
    batch = ewma_last(ev.withColumn("ts", F.col("ts").cast("timestamp")),
                      "user_id", "ts", "event_id", "value")
    want = {r.user_id: (r.ewma, r.n_obs) for r in batch.collect()}
    assert live == want


def test_attribution_stream_matches_batch_under_shuffled_arrival(
        spark, tmp_path):
    """Streaming last-touch attribution emits exactly the batch
    operator's per-conversion rows, despite content-hash-shuffled
    micro-batch arrival (disorder inside the watermark delay)."""
    import datetime
    import os

    from etl_online_retail_spark.catalog import SCHEMAS
    from etl_online_retail_spark.operators.sessionize import (
        last_touch_attribution,
    )
    from etl_online_retail_spark.streaming.stateful import attribution_stream

    ev = load_events(spark, SF).filter(F.col("user_id") % 5 == 0).cache()
    mn, mx = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    assert (mx - mn) < datetime.timedelta(days=300)

    sdir = str(tmp_path / "attr_shuffled")
    os.makedirs(sdir)

    def land(df, name, mtime):
        scratch = str(tmp_path / f"_attr_scratch_{name}")
        df.coalesce(1).write.parquet(scratch)
        part = next(f for f in os.listdir(scratch) if f.endswith(".parquet"))
        dst = os.path.join(sdir, f"{name}.parquet")
        os.rename(os.path.join(scratch, part), dst)
        os.utime(dst, (mtime, mtime))

    t0 = 1_000_000_000
    for b in range(4):
        shard = ev.filter(F.crc32(F.col("event_id").cast("string")) % 4 == b)
        land(shard, f"shard{b}", t0 + b)
    for i, days in enumerate((370, 740)):
        sentinel = spark.createDataFrame(
            [(10_000_000 + i, mx + datetime.timedelta(days=days), -1,
              "sentinel", 0.0, "{}")],
            schema=SCHEMAS["events"])
        land(sentinel, f"sentinel{i}", t0 + 100 + i)

    stream = (spark.readStream.schema(SCHEMAS["events"])
              .option("maxFilesPerTrigger", 1).parquet(sdir)
              .withColumn("ts", F.col("ts").cast("timestamp")))
    q = (attribution_stream(stream, delay="365 days")
         .writeStream.format("memory").queryName("attr_live")
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()

    live = {r.event_id: (r.attributed_type, r.lag_us, r.value)
            for r in spark.sql(
                "SELECT * FROM attr_live WHERE user_id >= 0").collect()}
    batch = last_touch_attribution(
        ev.withColumn("ts", F.col("ts").cast("timestamp")))
    want = {r.event_id: (r.attributed_type, r.lag_us, r.value)
            for r in batch.collect()}
    assert live == want
    assert len(live) > 0


def test_holt_stream_matches_batch_fold_under_shuffled_arrival(
        spark, tmp_path):
    """The streaming Holt's final (level, trend) per key equals the
    batch sequential fold (holt_last) over the complete log, despite
    content-hash-shuffled micro-batch arrival."""
    import datetime
    import os

    from etl_online_retail_spark.catalog import SCHEMAS
    from etl_online_retail_spark.operators.timeseries import holt_last
    from etl_online_retail_spark.streaming.stateful import holt_stream

    ev = load_events(spark, SF).filter(F.col("user_id") % 5 == 0).cache()
    mn, mx = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    assert (mx - mn) < datetime.timedelta(days=300)

    sdir = str(tmp_path / "holt_shuffled")
    os.makedirs(sdir)

    def land(df, name, mtime):
        scratch = str(tmp_path / f"_holt_scratch_{name}")
        df.coalesce(1).write.parquet(scratch)
        part = next(f for f in os.listdir(scratch) if f.endswith(".parquet"))
        dst = os.path.join(sdir, f"{name}.parquet")
        os.rename(os.path.join(scratch, part), dst)
        os.utime(dst, (mtime, mtime))

    t0 = 1_000_000_000
    for b in range(4):
        shard = ev.filter(F.crc32(F.col("event_id").cast("string")) % 4 == b)
        land(shard, f"shard{b}", t0 + b)
    for i, days in enumerate((370, 740)):
        sentinel = spark.createDataFrame(
            [(10_000_000 + i, mx + datetime.timedelta(days=days), -1,
              "sentinel", 0.0, "{}")],
            schema=SCHEMAS["events"])
        land(sentinel, f"sentinel{i}", t0 + 100 + i)

    stream = (spark.readStream.schema(SCHEMAS["events"])
              .option("maxFilesPerTrigger", 1).parquet(sdir)
              .withColumn("ts", F.col("ts").cast("timestamp")))
    q = (holt_stream(stream, delay="365 days")
         .writeStream.format("memory").queryName("holt_live")
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()

    live = {r.user_id: (round(r.level, 6), round(r.trend, 6), r.n_obs)
            for r in spark.sql("""
              SELECT user_id, level, trend, n_obs FROM holt_live a
              WHERE user_id >= 0 AND n_obs = (
                SELECT MAX(n_obs) FROM holt_live b
                WHERE b.user_id = a.user_id)""").collect()}
    batch = holt_last(ev.withColumn("ts", F.col("ts").cast("timestamp")),
                      "user_id", "ts", "event_id", "value")
    want = {r.user_id: (r.level, r.trend, r.n_obs)
            for r in batch.collect()}
    assert live == want


def test_zscore_stream_flags_exactly_the_batch_anomalies(spark, tmp_path):
    """The streaming z-score gate must flag exactly the rows the batch
    operator flags over the complete log, with identical scores,
    despite content-hash-shuffled micro-batch arrival."""
    import datetime
    import os

    from etl_online_retail_spark.catalog import SCHEMAS
    from etl_online_retail_spark.operators.timeseries import (
        rolling_zscore_anomalies,
    )
    from etl_online_retail_spark.streaming.stateful import zscore_stream

    ev = load_events(spark, SF).filter(F.col("user_id") % 3 == 0).cache()
    mn, mx = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    assert (mx - mn) < datetime.timedelta(days=300)

    sdir = str(tmp_path / "z_shuffled")
    os.makedirs(sdir)

    def land(df, name, mtime):
        scratch = str(tmp_path / f"_z_scratch_{name}")
        df.coalesce(1).write.parquet(scratch)
        part = next(f for f in os.listdir(scratch) if f.endswith(".parquet"))
        dst = os.path.join(sdir, f"{name}.parquet")
        os.rename(os.path.join(scratch, part), dst)
        os.utime(dst, (mtime, mtime))

    t0 = 1_000_000_000
    for b in range(4):
        shard = ev.filter(F.crc32(F.col("event_id").cast("string")) % 4 == b)
        land(shard, f"shard{b}", t0 + b)
    for i, days in enumerate((370, 740)):
        sentinel = spark.createDataFrame(
            [(10_000_000 + i, mx + datetime.timedelta(days=days), -1,
              "sentinel", 0.0, "{}")],
            schema=SCHEMAS["events"])
        land(sentinel, f"sentinel{i}", t0 + 100 + i)

    stream = (spark.readStream.schema(SCHEMAS["events"])
              .option("maxFilesPerTrigger", 1).parquet(sdir)
              .withColumn("ts", F.col("ts").cast("timestamp")))
    q = (zscore_stream(stream, delay="365 days")
         .writeStream.format("memory").queryName("z_live")
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()

    live = {(r.user_id, r.event_id): (r.baseline_n, r.zscore)
            for r in spark.sql(
                "SELECT * FROM z_live WHERE user_id >= 0").collect()}
    batch = rolling_zscore_anomalies(
        ev.withColumn("ts", F.col("ts").cast("timestamp")),
        "user_id", "ts", "event_id", "value")
    want = {(r.user_id, r.event_id): (r.baseline_n, r.zscore)
            for r in batch.collect()}
    assert live == want
    assert len(live) > 0
