"""Incremental ingest is exactly-once: a restarted stream with the same
checkpoint must not re-append already-committed files."""

from __future__ import annotations

import tempfile

from etl_online_retail_spark.catalog import load_events
from etl_online_retail_spark.streaming.events import read_event_stream
from etl_online_retail_spark.streaming.ingest import incremental_append

SF = "/root/testdata/sf0.001"


def test_incremental_append_is_exactly_once(spark):
    n_source = load_events(spark, SF).count()
    with tempfile.TemporaryDirectory() as d:
        out, ckpt = f"{d}/warehouse", f"{d}/ckpt"
        q = incremental_append(read_event_stream(spark, SF), out, ckpt)
        q.awaitTermination()
        assert spark.read.parquet(out).count() == n_source
        # "re-run the DAG": same checkpoint -> nothing new to process
        q2 = incremental_append(read_event_stream(spark, SF), out, ckpt)
        q2.awaitTermination()
        assert spark.read.parquet(out).count() == n_source
        # partitioned layout landed
        types = {r.event_type for r in
                 spark.read.parquet(out).select("event_type").distinct().collect()}
        assert len(types) >= 2


def test_batch_replay_is_idempotent(spark):
    """foreachBatch is at-least-once: a replayed batch_id must overwrite
    its own partitions, not append a second copy."""
    from etl_online_retail_spark.streaming.ingest import idempotent_batch_write

    batch = load_events(spark, SF).limit(200)
    n = batch.count()
    with tempfile.TemporaryDirectory() as d:
        out = f"{d}/warehouse"
        idempotent_batch_write(batch, 0, out)
        idempotent_batch_write(batch, 0, out)  # the crash-replay case
        assert spark.read.parquet(out).count() == n
        idempotent_batch_write(batch, 1, out)  # a NEW batch appends
        assert spark.read.parquet(out).count() == 2 * n


def test_upsert_batch_latest_row_wins_and_replay_idempotent(spark):
    from etl_online_retail_spark.streaming.ingest import upsert_batch_write

    def table(rows):
        return spark.createDataFrame(rows, "k long, v string, seq long")

    with tempfile.TemporaryDirectory() as d:
        t = f"{d}/tbl"
        b0 = table([(1, "a", 1), (2, "b", 1), (3, "c", 1)])
        upsert_batch_write(b0, 0, t, ["k"], "seq", n_shards=4)
        got = {r.k: r.v for r in spark.read.parquet(t).collect()}
        assert got == {1: "a", 2: "b", 3: "c"}

        # batch 1 updates key 1, inserts key 4
        b1 = table([(1, "a2", 2), (4, "d", 2)])
        upsert_batch_write(b1, 1, t, ["k"], "seq", n_shards=4)
        got = {r.k: r.v for r in spark.read.parquet(t).collect()}
        assert got == {1: "a2", 2: "b", 3: "c", 4: "d"}

        # crash-replay of batch 1: identical table afterwards
        upsert_batch_write(b1, 1, t, ["k"], "seq", n_shards=4)
        again = {r.k: r.v for r in spark.read.parquet(t).collect()}
        assert again == got
        assert spark.read.parquet(t).count() == 4

        # out-of-order replay of an OLD version must not regress the row
        upsert_batch_write(b0, 0, t, ["k"], "seq", n_shards=4)
        assert {r.k: r.v for r in spark.read.parquet(t).collect()}[1] == "a2"


def test_incremental_upsert_stream_end_to_end(spark):
    from etl_online_retail_spark.streaming.events import read_event_stream
    from etl_online_retail_spark.streaming.ingest import incremental_upsert

    # latest event per user: the SCD1 live-table use case
    with tempfile.TemporaryDirectory() as d:
        t, ckpt = f"{d}/tbl", f"{d}/ckpt"
        q = incremental_upsert(read_event_stream(spark, SF), t, ckpt,
                               key_cols=["user_id"], order_col="ts")
        q.awaitTermination()
        ev = load_events(spark, SF)
        n_users = ev.select("user_id").distinct().count()
        tbl = spark.read.parquet(t)
        assert tbl.count() == n_users
        # restart with the same checkpoint: no new input, table unchanged
        q2 = incremental_upsert(read_event_stream(spark, SF), t, ckpt,
                                key_cols=["user_id"], order_col="ts")
        q2.awaitTermination()
        assert spark.read.parquet(t).count() == n_users


def test_incremental_agg_matches_batch_and_survives_replay(spark):
    from etl_online_retail_spark.streaming.ingest import (
        incremental_agg,
        partial_agg_batch_write,
        read_incremental_agg,
    )

    with tempfile.TemporaryDirectory() as d:
        t, ckpt = f"{d}/agg", f"{d}/ckpt"
        q = incremental_agg(read_event_stream(spark, SF), t, ckpt,
                            key_cols=["event_type"], value_col="value")
        q.awaitTermination()
        got = {r.event_type: (r.n_rows, round(r.total, 2))
               for r in read_incremental_agg(spark, t, ["event_type"]).collect()}
        from pyspark.sql import functions as F
        want = {r.event_type: (r.n, round(r.v, 2))
                for r in (load_events(spark, SF).groupBy("event_type")
                          .agg(F.count(F.lit(1)).alias("n"),
                               F.sum(F.col("value").cast("decimal(18,2)"))
                                .cast("double").alias("v")).collect())}
        assert got == want
        # crash-replay of batch 0 with identical input: totals unchanged
        partial_agg_batch_write(load_events(spark, SF), 0, t,
                                ["event_type"], "value")
        q2 = incremental_agg(read_event_stream(spark, SF), t, ckpt,
                             key_cols=["event_type"], value_col="value")
        q2.awaitTermination()
        again = {r.event_type: (r.n_rows, round(r.total, 2))
                 for r in read_incremental_agg(spark, t,
                                               ["event_type"]).collect()}
        assert again == got


def test_compaction_preserves_totals(spark):
    from etl_online_retail_spark.streaming.ingest import (
        compact_incremental_agg,
        incremental_agg,
        read_incremental_agg,
    )

    with tempfile.TemporaryDirectory() as d:
        t, ckpt = f"{d}/agg", f"{d}/ckpt"
        q = incremental_agg(read_event_stream(spark, SF), t, ckpt,
                            key_cols=["event_type"], value_col="value")
        q.awaitTermination()
        before = {r.event_type: (r.n_rows, round(r.total, 2))
                  for r in read_incremental_agg(spark, t,
                                                ["event_type"]).collect()}
        compact_incremental_agg(spark, t, ["event_type"])
        after = {r.event_type: (r.n_rows, round(r.total, 2))
                 for r in read_incremental_agg(spark, t,
                                               ["event_type"]).collect()}
        assert after == before
        # all partials folded into the single compacted partition
        batches = {r._batch_id for r in
                   spark.read.parquet(t).select("_batch_id").distinct().collect()}
        assert batches == {-1}
