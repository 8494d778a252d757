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
