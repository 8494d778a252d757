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


def test_autocompaction_bounds_partials_under_many_microbatches(
        spark, tmp_path):
    """ROADMAP 15: with max_partials set, the foreachBatch writer folds
    partials inline so the on-disk partition count stays bounded however
    many micro-batches run, and totals stay exact."""
    import os

    from pyspark.sql import functions as F

    from etl_online_retail_spark.catalog import SCHEMAS
    from etl_online_retail_spark.streaming.ingest import (
        _list_partials,
        incremental_agg,
        read_incremental_agg,
    )

    ev = load_events(spark, SF).cache()
    sdir = str(tmp_path / "stream")
    os.makedirs(sdir)
    for b in range(8):
        shard = ev.filter(
            F.pmod(F.crc32(F.col("event_id").cast("string")), F.lit(8)) == b)
        scratch = str(tmp_path / f"_s{b}")
        shard.coalesce(1).write.parquet(scratch)
        part = next(f for f in os.listdir(scratch) if f.endswith(".parquet"))
        os.rename(os.path.join(scratch, part),
                  os.path.join(sdir, f"s{b}.parquet"))

    stream = (spark.readStream.schema(SCHEMAS["events"])
              .option("maxFilesPerTrigger", 1).parquet(sdir)
              .withColumn("ts", F.col("ts").cast("timestamp")))
    t, ckpt = str(tmp_path / "agg"), str(tmp_path / "ckpt")
    q = incremental_agg(stream, t, ckpt, key_cols=["event_type"],
                        value_col="value", max_partials=3)
    q.awaitTermination()

    # 8 micro-batches ran, but compaction keeps the table at
    # <= threshold live partials + 1 compact
    assert len(_list_partials(t)) <= 4
    got = {r.event_type: (r.n_rows, round(r.total, 2))
           for r in read_incremental_agg(spark, t, ["event_type"]).collect()}
    want = {r.event_type: (r.n, round(r.v, 2))
            for r in (ev.groupBy("event_type")
                      .agg(F.count(F.lit(1)).alias("n"),
                           F.sum(F.col("value").cast("decimal(18,2)"))
                            .cast("double").alias("v")).collect())}
    assert got == want


def test_autocompaction_crash_windows_never_double_count(
        spark, tmp_path, monkeypatch):
    """Every crash window of the compact protocol reads exactly once:
    compact written but cleanup skipped (simulated crash), a covered
    batch replayed on top, then a later real compaction sweeping up."""
    from pyspark.sql import functions as F

    from etl_online_retail_spark.streaming.ingest import (
        _effective_partials,
        _list_partials,
        autocompact_incremental_agg,
        partial_agg_batch_write,
        read_incremental_agg,
    )

    ev = load_events(spark, SF).cache()
    t = str(tmp_path / "agg")
    for b in range(4):
        partial_agg_batch_write(ev.filter(F.col("event_id") % 4 == b), b, t,
                                ["event_type"], "value")
    want = {r.event_type: (r.n_rows, round(r.total, 2))
            for r in read_incremental_agg(spark, t, ["event_type"]).collect()}

    # crash between compact write and cleanup: covered originals linger
    monkeypatch.setattr("shutil.rmtree", lambda *a, **k: None)
    autocompact_incremental_agg(spark, t, ["event_type"])
    monkeypatch.undo()
    assert set(_list_partials(t)) == {-5, 0, 1, 2, 3}  # garbage present
    assert _effective_partials(t) == [-5]              # readers ignore it
    got = {r.event_type: (r.n_rows, round(r.total, 2))
           for r in read_incremental_agg(spark, t, ["event_type"]).collect()}
    assert got == want

    # at-least-once replay of an already-folded batch: still exact
    partial_agg_batch_write(ev.filter(F.col("event_id") % 4 == 2), 2, t,
                            ["event_type"], "value")
    got = {r.event_type: (r.n_rows, round(r.total, 2))
           for r in read_incremental_agg(spark, t, ["event_type"]).collect()}
    assert got == want

    # a later batch + real compaction sweeps all garbage
    partial_agg_batch_write(ev.filter(F.col("event_id") % 4 == 0), 4, t,
                            ["event_type"], "value")
    want2 = {r.event_type: (r.n_rows, round(r.total, 2))
             for r in read_incremental_agg(spark, t,
                                           ["event_type"]).collect()}
    autocompact_incremental_agg(spark, t, ["event_type"])
    assert _list_partials(t) == [-6]
    got = {r.event_type: (r.n_rows, round(r.total, 2))
           for r in read_incremental_agg(spark, t, ["event_type"]).collect()}
    assert got == want2


def test_all_partitions_share_one_parquet_schema(spark, tmp_path,
                                                 monkeypatch):
    """Originals and compacts must write `_sum` as ONE pinned decimal type:
    re-summing widens per pass (18,2 -> 28,2 -> 38,2), and in the crash
    window where a stale narrower compact coexists with the live wider one,
    the stale dir (sorting first) would drive schema inference and make the
    live compact unreadable (ADVICE r3)."""
    import glob
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from etl_online_retail_spark.streaming.ingest import (
        autocompact_incremental_agg,
        partial_agg_batch_write,
        read_incremental_agg,
    )

    ev = load_events(spark, SF).cache()
    t = str(tmp_path / "agg")
    for b in range(3):
        partial_agg_batch_write(ev.filter(F.col("event_id") % 4 == b), b, t,
                                ["event_type"], "value")
    # two generations of compact coexisting (cleanup suppressed = crash)
    monkeypatch.setattr("shutil.rmtree", lambda *a, **k: None)
    autocompact_incremental_agg(spark, t, ["event_type"])
    partial_agg_batch_write(ev.filter(F.col("event_id") % 4 == 3), 3, t,
                            ["event_type"], "value")
    autocompact_incremental_agg(spark, t, ["event_type"])
    monkeypatch.undo()

    # physical column types must match exactly (COUNT partials mark _n
    # required while compacts mark it optional — that's fine; a TYPE
    # difference is what breaks cross-partition reads)
    schemas = set()
    for part_dir in sorted(glob.glob(os.path.join(t, "_batch_id=*"))):
        for f in glob.glob(os.path.join(part_dir, "*.parquet")):
            s = pq.read_schema(f)
            schemas.add(tuple((n, str(s.field(n).type)) for n in s.names))
    assert len(schemas) == 1, schemas
    # and the table still reads correctly through the mixed-generation dir
    got = {r.event_type: (r.n_rows, round(r.total, 2))
           for r in read_incremental_agg(spark, t, ["event_type"]).collect()}
    want = {r.event_type: (r.n, round(r.v, 2))
            for r in (ev.groupBy("event_type")
                      .agg(F.count(F.lit(1)).alias("n"),
                           F.sum(F.col("value").cast("decimal(18,2)"))
                            .cast("double").alias("v")).collect())}
    assert got == want


def test_streaming_cms_matches_batch_sketch_and_replay_safe(
        spark, tmp_path):
    """The streamed sketch (per-micro-batch partials merged on read) must
    equal the batch sketch over the same data, and a replayed batch must
    not change it (partition overwrite idempotence)."""
    from pyspark.sql import functions as F

    from etl_online_retail_spark.catalog import SCHEMAS
    from etl_online_retail_spark.operators.sketches import (
        cms_estimate,
        cms_sketch,
    )
    from etl_online_retail_spark.streaming.ingest import (
        cms_batch_write,
        incremental_cms,
        read_incremental_cms,
    )

    ev = load_events(spark, SF).cache()
    src = str(tmp_path / "src")
    for b in range(3):
        (ev.filter(F.col("event_id") % 3 == b)
         .write.parquet(f"{src}/shard{b}"))
    stream = (spark.readStream.schema(SCHEMAS["events"])
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{src}/*")
              .select(F.col("event_type").alias("term")))
    t = str(tmp_path / "cms")
    q = incremental_cms(stream, t, str(tmp_path / "ckpt"))
    q.awaitTermination()

    streamed = {(r.j, r.bucket): r.cnt
                for r in read_incremental_cms(spark, t).collect()}
    batch = {(r.j, r.bucket): r.cnt
             for r in cms_sketch(
                 ev.select(F.col("event_type").alias("term"))).collect()}
    assert streamed == batch

    # replay of an already-committed batch: overwrites its own partition
    cms_batch_write(ev.filter(F.col("event_id") % 3 == 1)
                    .select(F.col("event_type").alias("term")), 1, t)
    after = {(r.j, r.bucket): r.cnt
             for r in read_incremental_cms(spark, t).collect()}
    assert after == batch

    # probe estimates through the merged streamed sketch are usable
    probe = ev.select(F.col("event_type").alias("term")).distinct()
    exact = {r.event_type: r.n for r in ev.groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n")).collect()}
    for r in cms_estimate(probe, read_incremental_cms(spark, t)).collect():
        assert r.n_est >= exact[r.term]


def test_streaming_kmv_matches_batch_sketch_and_replay_safe(
        spark, tmp_path):
    """The streamed KMV sketch (per-micro-batch k-min partials merged on
    read) must equal the batch sketch over the same data; a replayed
    batch must not change it; and distinct/overlap estimates flow from
    the merged sketch."""
    from pyspark.sql import functions as F

    from etl_online_retail_spark.catalog import SCHEMAS
    from etl_online_retail_spark.operators.sketches import (
        kmv_sketch,
        kmv_stats,
    )
    from etl_online_retail_spark.streaming.ingest import (
        incremental_kmv,
        kmv_batch_write,
        read_incremental_kmv,
    )

    ev = (load_events(spark, SF)
          .select(F.col("event_type").alias("g"),
                  F.pmod(F.col("user_id").cast("bigint") * 7_919 + 1,
                         F.lit(1_000_000_007)).alias("h0"))
          .cache())
    src = str(tmp_path / "src")
    for b in range(3):
        ev.filter(F.pmod(F.col("h0"), F.lit(3)) == b).write.parquet(
            f"{src}/shard{b}")
    stream = (spark.readStream.schema("g string, h0 bigint")
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{src}/*"))
    t = str(tmp_path / "kmv")
    q = incremental_kmv(stream, t, str(tmp_path / "ckpt"), "g", "h0")
    q.awaitTermination()

    def as_sets(df):
        out = {}
        for r in df.select("g", "_h").collect():
            out.setdefault(r.g, set()).add(r._h)
        return out

    streamed = as_sets(read_incremental_kmv(spark, t, "g"))
    batch = as_sets(kmv_sketch(ev, "g", "h0"))
    assert streamed == batch

    # replay of an already-committed batch overwrites its own partition
    kmv_batch_write(ev.filter(F.pmod(F.col("h0"), F.lit(3)) == 1),
                    1, t, "g", "h0")
    assert as_sets(read_incremental_kmv(spark, t, "g")) == batch

    # the merged sketch drives per-group distinct estimates (exact when
    # the group's value set fits in k)
    exact = {r.g: r.n for r in
             ev.groupBy("g").agg(F.countDistinct("h0").alias("n"))
             .collect()}
    for r in kmv_stats(read_incremental_kmv(spark, t, "g"), "g").collect():
        if r.n_kept < 128:
            assert r.kmv_est == float(exact[r.g])
        else:
            assert abs(r.kmv_est - exact[r.g]) / exact[r.g] < 0.3
    ev.unpersist()


def test_streaming_hdr_matches_batch_histogram_and_quantiles(
        spark, tmp_path):
    """The streamed HDR histogram (per-batch partials merged on read)
    must equal the batch histogram, and quantile estimates from the
    merged sketch must obey the relative-error bound."""
    import math

    from pyspark.sql import functions as F

    from etl_online_retail_spark.operators.sketches import (
        HDR_SUBBUCKETS,
        hdr_histogram,
        hdr_quantiles,
    )
    from etl_online_retail_spark.streaming.ingest import (
        incremental_hdr,
        read_incremental_hdr,
    )

    vals = (spark.range(1, 30_000)
            .select(F.lit("g").alias("grp"),
                    (F.col("id") * 31 % 99_991 + 1).alias("v"))
            .cache())
    src = str(tmp_path / "src")
    for b in range(3):
        vals.filter(F.col("v") % 3 == b).write.parquet(f"{src}/shard{b}")
    stream = (spark.readStream.schema("grp string, v bigint")
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{src}/*"))
    t = str(tmp_path / "hdr")
    q = incremental_hdr(stream, t, str(tmp_path / "ckpt"), "grp", "v")
    q.awaitTermination()

    as_map = lambda df: {(r.grp, r.bucket): (r.ub, r.cnt)
                         for r in df.collect()}
    streamed = as_map(read_incremental_hdr(spark, t, "grp"))
    batch = as_map(hdr_histogram(vals, "grp", "v"))
    assert streamed == batch

    qs = [0.5, 0.99]
    got = {r.q: r.est for r in hdr_quantiles(
        read_incremental_hdr(spark, t, "grp"), "grp", qs).collect()}
    xs = sorted(r.v for r in vals.collect())
    for qv in qs:
        exact = xs[math.ceil(qv * len(xs)) - 1]
        assert exact < got[qv] <= exact * (1 + 1.0 / HDR_SUBBUCKETS) * (1 + 1e-12)
    vals.unpersist()


def test_read_agg_as_of_versions_and_retention(spark):
    """Time travel over the incremental aggregate: VERSION AS OF any
    batch still inside retention reproduces that moment's totals; a
    version compacted away raises with the retention message."""
    import pytest
    from pyspark.sql import functions as F

    from etl_online_retail_spark.streaming.ingest import (
        autocompact_incremental_agg,
        partial_agg_batch_write,
        read_agg_as_of,
        read_incremental_agg,
    )

    ev = load_events(spark, SF).cache()
    # 4 micro-batches: events sharded by event_id % 4
    shards = [ev.filter(F.col("event_id") % 4 == b) for b in range(4)]

    with tempfile.TemporaryDirectory() as d:
        t = f"{d}/agg"
        for b, shard in enumerate(shards):
            partial_agg_batch_write(shard, b, t, ["event_type"], "value")

        def batch_totals(n_batches):
            cum = ev.filter(F.col("event_id") % 4 < n_batches)
            return {r.event_type: (r.n, round(r.v, 2)) for r in
                    (cum.groupBy("event_type")
                     .agg(F.count(F.lit(1)).alias("n"),
                          F.sum(F.col("value").cast("decimal(18,2)"))
                           .cast("double").alias("v")).collect())}

        for n in range(1, 5):
            got = {r.event_type: (r.n_rows, round(r.total, 2)) for r in
                   read_agg_as_of(spark, t, ["event_type"], n - 1).collect()}
            assert got == batch_totals(n), f"as-of batch {n-1}"

        # compact everything, then append one more partial (batch 4)
        autocompact_incremental_agg(spark, t, ["event_type"])
        partial_agg_batch_write(ev.limit(0), 4, t, ["event_type"], "value")

        # latest version still serves (compact + the new partial) and
        # equals the live read
        live = {r.event_type: (r.n_rows, round(r.total, 2)) for r in
                read_incremental_agg(spark, t, ["event_type"]).collect()}
        as_of4 = {r.event_type: (r.n_rows, round(r.total, 2)) for r in
                  read_agg_as_of(spark, t, ["event_type"], 4).collect()}
        assert as_of4 == live == batch_totals(4)

        # but version 1 predates the compact's coverage -> retention error
        with pytest.raises(ValueError, match="retention"):
            read_agg_as_of(spark, t, ["event_type"], 1)


def test_streaming_uniform_sample_equals_batch_and_replay_safe(spark):
    from pyspark.sql import functions as F

    from etl_online_retail_spark.operators.sampling import uniform_sample_topk
    from etl_online_retail_spark.streaming.ingest import (
        incremental_uniform_sample,
        read_incremental_uniform_sample,
        uniform_sample_batch_write,
    )

    K = 25
    ev = load_events(spark, SF).cache()
    want = {r.event_id for r in
            uniform_sample_topk(ev, "event_id", K).collect()}

    with tempfile.TemporaryDirectory() as d:
        t, ckpt = f"{d}/sample", f"{d}/ckpt"
        q = incremental_uniform_sample(read_event_stream(spark, SF), t, ckpt,
                                       id_col="event_id", k=K)
        q.awaitTermination()
        got = {r.event_id for r in read_incremental_uniform_sample(
            spark, t, "event_id", K).collect()}
        assert got == want  # stream sample == batch sample, exactly

        # crash-replay of batch 0 (foreachBatch redelivers the SAME
        # content): the partition overwrite makes it a no-op
        uniform_sample_batch_write(ev, 0, t, "event_id", K)
        final = {r.event_id for r in read_incremental_uniform_sample(
            spark, t, "event_id", K).collect()}
        assert final == want


def test_read_agg_as_of_legacy_full_compact(spark):
    """An undated -1 compact serves only latest-or-later versions; any
    earlier as-of raises with the autocompact guidance."""
    import pytest
    from pyspark.sql import functions as F

    from etl_online_retail_spark.streaming.ingest import (
        compact_incremental_agg,
        partial_agg_batch_write,
        read_agg_as_of,
        read_incremental_agg,
    )

    ev = load_events(spark, SF).cache()
    with tempfile.TemporaryDirectory() as d:
        t = f"{d}/agg"
        for b in range(2):
            partial_agg_batch_write(ev.filter(F.col("event_id") % 2 == b),
                                    b, t, ["event_type"], "value")
        compact_incremental_agg(spark, t, ["event_type"])  # -> _batch_id=-1
        partial_agg_batch_write(ev.limit(0), 2, t, ["event_type"], "value")
        partial_agg_batch_write(
            ev.filter(F.col("event_id") % 7 == 0), 3, t,
            ["event_type"], "value")

        live = {r.event_type: (r.n_rows, round(r.total, 2)) for r in
                read_incremental_agg(spark, t, ["event_type"]).collect()}
        as_of = {r.event_type: (r.n_rows, round(r.total, 2)) for r in
                 read_agg_as_of(spark, t, ["event_type"], 3).collect()}
        assert as_of == live  # latest version serves through the -1 fold
        with pytest.raises(ValueError, match="legacy full compact"):
            read_agg_as_of(spark, t, ["event_type"], 1)


def test_streaming_psi_matches_batch_and_replay_safe(spark, tmp_path):
    """The live PSI (per-micro-batch count partials merged through
    psi_from_counts) must be bit-equal to the batch psi_by_group over
    the complete log, and a replayed batch must not change it."""
    from pyspark.sql import functions as F

    from etl_online_retail_spark.catalog import SCHEMAS
    from etl_online_retail_spark.operators.profile import psi_by_group
    from etl_online_retail_spark.streaming.ingest import (
        incremental_psi,
        psi_batch_write,
        read_incremental_psi,
    )

    ev = load_events(spark, SF).cache()
    bucketed = ev.select(
        "event_type",
        F.least(F.floor(F.col("value") / 50), F.lit(9)).alias("bkt"))
    src = str(tmp_path / "psi_src")
    for b in range(3):
        (ev.filter(F.col("event_id") % 3 == b)
         .write.parquet(f"{src}/shard{b}"))
    stream = (spark.readStream.schema(SCHEMAS["events"])
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{src}/*")
              .select("event_type",
                      F.least(F.floor(F.col("value") / 50), F.lit(9))
                       .alias("bkt")))
    t = str(tmp_path / "psi")
    q = incremental_psi(stream, t, str(tmp_path / "psi_ckpt"),
                        "event_type", "bkt")
    q.awaitTermination()

    live = {r.event_type: (r.n_rows, r.psi)
            for r in read_incremental_psi(spark, t,
                                          "event_type", "bkt").collect()}
    want = {r.event_type: (r.n_rows, r.psi)
            for r in psi_by_group(bucketed, "event_type", "bkt").collect()}
    assert live == want and len(live) >= 3

    # replay of an already-committed batch: overwrites its own partition
    psi_batch_write(
        ev.filter(F.col("event_id") % 3 == 1)
          .select("event_type",
                  F.least(F.floor(F.col("value") / 50), F.lit(9))
                   .alias("bkt")),
        1, t, "event_type", "bkt")
    after = {r.event_type: (r.n_rows, r.psi)
             for r in read_incremental_psi(spark, t,
                                           "event_type", "bkt").collect()}
    assert after == want


def test_streaming_quarantine_routes_and_replays_safely(spark, tmp_path):
    """Every row lands on exactly one side with the batch operator's
    exact routing, and a replayed batch overwrites its own partitions
    on BOTH sides."""
    from pyspark.sql import functions as F

    from etl_online_retail_spark.catalog import SCHEMAS
    from etl_online_retail_spark.streaming.ingest import (
        quarantine_batch_write,
        quarantined_ingest,
    )

    ev = load_events(spark, SF).cache()
    src = str(tmp_path / "q_src")
    for b in range(3):
        (ev.filter(F.col("event_id") % 3 == b)
         .write.parquet(f"{src}/shard{b}"))
    stream = spark.readStream.schema(SCHEMAS["events"]).parquet(f"{src}/*")
    rules = [("value_cap", F.col("value") <= 300.0),
             ("known_type",
              F.col("event_type").isin("click", "view", "purchase",
                                       "signup"))]
    vdir, qdir = str(tmp_path / "valid"), str(tmp_path / "quar")
    q = quarantined_ingest(stream, vdir, qdir, str(tmp_path / "q_ckpt"),
                           rules)
    q.awaitTermination()

    valid = spark.read.parquet(vdir)
    quar = spark.read.parquet(qdir)
    assert valid.count() + quar.count() == ev.count()
    # routing matches the batch operator exactly
    n_bad = ev.filter((F.col("value") > 300.0)
                      | (F.col("event_type") == "error")).count()
    assert quar.count() == n_bad
    assert "violations" in quar.columns
    assert quar.filter(F.col("violations") == "").count() == 0

    # replay the committed batch (availableNow ran the three files as
    # ONE micro-batch, id 0) with identical content: both sides must
    # come back unchanged (partition overwrite, not append)
    before = (valid.count(), quar.count())
    quarantine_batch_write(ev, 0, vdir, qdir, rules)
    after = (spark.read.parquet(vdir).count(),
             spark.read.parquet(qdir).count())
    assert after == before


def test_erase_from_landed_rewrites_only_hit_partitions(spark, tmp_path):
    """Retroactive GDPR sweep over the landed stream: subject rows
    vanish, unaffected partition directories are not rewritten, an
    all-subject partition is deleted outright, and a second pass is a
    no-op."""
    import os

    from pyspark.sql import functions as F

    from etl_online_retail_spark.streaming.ingest import (
        erase_from_landed,
        idempotent_batch_write,
    )

    out = str(tmp_path / "landed")
    rows0 = [(1, "click", 10.0), (2, "view", 5.0), (1, "view", 2.0)]
    rows1 = [(3, "click", 7.0), (4, "click", 1.0)]
    rows2 = [(1, "buy", 9.0)]          # batch 2: ONLY the subject
    for i, rows in enumerate((rows0, rows1, rows2)):
        idempotent_batch_write(
            spark.createDataFrame(rows, "user_id INT, event_type STRING,"
                                        " value DOUBLE"),
            i, out, partition_by="event_type")

    untouched = os.path.join(out, "_batch_id=1", "event_type=click")
    before = sorted(os.listdir(untouched))
    mtimes = {f: os.path.getmtime(os.path.join(untouched, f))
              for f in before}

    audit = erase_from_landed(spark, out, "user_id", [1])
    assert audit["rows_erased"] == 3
    assert audit["partitions_rewritten"] == 1   # b0/view (mixed rows)
    assert audit["partitions_deleted"] == 2     # b0/click, b2/buy (all-subject)

    table = spark.read.parquet(out)
    assert table.filter(F.col("user_id") == 1).count() == 0
    assert table.count() == 3                   # users 2,3,4 intact
    # the all-subject partition directory is gone
    assert not os.path.exists(os.path.join(out, "_batch_id=2",
                                           "event_type=buy"))
    # the untouched partition kept its exact files
    after = sorted(os.listdir(untouched))
    assert after == before
    assert all(os.path.getmtime(os.path.join(untouched, f)) == mtimes[f]
               for f in after)

    again = erase_from_landed(spark, out, "user_id", [1])
    assert again == {"partitions_rewritten": 0, "partitions_deleted": 0,
                     "rows_erased": 0}


def test_erase_from_landed_preserves_null_keys_and_escaped_partitions(
        spark, tmp_path):
    """NULL-key rows are NOT subjects and must survive the rewrite; a
    partition VALUE Spark escapes on disk (colon) must still be found
    and deleted when its partition becomes all-subject."""
    import os

    from pyspark.sql import functions as F

    from etl_online_retail_spark.streaming.ingest import (
        erase_from_landed,
        idempotent_batch_write,
    )

    out = str(tmp_path / "landed")
    rows = [(1, "a:b", 1.0),          # subject in an ESCAPED partition
            (None, "plain", 2.0),     # NULL key beside a subject
            (1, "plain", 3.0),
            (2, "plain", 4.0)]
    idempotent_batch_write(
        spark.createDataFrame(rows, "user_id INT, event_type STRING,"
                                    " value DOUBLE"),
        0, out, partition_by="event_type")

    audit = erase_from_landed(spark, out, "user_id", [1])
    assert audit["rows_erased"] == 2
    table = spark.read.parquet(out)
    got = {(r.user_id, r.event_type) for r in table.collect()}
    assert (None, "plain") in got          # NULL-key row survived
    assert (2, "plain") in got
    assert all(u != 1 for u, _ in got)
    # the escaped all-subject partition directory is actually gone
    b0 = os.path.join(out, "_batch_id=0")
    assert not any("a%3Ab" in d or "a:b" in d for d in os.listdir(b0))


def test_erase_from_landed_handles_null_partition_values(spark, tmp_path):
    """A subject row landed under a NULL partition value (the
    __HIVE_DEFAULT_PARTITION__ directory) must still be erased — the
    slice predicate needs eqNullSafe, not ==."""
    from pyspark.sql import functions as F

    from etl_online_retail_spark.streaming.ingest import (
        erase_from_landed,
        idempotent_batch_write,
    )

    out = str(tmp_path / "landed")
    rows = [(1, None, 1.0), (2, None, 2.0), (1, "click", 3.0)]
    idempotent_batch_write(
        spark.createDataFrame(rows, "user_id INT, event_type STRING,"
                                    " value DOUBLE"),
        0, out, partition_by="event_type")
    audit = erase_from_landed(spark, out, "user_id", [1])
    assert audit["rows_erased"] == 2
    table = spark.read.parquet(out)
    assert table.filter(F.col("user_id") == 1).count() == 0
    # the non-subject row in the NULL partition survived
    assert table.filter(F.col("event_type").isNull()).count() == 1


def test_replay_erasure_sweep_reapplies_ledger(spark, tmp_path):
    """The documented replay caveat, closed: a replayed _batch_id
    reinserts erased subjects; replay_erasure_sweep re-applies every
    ledgered erasure so the subject stays gone without the caller
    re-supplying the key list."""
    from pyspark.sql import functions as F

    from etl_online_retail_spark.streaming.ingest import (
        erase_from_landed,
        idempotent_batch_write,
        ledger_subjects,
        replay_erasure_sweep,
    )

    out = str(tmp_path / "landed")
    rows0 = [(1, "click", 10.0), (2, "view", 5.0)]
    idempotent_batch_write(
        spark.createDataFrame(rows0, "user_id INT, event_type STRING,"
                                     " value DOUBLE"),
        0, out, partition_by="event_type")
    erase_from_landed(spark, out, "user_id", [1])
    assert ledger_subjects(out) == {"user_id": [1]}

    # the stream replays batch 0 wholesale -> subject reinserted
    idempotent_batch_write(
        spark.createDataFrame(rows0, "user_id INT, event_type STRING,"
                                     " value DOUBLE"),
        0, out, partition_by="event_type")
    table = spark.read.parquet(out)
    assert table.filter(F.col("user_id") == 1).count() == 1

    swept = replay_erasure_sweep(spark, out)
    assert swept["rows_erased"] == 1
    assert spark.read.parquet(out).filter(
        F.col("user_id") == 1).count() == 0
    # the sweep re-erased without duplicating the ledger
    assert ledger_subjects(out) == {"user_id": [1]}
    assert replay_erasure_sweep(spark, out)["rows_erased"] == 0


def test_streaming_mix_rates_equal_batch(spark, tmp_path):
    """The fifth streamable family: per-batch source-count partials
    merged on read feed the identical counts->rates arithmetic, so the
    live temperature-mix rates equal the batch operator bit-for-bit
    over the complete stream, replay-safe."""
    import os

    from pyspark.sql import functions as F

    from etl_online_retail_spark.catalog import load_table
    from etl_online_retail_spark.operators.sampling import (
        temperature_rates,
    )
    from etl_online_retail_spark.streaming.ingest import (
        incremental_source_counts,
        read_mix_rates,
    )

    docs = load_table(spark, "documents", SF).select("doc_id", "source")
    # shuffled micro-batch arrival: content-hash batching, not id order
    sdir = str(tmp_path / "stream")
    os.makedirs(sdir)
    batched = docs.withColumn(
        "_b", F.pmod(F.xxhash64("doc_id"), F.lit(4)))
    for b in range(4):
        (batched.filter(F.col("_b") == b).drop("_b").coalesce(1)
         .write.mode("overwrite").parquet(f"{sdir}/b{b}"))
    stream = (spark.readStream
              .schema(docs.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(sdir + "/b*"))
    t, ckpt = str(tmp_path / "counts"), str(tmp_path / "ckpt")
    q = incremental_source_counts(stream, t, ckpt, "source")
    q.awaitTermination()

    def rows(df):
        return sorted((r.source, r.n_total, r.p_temp, r.cutoff)
                      for r in df.collect())

    live = rows(read_mix_rates(spark, t, "source", 200))
    batch = rows(temperature_rates(docs, "source", 200))
    assert live == batch                       # bit-for-bit
    # crash-replay of one batch: partials overwrite, rates unchanged
    replay = spark.read.parquet(f"{sdir}/b2")
    (replay.groupBy("source").agg(F.count(F.lit(1)).alias("_n"))
     .withColumn("_batch_id", F.lit(2))
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("_batch_id").parquet(t))
    assert rows(read_mix_rates(spark, t, "source", 200)) == batch


def test_incremental_minhash_dedup_stream_equals_batch(spark):
    """The live dedup loop: micro-batches probe the index the stream has
    accumulated. Over the full stream, the union of hit partitions must
    equal the batch operator's cross-batch pair set (each pair attributed
    to the LATER side's batch), with identical jaccard values; replaying
    a batch must leave both outputs unchanged."""
    import pyspark.sql.functions as F

    from etl_online_retail_spark.catalog import load_table
    from etl_online_retail_spark.operators.dedup import (
        minhash_near_duplicates,
    )
    from etl_online_retail_spark.streaming.ingest import (
        incremental_minhash_dedup,
        minhash_index_batch_write,
    )

    docs = load_table(spark, "documents", SF).select("doc_id", "text").cache()
    with tempfile.TemporaryDirectory() as d:
        src, index_dir, dups_dir, ckpt = (f"{d}/src", f"{d}/index",
                                          f"{d}/dups", f"{d}/ckpt")
        # three source files = three micro-batches (maxFilesPerTrigger=1)
        for part in range(3):
            (docs.filter(F.col("doc_id") % 3 == part)
             .coalesce(1).write.parquet(f"{src}/p{part}"))
        stream = (spark.readStream.schema(docs.schema)
                  .option("maxFilesPerTrigger", 1).parquet(f"{src}/p*"))
        q = incremental_minhash_dedup(stream, index_dir, dups_dir, ckpt)
        q.awaitTermination()

        batch_of = {r._id: r._batch_id for r in
                    (spark.read.parquet(index_dir)
                     .select("_id", "_batch_id").collect())}
        assert set(batch_of.values()) == {0, 1, 2}
        hits = {(r.new_id, r.corpus_id): (r.jaccard, r._batch_id) for r in
                spark.read.parquet(dups_dir).collect()}

        expected = {}
        for r in minhash_near_duplicates(docs).collect():
            ba, bb = batch_of[r.id_a], batch_of[r.id_b]
            if ba == bb:
                continue  # within-batch pairs are out of contract
            new, old = (r.id_a, r.id_b) if ba > bb else (r.id_b, r.id_a)
            expected[(new, old)] = (r.jaccard, max(ba, bb))
        assert expected, "fixture produced no cross-batch pairs"
        assert hits == expected

        # replay batch 1 (at-least-once): identical view -> identical rows
        batch1_docs = docs.filter(
            F.col("doc_id").isin([i for i, b in batch_of.items() if b == 1]))
        minhash_index_batch_write(batch1_docs, 1, index_dir, dups_dir)
        hits2 = {(r.new_id, r.corpus_id): (r.jaccard, r._batch_id) for r in
                 spark.read.parquet(dups_dir).collect()}
        assert hits2 == expected
        assert {r._id: r._batch_id for r in
                (spark.read.parquet(index_dir)
                 .select("_id", "_batch_id").collect())} == batch_of


def test_read_agg_as_of_survives_interrupted_autocompact_cleanup(
        spark, monkeypatch):
    """MIXED compaction crash window (r10 find): a legacy -1 fold, later
    batches, then an autocompact whose cleanup crashed after deleting
    the originals but before deleting -1. The live reader ignores the
    stale -1 (a coverage compact exists); the as-of reader used to take
    its legacy branch on seeing -1 and serve a silently STALE snapshot
    for the newest version. Both must read the coverage compact."""
    import shutil

    import pytest
    from pyspark.sql import functions as F

    from etl_online_retail_spark.streaming.ingest import (
        _list_partials,
        autocompact_incremental_agg,
        compact_incremental_agg,
        partial_agg_batch_write,
        read_agg_as_of,
        read_incremental_agg,
    )

    ev = load_events(spark, SF).cache()
    with tempfile.TemporaryDirectory() as d:
        t = f"{d}/agg"
        for b in range(3):
            partial_agg_batch_write(ev.filter(F.col("event_id") % 5 == b),
                                    b, t, ["event_type"], "value")
        compact_incremental_agg(spark, t, ["event_type"])  # undated -1
        for b in range(3, 5):
            partial_agg_batch_write(ev.filter(F.col("event_id") % 5 == b),
                                    b, t, ["event_type"], "value")

        real_rmtree = shutil.rmtree
        monkeypatch.setattr(
            "shutil.rmtree",
            lambda p, **k: None if str(p).endswith("_batch_id=-1")
            else real_rmtree(p, **k))
        autocompact_incremental_agg(spark, t, ["event_type"])
        monkeypatch.undo()
        assert sorted(_list_partials(t)) == [-6, -1]  # the crash state

        want = {r.event_type: (r.n, round(r.v, 2)) for r in
                (ev.groupBy("event_type")
                 .agg(F.count(F.lit(1)).alias("n"),
                      F.sum(F.col("value").cast("decimal(18,2)"))
                       .cast("double").alias("v")).collect())}
        live = {r.event_type: (r.n_rows, round(r.total, 2)) for r in
                read_incremental_agg(spark, t, ["event_type"]).collect()}
        as_of = {r.event_type: (r.n_rows, round(r.total, 2)) for r in
                 read_agg_as_of(spark, t, ["event_type"], 4).collect()}
        assert live == want
        assert as_of == want  # was the -1 fold's pre-batch-3 totals

        # versions under the coverage are genuinely undated -> refuse
        with pytest.raises(ValueError, match="retention"):
            read_agg_as_of(spark, t, ["event_type"], 2)

        # a bare undated fold with NO later partials refuses every
        # version (the fold's last-folded id is unknowable)
        t2 = f"{d}/agg2"
        for b in range(2):
            partial_agg_batch_write(ev.filter(F.col("event_id") % 5 == b),
                                    b, t2, ["event_type"], "value")
        compact_incremental_agg(spark, t2, ["event_type"])
        with pytest.raises(ValueError, match="unknowable"):
            read_agg_as_of(spark, t2, ["event_type"], 1)


def test_as_of_never_lies_under_any_maintenance_schedule(spark):
    """Property (hypothesis): for ANY schedule of appends interleaved
    with legacy folds, autocompactions, and crash-interrupted
    autocompaction cleanups, read_agg_as_of at EVERY version either
    raises ValueError (past retention / undated) or returns exactly the
    true cumulative totals — never a silently wrong snapshot. The
    snapshot contract's whole value is in that 'never'."""
    import shutil

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    from etl_online_retail_spark.streaming.ingest import (
        autocompact_incremental_agg,
        compact_incremental_agg,
        partial_agg_batch_write,
        read_agg_as_of,
    )

    rows = [(i, f"t{i % 2}", float(i)) for i in range(24)]
    df = spark.createDataFrame(
        rows, "event_id bigint, event_type string, value double").cache()
    df.count()

    def truth(k, n):  # exact per-type (count, sum) over batches 0..n
        out = {}
        for i, ty, v in rows:
            if i % k <= n:
                c, s = out.get(ty, (0, 0.0))
                out[ty] = (c + 1, s + v)
        return {ty: (c, round(s, 2)) for ty, (c, s) in out.items()}

    ACTIONS = ["none", "legacy", "auto", "crash_keep_all",
               "crash_keep_legacy"]

    # max_examples raised 5 -> 30 (r11 verdict): the crash->legacy
    # double-count survived three rounds because 5 examples explore
    # ~nothing of the 5^k schedule space; ~2 s/example keeps 30 in CI
    # budget. The found schedule is also pinned deterministically below
    # (test_legacy_fold_after_crashed_autocompact_does_not_double_count).
    @settings(max_examples=30, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(st.data())
    def check(data):
        k = data.draw(st.integers(min_value=1, max_value=4), label="k")
        actions = data.draw(
            st.lists(st.sampled_from(ACTIONS), min_size=k, max_size=k),
            label="actions")

        import tempfile as _tf

        t = _tf.mkdtemp() + "/agg"  # fresh per EXECUTION (replay-safe)
        real_rmtree = shutil.rmtree
        try:
            for b in range(k):
                partial_agg_batch_write(
                    df.filter(F.col("event_id") % k == b), b, t,
                    ["event_type"], "value")
                act = actions[b]
                if act == "legacy":
                    compact_incremental_agg(spark, t, ["event_type"])
                elif act == "auto":
                    autocompact_incremental_agg(spark, t, ["event_type"])
                elif act == "crash_keep_all":
                    shutil.rmtree = lambda p, **kw: None
                    autocompact_incremental_agg(spark, t, ["event_type"])
                    shutil.rmtree = real_rmtree
                elif act == "crash_keep_legacy":
                    shutil.rmtree = (
                        lambda p, **kw: None
                        if str(p).endswith("_batch_id=-1")
                        else real_rmtree(p, **kw))
                    autocompact_incremental_agg(spark, t, ["event_type"])
                    shutil.rmtree = real_rmtree
            for n in range(k):
                try:
                    got = {r.event_type: (r.n_rows, round(r.total, 2))
                           for r in read_agg_as_of(
                               spark, t, ["event_type"], n).collect()}
                except ValueError:
                    continue  # refusing is always allowed
                assert got == truth(k, n), \
                    f"as-of {n} lied (k={k}, actions={actions})"
        finally:
            shutil.rmtree = real_rmtree
            real_rmtree(t.rsplit("/", 1)[0], ignore_errors=True)

    check()


def test_legacy_fold_after_crashed_autocompact_does_not_double_count(
        spark, tmp_path, monkeypatch):
    """Deterministic pin of the r11 falsifying schedule (hypothesis drew
    k=3, actions=['crash_keep_all', 'legacy', 'none']): an autocompaction
    writes its coverage compact but crashes before cleanup, so the
    compact AND its covered originals both sit on disk — the exact
    window effective_partials exists for. The legacy -1 fold used to sum
    the raw directory (compact + covered originals = batch 0 twice,
    16 rows/168.0 where truth is 12/144.0) and its static overwrite made
    the corruption the only partition, permanently wrong for every later
    reader, live and as-of. The fold must source only effective
    partials. Both crash flavors are pinned: cleanup skipped entirely
    (crash_keep_all) and cleanup that only left the stale -1 behind
    (crash_keep_legacy, which needs a prior -1 to keep)."""
    import shutil

    from pyspark.sql import functions as F

    from etl_online_retail_spark.streaming.ingest import (
        autocompact_incremental_agg,
        compact_incremental_agg,
        partial_agg_batch_write,
        read_agg_as_of,
        read_incremental_agg,
    )

    rows = [(i, f"t{i % 2}", float(i)) for i in range(24)]
    df = spark.createDataFrame(
        rows, "event_id bigint, event_type string, value double").cache()
    df.count()

    def truth(k, n):
        out = {}
        for i, ty, v in rows:
            if i % k <= n:
                c, s = out.get(ty, (0, 0.0))
                out[ty] = (c + 1, s + v)
        return {ty: (c, round(s, 2)) for ty, (c, s) in out.items()}

    real_rmtree = shutil.rmtree

    def run(schedule, table_dir):
        for b, act in enumerate(schedule):
            partial_agg_batch_write(
                df.filter(F.col("event_id") % len(schedule) == b), b,
                table_dir, ["event_type"], "value")
            if act == "legacy":
                compact_incremental_agg(spark, table_dir, ["event_type"])
            elif act == "crash_keep_all":
                monkeypatch.setattr(shutil, "rmtree",
                                    lambda p, **kw: None)
                autocompact_incremental_agg(spark, table_dir,
                                            ["event_type"])
                monkeypatch.setattr(shutil, "rmtree", real_rmtree)
            elif act == "crash_keep_legacy":
                monkeypatch.setattr(
                    shutil, "rmtree",
                    lambda p, **kw: None
                    if str(p).endswith("_batch_id=-1")
                    else real_rmtree(p, **kw))
                autocompact_incremental_agg(spark, table_dir,
                                            ["event_type"])
                monkeypatch.setattr(shutil, "rmtree", real_rmtree)

    schedules = [
        ["crash_keep_all", "legacy", "none"],     # the found example
        ["legacy", "crash_keep_legacy", "legacy", "none"],
    ]
    for si, schedule in enumerate(schedules):
        t = str(tmp_path / f"agg{si}")
        run(schedule, t)
        k = len(schedule)
        live = {r.event_type: (r.n_rows, round(r.total, 2)) for r in
                read_incremental_agg(spark, t, ["event_type"]).collect()}
        assert live == truth(k, k - 1), f"live reader lied: {schedule}"
        for n in range(k):
            try:
                got = {r.event_type: (r.n_rows, round(r.total, 2))
                       for r in read_agg_as_of(
                           spark, t, ["event_type"], n).collect()}
            except ValueError:
                continue  # refusing is always allowed
            assert got == truth(k, n), \
                f"as-of {n} lied under schedule {schedule}"


def test_weighted_partials_preserve_decimal_scale(spark, tmp_path):
    """r10 review find: the weighted CDC term must NEGATE, not multiply
    — decimal(37,10) x int re-types to decimal(38,6) under Spark's
    allowPrecisionLoss and silently rounds scale-10 partials. A +1/-1
    pair over a value with 10 significant decimals must cancel exactly
    and the stored partial must keep scale 10."""
    from decimal import Decimal

    from pyspark.sql import functions as F

    from etl_online_retail_spark.streaming.ingest import (
        partial_multi_agg_batch_write,
    )

    v = Decimal("1.0123456789")
    df = spark.createDataFrame(
        [("a", v, 1), ("a", v, -1), ("b", v, 1)],
        "k string, _v decimal(37,10), _w int")
    t = str(tmp_path / "agg")
    partial_multi_agg_batch_write(df, 0, t, ["k"], ["_v"],
                                  sum_type="decimal(38,10)",
                                  weight_col="_w")
    out = spark.read.parquet(t)
    assert dict(out.dtypes)["_sum"] == "decimal(38,10)"
    got = {r.k: r._sum for r in out.collect()}
    assert got == {"a": Decimal("0.0000000000"), "b": v}


def test_legacy_compact_survives_session_dynamic_overwrite_mode(spark):
    """r10 review find: the -1 fold's whole-table overwrite must be
    pinned STATIC — under a session-level partitionOverwriteMode=dynamic
    the unpinned write replaced only the -1 partition, leaving the
    folded originals beside it (a double count for every reader and the
    as-of legacy branch's broken precondition)."""
    from pyspark.sql import functions as F

    from etl_online_retail_spark.streaming.ingest import (
        _list_partials,
        compact_incremental_agg,
        partial_agg_batch_write,
        read_incremental_agg,
    )

    ev = load_events(spark, SF).cache()
    conf_key = "spark.sql.sources.partitionOverwriteMode"
    old = spark.conf.get(conf_key, None)
    with tempfile.TemporaryDirectory() as d:
        t = f"{d}/agg"
        for b in range(3):
            partial_agg_batch_write(ev.filter(F.col("event_id") % 3 == b),
                                    b, t, ["event_type"], "value")
        want = {r.event_type: (r.n_rows, round(r.total, 2)) for r in
                read_incremental_agg(spark, t, ["event_type"]).collect()}
        try:
            spark.conf.set(conf_key, "dynamic")
            compact_incremental_agg(spark, t, ["event_type"])
        finally:
            if old is None:
                spark.conf.unset(conf_key)
            else:
                spark.conf.set(conf_key, old)
        assert _list_partials(t) == [-1]  # originals really gone
        got = {r.event_type: (r.n_rows, round(r.total, 2)) for r in
               read_incremental_agg(spark, t, ["event_type"]).collect()}
        assert got == want


def test_weighted_write_refuses_non_unit_weights(spark, tmp_path):
    """r10 advice: the ±1 weight contract is enforced, not just
    documented — a 0/±2/NULL weight would scale `_n` by w while negating
    each value only once (silently inconsistent partials that can net
    positive and slip past liveness). The violating batch writes
    NOTHING."""
    import os
    from decimal import Decimal

    import pytest

    from etl_online_retail_spark.streaming.ingest import (
        partial_multi_agg_batch_write,
    )

    t = str(tmp_path / "agg")
    for w in (2, 0, -3, None):
        df = spark.createDataFrame(
            [("a", Decimal("1.00"), 1), ("b", Decimal("2.00"), w)],
            "k string, _v decimal(18,2), _w int")
        with pytest.raises(ValueError, match="exactly \\+1 or -1"):
            partial_multi_agg_batch_write(df, 0, t, ["k"], ["_v"],
                                          weight_col="_w")
        assert not os.path.isdir(t)  # nothing was written
    # the valid signs still write (and carry no _bad_w column)
    ok = spark.createDataFrame(
        [("a", Decimal("1.00"), 1), ("a", Decimal("1.00"), -1)],
        "k string, _v decimal(18,2), _w int")
    partial_multi_agg_batch_write(ok, 0, t, ["k"], ["_v"],
                                  weight_col="_w")
    out = spark.read.parquet(t)
    assert "_bad_w" not in out.columns
    assert [(r.k, r._n) for r in out.collect()] == [("a", 0)]


def test_incremental_battle_matrix_stream_equals_batch(spark, tmp_path):
    """The streamed pairwise matrix merges bit-equal to the batch
    operator over the full battle log; the leaderboard derived from
    the merged matrix (records + fixed-point Bradley-Terry) equals the
    battle-log computation; replaying a batch changes nothing."""
    import os

    from pyspark.sql import functions as F

    from etl_online_retail_spark.catalog import load_table
    from etl_online_retail_spark.operators.arena import (
        bradley_terry,
        bradley_terry_from_matrix,
        model_records,
        pairwise_matrix,
        records_from_matrix,
    )
    from etl_online_retail_spark.streaming.ingest import (
        battle_matrix_batch_write,
        incremental_battle_matrix,
        read_battle_matrix,
    )

    # ONE source of truth for the battles fixture (review r13: a third
    # inline copy would silently drift from the oracle-gated one)
    from etl_online_retail_spark.workload_ext import _battles

    battles = _battles(spark, SF)

    sdir = str(tmp_path / "stream")
    os.makedirs(sdir)
    batched = battles.withColumn(
        "_b", F.pmod(F.xxhash64("model_a", "model_b", "outcome"),
                     F.lit(4)))
    for b in range(4):
        (batched.filter(F.col("_b") == b).drop("_b")
         .coalesce(1).write.mode("overwrite").parquet(f"{sdir}/b{b}"))
    schema = battles.schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(sdir + "/b*"))
    t, ckpt = str(tmp_path / "matrix"), str(tmp_path / "ckpt")
    q = incremental_battle_matrix(stream, t, ckpt)
    q.awaitTermination()

    def mrows(df):
        return sorted(tuple(x) for x in df.collect())

    merged = read_battle_matrix(spark, t)
    batch_pm = pairwise_matrix(battles)
    assert mrows(merged.select("m1", "m2", "m1_wins", "m2_wins",
                               "ties", "n_battles")) == \
        mrows(batch_pm)
    # leaderboard off the matrix == leaderboard off the battle log
    assert mrows(records_from_matrix(merged)) == \
        mrows(model_records(battles))
    assert mrows(bradley_terry_from_matrix(merged, iters=3)) == \
        mrows(bradley_terry(battles, iters=3))
    # crash-replay of one batch: the partial overwrites exactly itself
    replay = spark.read.parquet(f"{sdir}/b2")
    battle_matrix_batch_write(replay, 2, t)
    assert mrows(read_battle_matrix(spark, t)
                 .select("m1", "m2", "m1_wins", "m2_wins",
                         "ties", "n_battles")) == mrows(batch_pm)
