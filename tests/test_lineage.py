"""cut_lineage: the shared round-boundary materializer for iterative
operators (r15, VERDICT item 7) — default eager localCheckpoint, opt-in
reliable checkpoint via $SPARK_GRAFT_CHECKPOINT_DIR."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_online_retail_spark.session import cut_lineage


def test_default_mode_materializes_and_preserves_rows(spark):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    out = cut_lineage(df)
    assert sorted((r.id, r.v) for r in out.collect()) == \
        [(i, 2 * i) for i in range(100)]
    # lineage is cut: the returned plan is a scan, not the range+project
    assert "Range" not in out._jdf.queryExecution().optimizedPlan().toString()


def test_reliable_mode_writes_checkpoint_files(spark, tmp_path, monkeypatch):
    ckdir = str(tmp_path / "ck")
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", ckdir)
    df = spark.range(50).withColumn("v", F.col("id") + 1)
    out = cut_lineage(df)
    assert sorted((r.id, r.v) for r in out.collect()) == \
        [(i, i + 1) for i in range(50)]
    # the cut went through the RELIABLE path: files under the dir
    files = [f for _, _, fs in os.walk(ckdir) for f in fs]
    assert files, "reliable checkpoint mode wrote nothing"
