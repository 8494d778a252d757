"""Recorded 30x-accumulated CDC maintenance session (VERDICT r11 item 7).

The serving stack's pieces are each measured flat (append cost,
retraction cost, join-IVM fixed batch, autocompaction) — this drives the
FULL composition at 30x accumulated history in one recorded run:
streaming CDC feed -> concurrent multi-view maintenance (autocompaction
firing inside the stream) -> publish -> staged hash gate vs DuckDB.

Feed shape: the sf0.1 lineitem table arrives as two insert halves, then
29 churn pairs — an insert of the even-orderkey half followed by a
delete image retracting exactly that copy. Every batch is ~300k rows
(fixed size), 60 micro-batches / ~18M change rows total = 30x the
table's row count flows through maintenance, while the NET state stays
bit-equal to the base table — so the closing staged gate against DuckDB
(which reads the original parquet) proves all 29 rounds of retractions
unwound exactly, not just that the stream ran.

The claim under test: per-batch maintenance cost is FLAT in accumulated
history (autocompaction keeps the effective partial set bounded at
max_partials, and the compact's size is bounded by grain cardinality,
not by how much history folded into it). The report buckets the
per-batch trigger times at 1x / 10x / 30x accumulated volume.

Usage: python scripts/cdc_stream_30x.py   (run alone: wall-clock)
Results are recorded in PERFORMANCE.md.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_CHURN_PAIRS = int(os.environ.get("SPARK_GRAFT_CDC_PAIRS", "29"))

SERVED = [
    "total_revenue", "revenue_by_ymd", "revenue_rollup",
    "star_revenue_by_nation_month", "top_products_by_revenue",
    "pricing_summary", "revenue_cube", "revenue_grouping_sets",
    "revenue_pivot_by_flag", "revenue_rollup_gid",
    "revenue_share_by_nation", "chart_monthly_revenue",
]


def _write_one(df, dst: str) -> str:
    stage = tempfile.mkdtemp()
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
    shutil.move(part, dst)
    shutil.rmtree(stage, ignore_errors=True)
    return dst


def build_feed(spark, feed_dir: str) -> tuple[int, int]:
    """Three distinct physical files (even-half insert, odd-half insert,
    even-half delete); churn pairs are file COPIES with increasing
    mtimes — identical change content each round, so the feed build
    costs three writes, not sixty."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    even = li.filter(F.col("l_orderkey") % 2 == 0)
    odd = li.filter(F.col("l_orderkey") % 2 == 1)
    os.makedirs(feed_dir, exist_ok=True)
    work = tempfile.mkdtemp(prefix="cdc30x_src_")
    src_even_i = _write_one(even.withColumn("_op", F.lit("I")),
                            os.path.join(work, "even_I.parquet"))
    src_odd_i = _write_one(odd.withColumn("_op", F.lit("I")),
                           os.path.join(work, "odd_I.parquet"))
    src_even_d = _write_one(even.withColumn("_op", F.lit("D")),
                            os.path.join(work, "even_D.parquet"))

    plan = [src_even_i, src_odd_i]
    for _ in range(N_CHURN_PAIRS):
        plan += [src_even_i, src_even_d]
    for i, src in enumerate(plan):
        dst = os.path.join(feed_dir, f"batch_{i:03d}.parquet")
        shutil.copyfile(src, dst)
        # file source drains oldest-first: strictly increasing mtimes
        # pin the order so a delete never precedes its insert
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))
    shutil.rmtree(work, ignore_errors=True)
    n_rows = int(li.count() + even.count() * 2 * N_CHURN_PAIRS)
    return len(plan), n_rows


def main() -> None:
    from etl_online_retail_spark.operators import matview
    from etl_online_retail_spark.oracle import (
        compare_frames,
        duckdb_connection,
    )
    from etl_online_retail_spark.session import get_spark
    from etl_online_retail_spark.streaming import ingest

    import __spark_entry__ as entrymod

    spark = get_spark("cdc-stream-30x")
    work = tempfile.mkdtemp(prefix="cdc_30x_")
    feed_dir = os.path.join(work, "feed")
    ckpt_dir = os.path.join(work, "ckpt")
    store = matview.storage_dir_for(SF_DIR)
    shutil.rmtree(store, ignore_errors=True)

    t0 = time.perf_counter()
    n_files, n_feed_rows = build_feed(spark, feed_dir)
    print(f"feed: {n_files} micro-batches, {n_feed_rows} change rows "
          f"(~{n_feed_rows / 600_000:.0f}x the table; "
          f"{time.perf_counter() - t0:.1f}s to build)", flush=True)

    li_schema = spark.read.parquet(
        os.path.join(SF_DIR, "lineitem.parquet")).schema
    feed_schema = li_schema.add("_op", "string")
    # keep every batch's progress record (default retention is 100)
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates",
                   str(n_files + 8))
    stream = (spark.readStream.schema(feed_schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(feed_dir))
    t0 = time.perf_counter()
    q = matview.maintain_incremental(
        stream, SF_DIR, ckpt_dir, table="lineitem", op_col="_op",
        max_partials=4)
    q.awaitTermination()
    t_maintain = time.perf_counter() - t0
    prog = [p for p in q.recentProgress if p["numInputRows"] > 0]
    per_batch = [(int(p["batchId"]),
                  p["durationMs"]["triggerExecution"] / 1000.0,
                  int(p["numInputRows"])) for p in prog]
    print(f"maintained 4 lineitem views over {len(per_batch)} non-empty "
          f"micro-batches in {t_maintain:.1f}s "
          f"({t_maintain / n_files:.2f}s/batch wall incl. autocompactions)",
          flush=True)

    # bucket trigger times by accumulated processed volume
    acc = 0
    buckets: dict[str, list[float]] = {"1x": [], "10x": [], "30x": []}
    for bid, sec, rows in per_batch:
        acc += rows
        x = acc / 600_000
        if x <= 2.0:
            buckets["1x"].append(sec)
        elif 9.0 <= x <= 12.0:
            buckets["10x"].append(sec)
        elif x >= 28.0:
            buckets["30x"].append(sec)
    for label, xs in buckets.items():
        if xs:
            print(f"  per-batch trigger at ~{label} accumulated: "
                  f"min {min(xs):.2f}s / mean {sum(xs) / len(xs):.2f}s / "
                  f"max {max(xs):.2f}s over {len(xs)} batches", flush=True)
    for name in ("ship_day_rollup", "flag_day_rollup",
                 "star_month_rollup", "product_revenue_rollup"):
        tdir = matview.view_table_dir(SF_DIR, name)
        eff = sorted(ingest.effective_partials(tdir))
        print(f"  {name}: effective partials {eff}", flush=True)

    t0 = time.perf_counter()
    matview.publish(spark, SF_DIR)
    print(f"published serving relations in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb_connection(SF_DIR)
    failures = []
    t0 = time.perf_counter()
    for name in SERVED:
        spdf = qs[name](spark, SF_DIR).toPandas()
        dpdf = con.sql(oracles[name]).df()
        r = compare_frames(name, spdf, dpdf)
        print(f"{'PASS' if r.ok else 'FAIL'} {name}: "
              f"rows={r.spark_rows}/{r.duck_rows} "
              f"hash={'ok' if r.hash_ok else 'MISMATCH'}", flush=True)
        if not r.ok:
            failures.append(name)
    print(f"staged gate over {len(SERVED)} served queries in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    shutil.rmtree(work, ignore_errors=True)
    if failures:
        print(f"FAILURES: {failures}")
        sys.exit(1)
    print("all green — 30x accumulated churn nets exactly to the base "
          "table (29 retraction rounds unwound bit-exactly)")


if __name__ == "__main__":
    main()
