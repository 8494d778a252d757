"""Recorded sf0.1 streaming change-feed session (VERDICT r10 item 7).

Drives the FULL CDC maintenance pipeline end-to-end at bench scale:
a mixed insert/delete change feed over the whole sf0.1 lineitem table,
streamed file-by-file through maintain_incremental(op_col=...), with
autocompaction firing mid-stream — then publishes the maintained views
and hash-checks every SERVED lineitem-family query against DuckDB.

The feed is constructed so the NET state equals the sf0.1 lineitem
table exactly: the full table arrives as insert batches, an extra
"cancellation" slice is inserted twice (duplicate copies, the
reference's 'C'-prefix invoices), and delete images later retract
exactly those copies. The staged-gate comparison against DuckDB (which
reads the original parquet) is therefore a true verification that
retractions unwound precisely — not a smoke test.

Usage: python scripts/cdc_stream_sf01.py   (run alone: wall-clock)
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

# queries whose plans serve off the lineitem-fed views when staged
SERVED = [
    "total_revenue", "revenue_by_ymd", "revenue_rollup",
    "star_revenue_by_nation_month", "top_products_by_revenue",
    "pricing_summary", "revenue_cube", "revenue_grouping_sets",
    "revenue_pivot_by_flag", "revenue_rollup_gid",
    "revenue_share_by_nation", "chart_monthly_revenue",
]


def build_feed(spark, feed_dir: str) -> tuple[int, int]:
    """Write the change feed as ordered single-file batches: 6 insert
    slices covering lineitem exactly, one duplicate-copies slice, then
    2 delete batches retracting exactly those copies."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    copies = li.filter(F.col("l_orderkey") % 97 == 0)
    batches = [li.filter(F.col("l_orderkey") % 6 == i).withColumn(
        "_op", F.lit("I")) for i in range(6)]
    batches.append(copies.withColumn("_op", F.lit("I")))
    batches.append(copies.filter(F.col("l_orderkey") % 2 == 0)
                   .withColumn("_op", F.lit("D")))
    batches.append(copies.filter(F.col("l_orderkey") % 2 == 1)
                   .withColumn("_op", F.lit("D")))

    os.makedirs(feed_dir, exist_ok=True)
    total = 0
    for i, b in enumerate(batches):
        stage = tempfile.mkdtemp()
        b.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = os.path.join(feed_dir, f"batch_{i:02d}.parquet")
        shutil.move(part, dst)
        # file source drains oldest-first: pin a strictly increasing
        # mtime so deletes can never be processed before their inserts
        os.utime(dst, (1_000_000 + i, 1_000_000 + i))
        shutil.rmtree(stage, ignore_errors=True)
        total += 1
    n_rows = int(li.count() + copies.count() * 2)
    return total, n_rows


def main() -> None:
    from etl_online_retail_spark.operators import matview
    from etl_online_retail_spark.oracle import (
        compare_frames,
        duckdb_connection,
    )
    from etl_online_retail_spark.session import get_spark
    from etl_online_retail_spark.streaming import ingest

    import __spark_entry__ as entrymod

    spark = get_spark("cdc-stream-sf01")
    work = tempfile.mkdtemp(prefix="cdc_sf01_")
    feed_dir = os.path.join(work, "feed")
    ckpt_dir = os.path.join(work, "ckpt")
    store = matview.storage_dir_for(SF_DIR)
    shutil.rmtree(store, ignore_errors=True)

    t0 = time.perf_counter()
    n_files, n_feed_rows = build_feed(spark, feed_dir)
    t_feed = time.perf_counter() - t0
    print(f"feed: {n_files} files, {n_feed_rows} change rows "
          f"({t_feed:.1f}s to build)")

    li_schema = spark.read.parquet(
        os.path.join(SF_DIR, "lineitem.parquet")).schema
    feed_schema = li_schema.add("_op", "string")
    stream = (spark.readStream.schema(feed_schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(feed_dir))
    t0 = time.perf_counter()
    q = matview.maintain_incremental(
        stream, SF_DIR, ckpt_dir, table="lineitem", op_col="_op",
        max_partials=4)
    q.awaitTermination()
    t_maintain = time.perf_counter() - t0
    print(f"maintained 4 lineitem views over {n_files} micro-batches in "
          f"{t_maintain:.1f}s ({t_maintain / n_files:.2f}s/batch incl. "
          f"autocompactions)")
    for name in ("ship_day_rollup", "flag_day_rollup",
                 "star_month_rollup", "product_revenue_rollup"):
        tdir = matview.view_table_dir(SF_DIR, name)
        eff = sorted(ingest.effective_partials(tdir))
        print(f"  {name}: effective partials {eff} "
              f"(compact coverage id {eff[0] if eff else None})")

    t0 = time.perf_counter()
    matview.publish(spark, SF_DIR)
    t_pub = time.perf_counter() - t0
    print(f"published serving relations in {t_pub:.1f}s")

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
              f"hash={'ok' if r.hash_ok else 'MISMATCH'}")
        if not r.ok:
            failures.append(name)
    t_gate = time.perf_counter() - t0
    print(f"staged gate over {len(SERVED)} served queries in "
          f"{t_gate:.1f}s")
    shutil.rmtree(work, ignore_errors=True)
    if failures:
        print(f"FAILURES: {failures}")
        sys.exit(1)
    print("all green — CDC stream state hash-matches DuckDB on the "
          "original table (retractions unwound exactly)")


if __name__ == "__main__":
    main()
