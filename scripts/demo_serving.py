"""End-to-end serving-layer demo: the aggregate-navigator lifecycle.

The reference serves its Superset dashboard off a warm Postgres warehouse
the ETL refreshes; this demo is the engine-side equivalent at production
shape (round 10): materialized summary views PERSISTED as parquet in the
incremental partial-aggregate layout, maintained under incremental loads,
and served to the dashboard queries through the aggregate navigator —
the fact table is never touched at query time.

    python scripts/demo_serving.py [sf_dir]

Acts:
  1. Initial load  — write_full + publish; dashboard queries rewrite
                     onto the views (plan shown).
  2. Day-2 load    — append_batch maintains every view with work
                     proportional to the BATCH; publish refreshes the
                     serving cache; totals equal a full recompute.
  3. Replayed load — the same batch again: exactly-once by layout.
  4. New session   — publish-from-disk, no rebuild (simulated by
                     dropping every serving relation first).
  5. Cancellations — apply_cdc_batch retracts a returned-lines wave
                     (delete images as weight -1 partials); coverage
                     drops by exactly the retraction.
  6. Time travel   — serve_as_of reconstructs the pre-cancellation
                     version off the `_batch_id` ledger.
  7. Late orders   — apply_star_cdc_join maintains the star rollup via
                     retractable JOIN IVM: lineitems whose order record
                     arrives in a LATER batch still materialize their
                     pairs (the per-batch dim re-join cannot express
                     this), and the maintained view equals the one-shot
                     logical aggregate.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from etl_online_retail_spark import catalog, workload
    from etl_online_retail_spark.operators import matview
    from etl_online_retail_spark.session import get_spark

    spark = get_spark("demo-serving")
    store = tempfile.mkdtemp(prefix="demo_matviews_")
    queries = workload.queries()
    dash = ["total_revenue", "revenue_by_ymd",
            "star_revenue_by_nation_month", "top_products_by_revenue",
            # fed by OTHER source tables: base-planned until act 2b's
            # dimension loads maintain their views
            "customers_by_nation", "smart_key_range"]

    def run_dashboard(tag: str) -> dict[str, float]:
        out = {}
        for name in dash:
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            out[name] = time.perf_counter() - t0
        print(f"== dashboard ({tag}) ==")
        for name, sec in out.items():
            plan = (queries[name](spark, sf_dir)
                    ._jdf.queryExecution().executedPlan().toString())
            served = "view-served" if "InMemoryTableScan" in plan \
                else "base plan"
            print(f"  {name:32s} {sec*1000:7.1f} ms  [{served}]")
        return out

    try:
        # -- Act 1: initial load ------------------------------------
        li = catalog.load_table(spark, "lineitem", sf_dir)
        day1 = li.filter(F.pmod(F.col("l_orderkey"), F.lit(2)) == 0)
        day2 = li.filter(F.pmod(F.col("l_orderkey"), F.lit(2)) == 1)

        print("== act 1: initial load (write_full + publish) ==")
        t0 = time.perf_counter()
        # production would write_full from the landed fact; the demo's
        # "day 1" is half the orders, loaded through the SAME batch path
        for name in matview.MATVIEW_INPUTS:
            tdir = matview.view_table_dir(sf_dir, name, store)
            shutil.rmtree(tdir, ignore_errors=True)
        matview.append_batch(spark, sf_dir, day1, 0, storage_dir=store)
        matview.publish(spark, sf_dir, storage_dir=store)
        n_views = sum(1 for m in matview.MATVIEW_META.values()
                      if m["source"] == "lineitem")
        print(f"  {n_views} lineitem-fed views written + published in "
              f"{time.perf_counter()-t0:.2f}s (storage: {store})")
        run_dashboard("after day-1 load")
        mv = matview.serve(spark, sf_dir, "ship_day_rollup")
        day1_total = mv.agg(F.sum("n_rows")).collect()[0][0]
        print(f"  view row-coverage: {day1_total} fact rows")

        # -- Act 2: day-2 incremental load ---------------------------
        print("== act 2: day-2 incremental load (append_batch) ==")
        t0 = time.perf_counter()
        matview.append_batch(spark, sf_dir, day2, 1, storage_dir=store)
        matview.publish(spark, sf_dir, storage_dir=store)
        print(f"  maintained + republished in {time.perf_counter()-t0:.2f}s "
              f"(work proportional to the batch)")
        mv = matview.serve(spark, sf_dir, "ship_day_rollup")
        total = mv.agg(F.sum("n_rows")).collect()[0][0]
        want = li.count()
        print(f"  coverage now {total} rows == full fact {want}: "
              f"{'OK' if total == want else 'MISMATCH'}")

        # -- Act 2b: dimension loads (source-aware maintenance) ------
        print("== act 2b: customer + orders loads (other sources) ==")
        t0 = time.perf_counter()
        matview.append_batch(
            spark, sf_dir, catalog.load_table(spark, "customer", sf_dir),
            0, storage_dir=store, table="customer")
        matview.append_batch(
            spark, sf_dir, catalog.load_table(spark, "orders", sf_dir),
            0, storage_dir=store, table="orders")
        matview.publish(spark, sf_dir, storage_dir=store)
        print(f"  dim/day views maintained + republished in "
              f"{time.perf_counter()-t0:.2f}s — their queries flip from "
              f"base plans to view-served")
        run_dashboard("after dimension loads")

        # -- Act 3: replayed load ------------------------------------
        print("== act 3: day-2 load REPLAYED (exactly-once) ==")
        matview.append_batch(spark, sf_dir, day2, 1, storage_dir=store)
        matview.publish(spark, sf_dir, storage_dir=store)
        mv = matview.serve(spark, sf_dir, "ship_day_rollup")
        total = mv.agg(F.sum("n_rows")).collect()[0][0]
        print(f"  coverage after replay still {total}: "
              f"{'OK' if total == want else 'DOUBLE-COUNTED'}")

        # -- Act 4: a fresh session serves from disk -----------------
        print("== act 4: new session (publish-from-disk, no rebuild) ==")
        spark.conf.unset(matview.MATVIEW_DIR_CONF)
        for name in matview.MATVIEW_INPUTS:
            view = f"{matview.MATVIEW_PREFIX}_{name}"
            spark.table(view).unpersist()
            spark.catalog.dropTempView(view)
        t0 = time.perf_counter()
        matview.publish(spark, sf_dir, storage_dir=store)
        print(f"  republished from written tables in "
              f"{time.perf_counter()-t0:.2f}s")
        run_dashboard("fresh session")

        # the navigator's correctness contract, demonstrated live
        spark.conf.unset(matview.MATVIEW_DIR_CONF)
        base = queries["total_revenue"](spark, sf_dir).collect()
        matview.publish(spark, sf_dir, storage_dir=store)
        served = queries["total_revenue"](spark, sf_dir).collect()
        print(f"== served == base: "
              f"{'OK' if served == base else 'MISMATCH'} "
              f"(total_revenue {served[0].total_revenue:,.2f}, "
              f"{served[0].n_rows} rows)")

        # -- Act 5: cancellation wave (CDC retraction) ----------------
        # NOTE: the demo's fact parquet is immutable testdata, so from
        # here the views deliberately diverge from it (production
        # applies the same delete feed to the fact table); the checks
        # below are against the CDC arithmetic, not the frozen fact
        # the reference's source data carries 'C'-prefixed cancellation
        # invoices; the warehouse analogue is a retraction batch —
        # delete images ride the same partial layout with weight -1
        print("== act 5: cancellation wave (apply_cdc_batch) ==")
        cancel = li.filter(F.col("l_returnflag") == "R")
        n_cancel = cancel.count()
        t0 = time.perf_counter()
        matview.apply_cdc_batch(spark, sf_dir, 2, deletes=cancel,
                                storage_dir=store)
        matview.publish(spark, sf_dir, storage_dir=store)
        print(f"  {n_cancel} returned lines retracted + republished in "
              f"{time.perf_counter()-t0:.2f}s (work proportional to the "
              f"retraction batch)")
        mv = matview.serve(spark, sf_dir, "ship_day_rollup")
        total = mv.agg(F.sum("n_rows")).collect()[0][0]
        print(f"  coverage now {total} rows == fact minus returns "
              f"{want - n_cancel}: "
              f"{'OK' if total == want - n_cancel else 'MISMATCH'}")

        # -- Act 6: time travel (VERSION AS OF the ledger) ------------
        print("== act 6: serve_as_of (pre-cancellation snapshot) ==")
        asof = matview.serve_as_of(spark, sf_dir, "ship_day_rollup", 1,
                                   storage_dir=store)
        pre = asof.agg(F.sum("n_rows")).collect()[0][0]
        print(f"  version as of batch 1 covers {pre} rows == full fact "
              f"{want}: {'OK' if pre == want else 'MISMATCH'}")

        # -- Act 7: late-arriving orders (retractable join IVM) -------
        print("== act 7: late-arriving orders (apply_star_cdc_join) ==")
        store2 = tempfile.mkdtemp(prefix="demo_star_ivm_")
        try:
            o = catalog.load_table(spark, "orders", sf_dir)
            late = F.col("o_orderkey") % 5 == 0
            o_early, o_late = o.filter(~late), o.filter(late)
            t0 = time.perf_counter()
            # batch 0: ALL lineitems land, but a fifth of the order
            # records are still in flight — their pairs cannot exist yet
            matview.apply_star_cdc_join(
                spark, sf_dir, 0, li.limit(0), o.limit(0),
                li_ins=li, o_ins=o_early, storage_dir=store2)
            # batch 1: the late orders arrive as an ORDERS-side delta —
            # their pairs materialize from the accumulated lineitem
            # history (A_old ⋈ ΔB), no lineitem re-feed
            matview.apply_star_cdc_join(
                spark, sf_dir, 1, li, o_early,
                o_ins=o_late, storage_dir=store2)
            tdir = matview.view_table_dir(sf_dir, "star_month_rollup",
                                          store2)
            served_rows = sorted(
                (r.nationkey, str(r.month_start), r.revenue) for r in
                matview._serving_relation(
                    spark, tdir, "star_month_rollup").collect())
            logical = sorted(
                (r.nationkey, str(r.month_start), r.revenue) for r in
                matview.MATVIEWS["star_month_rollup"](
                    spark, sf_dir).collect())
            print(f"  2 join-IVM batches in {time.perf_counter()-t0:.2f}s; "
                  f"maintained star == one-shot logical aggregate: "
                  f"{'OK' if served_rows == logical else 'MISMATCH'} "
                  f"({len(served_rows)} grains)")
        finally:
            shutil.rmtree(store2, ignore_errors=True)
    finally:
        spark.conf.unset(matview.MATVIEW_DIR_CONF)
        shutil.rmtree(store, ignore_errors=True)


if __name__ == "__main__":
    main()
