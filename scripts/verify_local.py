"""Local stand-in for the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() twin on DuckDB at
the given scale factor and prints per-query PASS/FAIL (row count, schema,
order-insensitive value hash) with a diff sample on mismatch.

Both sides are canonicalized through PANDAS (spark `toPandas()`, duckdb
`.df()`) — the same conversions the driver's gate applies — so
HUGEINT/DECIMAL→float64 and DATE→Timestamp parity hazards fail here
instead of only in the driver's CORRECTNESS file (round-1 lesson: the
fetchall path silently re-integered HUGEINTs and masked 4 red rows).

Usage: python scripts/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from etl_online_retail_spark import workload_ext
    from etl_online_retail_spark.oracle import compare_frames, duckdb_connection
    from etl_online_retail_spark.session import get_spark

    spark = get_spark("verify-local")
    con = duckdb_connection(sf_dir)

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # Localize shingle oracles onto shared temp tables (one per-character
    # hash-fold evaluation instead of seven; ROADMAP 2). The driver runs
    # the portable strings — this accelerates only the local gate.
    selected = [n for n in qs if not only or n in only]
    localized = {n: workload_ext.localize_oracle(oracles[n])
                 for n in selected if n in oracles}
    if any(localized[n] != oracles[n] for n in localized):
        t0 = time.time()
        workload_ext.materialize_oracle_tables(con)
        print(f"materialized shared shingle tables in {time.time()-t0:.1f}s")
    oracles = {**oracles, **localized}
    failures = []
    for name, build in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = build(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(spdf)} rows in {time.time()-t0:.1f}s")
            continue
        try:
            dpdf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            failures.append(name)
            continue
        r = compare_frames(name, spdf, dpdf)
        status = "PASS" if r.ok else "FAIL"
        scols, dcols = list(spdf.columns), list(dpdf.columns)
        print(f"{status} {name}: rows={r.spark_rows}/{r.duck_rows} "
              f"schema={'ok' if r.schema_ok else f'{sorted(scols)} vs {sorted(dcols)}'} "
              f"hash={'ok' if r.hash_ok else 'MISMATCH'} ({time.time()-t0:.1f}s)")
        if not r.ok:
            failures.append(name)
            if r.spark_only or r.duck_only:
                print(f"    spark-only: {r.spark_only}")
                print(f"    duck-only:  {r.duck_only}")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all green")


if __name__ == "__main__":
    main()
