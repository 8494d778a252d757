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
       python scripts/verify_local.py [sf_dir] --changed-since <git-ref>
       python scripts/verify_local.py [sf_dir] --staged [query ...]

--changed-since maps the files touched since <git-ref> (committed, staged,
unstaged, and untracked) to the registered queries they can affect and
gates only those — the fast pre-commit loop as the registry grows. The
map is derived, not maintained: each query's defining module is known
from the registry, and a static import scan of the package gives the
transitive file->module closure, so a touched operator file selects every
query whose workload module (transitively) imports it. Conservative by
construction: shared infrastructure (catalog/session/oracle/entry) selects
everything; tests/docs/scripts select nothing.

--staged materializes the aggregate-navigator views for sf_dir before
running (operators/matview.py), so the queries that rewrite onto summary
relations run their SERVED plans — hash-checked directly against DuckDB
instead of only equality-pinned against the base plans in pytest. The
driver's own gate never stages views, so this mode is the local
complement: run it once per round (PERFORMANCE.md records the result).
"""

from __future__ import annotations

import sys
import time

PKG = "etl_online_retail_spark"
REPO = "/root/repo"


def _import_graph() -> dict[str, set[str]]:
    """modname -> package modules it imports (top-level AND inside defs)."""
    import ast
    import os

    graph: dict[str, set[str]] = {}
    for root, _, files in os.walk(os.path.join(REPO, PKG)):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            mod = os.path.relpath(path, REPO)[:-3].replace(os.sep, ".")
            if mod.endswith(".__init__"):
                mod = mod[: -len(".__init__")]
            imps: set[str] = set()
            with open(path) as fh:
                tree = ast.parse(fh.read())
            for node in ast.walk(tree):
                if isinstance(node, ast.Import):
                    imps.update(a.name for a in node.names
                                if a.name.startswith(PKG))
                elif isinstance(node, ast.ImportFrom):
                    if node.module and node.module.startswith(PKG):
                        imps.add(node.module)
                        # `from pkg.operators import dedup`: the imported
                        # names may themselves be submodules
                        imps.update(f"{node.module}.{a.name}"
                                    for a in node.names)
            graph[mod] = imps
    return graph


def _closure(mod: str, graph: dict[str, set[str]]) -> set[str]:
    """Transitive imports of `mod`, WITHOUT expanding through sibling
    workload modules: every workload module imports workload.py for
    register()/_t(), so naive transitivity would make any operator file
    select the whole registry. A sibling workload module is still ADDED
    (a change to workload.py's shared fragments affects its importers) —
    its own imports just don't leak into this module's closure."""
    seen: set[str] = set()
    stack = [mod]
    while stack:
        m = stack.pop()
        if m in seen or m not in graph:
            continue
        seen.add(m)
        if m != mod and m.rsplit(".", 1)[-1].startswith("workload"):
            continue
        stack.extend(graph[m])
    return seen


def _changed_files(ref: str) -> list[str]:
    import subprocess

    def git(*args: str) -> list[str]:
        out = subprocess.run(["git", *args], cwd=REPO, check=True,
                             capture_output=True, text=True).stdout
        return [line for line in out.splitlines() if line]

    return sorted(set(git("diff", "--name-only", ref)
                      + git("ls-files", "--others", "--exclude-standard")))


def queries_for_changes(ref: str, qs: dict) -> set[str] | None:
    """Query names affected by changes since `ref`; None = run everything
    (shared infrastructure touched)."""
    changed_mods: set[str] = set()
    for path in _changed_files(ref):
        if path.startswith(f"{PKG}/") and path.endswith(".py"):
            mod = path[:-3].replace("/", ".")
            if mod.endswith(".__init__"):
                mod = mod[: -len(".__init__")]
            changed_mods.add(mod)
        elif path == "__spark_entry__.py":
            return None
        # tests/, scripts/, docs, bench.py: no effect on query semantics
    if not changed_mods:
        return set()
    graph = _import_graph()
    # shared infrastructure modules feed every query via catalog/session
    infra = {f"{PKG}.catalog", f"{PKG}.session", f"{PKG}.oracle", PKG}
    if changed_mods & infra:
        return None
    selected = set()
    for name, build in qs.items():
        if changed_mods & _closure(build.__module__, graph):
            selected.add(name)
    return selected


def main():
    args = sys.argv[1:]
    since = None
    if "--changed-since" in args:
        i = args.index("--changed-since")
        since = args[i + 1]
        args = args[:i] + args[i + 2:]
    staged = "--staged" in args
    if staged:
        args.remove("--staged")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from etl_online_retail_spark import workload_ext
    from etl_online_retail_spark.oracle import compare_frames, duckdb_connection
    from etl_online_retail_spark.session import get_spark

    qs = entrymod.queries()
    if since is not None:
        affected = queries_for_changes(since, qs)
        if affected is None:
            print(f"changed-since {since}: shared infrastructure touched "
                  f"-> full registry")
        else:
            extra = len(only - affected)
            only |= affected
            note = f" + {extra} explicit" if extra else ""
            print(f"changed-since {since}: {len(affected)} affected "
                  f"queries{note}")
            if not only:
                print("no registered queries affected\nall green")
                return

    spark = get_spark("verify-local")
    if staged:
        from etl_online_retail_spark.operators import matview

        t0 = time.time()
        matview.materialize(spark, sf_dir)
        print(f"STAGED MODE: matviews materialized for {sf_dir} in "
              f"{time.time()-t0:.1f}s — navigator-served plans active")
    con = duckdb_connection(sf_dir)

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
