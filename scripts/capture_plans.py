"""Capture .explain("formatted") for named queries into plans/<round>/.

Usage: python scripts/capture_plans.py <tag-suffix> q1 q2 ...
Writes plans/$SPARK_GRAFT_ROUND/<query>_<tag-suffix>.txt (round defaults
to r15; e.g. tag-suffix = before/after). r14 ADVICE: the directory used
to be hardcoded to plans/r14, silently mixing rounds.

Runs against the sf0.01 testdata by default ($SPARK_GRAFT_SF_DIR to
override) — plan SHAPE (Exchange count, join strategy, PushedFilters)
is what the files witness, and it is SF-independent for these queries.
Iterative queries execute their driver loop at plan-construction time;
the captured plan is the final served relation plus a header noting the
loop ran (the loop's per-round plan shape is documented in
OPTIMIZATION_r14.md instead).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from etl_online_retail_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("capture-plans")
    qs = entrymod.queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans",
        os.environ.get("SPARK_GRAFT_ROUND", "r15"))
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        build = qs.get(name)
        if build is None:
            print(f"skip {name}: not registered", file=sys.stderr)
            continue
        df = build(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"== {name} ({tag}) — explain('formatted') at "
                    f"{os.path.basename(sf_dir)} ==\n\n")
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
