"""Governance / release demo: the loop a data steward runs before a
warehouse extract leaves the building, plus the monitoring that keeps it
honest afterwards.

    k-anonymity audit  ->  l-diversity audit  ->  suppression release
    drift monitor (PSI by source)  ->  attribution read-outs
    (last-touch vs linear on the same events)

Each stage is a first-class operator with an oracle-verified query twin
(k_anonymity_report, l_diversity_report, k_anonymous_release,
source_length_psi, attribution_last_touch, attribution_linear).
Run: python scripts/demo_governance.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from etl_online_retail_spark.catalog import load_table
from etl_online_retail_spark.functions.text import token_count
from etl_online_retail_spark.operators.privacy import (
    k_anonymity_report,
    k_anonymize,
    l_diversity_report,
)
from etl_online_retail_spark.operators.profile import psi_by_group
from etl_online_retail_spark.operators.sessionize import (
    last_touch_attribution,
    linear_attribution_credit,
)
from etl_online_retail_spark.session import get_spark

QI = ["c_nationkey", "c_mktsegment", "bal_band"]
K = 5
L = 3


def run_governance(spark, sf_dir: str) -> dict:
    """The loop as data: returns each stage's result for assertions."""
    customer = (load_table(spark, "customer", sf_dir)
                .withColumn("bal_band",
                            F.floor(F.col("c_acctbal").cast("double")
                                    / 1000.0).cast("bigint"))
                .cache())
    docs = load_table(spark, "documents", sf_dir)
    events = load_table(spark, "events", sf_dir)

    k_rep = k_anonymity_report(customer, QI, k=K)
    n_groups = k_rep.count()
    n_suppressed = k_rep.filter("suppressed").count()
    l_rep = l_diversity_report(customer, ["c_nationkey", "bal_band"],
                               "c_mktsegment", l=L)
    n_homogeneous = l_rep.filter(~F.col("diverse")).count()
    released = k_anonymize(customer, QI, k=K)
    n_in, n_out = customer.count(), released.count()

    bkt = F.least(F.floor(token_count("text").cast("double") / 20),
                  F.lit(9)).cast("bigint")
    psi = (psi_by_group(docs.select("source", bkt.alias("bkt")),
                        "source", "bkt")
           .orderBy(F.col("psi").desc()).collect())

    last = {r.attributed_type: (r.n_conversions, r.total_value)
            for r in (last_touch_attribution(events)
                      .groupBy("attributed_type")
                      .agg(F.count(F.lit(1)).alias("n_conversions"),
                           F.sum(F.col("value").cast("decimal(18,2)"))
                           .cast("double").alias("total_value"))
                      .collect())}
    linear = {r.attributed_type: (r.n_credits, r.credit)
              for r in linear_attribution_credit(events).collect()}

    # right-to-erasure: the pre-flight impact audit over the
    # referential chain, then the destructive pass on the dim itself
    from etl_online_retail_spark.operators.privacy import (
        erase_rows,
        erasure_scope,
    )

    orders = load_table(spark, "orders", sf_dir)
    subjects = (customer.filter(F.col("c_custkey") % 97 == 0)
                .select(F.col("c_custkey").alias("subject_key")))
    scope = {r.table: (r.n_rows, r.n_erased) for r in erasure_scope(
        {"customer": customer, "orders": orders},
        {"customer": "c_custkey", "orders": "o_custkey"},
        subjects).collect()}
    n_after = erase_rows(customer, "c_custkey", subjects).count()

    return {"n_groups": n_groups, "n_suppressed": n_suppressed,
            "n_homogeneous": n_homogeneous, "n_in": n_in, "n_out": n_out,
            "psi": psi, "last": last, "linear": linear,
            "erasure_scope": scope, "n_after_erasure": n_after}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("demo-governance")
    out = run_governance(spark, sf_dir)

    print("\n== privacy audit (customer, QI = nation x segment x "
          "balance band) ==")
    print(f"  {out['n_groups']} QI groups; {out['n_suppressed']} below "
          f"k={K} (suppressed on release)")
    print(f"  {out['n_homogeneous']} groups fail distinct "
          f"l-diversity (l={L}) — homogeneity exposure")
    print(f"  release: {out['n_out']}/{out['n_in']} rows survive "
          f"suppression")

    print("== drift monitor (token-length PSI by source) ==")
    for r in out["psi"][:5]:
        band = ("stable" if r.psi < 0.1
                else "drifting" if r.psi < 0.25 else "SHIFTED")
        print(f"  {r.source:8s} psi={r.psi:.4f}  [{band}]")

    print("== right-to-erasure (subjects: custkey % 97 == 0) ==")
    for tbl, (n_rows, n_erased) in sorted(out["erasure_scope"].items()):
        print(f"  {tbl:8s} {n_erased:5d} of {n_rows:,} rows in scope")
    print(f"  post-erasure customer rows: {out['n_after_erasure']:,}")

    print("== attribution: last-touch vs linear ==")
    for t in sorted(set(out["last"]) | set(out["linear"])):
        lt = out["last"].get(t, (0, 0.0))
        ln = out["linear"].get(t, (0, 0.0))
        print(f"  {t:8s} last-touch {lt[0]:4d} conv / {lt[1]:10.2f}   "
              f"linear {ln[0]:4d} credits / {ln[1]:10.2f}")


if __name__ == "__main__":
    main()
