"""Data card: the datasheet a training-data pipeline publishes with a
corpus release ("Datasheets for Datasets" / model-card practice) —
composition, quality, duplication, and the proposed training mix, every
number produced by the engine's own registered (oracle-verified)
operators rather than ad-hoc scripts.

Run: python scripts/demo_datacard.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from etl_online_retail_spark.catalog import load_table
from etl_online_retail_spark.functions.text import token_count
from etl_online_retail_spark.operators.dedup import exact_duplicates
from etl_online_retail_spark.operators.sampling import temperature_rates
from etl_online_retail_spark.session import get_spark


def build_card(spark, sf_dir: str) -> dict:
    """All card sections as plain dicts (testable; the CLI prints them)."""
    docs = load_table(spark, "documents", sf_dir).cache()
    n_docs = docs.count()

    comp = {r.source: (r.n, r.toks) for r in
            (docs.groupBy("source")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(token_count("text")).cast("bigint").alias("toks"))
             .collect())}
    langs = {r.lang: r.n for r in
             docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
             .collect()}

    # duplication: exact groups via the registered operator — each
    # group of n_copies contributes n_copies - 1 removable rows
    dup_rows = (exact_duplicates(docs)
                .filter(F.col("n_copies") > 1)
                .agg(F.coalesce(F.sum(F.col("n_copies") - 1), F.lit(0))
                     .alias("extra"))
                .collect())
    n_exact_dups = int(dup_rows[0].extra)

    # proposed training mix (temperature alpha=0.5 over sources)
    mix = {r.source: {"n_total": r.n_total,
                      "p_temp": round(r.p_temp, 4),
                      "cutoff": r.cutoff}
           for r in temperature_rates(docs.select("doc_id", "source"),
                                      "source", n_docs // 2).collect()}

    lengths = (docs.select(token_count("text").alias("t"))
               .agg(F.min("t").alias("mn"),
                    F.expr("percentile(t, 0.5)").alias("p50"),
                    F.expr("percentile(t, 0.9)").alias("p90"),
                    F.max("t").alias("mx")).collect()[0])

    docs.unpersist()
    return {
        "n_docs": n_docs,
        "composition": comp,
        "languages": langs,
        "exact_duplicate_rows": n_exact_dups,
        "token_lengths": {"min": lengths.mn, "p50": lengths.p50,
                          "p90": lengths.p90, "max": lengths.mx},
        "proposed_mix": mix,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("demo-datacard")
    card = build_card(spark, sf_dir)
    print(f"\n=== DATA CARD — {sf_dir} ===")
    print(f"documents: {card['n_docs']:,}")
    print("\n-- composition (source: docs, tokens) --")
    for s, (n, t) in sorted(card["composition"].items()):
        print(f"  {s}: {n:,} docs, {t:,} tokens")
    print("\n-- languages --")
    for lang, n in sorted(card["languages"].items()):
        print(f"  {lang}: {n:,}")
    print(f"\n-- duplication --\n  exact duplicate rows: "
          f"{card['exact_duplicate_rows']:,}")
    tl = card["token_lengths"]
    print(f"\n-- token lengths --\n  min {tl['min']}  p50 {tl['p50']}  "
          f"p90 {tl['p90']}  max {tl['max']}")
    print("\n-- proposed training mix (alpha=0.5) --")
    for s, m in sorted(card["proposed_mix"].items()):
        print(f"  {s}: share {m['p_temp']:.1%} of sample "
              f"(corpus {m['n_total']:,} docs)")


if __name__ == "__main__":
    main()
