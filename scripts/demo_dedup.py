"""Dedup-loop demo: the curation cycle a training-data pipeline runs on
every incoming crawl slice, end to end.

    quality triage (Gopher rule battery -> CCNet perplexity thirds)
    duplication telemetry (dup rate + n-gram diversity per source)
    incremental probe (today's slice vs the retained corpus's band index)
    the same loop LIVE (streaming micro-batches maintaining the index)
    retention (keep the best-quality member of each near-dup cluster)

Each stage is a first-class operator with an oracle-verified query twin
(gopher_quality_flags, perplexity_buckets, dup_rate_by_source,
ngram_diversity_by_source, incremental_near_dups, dedup_retention).
Run: python scripts/demo_dedup.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from etl_online_retail_spark.catalog import load_table
from etl_online_retail_spark.operators.curation import (
    cluster_representatives,
    gopher_quality_flags,
)
from etl_online_retail_spark.operators.dedup import (
    incremental_near_duplicates,
    minhash_near_duplicates,
)
from etl_online_retail_spark.session import get_spark
from etl_online_retail_spark.streaming.ingest import incremental_minhash_dedup
from etl_online_retail_spark.workload import queries
from etl_online_retail_spark.workload_ext import GOPHER_MIN_STOPWORDS_Q


def run_dedup_loop(spark, sf_dir: str) -> dict:
    """The loop as data: returns each stage's result for assertions."""
    docs = load_table(spark, "documents", sf_dir).cache()
    n_docs = docs.count()

    # 1. quality triage
    flags = gopher_quality_flags(docs,
                                 min_stopwords=GOPHER_MIN_STOPWORDS_Q).cache()
    rule_cols = ["word_count_ok", "mean_word_len_ok", "symbol_ratio_ok",
                 "alpha_ratio_ok", "stopword_ok", "passes_gopher"]
    pass_counts = flags.agg(
        *[F.sum(F.col(c).cast("int")).alias(c) for c in rule_cols]).first()
    ppl = {(r.source, r.ppl_bucket): 1 for r in []}  # filled below
    ppl_rows = (queries()["perplexity_buckets"](spark, sf_dir)
                .groupBy("ppl_bucket")
                .agg(F.count(F.lit(1)).alias("n")).collect())
    ppl = {r.ppl_bucket: r.n for r in ppl_rows}

    # 2. duplication telemetry
    dup_rates = (queries()["dup_rate_by_source"](spark, sf_dir)
                 .orderBy(F.desc("near_dup_rate"), "source").collect())
    diversity = (queries()["ngram_diversity_by_source"](spark, sf_dir)
                 .orderBy("distinct_2").collect())

    # 3. incremental probe: 90% retained corpus, 10% "today's slice"
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    new_batch = docs.filter(F.col("doc_id") % 10 == 0)
    inc_hits = incremental_near_duplicates(corpus, new_batch).collect()

    # 4. the same loop live: three micro-batches build + probe the index
    with tempfile.TemporaryDirectory() as d:
        src, index_dir, dups_dir, ckpt = (f"{d}/src", f"{d}/index",
                                          f"{d}/dups", f"{d}/ckpt")
        for part in range(3):
            (docs.filter(F.col("doc_id") % 3 == part)
             .coalesce(1).write.parquet(f"{src}/p{part}"))
        stream = (spark.readStream.schema(docs.schema)
                  .option("maxFilesPerTrigger", 1).parquet(f"{src}/p*"))
        q = incremental_minhash_dedup(stream, index_dir, dups_dir, ckpt)
        q.awaitTermination()
        stream_hits = {r._batch_id: r.n for r in
                       (spark.read.parquet(dups_dir)
                        .groupBy("_batch_id")
                        .agg(F.count(F.lit(1)).alias("n")).collect())}
        indexed = spark.read.parquet(index_dir).count()

    # cross-check: the live loop's total must equal the batch pair set's
    # cross-batch subset (batch membership = doc_id % 3)
    cross_batch = (minhash_near_duplicates(docs)
                   .filter(F.pmod(F.col("id_a"), F.lit(3))
                           != F.pmod(F.col("id_b"), F.lit(3)))
                   .count())

    # 5. retention: one best-quality representative per near-dup cluster
    reps = cluster_representatives(docs).cache()
    n_kept = reps.count()
    biggest = (reps.orderBy(F.desc("n_members"), "cluster_id").first())

    return {"n_docs": n_docs,
            "pass_counts": {c: pass_counts[c] for c in rule_cols},
            "ppl": ppl, "dup_rates": dup_rates, "diversity": diversity,
            "inc_hits": inc_hits, "stream_hits": stream_hits,
            "indexed": indexed, "cross_batch": cross_batch,
            "n_kept": n_kept, "biggest": biggest,
            "members_total": reps.agg(F.sum("n_members")).first()[0]}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("demo-dedup")
    out = run_dedup_loop(spark, sf_dir)
    n = out["n_docs"]

    print(f"\n== quality triage ({n} docs) ==")
    for rule, cnt in out["pass_counts"].items():
        print(f"  {rule:18s} {cnt:5d}/{n} pass")
    print("  perplexity thirds:",
          "  ".join(f"{b}={out['ppl'].get(b, 0)}"
                    for b in ("head", "middle", "tail")))

    print("== duplication telemetry (worst sources) ==")
    for r in out["dup_rates"][:5]:
        print(f"  {r.source:8s} near-dup {r.near_dup_rate:6.2%}  "
              f"exact {r.exact_dup_rate:6.2%}  ({r.n_docs} docs)")
    low = out["diversity"][0]
    print(f"  least diverse source: {low.source} "
          f"(distinct-2 = {low.distinct_2:.3f})")

    print("== incremental probe (today's slice vs retained corpus) ==")
    print(f"  {len(out['inc_hits'])} verified near-dup hits; "
          f"sample: {[(h.new_id, h.corpus_id) for h in out['inc_hits'][:3]]}")

    print("== live loop (3 micro-batches) ==")
    for b in sorted(out["stream_hits"]):
        print(f"  batch {b}: {out['stream_hits'][b]} hits vs earlier index")
    print(f"  index now holds {out['indexed']} banded signatures; "
          f"stream total {sum(out['stream_hits'].values())} "
          f"== batch cross-batch pairs {out['cross_batch']}")

    print("== retention (best-quality representative per cluster) ==")
    b = out["biggest"]
    print(f"  kept {out['n_kept']}/{n} docs; largest cluster "
          f"{b.cluster_id} kept doc {b.doc_id} "
          f"(quality {b.quality:.3f}) of {b.n_members} members")


if __name__ == "__main__":
    main()
