"""End-to-end pretraining-data export: the LLM-pipeline user story.

documents.parquet -> heavy-hitter boilerplate scan (count-min sketch) ->
curate (quality floor + exact dedup + MinHash near-dup) -> model-based
quality gate (hashed linear classifier) -> per-source token budgets
(two-phase prefix-sum scan) -> deterministic language downsampling
(hash-bucket stratified sample) -> train/val/test split -> pack the train split into fixed-budget sequences -> epoch-keyed
deterministic shuffle -> write sharded JSONL, one directory per split —
the layout a training loader consumes. Every stage is an operator from
this repo; nothing here is bespoke. Run: python scripts/demo_pretrain.py
[sf_dir] [out_dir]
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from etl_online_retail_spark.catalog import load_table
from etl_online_retail_spark.functions.text import token_count
from etl_online_retail_spark.operators.curation import curate_corpus, with_split
from etl_online_retail_spark.operators.packing import (
    pack_sequences,
    packing_summary,
)
from etl_online_retail_spark.session import get_spark
from etl_online_retail_spark.sources.formats import write_jsonl

PACK_BUDGET = 512


def run_export(spark, sf_dir: str, out_dir: str) -> dict:
    from etl_online_retail_spark.functions.text import normalize, tokens
    from etl_online_retail_spark.operators import sampling, sketches

    docs = load_table(spark, "documents", sf_dir)
    n_raw = docs.count()

    # corpus triage: count-min heavy hitters flag boilerplate vocabulary
    # (sublinear state however large the vocab gets)
    terms = (docs.select(F.explode(tokens(normalize("text"))).alias("term"))
             .filter(F.col("term") != ""))
    sketch = sketches.cms_sketch(terms)
    hh = (sketches.cms_estimate(terms.select("term").distinct(), sketch)
          .orderBy(F.desc("n_est"), F.asc("term")).limit(5).collect())

    curated = curate_corpus(docs).select("doc_id", "quality")
    corpus = (docs.join(curated, "doc_id")
              .select("doc_id", "lang", "source", "text", "quality"))
    n_curated = corpus.count()

    # model-based quality gate: the hashed linear classifier scores every
    # survivor; keep docs the (stand-in) model prefers. A trained model
    # drops in by swapping the weight list.
    from etl_online_retail_spark.operators.relevance import (
        hashed_linear_score,
    )

    scores = hashed_linear_score(corpus).select("doc_id", "p_keep")
    corpus = (corpus.join(scores, "doc_id")
              .filter(F.col("p_keep") >= 0.45).drop("p_keep"))
    n_model_gated = corpus.count()

    # per-source token budgets: deterministic mix quotas via the
    # two-phase prefix-sum scan (nested under growing budgets)
    budgeted = sampling.token_budget_mix(
        corpus.withColumn("_tok", token_count("text").cast("bigint")),
        "source", "doc_id", "_tok", {}, default_budget=100_000)
    corpus = budgeted.drop("_tok", "cum_before")
    n_budgeted = corpus.count()

    # deterministic language rebalancing: downweight the dominant language
    # (same rows survive on every run/engine — ablations stay comparable)
    corpus = sampling.stratified_sample(
        corpus, "lang", "doc_id", {"en": 0.7}, default_fraction=1.0)
    n_sampled = corpus.count()

    split = with_split(corpus)  # deterministic hash split
    train = split.filter(F.col("split") == "train")
    # epoch-keyed deterministic shuffle decides shard + order for epoch 0
    train = (sampling.epoch_shuffle(train, "doc_id", epoch=0, n_shards=8)
             .drop("pos"))
    packed = pack_sequences(
        train.select("source", "doc_id", "text",
                     token_count("text").alias("_tok")),
        budget=PACK_BUDGET, tokens_col="_tok")

    stats = {r.source: r for r in packing_summary(packed).collect()}
    for name in ("train", "val", "test"):
        part = split.filter(F.col("split") == name)
        if name == "train":
            part = packed.select("doc_id", "source", "text", "n_tokens",
                                 "start_offset", "first_seq", "last_seq")
        write_jsonl(part, f"{out_dir}/{name}")

    n_train = spark.read.json(f"{out_dir}/train").count()
    n_val = spark.read.json(f"{out_dir}/val").count()
    n_test = spark.read.json(f"{out_dir}/test").count()
    return {
        "raw_docs": n_raw,
        "boilerplate_terms": ", ".join(r.term for r in hh),
        "curated_docs": n_curated,
        "after_model_gate": n_model_gated,
        "after_token_budget": n_budgeted,
        "after_lang_rebalance": n_sampled,
        "train": n_train, "val": n_val, "test": n_test,
        "train_sequences": sum(s.n_sequences for s in stats.values()),
        "train_tokens": sum(s.total_tokens for s in stats.values()),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = (sys.argv[2] if len(sys.argv) > 2
               else tempfile.mkdtemp(prefix="pretrain_export_"))
    spark = get_spark("demo-pretrain")
    report = run_export(spark, sf_dir, out_dir)
    print(f"exported to {out_dir}")
    for k, v in report.items():
        print(f"  {k}: {v:,}" if isinstance(v, int) else f"  {k}: {v}")


if __name__ == "__main__":
    main()
