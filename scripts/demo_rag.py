"""End-to-end retrieval (RAG) demo: the hybrid-search user story.

documents.parquet + embeddings.parquet -> model-based quality gate
(hashed linear classifier) -> lexical BM25 top-k AND dense cosine top-k
(BLAS-vectorized scale path) -> reciprocal-rank fusion -> map the fused
winners to their retrieval chunks (sliding-window offsets) — the passage
set a generator would consume. Every stage is an operator from this
repo; nothing here is bespoke. Run: python scripts/demo_rag.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_online_retail_spark.catalog import load_table
from etl_online_retail_spark.session import get_spark

QUERY_TERMS = ("hash", "join", "vector")
QUERY_VEC_ID = 0
DEPTH = 50
TOP_N = 10


def run_retrieval(spark, sf_dir: str) -> dict:
    from etl_online_retail_spark.operators.packing import chunk_offsets
    from etl_online_retail_spark.operators.relevance import (
        bm25_scores,
        hashed_linear_score,
        rrf_fuse,
    )
    from etl_online_retail_spark.operators.similarity import (
        brute_force_topk_vectorized,
    )

    docs = load_table(spark, "documents", sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)
    n_raw = docs.count()

    # model-based quality gate before anything is indexed
    gated = (docs.join(hashed_linear_score(docs).select("doc_id", "p_keep"),
                       "doc_id")
             .filter(F.col("p_keep") >= 0.45))
    n_gated = gated.count()

    # lexical arm: BM25 over the gated corpus
    w = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    lex = (bm25_scores(gated, QUERY_TERMS)
           .withColumn("rank", F.row_number().over(w))
           .filter(F.col("rank") <= DEPTH)
           .select("doc_id", "rank"))

    # dense arm: vectorized cosine top-k, corpus restricted to gated docs
    gemb = emb.join(gated.select(F.col("doc_id").alias("vec_id")), "vec_id")
    dense = (brute_force_topk_vectorized(
                gemb, emb.filter(F.col("vec_id") == QUERY_VEC_ID), k=DEPTH)
             .select(F.col("neighbour_id").alias("doc_id"), "rank"))

    fused = (rrf_fuse({"lex": lex, "dense": dense})
             .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
             .limit(TOP_N))

    # passages: each winner's first retrieval chunk
    chunks = chunk_offsets(gated)
    passages = (fused.join(chunks.filter(F.col("chunk_id") == 0), "doc_id")
                .select("doc_id", "rrf_score", "start_tok", "chunk_len"))
    n_passages = passages.count()

    top = fused.collect()
    return {
        "corpus_docs": n_raw,
        "after_quality_gate": n_gated,
        "lexical_hits": lex.count(),
        "dense_hits": dense.count(),
        "fused_top": len(top),
        "passages": n_passages,
        "best_doc": top[0].doc_id if top else None,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("demo-rag")
    report = run_retrieval(spark, sf_dir)
    for k, v in report.items():
        print(f"  {k}: {v}")


if __name__ == "__main__":
    main()
