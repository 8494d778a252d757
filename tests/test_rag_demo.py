"""End-to-end retrieval demo: the hybrid-search composition holds
together (gate -> lexical arm -> dense arm -> fusion -> passages)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from scripts.demo_rag import TOP_N, run_retrieval

SF = "/root/testdata/sf0.001"


def test_rag_demo_end_to_end(spark):
    r = run_retrieval(spark, SF)
    assert r["corpus_docs"] == 500
    assert 0 < r["after_quality_gate"] <= r["corpus_docs"]
    assert r["lexical_hits"] > 0 and r["dense_hits"] > 0
    assert r["fused_top"] == TOP_N
    # every fused winner maps to exactly one first-chunk passage
    assert r["passages"] == r["fused_top"]
    assert r["best_doc"] is not None
    # deterministic across reruns
    assert run_retrieval(spark, SF)["best_doc"] == r["best_doc"]
