"""End-to-end pretraining export pipeline: counts, splits, packing layout."""

from __future__ import annotations

import tempfile

from scripts.demo_pretrain import run_export


def test_export_pipeline_end_to_end(spark):
    with tempfile.TemporaryDirectory() as d:
        r = run_export(spark, "/root/testdata/sf0.001", d)
        # curation and language rebalance only remove docs
        assert 0 < r["curated_docs"] <= r["raw_docs"]
        assert 0 < r["after_lang_rebalance"] <= r["curated_docs"]
        # split partitions the rebalanced corpus exactly
        assert r["train"] + r["val"] + r["test"] == r["after_lang_rebalance"]
        # ~90/5/5 hash split: train dominates
        assert r["train"] > r["val"] and r["train"] > r["test"]
        # the CMS triage surfaced the corpus's dominant vocabulary
        assert len(r["boilerplate_terms"].split(", ")) == 5
        # packing accounting: every sequence holds <= budget NEW tokens,
        # so sequences * budget covers the token total
        assert r["train_sequences"] * 512 >= r["train_tokens"]
        assert r["train_tokens"] > 0
        # the train shard carries the packing columns
        cols = set(spark.read.json(f"{d}/train").columns)
        assert {"doc_id", "n_tokens", "start_offset",
                "first_seq", "last_seq"} <= cols
