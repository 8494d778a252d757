"""The dedup-loop demo must run end-to-end and its invariants must hold
(stream hits reconcile with the batch pair set, retention partitions the
corpus, triage counts are sane)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/scripts")


def test_dedup_demo_loop(spark):
    from demo_dedup import run_dedup_loop

    out = run_dedup_loop(spark, "/root/testdata/sf0.001")
    n = out["n_docs"]
    # triage: every rule count in [0, n]; the conjunction never exceeds
    # any single rule; the perplexity thirds cover every scored doc
    pc = out["pass_counts"]
    assert all(0 <= c <= n for c in pc.values())
    assert pc["passes_gopher"] <= min(
        c for r, c in pc.items() if r != "passes_gopher")
    assert 0 < sum(out["ppl"].values()) <= n
    assert set(out["ppl"]) <= {"head", "middle", "tail"}
    # telemetry: rates are probabilities; every source reports
    assert len(out["dup_rates"]) == 20
    assert all(0.0 <= r.near_dup_rate <= 1.0 for r in out["dup_rates"])
    # the live loop's hits reconcile exactly with the batch pair set
    assert sum(out["stream_hits"].values()) == out["cross_batch"]
    assert out["stream_hits"].get(0, 0) == 0  # nothing indexed before b0
    assert out["indexed"] <= n
    # retention partitions the corpus: memberships sum to n, one winner
    # per cluster, winners <= docs
    assert out["members_total"] == n
    assert 0 < out["n_kept"] <= n
    assert out["biggest"].n_members >= 1
    # the incremental probe found something on this fixture
    assert out["inc_hits"]
