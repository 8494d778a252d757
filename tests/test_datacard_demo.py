"""Data-card demo: sections populated and internally consistent."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/scripts")

from demo_datacard import build_card


def test_data_card_sections_consistent(spark):
    card = build_card(spark, "/root/testdata/sf0.001")
    assert card["n_docs"] == 500
    comp = card["composition"]
    assert sum(n for n, _ in comp.values()) == card["n_docs"]
    assert sum(card["languages"].values()) == card["n_docs"]
    assert card["exact_duplicate_rows"] >= 0
    tl = card["token_lengths"]
    assert tl["min"] <= tl["p50"] <= tl["p90"] <= tl["max"]
    mix = card["proposed_mix"]
    # p_temp values are rounded to 4dp for the card, so the sum carries
    # up to 5e-5 rounding error PER SOURCE (exact only for a perfectly
    # uniform corpus) — tolerance scales with source count
    assert abs(sum(m["p_temp"] for m in mix.values()) - 1.0) \
        <= len(mix) * 5e-5
    assert set(mix) == set(comp)
