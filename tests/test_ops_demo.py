"""demo_ops smoke: the profile -> suggest -> skew -> timeseries loop
produces sane values on the small SF."""

from __future__ import annotations

from scripts.demo_ops import run_ops

SF = "/root/testdata/sf0.001"


def test_ops_demo_loop(spark):
    out = run_ops(spark, SF)
    cols = {r.col_name for r in out["profile"]}
    assert cols == {"o_orderkey", "o_custkey", "o_orderstatus",
                    "o_totalprice", "o_orderdate", "o_orderpriority"}
    rules = {(r.col_name, r.rule) for r in out["suggestions"]}
    assert ("o_orderkey", "unique") in rules
    assert ("o_orderstatus", "fixed_width") in rules
    s = out["skew"]
    assert s.n_keys > 0 and 0.0 <= s.gini < 1.0
    assert 0.0 <= out["gap_share"] <= 1.0
    assert out["longest_streak"] >= 1
