"""The alignment-data demo's loop must run end-to-end and its
invariants must hold (funnel accounts for every prompt, the BT
leaderboard is internally consistent, agreement stats are bounded)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/scripts")


def test_align_demo_loop(spark):
    from demo_align import run_align

    out = run_align(spark, "/root/testdata/sf0.001")

    # funnel: every synthesized pair lands in exactly one reason bucket
    assert sum(out["funnel"].values()) == out["n_prompts"] > 0
    # margin audit covers every source, and validity never exceeds count
    assert all(m.n_valid <= m.n_pairs for m in out["margins"])

    # leaderboard: every model has a record, records are symmetric
    # (total wins == total losses, win_rate averages to 1/2 over a
    # closed roster), and BT scores are positive
    board = out["board"]
    recs = out["records"]
    assert {x.model for x in board} == set(recs)
    assert sum(r.wins for r in recs.values()) == \
        sum(r.losses for r in recs.values())
    assert all(x.bt_fp >= 1 for x in board)
    assert board == sorted(board, key=lambda x: -x.bt_fp)

    # agreement: kappa bounded by 1, Fleiss po/pe are probabilities
    assert all(k.kappa is None or k.kappa <= 1.0 for k in out["kappa"])
    f = out["fleiss"]
    assert 0.0 <= f.po <= 1.0 and 0.0 <= f.pe <= 1.0
    assert f.n_items > 0 and f.n_dropped >= 0

    # scorecard: overlap never exceeds either side's token sum
    for s in out["scorecard"]:
        assert s.overlap_sum <= s.pred_tok_sum
        assert s.overlap_sum <= s.ref_tok_sum
        assert 0 <= s.n_exact <= s.n_examples

    # the audits, asserted on the SAME run (review r13: a second
    # run_align call doubled the demo's suite cost for no coverage)
    pb = out["posbias"]
    assert pb.a_wins + pb.b_wins + pb.ties == pb.n_battles
    assert abs(pb.position_gap) < 0.1      # fixture is symmetric
    a = out["alpha"]
    # alpha uses the WHOLE ragged panel Fleiss had to trim
    assert a.n_items >= out["fleiss"].n_items
    assert a.n_dropped == 0                # no singletons in fixture
    pk = out["pass_at_k"]
    assert 0.0 <= pk.p1 <= pk.p3 <= pk.p5 <= 1.0   # monotone in k
