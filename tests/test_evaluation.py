"""Eval scoring: normalization, multiset token overlap, F1, summaries."""

from pyspark.sql import functions as F

from etl_online_retail_spark.operators.evaluation import (
    eval_summary,
    exact_match,
    token_overlap,
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, pred string, ref string")


def test_exact_match_normalizes(spark):
    rows = [(1, "s", "  The CAT  sat ", "the cat sat"),   # ws + case
            (2, "s", "the cat", "the dog")]
    got = {r.doc_id: r.exact_match for r in
           _df(spark, rows)
           .select("doc_id", exact_match("pred", "ref")).collect()}
    assert got == {1: True, 2: False}


def test_token_overlap_is_multiset(spark):
    """A token repeated k times on one side and m on the other
    contributes min(k, m) — the SQuAD convention, not set overlap."""
    rows = [
        (1, "s", "a a a b", "a a c"),    # overlap: min(3,2)=2 for 'a'
        (2, "s", "x y", "p q"),          # disjoint: 0
        (3, "s", "w w", "w w"),          # identical: 2, f1 = 1.0
    ]
    got = {r.doc_id: (r.n_pred, r.n_ref, r.n_overlap, r.f1) for r in
           token_overlap(_df(spark, rows), "pred", "ref").collect()}
    assert got[1] == (4, 3, 2, 2 * 2.0 / 7)
    assert got[2] == (2, 2, 0, 0.0)
    assert got[3] == (2, 2, 2, 1.0)


def test_token_overlap_case_insensitive(spark):
    rows = [(1, "s", "The CAT", "the cat")]
    r = token_overlap(_df(spark, rows), "pred", "ref").collect()[0]
    assert (r.n_overlap, r.f1) == (2, 1.0)


def test_eval_summary_groups(spark):
    rows = [
        (1, "a", "t u v", "t u v"),      # exact, overlap 3
        (2, "a", "t u", "u z"),          # overlap 1
        (3, "b", "m", "n"),              # overlap 0
    ]
    got = {r.source: r for r in
           eval_summary(_df(spark, rows), "pred", "ref").collect()}
    a, b = got["a"], got["b"]
    assert (a.n_examples, a.n_exact, a.overlap_sum) == (2, 1, 4)
    assert (a.pred_tok_sum, a.ref_tok_sum) == (5, 5)
    assert (b.n_examples, b.n_exact, b.overlap_sum) == (1, 0, 0)


def test_registry_fixture_has_both_branches(spark):
    """Every 9th doc is an exact match; the slice branch overlaps
    partially (words 5..12 of pred meet words 5..16 of ref)."""
    from conftest import SF_SMALL

    from etl_online_retail_spark.workload_ext import q_eval_token_f1

    rows = q_eval_token_f1(spark, SF_SMALL).collect()
    em = [r for r in rows if r.exact_match]
    part = [r for r in rows if not r.exact_match]
    assert em and part
    assert all(r.f1 == 1.0 and r.n_overlap == r.n_pred for r in em)
    # words 5..min(16, n) are always shared, so overlap is positive;
    # a 10-word doc's ref (words 5..10) sits wholly inside pred
    # (words 1..10), so equality with n_ref is legitimate
    assert all(0 < r.n_overlap <= r.n_ref for r in part)
    assert any(r.n_overlap < r.n_ref for r in part)


def test_exact_match_edge_whitespace_kinds(spark):
    """Collapse-then-trim: edge tabs/newlines must not become phantom
    tokens (r13 review — trim only strips 0x20)."""
    rows = [(1, "s", "the cat\n", "the cat"),
            (2, "s", "\tthe  cat ", "the cat")]
    got = {r.doc_id: r.exact_match for r in
           _df(spark, rows)
           .select("doc_id", exact_match("pred", "ref")).collect()}
    assert got == {1: True, 2: True}
    r = token_overlap(_df(spark, rows), "pred", "ref").collect()
    assert all(x.n_pred == 2 and x.f1 == 1.0 for x in r)


def test_null_and_empty_answers_score_zero(spark):
    """NULL/empty answers score 0 (never NULL): a model returning
    nothing must not beat one returning wrong answers in the sums."""
    rows = [(1, "s", None, "a b"), (2, "s", "", "a b"),
            (3, "s", "  ", "a b"), (4, "s", None, None)]
    got = {r.doc_id: (r.n_pred, r.n_ref, r.n_overlap, r.f1) for r in
           token_overlap(_df(spark, rows), "pred", "ref").collect()}
    assert got[1] == (0, 2, 0, 0.0)
    assert got[2] == (0, 2, 0, 0.0)
    assert got[3] == (0, 2, 0, 0.0)
    assert got[4] == (0, 0, 0, 0.0)
    em = {r.doc_id: r.exact_match for r in
          _df(spark, rows)
          .select("doc_id", exact_match("pred", "ref")).collect()}
    assert em == {1: False, 2: False, 3: False, 4: False}
    s = eval_summary(_df(spark, rows), "pred", "ref").collect()[0]
    assert (s.n_examples, s.n_exact, s.overlap_sum, s.pred_tok_sum,
            s.ref_tok_sum) == (4, 0, 0, 0, 6)


def test_pass_at_k_hand_values(spark):
    """n=5, c=2, k=3: 1 - C(3,3)/C(5,3) = 0.9 (product (3/5)(2/4)(1/3)
    = 0.1). c=0 -> 0.0; n-c < k -> exactly 1.0; n < k -> NULL."""
    from etl_online_retail_spark.operators.evaluation import pass_at_k

    rows = ([("t1", b) for b in
             (True, True, False, False, False)]       # n=5, c=2
            + [("t2", False)] * 5                     # c=0
            + [("t3", True)] * 4 + [("t3", False)]    # n-c=1 < 3
            + [("t4", True), ("t4", False)])          # n=2 < 3
    df = spark.createDataFrame(rows, "task_id string, passed boolean")
    got = {r.task: r for r in pass_at_k(df, ks=(1, 3)).collect()}
    t1 = got["t1"]
    assert (t1.n, t1.c) == (5, 2)
    assert abs(t1.pass_at_3 - 0.9) < 1e-12
    assert t1.pass_at_1 == 1.0 - (3 / 5)
    assert got["t2"].pass_at_3 == 0.0 and got["t2"].pass_at_1 == 0.0
    assert got["t3"].pass_at_3 == 1.0
    assert got["t4"].pass_at_3 is None
    assert got["t4"].pass_at_1 == 0.5
