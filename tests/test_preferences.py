"""Preference-pair (DPO) prep: validation order, template render +
response-only spans, prompt keep-first dedup, margin stats."""

from pyspark.sql import functions as F

from etl_online_retail_spark.operators.preferences import (
    dedup_prompts,
    dpo_prep,
    pair_reason,
    pair_stats,
)


def _pairs(spark, rows):
    return spark.createDataFrame(
        rows, "pair_id long, source string, prompt string, "
              "chosen string, rejected string")


def test_pair_reason_order_and_nulls(spark):
    """The FIRST failing check names the row; NULL and '' are both
    empty; a row failing several checks reports the earliest."""
    rows = [
        (1, "s", "p", "c", "r"),            # ok
        (2, "s", "", "c", "c"),             # empty_prompt beats zero_signal
        (3, "s", None, "c", "r"),           # NULL prompt == empty
        (4, "s", "p", "", "r"),             # empty_chosen
        (5, "s", "p", "c", None),           # empty_rejected
        (6, "s", "p", "same", "same"),      # zero_signal
    ]
    got = {r.pair_id: r.reason for r in
           _pairs(spark, rows)
           .select("pair_id",
                   pair_reason("prompt", "chosen", "rejected")
                   .alias("reason")).collect()}
    assert got == {1: "ok", 2: "empty_prompt", 3: "empty_prompt",
                   4: "empty_chosen", 5: "empty_rejected",
                   6: "zero_signal"}


def test_dpo_prep_render_and_spans(spark):
    """Both branches render through the SFT template and each span
    covers exactly its response: flat[start:end] == response."""
    rows = [(1, "s", "ask me", "good answer", "bad")]
    r = dpo_prep(_pairs(spark, rows)).collect()[0]
    assert r.flat_chosen == "<|user|>ask me<|assistant|>good answer"
    assert r.flat_rejected == "<|user|>ask me<|assistant|>bad"
    assert r.flat_chosen[r.chosen_start:r.chosen_end] == "good answer"
    assert r.flat_rejected[r.rejected_start:r.rejected_end] == "bad"
    # spans start together (shared prompt+template prefix) — the DPO
    # property that lets a trainer mask both branches identically
    assert r.chosen_start == r.rejected_start == len("<|user|>ask me"
                                                     "<|assistant|>")


def test_dedup_prompts_keeps_min_id_with_payload(spark):
    rows = [(5, "s", "P1", "c5", "r"), (2, "s", "P1", "c2", "r"),
            (9, "s", "P2", "c9", "r"), (3, "s", "P1", "c3", "r")]
    got = {(r.prompt, r.pair_id, r.chosen) for r in
           dedup_prompts(_pairs(spark, rows)).collect()}
    assert got == {("P1", 2, "c2"), ("P2", 9, "c9")}


def test_pair_stats_margins_valid_only(spark):
    rows = [
        (1, "a", "p", "ccccc", "rr"),      # ok, margin +3
        (2, "a", "p", "c", "rrrr"),        # ok, margin -3
        (3, "a", "p2", "same", "same"),    # zero_signal: excluded
        (4, "b", "", "c", "r"),            # empty_prompt: excluded
    ]
    got = {r.source: r for r in pair_stats(_pairs(spark, rows)).collect()}
    a = got["a"]
    assert (a.n_pairs, a.n_valid, a.n_zero_signal, a.n_prompts) == (3, 2, 1, 2)
    assert (a.margin_sum, a.abs_margin_sum) == (0, 6)
    b = got["b"]
    assert (b.n_pairs, b.n_valid, b.margin_sum) == (1, 0, 0)


def test_registry_fixture_reason_mix(spark):
    """The registry fixture exercises every branch the corpus can hit:
    ok, zero_signal (every 7th), empty_rejected (every 11th)."""
    from conftest import SF_SMALL

    from etl_online_retail_spark.workload_ext import _dpo_pairs

    pairs = dpo_prep(_dpo_pairs(spark, SF_SMALL))
    got = {r.reason: r.n for r in
           pairs.groupBy("reason").agg(F.count(F.lit(1)).alias("n"))
           .collect()}
    assert set(got) == {"ok", "zero_signal", "empty_rejected"}
    assert got["ok"] > got["zero_signal"] > 0 and got["empty_rejected"] > 0


def test_dedup_prompts_null_prompt_group_survives(spark):
    """NULL prompts form one group and keep-first retains its min-id
    row (a plain equi-join would drop them all — r13 review); the
    validator flags it downstream."""
    rows = [(7, "s", None, "c7", "r"), (4, "s", None, "c4", "r"),
            (1, "s", "P", "c1", "r")]
    got = {(r.prompt, r.pair_id) for r in
           dedup_prompts(_pairs(spark, rows)).collect()}
    assert got == {(None, 4), ("P", 1)}


def test_pairs_from_scores_tiebreaks_and_singletons(spark):
    """argmax/argmin with lower-id tie-break on both sides; a
    single-candidate prompt yields chosen == rejected (zero_signal
    downstream — synthesis never invents signal)."""
    from etl_online_retail_spark.operators.preferences import (
        pairs_from_scores,
    )

    rows = [
        ("P1", "c10", 10, 1), ("P1", "c30", 30, 2), ("P1", "c5", 5, 3),
        # P2: all-tied scores -> chosen AND rejected both take id 4
        ("P2", "t4", 7, 4), ("P2", "t9", 7, 9),
        ("P3", "only", 1, 7),
    ]
    df = spark.createDataFrame(
        rows, "prompt string, candidate string, score long, cand_id long")
    got = {r.prompt: r for r in pairs_from_scores(df).collect()}
    p1 = got["P1"]
    assert (p1.chosen, p1.chosen_id, p1.rejected, p1.rejected_id) == \
        ("c30", 2, "c5", 3)
    assert (p1.chosen_score, p1.rejected_score) == (30, 5)
    p2 = got["P2"]
    assert (p2.chosen_id, p2.rejected_id) == (4, 4)
    assert p2.chosen == p2.rejected == "t4"
    p3 = got["P3"]
    assert p3.chosen == p3.rejected == "only"
