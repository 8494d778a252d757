"""Preference-pair (DPO / reward-model) data preparation.

After SFT comes preference tuning: the corpus is (prompt, chosen,
rejected) triples. Before they reach a DPO or reward trainer the
pipeline must (1) VALIDATE pairs — a rejected response identical to
the chosen one carries zero learning signal, and empty/NULL prompts or
responses are corrupt; (2) DEDUPLICATE prompts — repeated prompts
over-weight their gradient, so one pair survives per prompt under a
deterministic rule; (3) RENDER both branches through the same chat
template the SFT stage uses (operators/conversations.py), each with
the loss span covering only its response; (4) compute the length-margin
stats a mixer/curriculum stage consumes.

Everything here is JVM Column algebra — no Python touches a pair, so
the 100 TB cost is one codegen'd map stage plus (for prompt dedup) a
single hash aggregation on the prompt key. Same template constants as
conversations.py, so SFT and DPO strings are tokenizer-compatible by
construction.

HOF discipline (PERFORMANCE.md rule 7): no higher-order functions are
needed at all — spans are closed-form length arithmetic because a DPO
row is exactly one user and one assistant turn per branch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_online_retail_spark.operators.conversations import (
    DEFAULT_TEMPLATE,
)

# validation outcome labels, in check order (the first failing check
# names the row): a trainer filters reason == 'ok', an auditor groups
# by reason
REASONS = ("empty_prompt", "empty_chosen", "empty_rejected",
           "zero_signal", "ok")


def pair_reason(prompt: Column | str, chosen: Column | str,
                rejected: Column | str) -> Column:
    """First failing validity check, or 'ok'. NULL and '' are both
    empty (scraped preference sets use either for a missing side)."""
    p = F.col(prompt) if isinstance(prompt, str) else prompt
    c = F.col(chosen) if isinstance(chosen, str) else chosen
    r = F.col(rejected) if isinstance(rejected, str) else rejected

    def empty(x: Column) -> Column:
        return x.isNull() | (F.length(x) == 0)

    return (F.when(empty(p), F.lit("empty_prompt"))
             .when(empty(c), F.lit("empty_chosen"))
             .when(empty(r), F.lit("empty_rejected"))
             .when(c == r, F.lit("zero_signal"))
             .otherwise(F.lit("ok")))


def _render(prompt: Column, response: Column,
            template: tuple[str, str]) -> tuple[Column, Column, Column]:
    """(flat, span_start, span_end): <|user|>prompt<|assistant|>response
    with the loss span covering exactly the response characters."""
    lo, hi = template
    user_tag = f"{lo}user{hi}"
    asst_tag = f"{lo}assistant{hi}"
    flat = F.concat(F.lit(user_tag), prompt, F.lit(asst_tag), response)
    start = (F.lit(len(user_tag) + len(asst_tag))
             + F.length(prompt)).cast("int")
    end = (start + F.length(response)).cast("int")
    return flat, start, end


def dpo_prep(pairs: DataFrame, prompt_col: str = "prompt",
             chosen_col: str = "chosen", rejected_col: str = "rejected",
             template: tuple[str, str] = DEFAULT_TEMPLATE) -> DataFrame:
    """All input columns plus, per branch, the rendered training string
    and its response loss span — (flat_chosen, chosen_start, chosen_end,
    flat_rejected, rejected_start, rejected_end) — plus the validity
    `reason`. A trainer filters reason == 'ok' and feeds both flats;
    the spans mask everything but the response (prompt tokens
    contribute no loss in DPO — both branches share them)."""
    fc, cs, ce = _render(F.col(prompt_col), F.col(chosen_col), template)
    fr, rs, re_ = _render(F.col(prompt_col), F.col(rejected_col), template)
    return (pairs
            .withColumn("reason",
                        pair_reason(prompt_col, chosen_col, rejected_col))
            .withColumn("flat_chosen", fc)
            .withColumn("chosen_start", cs)
            .withColumn("chosen_end", ce)
            .withColumn("flat_rejected", fr)
            .withColumn("rejected_start", rs)
            .withColumn("rejected_end", re_))


def dedup_prompts(pairs: DataFrame, prompt_col: str = "prompt",
                  id_col: str = "pair_id") -> DataFrame:
    """One pair per distinct prompt — keep-FIRST by id (deterministic,
    replay-stable), the mirror of dedup.keep_last. One hash aggregation
    on the prompt key, then a self-semi-join on (prompt, id) to fetch
    the surviving rows, so response payloads never ride the shuffle —
    the same payload discipline as robots_decisions. The join key is
    NULL-SAFE: groupBy treats NULL prompts as one group, so a plain
    equi-join would silently drop every NULL-prompt pair instead of
    keeping its first row for pair_reason to flag downstream (r13
    review)."""
    firsts = (pairs.groupBy(prompt_col)
              .agg(F.min(id_col).alias(id_col)))
    f = firsts.alias("_f")
    p = pairs.alias("_p")
    return (p.join(f,
                   F.col(f"_p.{prompt_col}").eqNullSafe(
                       F.col(f"_f.{prompt_col}"))
                   & (F.col(f"_p.{id_col}") == F.col(f"_f.{id_col}")),
                   "left_semi"))


def pairs_from_scores(candidates: DataFrame, prompt_col: str = "prompt",
                      cand_col: str = "candidate",
                      score_col: str = "score",
                      id_col: str = "cand_id") -> DataFrame:
    """Best-of-n preference synthesis: given N scored candidates per
    prompt (rejection sampling / reward-model outputs), emit one
    (prompt, chosen, rejected) pair — chosen is the max-score
    candidate, rejected the min-score one, ties broken to the LOWER
    candidate id on both sides (deterministic, replay-stable). Prompts
    whose best and worst coincide (a single candidate) yield
    chosen == rejected and fall to pair_reason's zero_signal check
    downstream — synthesis never invents signal.

    One hash aggregation: max_by/min_by over a (score, -id) ordering
    struct — no window, no self-join, candidates ride the shuffle once."""
    # higher score wins; within a score, lower id wins -> order by
    # (score asc, id desc) for max_by and flip for min_by
    up = F.struct(F.col(score_col).alias("s"),
                  (-F.col(id_col)).alias("i"))
    down = F.struct((-F.col(score_col)).alias("s"),
                    (-F.col(id_col)).alias("i"))
    return (candidates.groupBy(prompt_col)
            .agg(F.max_by(F.col(cand_col), up).alias("chosen"),
                 F.max_by(F.col(id_col), up).alias("chosen_id"),
                 F.max_by(F.col(cand_col), down).alias("rejected"),
                 F.max_by(F.col(id_col), down).alias("rejected_id"),
                 F.max(score_col).alias("chosen_score"),
                 F.min(score_col).alias("rejected_score")))


def pair_stats(pairs: DataFrame, group_col: str = "source",
               prompt_col: str = "prompt", chosen_col: str = "chosen",
               rejected_col: str = "rejected") -> DataFrame:
    """Per-group corpus audit: pair/valid counts, validity breakdown,
    distinct prompts, and the LENGTH MARGIN (chosen minus rejected
    chars, valid pairs only — a curriculum proxy: large margins are
    easy comparisons, near-zero margins are hard ones). Exact integer
    sums; one aggregation."""
    reason = pair_reason(prompt_col, chosen_col, rejected_col)
    ok = reason == "ok"
    margin = (F.length(chosen_col).cast("bigint")
              - F.length(rejected_col).cast("bigint"))
    return (pairs
            .groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.sum(ok.cast("bigint")).alias("n_valid"),
                 F.sum((reason == "zero_signal").cast("bigint"))
                  .alias("n_zero_signal"),
                 F.countDistinct(prompt_col).alias("n_prompts"),
                 F.sum(F.when(ok, margin).otherwise(F.lit(0)))
                  .cast("bigint").alias("margin_sum"),
                 F.sum(F.when(ok, F.abs(margin)).otherwise(F.lit(0)))
                  .cast("bigint").alias("abs_margin_sum")))
