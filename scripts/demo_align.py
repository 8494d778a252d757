"""Alignment-data demo: the loop an RLHF data team runs.

    best-of-n synthesis (scored candidates -> chosen/rejected pairs)
      -> DPO prep funnel (validity reasons, rendered branches, margins)
    judge arena (battles -> records -> Bradley-Terry leaderboard,
      position-bias audit)
    annotator QA (Cohen's kappa per source + Fleiss' fixed panel +
      Krippendorff's alpha on the ragged panel)
    eval scorecard (exact match + token F1 per source, pass@k)

Each stage is a first-class operator with an oracle-verified query twin
(best_of_n_pairs, dpo_pair_prep, preference_pair_stats,
judge_model_records, judge_bt_scores, annotator_kappa_by_source,
annotator_fleiss_by_source, eval_summary_by_source).
Run: python scripts/demo_align.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from etl_online_retail_spark.catalog import load_table
from etl_online_retail_spark.operators.agreement import (
    cohens_kappa,
    fleiss_kappa,
)
from etl_online_retail_spark.operators.arena import (
    bradley_terry,
    model_records,
)
from etl_online_retail_spark.operators.evaluation import eval_summary
from etl_online_retail_spark.operators.preferences import (
    dpo_prep,
    pair_stats,
    pairs_from_scores,
)
from etl_online_retail_spark.session import get_spark


def run_align(spark, sf_dir: str) -> dict:
    """The loop as data: returns each stage's result for assertions."""
    docs = load_table(spark, "documents", sf_dir).cache()

    # 1. best-of-n: N scored candidates per prompt -> one pair each
    cands = docs.select(
        F.concat("source", F.lit("#"),
                 (F.col("doc_id") % 25).cast("string")).alias("prompt"),
        F.col("text").alias("candidate"),
        (F.length("text") % 97).cast("bigint").alias("score"),
        F.col("doc_id").alias("cand_id"))
    bon = pairs_from_scores(cands).cache()
    n_prompts = bon.count()

    # 2. DPO prep: validity funnel + rendered branches + margin audit
    pairs = bon.select(
        "prompt", "chosen", "rejected",
        F.split("prompt", "#").getItem(0).alias("source"))
    prepped = dpo_prep(pairs)
    funnel = {r.reason: r.n for r in
              prepped.groupBy("reason")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    margins = pair_stats(pairs).orderBy("source").collect()

    # 3. judge arena: battles -> records -> Bradley-Terry leaderboard
    # (the oracle-gated fixture — one source of truth, review r13)
    from etl_online_retail_spark.workload_ext import _battles

    battles = _battles(spark, sf_dir).cache()
    records = {x.model: x for x in model_records(battles).collect()}
    board = (bradley_terry(battles, iters=3)
             .orderBy(F.col("bt_fp").desc()).collect())
    from etl_online_retail_spark.operators.arena import position_bias
    posbias = position_bias(battles).collect()[0]

    # 4. annotator QA: pairwise kappa per source + Fleiss on a 3-panel
    labels = docs.select(
        "source",
        F.concat(F.lit("L"), (F.length("text") % 5).cast("string"))
         .alias("label_a"),
        F.concat(F.lit("L"),
                 ((F.length("text") + F.col("doc_id")) % 5)
                 .cast("string")).alias("label_b"))
    kap = (cohens_kappa(labels, group_col="source")
           .orderBy("source").collect())
    ratings = (docs.select(
        "doc_id", "text",
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("rater"))
        .filter(~((F.col("rater") == 2) & (F.col("doc_id") % 13 == 0)))
        .select(F.col("doc_id").alias("item_id"),
                F.concat(F.lit("L"),
                         ((F.length("text")
                           + F.col("rater") * F.col("doc_id")) % 4)
                         .cast("string")).alias("label")))
    fleiss = fleiss_kappa(ratings, n_raters=3).collect()[0]
    from etl_online_retail_spark.operators.agreement import (
        krippendorff_alpha,
    )
    # the same panel is already ragged (rater 2 withheld on %13), so
    # alpha uses ALL of it where Fleiss had to drop the 2-rater items
    alpha = krippendorff_alpha(ratings).collect()[0]

    # 5. eval scorecard per source (pred/ref fixture: shifted slices,
    # every 9th an exact match)
    ws = F.split(F.col("text"), " ")
    is_em = F.col("doc_id") % 9 == 0
    eval_pairs = docs.select(
        "doc_id", "source",
        F.when(is_em, F.col("text"))
         .otherwise(F.upper(F.array_join(F.slice(ws, 1, 12), " ")))
         .alias("pred"),
        F.when(is_em, F.col("text"))
         .otherwise(F.array_join(F.slice(ws, 5, 12), " ")).alias("ref"))
    scorecard = (eval_summary(eval_pairs, "pred", "ref")
                 .orderBy("source").collect())
    from etl_online_retail_spark.operators.evaluation import pass_at_k
    pk = (pass_at_k(docs.select(
        F.concat("source", F.lit("#"),
                 (F.col("doc_id") % 25).cast("string")).alias("task_id"),
        (F.length("text") % 97 > 48).alias("passed")), ks=(1, 3, 5))
        .agg(F.count(F.lit(1)).alias("n_tasks"),
             F.avg("n").alias("mean_n"),
             F.avg("pass_at_1").alias("p1"),
             F.avg("pass_at_3").alias("p3"),
             F.avg("pass_at_5").alias("p5")).collect()[0])

    return {"n_prompts": n_prompts, "funnel": funnel, "margins": margins,
            "records": records, "board": board, "posbias": posbias,
            "kappa": kap, "fleiss": fleiss, "alpha": alpha,
            "scorecard": scorecard, "pass_at_k": pk}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("demo-align")
    out = run_align(spark, sf_dir)

    print("\n== best-of-n -> DPO funnel ==")
    total = sum(out["funnel"].values())
    print(f"  {out['n_prompts']} prompts synthesized into pairs")
    for reason, n in sorted(out["funnel"].items(),
                            key=lambda kv: -kv[1]):
        print(f"  {reason:16s} {n:6d} / {total}")
    for m in out["margins"]:
        print(f"  {m.source:8s} valid {m.n_valid:5d}/{m.n_pairs:<5d} "
              f"margin_sum {m.margin_sum:8d}")

    print("== judge arena (Bradley-Terry leaderboard) ==")
    for x in out["board"]:
        rec = out["records"][x.model]
        print(f"  {x.model:4s} bt={x.bt_score:7.3f}  "
              f"{rec.wins:6d}W {rec.losses:6d}L {rec.ties:6d}T  "
              f"win_rate={rec.win_rate:.4f}")

    pb = out["posbias"]
    print(f"  position bias: a_rate={pb.a_win_rate:.4f} "
          f"b_rate={pb.b_win_rate:.4f} gap={pb.position_gap:+.4f} "
          f"over {pb.n_battles} battles")

    print("== annotator QA ==")
    for k in out["kappa"][:5]:
        print(f"  {k.source:8s} kappa={k.kappa:+.4f} "
              f"(agree {k.n_agree}/{k.n})")
    f = out["fleiss"]
    print(f"  fleiss panel: {f.n_items} items ({f.n_dropped} ragged "
          f"dropped) po={f.po:.4f} pe={f.pe:.4f} kappa={f.kappa:+.4f}")
    a = out["alpha"]
    print(f"  krippendorff alpha (ragged ok): {a.n_items} items "
          f"({a.n_dropped} singletons dropped) ao={a.ao:.4f} "
          f"ae={a.ae:.4f} alpha={a.alpha:+.4f}")

    print("== eval scorecard ==")
    for s in out["scorecard"]:
        em_rate = s.n_exact / s.n_examples
        micro_f1 = 2 * s.overlap_sum / (s.pred_tok_sum + s.ref_tok_sum)
        print(f"  {s.source:8s} em={em_rate:.4f} "
              f"micro_f1={micro_f1:.4f} ({s.n_examples} examples)")
    pk = out["pass_at_k"]
    print(f"  pass@k over {pk.n_tasks} tasks "
          f"({pk.mean_n:.1f} candidates each): "
          f"pass@1={pk.p1:.4f} pass@3={pk.p3:.4f} pass@5={pk.p5:.4f}")


if __name__ == "__main__":
    main()
