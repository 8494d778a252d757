"""Inter-annotator agreement: confusion matrix + Cohen's kappa.

Labeled-data QA for training pipelines: two annotators (humans, or a
model judged against a human) label the same items; agreement beyond
chance is the signal that the labels are usable. Cohen's kappa
(po - pe) / (1 - pe) reduces to EXACT integer arithmetic:

    kappa = (n * n_agree - pe_num) / (n^2 - pe_num)
    pe_num = sum_k n_ak * n_bk     (marginal products per label k)

so the whole statistic is exact BIGINT counting plus ONE IEEE
division (cross-engine bit-exact, the gopher_quality_flags
convention). When the denominator is zero (both marginal
distributions concentrated on one identical label: pe = 1) kappa is
undefined and returned as NULL.

Scale shape: item count is the big dimension (billions of labeled
rows); labels per annotator are the small one. Everything is hash
aggregations at the (group, label) grain co-partitioned on the group
column, one tiny marginal-marginal join per group, and a final
group-grain join — items never ride a shuffle wider than their
group + label columns. NULL is ONE MORE LABEL, consistently on both
sides of the statistic (NULL-safe equality for observed agreement
AND for the marginal join): po and pe must range over the same label
space or kappa's chance correction stops meaning anything. Callers
who consider missing labels invalid should filter before calling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GRP = "_kappa_grp"


def confusion_matrix(labels: DataFrame, a_col: str = "label_a",
                     b_col: str = "label_b") -> DataFrame:
    """Counts at the (label_a, label_b) grain — one hash aggregation;
    the raw matrix behind kappa and any per-class drill-down."""
    return (labels.groupBy(F.col(a_col).alias("label_a"),
                           F.col(b_col).alias("label_b"))
            .agg(F.count(F.lit(1)).alias("n")))


def cohens_kappa(labels: DataFrame, a_col: str = "label_a",
                 b_col: str = "label_b",
                 group_col: str | None = None) -> DataFrame:
    """(group?, n, n_agree, pe_num, kappa) per group (or one global
    row when group_col is None). n/n_agree/pe_num are the exact
    BIGINTs kappa derives from — emitted so downstream re-weighting
    (pooled kappa across groups) never re-reads the items."""
    g = F.col(group_col) if group_col else F.lit(0)
    base = labels.select(g.alias(_GRP),
                         F.col(a_col).alias("_a"), F.col(b_col).alias("_b"))
    one = F.lit(1).cast("long")
    zero = F.lit(0).cast("long")
    totals = base.groupBy(_GRP).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("_a").eqNullSafe(F.col("_b")), one)
               .otherwise(zero)).alias("n_agree"))
    ma = (base.groupBy(_GRP, "_a").agg(F.count(F.lit(1)).alias("_na"))
          .withColumnRenamed(_GRP, "_ga"))
    mb = (base.groupBy(_GRP, "_b").agg(F.count(F.lit(1)).alias("_nb"))
          .withColumnRenamed(_GRP, "_gb"))
    pe = (ma.join(mb, (F.col("_ga") == F.col("_gb"))
                  & F.col("_a").eqNullSafe(F.col("_b")))
          .groupBy(F.col("_ga").alias(_GRP))
          .agg(F.sum(F.col("_na") * F.col("_nb")).alias("pe_num")))
    out = (totals.join(pe, _GRP)
           .withColumn(
               "kappa",
               F.when(F.col("n") * F.col("n") - F.col("pe_num") != 0,
                      (F.col("n") * F.col("n_agree") - F.col("pe_num"))
                      .cast("double")
                      / (F.col("n") * F.col("n") - F.col("pe_num")))))
    if group_col:
        return out.withColumnRenamed(_GRP, group_col)
    return out.drop(_GRP)
