"""Aggregation / ordering operators (SURVEY.md §2.5, §2.7, §2.8).

Grouped SUM (A1), global aggregates (A2), COUNT DISTINCT (A3/A4), ROLLUP
(A5), HAVING (F7), ORDER BY/LIMIT/top-k (O1-O3), month-grain series (T1).
All are single groupBy/rollup plans: Catalyst plans partial (map-side) +
final hash aggregation automatically, and top-k compiles to
TakeOrderedAndProject - no full sort is ever materialized for a LIMIT.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_online_retail_spark.functions.datetime_fns import month_start


def grouped(df: DataFrame, keys: Sequence[Column | str],
            aggs: Sequence[Column]) -> DataFrame:
    """A1/A3/A4: GROUP BY keys with aliased aggregate columns."""
    return df.groupBy(*keys).agg(*aggs)


def global_agg(df: DataFrame, aggs: Sequence[Column]) -> DataFrame:
    """A2: aggregate without keys (e.g. total revenue, MIN/MAX bounds)."""
    return df.agg(*aggs)


def rollup_agg(df: DataFrame, keys: Sequence[Column | str],
               aggs: Sequence[Column]) -> DataFrame:
    """A5: GROUP BY ROLLUP(keys) - hierarchy subtotals + grand total.

    The reference's ROLLUP(year, month, day) returned 323 rows =
    307 days + 13 months + 2 years + 1 total (superset.db#query[7]).
    """
    return df.rollup(*keys).agg(*aggs)


def having(df: DataFrame, keys: Sequence[Column | str],
           aggs: Sequence[Column], predicate: Column) -> DataFrame:
    """F7: post-aggregation filter (SQL HAVING)."""
    return df.groupBy(*keys).agg(*aggs).filter(predicate)


def top_k(df: DataFrame, keys: Sequence[Column | str], aggs: Sequence[Column],
          order: Sequence[Column], k: int) -> DataFrame:
    """O3: group, aggregate, ORDER BY ... LIMIT k.

    Callers pass a total order (metric DESC + key tiebreaker) so the k rows
    are deterministic under ties; Spark executes TakeOrderedAndProject
    (per-partition heaps, no global sort).
    """
    return df.groupBy(*keys).agg(*aggs).orderBy(*order).limit(k)


def monthly_series(df: DataFrame, ts_col: str, aggs: Sequence[Column]) -> DataFrame:
    """T1: DATE_TRUNC('month') time series (Superset P1M grain)."""
    return (df.groupBy(month_start(ts_col).alias("month_start"))
              .agg(*aggs)
              .orderBy("month_start"))


def count_distinct(col: str, alias: str) -> Column:
    """A3 exact COUNT(DISTINCT col). Use approx_count_distinct at the
    100 TB scale path when a ~2% error is acceptable (single pass, no
    per-group distinct expansion)."""
    return F.countDistinct(F.col(col)).alias(alias)


def approx_count_distinct(col: str, alias: str, rsd: float = 0.02) -> Column:
    """Scale variant of A3: HyperLogLog++ sketch, mergeable map-side."""
    return F.approx_count_distinct(F.col(col), rsd).alias(alias)


def mad_outliers(df: DataFrame, group_col: str, value_col: str,
                 k: float = 3.0) -> DataFrame:
    """Robust per-group outlier statistics via the median absolute
    deviation: med = median(v), mad = median(|v - med|), and a value is
    an outlier when |v - med| > k * 1.4826 * mad (1.4826 scales MAD to
    σ under normality, so k behaves like a z-score cutoff — but unlike
    mean/stddev, the estimator itself doesn't move when the outliers it
    is hunting pollute the tail). The standard robust cleaning gate for
    price/length/latency columns.

    Output: (group_col, n BIGINT, med DOUBLE, mad DOUBLE,
    n_outliers BIGINT). The value column must be integer-scaled (cents,
    chars) so the interpolated medians are exact in DOUBLE and
    engine-portable.

    Scale shape: two grouped exact-median aggregations with a broadcast
    join-back between them (group cardinality rows), then one counting
    aggregation — no window, no sort of the full relation beyond what
    median itself needs. At extreme group sizes swap F.median for the
    HDR-histogram sketch quantile (operators/sketches) at a documented
    error bound; semantics otherwise unchanged.
    """
    v = F.col(value_col).cast("double")
    med = (df.groupBy(group_col)
           .agg(F.median(v).alias("med")))
    dev = (df.join(F.broadcast(med), group_col)
           .withColumn("_adev", F.abs(v - F.col("med"))))
    mad = (dev.groupBy(group_col)
           .agg(F.first("med").alias("med"),
                F.median(F.col("_adev")).alias("mad")))
    flagged = (dev.drop("med")
               .join(F.broadcast(mad), group_col)
               .withColumn(
                   "_is_out",
                   (F.col("_adev") >
                    F.lit(k) * F.lit(1.4826) * F.col("mad")).cast("int")))
    return (flagged.groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.first("med").alias("med"),
                 F.first("mad").alias("mad"),
                 F.sum("_is_out").cast("bigint").alias("n_outliers")))


def jackknife_mean(df: DataFrame, id_col: str, cents_col: str,
                   n_buckets: int = 32, z: float = 1.96) -> DataFrame:
    """Delete-one-bucket jackknife standard error for a mean — an honest
    uncertainty band on any dashboard average, computed deterministically
    (hash buckets, no RNG) and distributed (the classic "bag of little
    bootstraps"-era trick: resampling over PARTITION AGGREGATES, never
    over rows).

        m_b  = mean over all rows OUTSIDE bucket b        (B leave-one-out means)
        se^2 = (B-1)/B * sum_b (m_b - mbar)^2

    cents_col must be an exact int64 quantity (the repo's cents
    convention) so every bucket total is exact; the leave-one-out means
    are then row-local IEEE doubles, and both float reductions over the
    B-row relation (mbar, the variance sum) follow the
    decimal-contribution discipline — round to 9dp, sum as
    DECIMAL(18,9) — making the whole estimate oracle-hash-exact.

    Output: one row (n_rows, mean, se, ci_lo, ci_hi) with mean/se/ci in
    cents, rounded to 6dp. Scale shape: one map-combinable hash agg to
    B partial sums, then arithmetic over a B-row relation.
    """
    from etl_online_retail_spark.functions.hashing import (
        PRIME,
        affine,
        hash_family,
    )

    a, b = hash_family(1, seed=13)[0]
    # the shared affine helper, not an inline copy (r7 review): same
    # arithmetic, one source of truth with every other hash consumer
    h = F.pmod(F.col(id_col).cast("bigint"), F.lit(PRIME))
    bucket = F.pmod(affine(h, a, b), F.lit(n_buckets))
    per = (df.select(bucket.alias("_b"), F.col(cents_col).alias("_v"))
           .groupBy("_b")
           .agg(F.count(F.lit(1)).alias("_n"), F.sum("_v").alias("_s")))
    tot = per.agg(F.sum("_n").alias("_nt"), F.sum("_s").alias("_st"))
    # a bucket holding EVERY row has no leave-one-out complement: its
    # 0/0 must become NULL (excluded by COUNT(_m)), never a NaN that
    # COUNT would still tally — with one occupied bucket the whole se/ci
    # then reads NULL instead of silently propagating NaN
    loo = (per.crossJoin(F.broadcast(tot))
           .select("_b", "_nt", "_st",
                   F.when(
                       F.col("_nt") > F.col("_n"),
                       (F.col("_st") - F.col("_s")).cast("double")
                       / (F.col("_nt") - F.col("_n")).cast("double"))
                   .alias("_m"))
           .cache())  # feeds mbar AND the variance sum (rule 7)
    # B below is the number of OCCUPIED buckets with a defined LOO mean
    # (COUNT of non-null _m), not the nominal n_buckets: tiny or
    # unluckily-hashed inputs leave buckets empty, and dividing by the
    # nominal count would deflate mbar and inflate the deviations.
    # Both accumulators are DECIMAL(28,9) (integer range 1e19): the LOO
    # means are full-sized cents values and their squares cents^2, so
    # the narrow (18,9) accumulator would overflow for means past ~1e9
    # cents — Spark nullifying silently while DuckDB errors.
    mbar_rel = loo.agg(
        F.sum(F.round(F.col("_m"), 9).cast("decimal(28,9)")).alias("_sm"),
        F.count(F.col("_m")).alias("_nb"))
    # _nb = 0 (no defined LOO mean anywhere) must surface as NULL, not
    # an ANSI DIVIDE_BY_ZERO error mid-plan
    mbar = F.try_divide(F.col("_sm").cast("double"),
                        F.col("_nb").cast("double"))
    var_rel = (loo.crossJoin(F.broadcast(
                   mbar_rel.select(mbar.alias("_mbar"),
                                   F.col("_nb"))))
               .agg(F.first("_nt").alias("_nt"), F.first("_st").alias("_st"),
                    F.first("_nb").alias("_nb"),
                    F.sum(F.round((F.col("_m") - F.col("_mbar"))
                                  * (F.col("_m") - F.col("_mbar")), 9)
                          .cast("decimal(28,9)")).cast("double")
                    .alias("_ss")))
    mean = F.col("_st").cast("double") / F.col("_nt").cast("double")
    nbd = F.col("_nb").cast("double")
    se = F.sqrt(F.try_divide(nbd - F.lit(1.0), nbd) * F.col("_ss"))
    return var_rel.select(
        F.col("_nt").alias("n_rows"),
        F.round(mean, 6).alias("mean"),
        F.round(se, 6).alias("se"),
        F.round(mean - F.lit(z) * se, 6).alias("ci_lo"),
        F.round(mean + F.lit(z) * se, 6).alias("ci_hi"))
