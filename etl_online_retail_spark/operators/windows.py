"""Window-function operators (SURVEY.md §2.6).

The reference implies two window needs - keep-last dedup (etl.py:104,114 ->
operators/dedup.py) and Superset's series-limit top-N - and has nothing
else; Spark gives the full surface, exposed here: ranking, lag/lead, frame
running totals, top-n per group.

Scale note: every window shuffles on its partition keys. Partition by a
high-cardinality key (customer, user) so state per partition stays small;
an ORDER BY window without PARTITION BY is a single-partition sort and is
deliberately not offered here (see surrogate.py for the one justified use).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ranked(df: DataFrame, partition: Sequence[str], order: Sequence[Column],
           alias: str = "rn", method: str = "row_number") -> DataFrame:
    """Attach row_number/rank/dense_rank over partition/order."""
    fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[method]
    w = Window.partitionBy(*partition).orderBy(*order)
    return df.withColumn(alias, fn().over(w))


def top_n_per_group(df: DataFrame, partition: Sequence[str],
                    order: Sequence[Column], n: int) -> DataFrame:
    """Superset 'series limit': keep the n best rows per group."""
    return (ranked(df, partition, order, "_rn")
            .filter(F.col("_rn") <= n)
            .drop("_rn"))


def running_total(df: DataFrame, partition: Sequence[str], order: Sequence[Column],
                  value: Column, alias: str) -> DataFrame:
    """Cumulative sum: rowsBetween(unboundedPreceding, currentRow)."""
    w = (Window.partitionBy(*partition).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return df.withColumn(alias, F.sum(value).over(w))


def with_lag(df: DataFrame, partition: Sequence[str], order: Sequence[Column],
             col: str, alias: str, offset: int = 1) -> DataFrame:
    """lag(col, offset) over partition/order (basis for sessionization)."""
    w = Window.partitionBy(*partition).orderBy(*order)
    return df.withColumn(alias, F.lag(col, offset).over(w))


def _shard_expr(bounds: list[float], nulls: str) -> Column:
    """Shard index from `_sv` against the boundary list. NULL `_sv`
    rows get their OWN dedicated shard — strict '>' against a bound
    evaluates to NULL for them, which would otherwise land them in a
    NULL shard and crash the driver-side `sorted(counts)` fold.
    nulls="first" shards them below everything (Spark's asc default,
    NULLS FIRST); nulls="last" above everything (desc default)."""
    if nulls not in ("first", "last"):
        raise ValueError(f"nulls must be 'first' or 'last', got {nulls!r}")
    shard = F.lit(0)
    for b in bounds:
        # strict '>' sends boundary-valued rows to the LOWER shard —
        # equal shard_by values always share a shard (contiguity)
        shard = shard + (F.col("_sv") > F.lit(b)).cast("int")
    null_shard = -1 if nulls == "first" else len(bounds) + 1
    return F.when(F.col("_sv").isNull(), F.lit(null_shard)).otherwise(shard)


def distributed_rank(df: DataFrame, order: Sequence[Column],
                     shard_by: Column, n_shards: int = 64,
                     alias: str = "grank",
                     nulls: str = "first") -> tuple[DataFrame, int]:
    """EXACT global row_number over a total order, without the
    single-partition sort that `Window.orderBy(...)` (no PARTITION BY)
    compiles to — the classic 100 TB cliff, since WindowExec moves the
    whole relation through one `Exchange SinglePartition`.

    `shard_by` must be a numeric column expression MONOTONE
    NON-DECREASING along `order` (pass the negated sort key for a
    descending primary order). Rows with equal `shard_by` values may tie
    arbitrarily in `order`'s tie-break columns; they are kept in one
    shard so shards stay CONTIGUOUS rank ranges, which is what makes the
    offset arithmetic exact.

    Three bounded steps, no global sort:

      1. approx shard boundaries: one `percentile_approx` aggregation
         (map-combinable, KB result). Boundaries only balance the
         shards — rank EXACTNESS never depends on where they fall;
      2. per-shard counts -> exclusive offsets, computed driver-side
         over <= n_shards rows;
      3. row_number PARTITIONED by shard (each reducer sorts ~1/n_shards
         of the data) + the shard's offset = the exact global rank.

    NULL `shard_by` values (a NULL quality score, a NULL logprob) get
    a dedicated shard placed per `nulls` ("first" = below everything,
    Spark's asc-order default; "last" = above) — pick the side matching
    `order`'s null placement so ranks stay exact.

    Returns (df + alias column, total_rows). The input is cached — it
    feeds the boundary job, the count job and the final plan (rule 7).
    """
    sv = shard_by.cast("double")
    work = df.withColumn("_sv", sv).cache()
    fracs = [i / n_shards for i in range(1, n_shards)]
    bounds_row = work.agg(
        F.percentile_approx("_sv", fracs, 10_000).alias("_b")).first()
    bounds = sorted({float(b) for b in (bounds_row["_b"] or [])
                     if b is not None})
    sharded = (work.withColumn("_shard", _shard_expr(bounds, nulls))
               .drop("_sv").cache())
    counts = {r["_shard"]: r["n"] for r in
              (sharded.groupBy("_shard")
               .agg(F.count(F.lit(1)).alias("n")).collect())}
    total, offsets = 0, {}
    for s in sorted(counts):
        offsets[s] = total
        total += counts[s]
    off = F.lit(0)
    for s, o in offsets.items():
        off = F.when(F.col("_shard") == s, F.lit(o)).otherwise(off)
    w = Window.partitionBy("_shard").orderBy(*order)
    ranked_df = (sharded
                 .withColumn(alias, (off.cast("bigint")
                                     + F.row_number().over(w)))
                 .drop("_shard"))
    return ranked_df, total


# distributed_rank_by collects a |groups| x n_shards offset relation to
# the driver; beyond this many rows that collect is a silent driver OOM
# waiting to happen, so the operator refuses loudly instead. The bound is
# generous for the contract (BOUNDED part_cols: source, language,
# shard-date — dimension-sized, never a key): 1M offset rows is ~16k
# groups at the default 64 shards, far past any dimension and far below
# driver heap.
MAX_OFFSET_ROWS = 1_000_000


def distributed_rank_by(df: DataFrame, part_cols: Sequence[str],
                        order: Sequence[Column], shard_by: Column,
                        n_shards: int = 64, alias: str = "grank",
                        total_alias: str | None = None,
                        nulls: str = "first") -> DataFrame:
    """EXACT per-group row_number over a total order WITHIN each group —
    distributed_rank's partitioned sibling, for the case where the
    groups themselves are huge (a per-source window over a 100 TB corpus
    split across 5 sources is 5 near-global single-partition sorts; this
    runs one range-sharded pass).

    Same three bounded steps: global approx shard boundaries (balance
    only — exactness never depends on them), per-(group, shard) counts
    folded into exclusive offsets driver-side, then row_number
    partitioned by (group, shard) plus the offset. The offset table is
    |groups| x n_shards rows broadcast back, so `part_cols` must be
    BOUNDED (dimension-sized: source, language, shard-date...), never a
    key column — a counted guard raises ValueError before the collect if
    the offset relation exceeds MAX_OFFSET_ROWS rows (misuse on a key
    column fails loudly instead of OOMing the driver).
    `shard_by` must be monotone non-decreasing along
    `order`. NULLs in part_cols are joined null-safely (their own
    group); NULL `shard_by` values get a dedicated shard per `nulls`
    ("first"/"last" — match the order's null placement). Adds `alias`
    (per-group rank) and, when total_alias is given, the group's total
    row count.
    """
    sv = shard_by.cast("double")
    work = df.withColumn("_sv", sv).cache()
    fracs = [i / n_shards for i in range(1, n_shards)]
    bounds_row = work.agg(
        F.percentile_approx("_sv", fracs, 10_000).alias("_b")).first()
    bounds = sorted({float(b) for b in (bounds_row["_b"] or [])
                     if b is not None})
    sharded = (work.withColumn("_shard", _shard_expr(bounds, nulls))
               .drop("_sv").cache())
    counts_rel = (sharded.groupBy(*part_cols, "_shard")
                  .agg(F.count(F.lit(1)).alias("_n")).cache())
    # guard BEFORE the collect: the count job reads the cached aggregate,
    # so the extra pass costs one bounded scan, never a driver OOM
    n_offsets = counts_rel.count()
    if n_offsets > MAX_OFFSET_ROWS:
        counts_rel.unpersist()
        raise ValueError(
            f"distributed_rank_by: offset relation has {n_offsets} rows "
            f"(> MAX_OFFSET_ROWS={MAX_OFFSET_ROWS}); part_cols="
            f"{list(part_cols)} must be bounded dimension columns "
            f"(source, language, shard-date), never a key — use "
            f"distributed_rank per group or an ordinary window instead")
    counts = counts_rel.collect()
    counts_rel.unpersist()
    per_part: dict[tuple, dict[int, int]] = {}
    for r in counts:
        key = tuple(r[c] for c in part_cols)
        per_part.setdefault(key, {})[r["_shard"]] = r["_n"]
    rows = []
    for key, shards in per_part.items():
        tot = sum(shards.values())
        run = 0
        for s in sorted(shards):
            rows.append((*key, s, run, tot))
            run += shards[s]
    from pyspark.sql import types as T

    off_schema = T.StructType(
        [sharded.schema[c] for c in part_cols]
        + [T.StructField("_shard", T.IntegerType(), False),
           T.StructField("_off", T.LongType(), False),
           T.StructField("_tot", T.LongType(), False)])
    off_df = df.sparkSession.createDataFrame(rows, off_schema)
    cond = F.col("l._shard") == F.col("r._shard")
    for c in part_cols:
        cond = cond & F.col(f"l.{c}").eqNullSafe(F.col(f"r.{c}"))
    joined = (sharded.alias("l")
              .join(F.broadcast(off_df.alias("r")), cond)
              .select("l.*", "r._off", "r._tot"))
    w = Window.partitionBy(*part_cols, "_shard").orderBy(*order)
    out = (joined
           .withColumn(alias, F.col("_off") + F.row_number().over(w))
           .drop("_shard", "_off"))
    if total_alias is None:
        return out.drop("_tot")
    return out.withColumnRenamed("_tot", total_alias)


def distributed_ntile_by(df: DataFrame, part_cols: Sequence[str],
                         order: Sequence[Column], shard_by: Column,
                         n: int, n_shards: int = 64,
                         alias: str = "bucket",
                         nulls: str = "first") -> DataFrame:
    """EXACT per-group NTILE(n) without per-group single-partition
    sorts: distributed_rank_by + the same closed form as
    distributed_ntile, with the group total N carried as a column (the
    first N % n buckets hold ceil(N/n) rows, the rest floor(N/n)) — all
    integer `div`/`%` arithmetic, bit-equal to the engines' own
    partitioned NTILE. `nulls` places NULL shard_by rows ("first" =
    Spark's asc default; pass "last" for desc-ordered callers, whose
    window default is desc_nulls_last)."""
    ranked_df = distributed_rank_by(df, part_cols, order, shard_by,
                                    n_shards=n_shards, alias="_gr",
                                    total_alias="_gn", nulls=nulls)
    in_big = F.expr(f"(_gr - 1) div (_gn div {n} + 1) + 1")
    in_small = F.expr(
        f"_gn % {n} + (_gr - (_gn % {n}) * (_gn div {n} + 1) - 1)"
        f" div greatest(_gn div {n}, 1) + 1")
    t = F.expr(f"(_gn % {n}) * (_gn div {n} + 1)")
    bucket = F.when(F.col("_gr") <= t, in_big).otherwise(in_small)
    return ranked_df.withColumn(alias, bucket.cast("int")).drop("_gr", "_gn")


def distributed_ntile(df: DataFrame, order: Sequence[Column],
                      shard_by: Column, n: int, n_shards: int = 64,
                      alias: str = "bucket",
                      nulls: str = "first") -> DataFrame:
    """EXACT NTILE(n) over a total order without a single-partition
    sort: the bucket of a row is a CLOSED FORM of its global rank r and
    the total count N (the first N % n buckets hold ceil(N/n) rows, the
    rest floor(N/n)), so `distributed_rank` + driver-side arithmetic
    reproduces NTILE bit-for-bit — asserted against the oracle engines'
    own NTILE in the decile/z-order query hashes. `nulls` places NULL
    shard_by rows ("first" = asc default; "last" for desc orders)."""
    ranked_df, total = distributed_rank(df, order, shard_by,
                                        n_shards=n_shards, alias="_gr",
                                        nulls=nulls)
    q, rem = divmod(total, n)
    t = rem * (q + 1)
    # `div` = exact integer division (the double `/` rounds near 2^52)
    in_big = F.expr(f"(_gr - 1) div {q + 1} + 1")
    in_small = F.expr(f"{rem} + (_gr - {t} - 1) div {max(q, 1)} + 1")
    bucket = F.when(F.col("_gr") <= F.lit(t), in_big).otherwise(in_small)
    return ranked_df.withColumn(alias, bucket.cast("int")).drop("_gr")
