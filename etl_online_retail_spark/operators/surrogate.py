"""Surrogate keys + unknown-member seeding (SURVEY.md §7 "hard parts").

The reference relies on Postgres SERIAL (init_db.sql:8,16) and even reads
dims back from the warehouse so facts can observe DB-assigned keys
(etl.py:198-205). Spark has no sequence; we assign keys deterministically
in-plan instead, which also removes the reference's write-then-read-back
round trip entirely (SURVEY.md §3.1).

Two strategies:
  * dense_keys: row_number over natural-key order. Exactly reproduces
    SERIAL-style 1..N ids (seed row = 1). Single-partition window - fine
    for dimension tables (the only place the reference needs SERIAL),
    unacceptable for facts.
  * scalable_keys: zipWithIndex-free distributed variant built from
    monotonically_increasing_id ordering is deliberately NOT used because
    ids must be stable across runs; at fact scale use the natural key
    itself or a hash - facts in the reference carry no surrogate of
    their own (init_db.sql:35-42 has no PK).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dense_keys(dim: DataFrame, order: Sequence[str], key_name: str,
               offset: int = 1) -> DataFrame:
    """SERIAL-equivalent: key_name = offset + row_number() over natural order.

    offset=1 leaves id 1 free for the seeded unknown member
    (init_db.sql:12-13, 20-21).
    """
    w = Window.orderBy(*[F.col(c) for c in order])
    return dim.withColumn(key_name, (F.row_number().over(w) + offset).cast("int"))


def dense_keys_distributed(dim: DataFrame, order: Sequence[str],
                           key_name: str, shard_by,
                           offset: int = 1) -> DataFrame:
    """dense_keys without the single-partition window: EXACT same
    1..N ids over the same natural-key order, computed via
    distributed_rank (operators/windows.py — approx range shards +
    per-shard row_number + driver-side offsets, r6).

    For the reference's real dimensions dense_keys is fine (dim-sized
    by design, PERFORMANCE.md rule 4); this is the variant for a
    dimension that outgrows one partition while still needing DENSE
    SERIAL-style ids (hashed_keys being the sparse alternative).
    `shard_by` must be a numeric Column monotone non-decreasing along
    `order` — for a numeric natural key, the key itself. Ids stay INT
    for drop-in parity with dense_keys; a dimension past 2^31 rows
    should widen key_name downstream."""
    from etl_online_retail_spark.operators.windows import distributed_rank

    ranked, _ = distributed_rank(
        dim, [F.col(c) for c in order], shard_by, alias="_rk")
    return (ranked
            .withColumn(key_name, (F.col("_rk") + offset).cast("int"))
            .drop("_rk"))


def with_unknown_member(dim: DataFrame, key_name: str,
                        natural_key: str, unknown_value: str = "00000") -> DataFrame:
    """Prepend the unknown-member seed row at id 1.

    All non-key attributes are NULL, matching
    INSERT INTO dim VALUES (DEFAULT, '00000', NULL) (init_db.sql:12-13).
    """
    spark = dim.sparkSession
    seed = spark.createDataFrame([(1, unknown_value)], f"{key_name} int, {natural_key} string")
    for field in dim.schema.fields:
        if field.name not in (key_name, natural_key):
            seed = seed.withColumn(field.name, F.lit(None).cast(field.dataType))
    return seed.select(dim.columns).unionByName(dim)


def hashed_keys(dim: DataFrame, natural_cols: Sequence[str],
                key_name: str, seed: int = 0) -> DataFrame:
    """Scale-path surrogate keys: 64-bit hash of the natural key.

    dense_keys is the SERIAL-faithful default but is a global window — fine
    for real dimensions (dim-sized by design, PERFORMANCE.md rule 4), wrong
    for a monster dimension that outgrows one partition. Hashed keys are
    embarrassingly parallel and stable across runs/partitionings; the trade
    is sparse (non-dense) ids and a collision risk of ~n^2 / 2^64
    (birthday bound: ~1e-8 at 10M rows). Pair with assert_injective before
    first use of a new dimension.
    """
    return dim.withColumn(
        key_name, F.xxhash64(*[F.col(c) for c in natural_cols], F.lit(seed)))


def assert_injective(dim: DataFrame, natural_cols: Sequence[str],
                     key_name: str) -> None:
    """Fail loudly if the hashed key collides on distinct natural keys."""
    n_nat = dim.select(*natural_cols).distinct().count()
    n_key = dim.select(key_name).distinct().count()
    if n_key != n_nat:
        raise ValueError(
            f"hashed key {key_name} collides: {n_nat} natural keys -> "
            f"{n_key} hash values; re-seed hashed_keys or widen the key")


def resolve_with_unknown(facts: DataFrame, dim: DataFrame,
                         natural_key: str, dim_key: str,
                         unknown_id: int = 1) -> DataFrame:
    """Late-arriving-dimension tolerant FK resolution: facts whose
    natural key has no dim row yet resolve to the seeded unknown member
    (id 1, init_db.sql:12-13) instead of being dropped or crashing the
    load — the standard Kimball treatment for facts that outrun their
    dimension feed. Adds `dim_key` and `_dim_resolved` (False marks the
    rows a later backfill should revisit)."""
    from etl_online_retail_spark.operators.joins import (
        size_guarded_broadcast,
    )

    lookup = dim.select(F.col(natural_key).alias("_nk"),
                        F.col(dim_key).alias("_dk"))
    return (facts.join(size_guarded_broadcast(lookup),
                       facts[natural_key] == F.col("_nk"), "left")
            .withColumn(dim_key,
                        F.coalesce(F.col("_dk"),
                                   F.lit(unknown_id)).cast("int"))
            .withColumn("_dim_resolved", F.col("_dk").isNotNull())
            .drop("_nk", "_dk"))


def backfill_late_dims(facts: DataFrame, dim: DataFrame,
                       natural_key: str, dim_key: str,
                       unknown_id: int = 1) -> DataFrame:
    """The second half of the late-arriving flow: once the dimension
    feed catches up, re-resolve ONLY the fact rows parked on the unknown
    member. Resolved rows pass through untouched (no join at all on that
    leg); the unknown-member slice re-joins the refreshed dim and flips
    `_dim_resolved` where a real key now exists. Repeated backfills are
    idempotent — a row leaves the unknown slice exactly when its dim row
    lands."""
    from etl_online_retail_spark.operators.joins import (
        size_guarded_broadcast,
    )

    parked = facts.filter(F.col(dim_key) == unknown_id)
    settled = facts.filter(F.col(dim_key) != unknown_id)
    lookup = dim.select(F.col(natural_key).alias("_nk"),
                        F.col(dim_key).alias("_dk"))
    refreshed = (parked.drop(dim_key, "_dim_resolved")
                 .join(size_guarded_broadcast(lookup),
                       parked[natural_key] == F.col("_nk"), "left")
                 .withColumn(dim_key,
                             F.coalesce(F.col("_dk"),
                                        F.lit(unknown_id)).cast("int"))
                 .withColumn("_dim_resolved", F.col("_dk").isNotNull())
                 .drop("_nk", "_dk"))
    return settled.unionByName(refreshed.select(settled.columns))
