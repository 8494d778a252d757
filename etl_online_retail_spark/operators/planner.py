"""Statistics-driven join planning: the sketch family closing into the
physical-strategy choice.

Spark's own planner chooses broadcast vs shuffle from static size
estimates, and AQE refines skew handling at runtime — but both act on
whatever statistics exist. This module is the INGEST-TIME complement: a
warehouse that maintains KB-sized key sketches per table (count-min
counters + the plan-size estimate) can pick the right strategy for an
equi-join BEFORE either relation moves, including the case AQE cannot
see up front (a key so hot the shuffle itself is the mistake — the
salted-join decision).

Decision ladder for a JOIN b ON key:

  1. either side's static plan-size estimate fits the broadcast bound
     -> BROADCAST (hint the smaller side; the fact never shuffles);
  2. else estimate the probe side's hottest-key share from its count-min
     sketch: top bucket count / total rows (the CMS overestimates, so a
     verdict of "not skewed" is trustworthy; "skewed" errs safe);
     share > skew_threshold -> SALTED (split the hot key across
     salt_buckets reducers, replicate the build side);
  3. else plain SHUFFLE join (sort-merge / AQE's choice).

The sketch pass costs one map-side-combinable aggregation per side —
the statistics collection a warehouse amortizes at load time, not a
per-query cost. All decisions return the REASONING as a record so the
choice is auditable (and testable) rather than silent.

Reference parity: the reference's Postgres picks join strategies from
ANALYZE statistics (pg_statistic); this is the engine-side analogue
built from the repo's own portable sketches.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_online_retail_spark.operators import sketches
from etl_online_retail_spark.operators.joins import (
    BROADCAST_MAX_BYTES,
    _plan_size_bytes,
)

DEFAULT_SKEW_SHARE = 0.20   # one key holding >20% of the probe side
DEFAULT_SALT_BUCKETS = 8


@dataclass(frozen=True)
class JoinDecision:
    strategy: str             # "broadcast" | "salted" | "shuffle"
    build_side: str | None    # "left" | "right" for broadcast, else None
    left_bytes: int | None    # static plan-size estimates
    right_bytes: int | None
    top_key_share: float | None  # CMS-estimated hottest-key share (probe)
    reason: str


_INTEGRAL_TYPES = {"tinyint", "smallint", "int", "integer", "bigint",
                   "long", "short", "byte", "date", "boolean"}


def _top_share(df: DataFrame, key: str) -> float:
    """CMS-estimated share of the probe side held by its hottest key:
    max single-bucket count in the shallowest hash row, over total rows.
    Collision-inflated (CMS only overestimates), so the share is an
    UPPER bound — a clean verdict is definitive, a skew verdict is
    conservative. Cost: one map-combinable agg to a KB relation.

    The CMS integer fast-path (`numeric_keys=True`) casts the key to
    BIGINT — under ANSI mode that cast THROWS for non-numeric keys
    (CAST_INVALID_INPUT), so it is taken only when the key's declared
    type is integral; everything else (strings, decimals, timestamps)
    routes through the portable string fold, stringified first so
    poly_hash's char-fold sees a deterministic rendering."""
    dtype = dict(df.dtypes).get(key, "string")
    numeric = dtype in _INTEGRAL_TYPES
    key_col = F.col(key) if numeric else F.col(key).cast("string")
    keyed = df.select(key_col.alias("term"))
    sk = sketches.cms_sketch(keyed, "term", numeric_keys=numeric)
    row = (sk.groupBy("j")
           .agg(F.max("cnt").alias("_mx"), F.sum("cnt").alias("_tot"))
           .agg(F.min(F.col("_mx").cast("double")
                      / F.col("_tot").cast("double")).alias("share"))
           .collect()[0])
    return float(row.share) if row.share is not None else 0.0


def plan_equi_join(left: DataFrame, right: DataFrame,
                   left_key: str, right_key: str,
                   how: str = "inner",
                   broadcast_max_bytes: int = BROADCAST_MAX_BYTES,
                   skew_share: float = DEFAULT_SKEW_SHARE,
                   salt_buckets: int = DEFAULT_SALT_BUCKETS,
                   ) -> tuple[DataFrame, JoinDecision]:
    """Choose and build the join; returns (joined, decision). The joined
    relation is semantically identical under every strategy (the salted
    plan is result-identical by construction — the salted_revenue
    oracle's hash-verified claim), only the physical shape differs."""
    lb = _plan_size_bytes(left)
    rb = _plan_size_bytes(right)
    cond = left[left_key] == right[right_key]

    small_right = rb is not None and rb <= broadcast_max_bytes
    small_left = lb is not None and lb <= broadcast_max_bytes
    if small_right or small_left:
        # explicit None check: a genuine 0-byte estimate is falsy and
        # `lb or rb` would compare rb against itself, flipping the
        # build-side choice for empty relations
        if small_right and (not small_left
                            or rb <= (rb if lb is None else lb)):
            build, built = "right", F.broadcast(right)
            joined = left.join(built, cond, how)
        else:
            build, built = "left", F.broadcast(left)
            joined = built.join(right, cond, how)
        dec = JoinDecision("broadcast", build, lb, rb, None,
                           f"{build} side fits {broadcast_max_bytes}B")
        return joined, dec

    # both sides big: consult the key sketch on the (bigger) probe side
    probe_is_left = (lb or 0) >= (rb or 0)
    probe, probe_key = ((left, left_key) if probe_is_left
                        else (right, right_key))
    share = _top_share(probe, probe_key)
    # salting replicates the build side, so an OUTER join whose
    # preserved side is the replicated one would emit salt_buckets
    # null-extended copies of every unmatched row — salt only inner
    # joins; outer joins under skew are AQE's skew-split territory
    if share > skew_share and how == "inner":
        # salted_join's shape with per-side key names: the probe side
        # gets a per-row salt, the build side explodes into
        # salt_buckets replicas, the shuffle key becomes (key, salt) —
        # output columns equal the plain join's (both keys kept).
        # The salt is a per-ROW position, not a content hash: hot keys
        # are hot precisely because many rows share the same values, so
        # a row-content hash would send every duplicate to one bucket
        # (no split) and throws on unhashable column types (map). The
        # monotonic id differs per row regardless of content; the join
        # RESULT is salt-invariant, so its non-determinism across runs
        # is physical only.
        salt = F.pmod(F.monotonically_increasing_id(),
                      F.lit(salt_buckets))
        replicas = F.explode(
            F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
        if probe_is_left:
            sl = left.withColumn("_salt_l", salt)
            sr = right.withColumn("_salt_r", replicas)
        else:
            sl = left.withColumn("_salt_l", replicas)
            sr = right.withColumn("_salt_r", salt)
        joined = (sl.join(sr, (sl[left_key] == sr[right_key])
                          & (sl["_salt_l"] == sr["_salt_r"]), how)
                  .drop("_salt_l", "_salt_r"))
        dec = JoinDecision("salted", None, lb, rb, share,
                           f"top key holds ~{share:.0%} of the probe "
                           f"side (> {skew_share:.0%})")
        return joined, dec

    reason = ("both sides past the broadcast bound, no dominant key — "
              "AQE's shuffle join"
              if share <= skew_share else
              f"top key holds ~{share:.0%} but {how!r} join cannot be "
              f"salted (replicated unmatched rows) — AQE skew-split")
    dec = JoinDecision("shuffle", None, lb, rb, share, reason)
    return left.join(right, cond, how), dec
