"""Deterministic corpus sampling (training-data curation building blocks).

Random sampling is useless for a reproducible data pipeline: reruns must
select the SAME rows, across engines and cluster layouts. Every sampler
here derives its keep/drop decision from a portable affine hash of the
row id (functions/hashing — identical arithmetic on Spark and DuckDB), so
samples are reproducible, join-stable (the same id always lands the same
way), and oracle-verifiable. This is how production pretraining pipelines
do it (hash-mod sharding), not rand().

Scale notes: stratified_sample is a pure filter (no shuffle — predicate
pushdown applies); uniform_sample_topk is a global top-k (one reduce).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_online_retail_spark.functions.hashing import (
    PRIME,
    affine,
    affine_sql,
    hash_family,
)

# one fixed affine map for id -> bucket; resolution = bucket granularity
SAMPLE_SEED = 7
SAMPLE_RESOLUTION = 10_000
_A, _B = hash_family(1, SAMPLE_SEED)[0]


def _bucket(id_col: Column) -> Column:
    """Deterministic bucket in [0, SAMPLE_RESOLUTION) from a BIGINT id.

    The id is reduced into [0, PRIME) BEFORE the affine map: hashing.py's
    no-overflow guarantee (a*h + b < 2^63) only holds for h < PRIME, and
    raw ids at 100 TB exceed that (any id >= ~9.2e9 would overflow int64 —
    DuckDB raises, Spark ANSI raises). pmod-first is value-preserving for
    id < PRIME (modular arithmetic), so small-SF samples are unchanged.
    """
    h = F.pmod(id_col.cast("bigint"), F.lit(PRIME))
    return F.pmod(affine(h, _A, _B), F.lit(SAMPLE_RESOLUTION))


def _hval(id_col: Column) -> Column:
    """Full-resolution deterministic ORDER key in [0, PRIME) — the
    affine value BEFORE the bucket reduction. Ordering claims (uniform
    top-k, reservoir semantics, walk order) must use this, not _bucket:
    10,000 bucket values leave massive tie groups broken by raw id, so
    a "uniform" sample of k << n/10000 rows degenerates to the lowest
    ids of one bucket (r7 review). _bucket remains the RATE-cutoff
    domain (fraction realization needs the coarse resolution)."""
    h = F.pmod(id_col.cast("bigint"), F.lit(PRIME))
    return affine(h, _A, _B)


def hval_sql(expr: str) -> str:
    """DuckDB twin of _hval (inlined family constants)."""
    h = f"((({expr})::BIGINT % {PRIME} + {PRIME}) % {PRIME})"
    return f"({affine_sql(h, _A, _B)})"


def bucket_sql(expr: str) -> str:
    """DuckDB twin of _bucket (inlined family constants)."""
    h = f"((({expr})::BIGINT % {PRIME} + {PRIME}) % {PRIME})"
    return (f"(({affine_sql(h, _A, _B)}) % "
            f"{SAMPLE_RESOLUTION} + {SAMPLE_RESOLUTION}) % "
            f"{SAMPLE_RESOLUTION}")


def stratified_sample(df: DataFrame, stratum_col: str, id_col: str,
                      fractions: dict[str, float],
                      default_fraction: float = 0.0) -> DataFrame:
    """Keep a per-stratum deterministic fraction of rows.

    A row survives iff bucket(id) < round(fraction * RESOLUTION) for its
    stratum — so the realized fraction is exact to 1/RESOLUTION in
    expectation, the SAME rows survive on every run/engine, and enlarging
    a stratum's fraction strictly grows its sample (nested samples — the
    property curriculum/ablation reruns need).
    """
    cut = F.lit(int(round(default_fraction * SAMPLE_RESOLUTION)))
    for stratum, frac in sorted(fractions.items()):
        cut = F.when(F.col(stratum_col) == stratum,
                     int(round(frac * SAMPLE_RESOLUTION))).otherwise(cut)
    return df.filter(_bucket(F.col(id_col)) < cut)


def stratified_sample_cut_sql(stratum_expr: str,
                              fractions: dict[str, float],
                              default_fraction: float = 0.0) -> str:
    """DuckDB twin of the per-stratum cutoff expression."""
    whens = " ".join(
        f"WHEN {stratum_expr} = '{s}' "
        f"THEN {int(round(f * SAMPLE_RESOLUTION))}"
        for s, f in sorted(fractions.items()))
    return (f"CASE {whens} "
            f"ELSE {int(round(default_fraction * SAMPLE_RESOLUTION))} END")


def uniform_sample_topk(df: DataFrame, id_col: str, k: int) -> DataFrame:
    """Uniform sample WITHOUT replacement of exactly k rows (reservoir-
    sampling semantics, deterministically): the k smallest affine-hash
    values over the id space. One global top-k reduce — no shuffle of the
    full table, no rand(), reproducible across engines and reruns.
    (Plans as TakeOrderedAndProject: per-partition heaps + driver merge.)"""
    return (df
            .withColumn("_hv", _hval(F.col(id_col)))
            .orderBy(F.asc("_hv"), F.asc(id_col))
            .limit(k)
            .drop("_hv"))


def epoch_shuffle(df: DataFrame, id_col: str, epoch: int,
                  n_shards: int = 64) -> DataFrame:
    """Deterministic epoch-keyed global shuffle for training export:
    adds `shard` (which output shard the row lands in) and `pos`
    (its position within the shard). Different epochs permute rows
    differently (the affine family is keyed by the epoch), the same epoch
    reproduces the identical layout on any cluster/run — the property a
    resumable pretraining run needs from its data order.

    Scale shape: NO global ordering is ever materialized — shard
    assignment is a pure row expression and `pos` is a row_number window
    PARTITIONED by shard (shard count is chosen by the caller to bound
    shard size), so the whole thing is one shuffle on the shard key. A
    writer then emits one file per shard sorted by pos.
    """
    # TWO independent family members: shard and within-shard key from
    # the SAME affine value pinned key mod gcd(n_shards, RESOLUTION) per
    # shard (~625 effective key values -> huge id-ordered tie runs,
    # identical across epochs — r7 review); the key is also kept at
    # FULL resolution so tie groups vanish
    (a0, b0), (a1, b1) = hash_family(2, seed=1_000_003 + epoch)
    h = F.pmod(F.col(id_col).cast("bigint"), F.lit(PRIME))
    key = affine(h, a1, b1)
    from pyspark.sql import Window

    shard = F.pmod(affine(h, a0, b0), F.lit(n_shards)).cast("int")
    w = Window.partitionBy(shard).orderBy(key.asc(), F.col(id_col).asc())
    return (df.withColumn("shard", shard)
              .withColumn("pos", F.row_number().over(w)))


def epoch_shuffle_sql(id_expr: str, epoch: int, n_shards: int = 64) -> str:
    """DuckDB twin: (shard, pos) expressions as a SELECT-fragment pair."""
    (a0, b0), (a1, b1) = hash_family(2, seed=1_000_003 + epoch)
    h = f"((({id_expr})::BIGINT % {PRIME} + {PRIME}) % {PRIME})"
    key = f"({affine_sql(h, a1, b1)})"
    aff0 = affine_sql(h, a0, b0)
    shard = f"CAST((({aff0}) % {n_shards} + {n_shards}) % {n_shards} AS INTEGER)"
    return (f"{shard} AS shard, CAST(ROW_NUMBER() OVER ("
            f"PARTITION BY {shard} ORDER BY {key} ASC, {id_expr} ASC) "
            f"AS INTEGER) AS pos")


def ordered_prefix_sum(df: DataFrame, part_col: str, id_col: str,
                       value_col: str, n_shards: int = 16) -> DataFrame:
    """Running total over the deterministic order (hval(id), id) within
    each part: adds `cum_before` = sum of value over STRICTLY EARLIER
    rows. Exclusive semantics so a consumer can ask "had the budget been
    exhausted before this row?".

    This is a DISTRIBUTED SCAN, not one window per part. A naive
    `SUM OVER (PARTITION BY part ORDER BY ...)` sorts each part in a
    single reducer — the classic 100 TB cliff when parts are few and
    huge. Instead the ordered domain is range-split into n_shards
    CONTIGUOUS hash-value ranges (hash-ordering makes ranges uniform
    without sampling — the order key is uniform on [0, PRIME)):

      1. per-(part, shard) totals           — map-side-combinable agg;
      2. exclusive running offsets over the parts x n_shards totals
         relation (tiny — a driver-scale window);
      3. broadcast offsets back; within-(part, shard) window cumsum
         + offset — each sort touches 1/n_shards of a part.

    Exactly equal to the single-window form (integer arithmetic, same
    total order) — asserted in tests across shard counts.
    """
    from pyspark.sql import Window

    # full-resolution walk order (r7 review: 10k-bucket order leaves
    # id-ordered tie runs); hval is uniform on [0, PRIME) so contiguous
    # hval ranges still split the order evenly. hval * n_shards < 2^35
    # — exact in the double division.
    hv = _hval(F.col(id_col))
    shard = F.floor(hv * n_shards / F.lit(PRIME)).cast("int")
    base = df.withColumn("_b", hv).withColumn("_sh", shard)
    totals = base.groupBy(part_col, "_sh").agg(
        F.sum(F.col(value_col)).alias("_tot"))
    w_off = (Window.partitionBy(part_col).orderBy("_sh")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = totals.select(
        part_col, "_sh",
        F.coalesce(F.sum("_tot").over(w_off), F.lit(0)).alias("_off"))
    w_in = (Window.partitionBy(part_col, "_sh")
            .orderBy(F.asc("_b"), F.asc(id_col))
            .rowsBetween(Window.unboundedPreceding, -1))
    return (base
            .join(F.broadcast(offsets), [part_col, "_sh"])
            .withColumn(
                "cum_before",
                (F.coalesce(F.sum(F.col(value_col)).over(w_in), F.lit(0))
                 + F.col("_off")).cast("bigint"))
            .drop("_b", "_sh", "_off"))


def token_budget_mix(df: DataFrame, part_col: str, id_col: str,
                     value_col: str, budgets: dict[str, int],
                     default_budget: int,
                     n_shards: int = 16) -> DataFrame:
    """Deterministic training-mix builder: fill each part's (source's,
    domain's) TOKEN budget by walking rows in the hash order (hval(id),
    id) and keeping a row iff the tokens consumed strictly before it are
    under the part's budget — so the kept set overshoots by at most one
    document, is identical on every run/engine/layout, and GROWS
    monotonically with the budget (nested mixes, the ablation property).

    The walk is ordered_prefix_sum — a two-phase distributed scan, so
    per-part cost is sharded rather than single-reducer. `cum_before`
    stays in the output for auditability (and oracle verification).
    """
    cum = ordered_prefix_sum(df, part_col, id_col, value_col,
                             n_shards=n_shards)
    budget = F.lit(default_budget).cast("bigint")
    for part, b in sorted(budgets.items()):
        budget = F.when(F.col(part_col) == part,
                        F.lit(b).cast("bigint")).otherwise(budget)
    return cum.filter(F.col("cum_before") < budget)


def temperature_rates(df: DataFrame, part_col: str, budget_docs: int,
                      alpha: float = 0.5) -> DataFrame:
    """Per-source sampling rates for TEMPERATURE-BASED data mixing (the
    XLM-R / mT5 multilingual recipe): source i is drawn with probability
    p_i ∝ n_i^alpha, flattening the natural distribution so
    low-resource sources are up-weighted without discarding the
    high-resource ones. Returns one row per source:
    (part, n_total, p_temp, cutoff) where cutoff is the integer bucket
    threshold realizing keep-rate min(1, budget_docs * p_i / n_i).

    Cross-engine exactness: alpha=0.5 (the registered default) uses
    sqrt, which IEEE-754 requires to be CORRECTLY ROUNDED — unlike
    pow(), whose libm implementations differ in the last ulp between
    JVMs and C runtimes — and the denominator folds the per-source
    sqrt values under the decimal-contribution discipline (round 9dp,
    sum DECIMAL(28,9)) so it is order-independent. Every remaining step
    is scalar IEEE arithmetic in a fixed order plus one integer floor.
    Other alphas work but carry the pow() portability caveat.

    Scale shape: one hash agg over the data (source cardinality rows),
    a 1-row broadcast for the denominator — no collect, no shuffle of
    the corpus itself.
    """
    counts = df.groupBy(part_col).agg(F.count(F.lit(1)).alias("n_total"))
    return rates_from_counts(counts, part_col, budget_docs, alpha)


def rates_from_counts(counts: DataFrame, part_col: str, budget_docs: int,
                      alpha: float = 0.5) -> DataFrame:
    """The counts -> rates arithmetic alone, over a (part, n_total)
    relation. Split out so a STREAMING count maintainer (per-batch
    source-count partials merged on read — streaming/ingest.
    incremental_source_counts) feeds the IDENTICAL computation and the
    live rates equal the batch rates bit-for-bit over the complete
    stream (counts are a monoid; everything downstream is the same
    deterministic expression tree)."""
    n = F.col("n_total").cast("double")
    if alpha == 0.5:
        raw_w = F.sqrt(n)
    else:
        raw_w = F.pow(n, F.lit(float(alpha)))
    # stats feeds BOTH the denominator aggregate and the crossJoin
    # probe side — cache it so a corpus-wide upstream agg cannot
    # execute twice (rule 7; r7 review)
    stats = counts.withColumn("_w",
                              F.round(raw_w, 9).cast("decimal(28,9)")).cache()
    denom = stats.agg(F.sum("_w").cast("double").alias("_denom"))
    p = F.col("_w").cast("double") / F.col("_denom")
    rate = F.least(F.lit(1.0),
                   (F.lit(float(budget_docs)) * F.col("p_temp")) / n)
    return (stats.crossJoin(F.broadcast(denom))
            .withColumn("p_temp", p)
            .withColumn("cutoff",
                        F.floor(rate * F.lit(SAMPLE_RESOLUTION))
                        .cast("bigint"))
            .select(part_col, "n_total", "p_temp", "cutoff"))


def temperature_mix(df: DataFrame, part_col: str, id_col: str,
                    budget_docs: int, alpha: float = 0.5) -> DataFrame:
    """Rows surviving the temperature mix: doc kept iff
    bucket(id) < its source's cutoff (see temperature_rates). The same
    deterministic nested-sample property as stratified_sample — raising
    the budget strictly grows every source's kept set."""
    rates = temperature_rates(df, part_col, budget_docs, alpha)
    return (df.join(F.broadcast(rates.select(part_col, "cutoff")), part_col)
            .filter(_bucket(F.col(id_col)) < F.col("cutoff"))
            .drop("cutoff"))


def stratified_topk_sample(df: DataFrame, stratum_col: str, id_col: str,
                           k: int) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum: the k smallest
    affine-hash values WITHIN each stratum (per-group reservoir-sampling
    semantics, deterministic). Complements stratified_sample (fractions,
    pure filter) when the contract is a fixed COUNT per class/language/
    source — eval-set carving, per-domain probes.

    Shape: one window pass partitioned by stratum — a single shuffle on
    the stratum key. Integer-only ordering (hash value, id), so the selected
    set is engine-portable and oracle-exact. At 100 TB with few, huge
    strata, pre-filter with an approximate per-stratum bucket cutoff
    (k/|stratum| quantile) before the exact rank to avoid sorting whole
    strata; with many modest strata this single pass is already right.
    """
    from pyspark.sql import Window

    w = (Window.partitionBy(stratum_col)
         .orderBy(_hval(F.col(id_col)).asc(), F.col(id_col).asc()))
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_rn"))


def systematic_weighted_sample(df: DataFrame, id_col: str,
                               weight_col: str, step: int,
                               part_col: str | None = None,
                               n_shards: int = 16) -> DataFrame:
    """Weighted sampling WITHOUT replacement or rand(): walk rows in the
    deterministic hash order, accumulate integer weights, and keep every
    row whose weight span [cum_before, cum_before + w) crosses a
    multiple of `step` — systematic resampling. Each row survives with
    probability ~ w/step (w >= step: always), the expected sample size
    is total_weight/step, and the SAME rows survive on every run,
    engine, and layout. The A-ES exponential-key scheme needs log() —
    a last-ulp portability risk; this stays in exact integer arithmetic.

    The cumulative walk is ordered_prefix_sum (two-phase distributed
    scan); `part_col=None` samples globally via a constant part.
    """
    if step <= 0:
        raise ValueError("step must be positive")
    work, part = df, part_col
    if part is None:
        part = "_all"
        work = df.withColumn(part, F.lit(0))
    cum = ordered_prefix_sum(work, part, id_col, weight_col,
                             n_shards=n_shards)

    # crossing test in PURE integer arithmetic: floor((x+w)/s) >
    # floor(x/s) <=> (x mod s) + w >= s. The previous form divided
    # bigints with `/` (IEEE doubles), lossy past 2^53 cumulative
    # weight (r7 review).
    picked = cum.filter(
        F.pmod(F.col("cum_before"), F.lit(step))
        + F.col(weight_col).cast("bigint") >= F.lit(step))
    return picked.drop(part) if part_col is None else picked
