"""Table profiling: per-column statistics in ONE scan.

The data-quality entry point (the Deequ/Great-Expectations "profiler"
shape): before constraints can be asserted (operators/constraints.py
validates; this one DESCRIBES), a pipeline needs null counts, distinct
cardinalities, and value ranges per column. The naive form runs one
aggregation per column (C scans of a 100 TB table); this operator builds
every column's aggregates into a SINGLE groupBy().agg(...) pass — one
scan, map-side combinable — then unpivots the 1-row result into one row
per column with an explode over a struct array (driver-sized, free).

Cross-engine canonical forms (so the profile is oracle-verifiable):
  * numeric range as DOUBLE (bigint keys < 2^53 are exact);
  * timestamps as epoch SECONDS (micros exceed double's exact range);
  * string range as raw min/max (binary collation on both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)
_TS = (T.TimestampType, T.TimestampNTZType, T.DateType)


def profile_table(df: DataFrame, cols: list[str] | None = None,
                  approx: bool = False) -> DataFrame:
    """One row of statistics per column:
    (col_name, n_rows, n_null, n_distinct, numeric_min, numeric_max,
    str_min, str_max) — the numeric pair is NULL for string columns and
    vice versa; n_distinct counts non-null values (COUNT DISTINCT
    semantics on both engines).

    approx=True swaps the exact distinct counts for
    approx_count_distinct (HLL): exact multi-column COUNT DISTINCT makes
    Spark Expand every row once per distinct-aggregated column (C-fold
    row amplification before the partial agg — see EXPLAIN.md); the HLL
    form keeps the scan 1x at ~2% cardinality error, which is what a
    100 TB profile wants. Exact stays the default because it is the
    oracle-verifiable form.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    names = cols if cols is not None else list(fields)

    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in names:
        t = fields[c]
        col = F.col(c)
        aggs.append(F.sum(F.when(col.isNull(), 1).otherwise(0))
                    .cast("bigint").alias(f"_nn_{c}"))
        nd = (F.approx_count_distinct(col) if approx
              else F.count_distinct(col))
        aggs.append(nd.alias(f"_nd_{c}"))
        if isinstance(t, _TS):
            # FLOOR of epoch seconds in exact int64 (us - pmod(us, 1e6))
            # — timestampdiff(SECOND) truncates toward zero, which
            # disagrees with the oracle's FLOOR for pre-1970 stamps with
            # fractional seconds; pmod keeps the arithmetic exact where
            # a double division of raw micros (> 2^53) would not be
            us = F.expr(
                f"timestampdiff(MICROSECOND, "
                f"TIMESTAMP_NTZ '1970-01-01 00:00:00',"
                f" CAST({c} AS TIMESTAMP_NTZ))")
            sec = ((us - F.pmod(us, F.lit(1_000_000)))
                   / F.lit(1_000_000)).cast("double")
            aggs.append(F.min(sec).alias(f"_lo_{c}"))
            aggs.append(F.max(sec).alias(f"_hi_{c}"))
        elif isinstance(t, _NUMERIC):
            aggs.append(F.min(col.cast("double")).alias(f"_lo_{c}"))
            aggs.append(F.max(col.cast("double")).alias(f"_hi_{c}"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"_lo_{c}"))
            aggs.append(F.lit(None).cast("double").alias(f"_hi_{c}"))
        if isinstance(t, T.StringType):
            aggs.append(F.min(col).alias(f"_smin_{c}"))
            aggs.append(F.max(col).alias(f"_smax_{c}"))
            aggs.append(F.min(F.length(col)).cast("bigint")
                        .alias(f"_lmin_{c}"))
            aggs.append(F.max(F.length(col)).cast("bigint")
                        .alias(f"_lmax_{c}"))
        else:
            aggs.append(F.lit(None).cast("string").alias(f"_smin_{c}"))
            aggs.append(F.lit(None).cast("string").alias(f"_smax_{c}"))
            aggs.append(F.lit(None).cast("bigint").alias(f"_lmin_{c}"))
            aggs.append(F.lit(None).cast("bigint").alias(f"_lmax_{c}"))

    one = df.agg(*aggs)
    rows = F.array(*[
        F.struct(F.lit(c).alias("col_name"),
                 F.col("_n").alias("n_rows"),
                 F.col(f"_nn_{c}").alias("n_null"),
                 F.col(f"_nd_{c}").alias("n_distinct"),
                 F.col(f"_lo_{c}").alias("numeric_min"),
                 F.col(f"_hi_{c}").alias("numeric_max"),
                 F.col(f"_smin_{c}").alias("str_min"),
                 F.col(f"_smax_{c}").alias("str_max"),
                 F.col(f"_lmin_{c}").alias("str_len_min"),
                 F.col(f"_lmax_{c}").alias("str_len_max"))
        for c in names])
    return (one.select(F.explode(rows).alias("_s"))
            .select("_s.col_name", "_s.n_rows", "_s.n_null", "_s.n_distinct",
                    "_s.numeric_min", "_s.numeric_max",
                    "_s.str_min", "_s.str_max",
                    "_s.str_len_min", "_s.str_len_max"))


def profile_oracle_sql(table: str, cols: list[tuple[str, str]]) -> str:
    """DuckDB twin: UNION ALL of per-column aggregate rows. `cols` is
    (name, kind) with kind in {'numeric', 'ts', 'string'} — the oracle
    states the SEMANTICS per column; the one-scan unpivot plan is what
    the hash comparison then verifies.
    """
    parts = []
    for name, kind in cols:
        if kind == "ts":
            # FLOOR: duckdb epoch() keeps fractional seconds; the Spark
            # side truncates (timestampdiff SECOND). floor is monotone,
            # so min/max commute with it.
            lo = f"CAST(FLOOR(epoch(MIN({name}))) AS DOUBLE)"
            hi = f"CAST(FLOOR(epoch(MAX({name}))) AS DOUBLE)"
            smin, smax = "NULL", "NULL"
            lmin, lmax = "NULL", "NULL"
        elif kind == "numeric":
            lo = f"CAST(MIN({name}) AS DOUBLE)"
            hi = f"CAST(MAX({name}) AS DOUBLE)"
            smin, smax = "NULL", "NULL"
            lmin, lmax = "NULL", "NULL"
        else:
            lo, hi = "NULL", "NULL"
            smin, smax = f"MIN({name})", f"MAX({name})"
            lmin = f"MIN(LENGTH({name}))"
            lmax = f"MAX(LENGTH({name}))"
        parts.append(
            f"SELECT '{name}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows, "
            f"CAST(SUM(CASE WHEN {name} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS n_null, "
            f"CAST(COUNT(DISTINCT {name}) AS BIGINT) AS n_distinct, "
            f"CAST({lo} AS DOUBLE) AS numeric_min, "
            f"CAST({hi} AS DOUBLE) AS numeric_max, "
            f"CAST({smin} AS VARCHAR) AS str_min, "
            f"CAST({smax} AS VARCHAR) AS str_max, "
            f"CAST({lmin} AS BIGINT) AS str_len_min, "
            f"CAST({lmax} AS BIGINT) AS str_len_max FROM {table}")
    return " UNION ALL ".join(parts)


def key_skew_stats(df: DataFrame, key_col: str) -> DataFrame:
    """Join/aggregation skew diagnostic for a key column, one output row:
    (n_rows, n_keys, max_key_rows, p50_key_rows, p99_key_rows,
    top_share, gini) — the numbers that decide whether a key needs
    salting (operators/joins.salted_join), AQE skew splitting, or
    nothing. Gini 0 = perfectly uniform keys; near 1 = one hot key.

    Scale shape — this is where the naive form dies at 100 TB: ranking
    every key by its group size is a GLOBAL sort over the key relation
    (billions of rows, one reducer under a partition-less window).
    Instead the key sizes collapse to their HISTOGRAM
    (size -> number of keys with that size; hundreds of distinct sizes
    whatever the key cardinality), and rank-based statistics come out in
    closed form per histogram block: keys sharing a size occupy a
    contiguous rank range, so the Gini rank sum is an arithmetic series
    per block, and percentiles are cumulative-count lookups. Two
    map-side-combinable aggs + a window over the TINY histogram. All
    arithmetic int64-exact until two final double divisions (6dp).
    """
    from pyspark.sql import Window

    sizes = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("_c"))
    hist = sizes.groupBy("_c").agg(F.count(F.lit(1)).alias("_k"))

    w = (Window.orderBy("_c")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = (hist
           .withColumn("_cum_keys", F.sum("_k").over(w))
           .withColumn("_a", F.col("_cum_keys") - F.col("_k") + 1))
    tot = cum.agg(
        F.sum(F.col("_c") * F.col("_k")).cast("bigint").alias("_n_rows"),
        F.sum("_k").cast("bigint").alias("_n_keys"),
        F.max("_c").cast("bigint").alias("_max"))
    joined = cum.crossJoin(F.broadcast(tot))
    # per-block Gini rank sum: s*k*(2a + k - n_keys - 2), exact int64
    blk = (F.col("_c") * F.col("_k")
           * (2 * F.col("_a") + F.col("_k") - F.col("_n_keys") - 2))
    # percentile lookups: smallest size with cum_keys >= ceil(q * n_keys)
    def pct(q: float):
        return F.min(F.when(
            F.col("_cum_keys") >= F.ceil(F.lit(q) * F.col("_n_keys")),
            F.col("_c")))
    return (joined.groupBy("_n_rows", "_n_keys", "_max")
            .agg(F.sum(blk).alias("_g"),
                 pct(0.5).cast("bigint").alias("p50_key_rows"),
                 pct(0.99).cast("bigint").alias("p99_key_rows"))
            .select(F.col("_n_rows").alias("n_rows"),
                    F.col("_n_keys").alias("n_keys"),
                    F.col("_max").alias("max_key_rows"),
                    "p50_key_rows", "p99_key_rows",
                    F.round(F.col("_max").cast("double")
                            / F.col("_n_rows").cast("double"), 6)
                     .alias("top_share"),
                    F.round(F.col("_g").cast("double")
                            / (F.col("_n_keys").cast("double")
                               * F.col("_n_rows").cast("double")), 6)
                     .alias("gini")))


LOW_CARDINALITY_MAX = 20


def suggest_constraints(profile: DataFrame) -> DataFrame:
    """Deequ-style constraint SUGGESTION: turn a profile relation
    (profile_table output) into candidate data-quality rules —
    (col_name, rule, detail) — with NO extra scan of the data; the rules
    are a pure projection over the already-computed statistics:

      complete        n_null = 0            -> assert NOT NULL on loads
      unique          every non-null value distinct (and none null)
                                            -> primary-key candidate
      non_negative    numeric_min >= 0      -> positivity check
      fixed_width     all string lengths equal -> CHAR(n) semantics
                      (detail = the width)  — the reference's CHAR(5)
                      key columns surface exactly this way
      low_cardinality n_distinct <= 20      -> enum/IS IN check
                      (detail = n_distinct)

    The suggest->validate loop closes with operators/constraints.py: a
    suggested 'complete' becomes not_null_violations on the next load,
    'fixed_width' becomes fixed_width_violations, 'unique' becomes
    unique_key_violations.
    """
    cands = F.array(
        F.when(F.col("n_null") == 0,
               F.struct(F.lit("complete").alias("rule"),
                        F.lit("").alias("detail"))),
        F.when((F.col("n_null") == 0)
               & (F.col("n_distinct") == F.col("n_rows"))
               & (F.col("n_rows") > 0),
               F.struct(F.lit("unique").alias("rule"),
                        F.lit("").alias("detail"))),
        F.when(F.col("numeric_min") >= 0,
               F.struct(F.lit("non_negative").alias("rule"),
                        F.lit("").alias("detail"))),
        F.when(F.col("str_len_min") == F.col("str_len_max"),
               F.struct(F.lit("fixed_width").alias("rule"),
                        F.col("str_len_min").cast("string").alias("detail"))),
        F.when(F.col("n_distinct") <= LOW_CARDINALITY_MAX,
               F.struct(F.lit("low_cardinality").alias("rule"),
                        F.col("n_distinct").cast("string").alias("detail"))),
    )
    return (profile
            .select("col_name",
                    F.explode(F.filter(cands, lambda s: s.isNotNull()))
                     .alias("_r"))
            .select("col_name", "_r.rule", "_r.detail"))


def psi_by_group(rel: DataFrame, group_col: str,
                 bucket_col: str) -> DataFrame:
    """Population Stability Index of each group's bucket distribution
    against the corpus-wide distribution — the standard drift score a
    feature-monitoring pipeline computes per slice/day/source:

        PSI(g) = sum_b (p_gb - q_b) * ln(p_gb / q_b)

    with add-one (Laplace) smoothing over the observed bucket vocabulary
    on BOTH sides, so empty buckets contribute finite, deterministic
    mass instead of infinities: p_gb = (c_gb + 1) / (n_g + B),
    q_b = (c_b + 1) / (n + B), B = number of distinct observed buckets.
    Rule of thumb read-out: < 0.1 stable, 0.1-0.25 drifting, > 0.25
    shifted.

    rel: one row per item with (group_col, bucket_col) — bucketing is the
    caller's closed-form expression (e.g. a capped integer division of a
    length), keeping the operator engine-agnostic and oracle-exact.

    Exactness: counts are exact integers; each bucket's float
    contribution is rounded to 9dp and summed as DECIMAL(18,9) (the BM25
    discipline — order-independent), the total rounds to 6dp.

    Scale shape: two hash aggs ((group, bucket) and bucket) + a
    broadcast of the bucket marginals (B rows) and scalars; the groups x
    buckets contribution relation is tiny. One shuffle over the input.
    """
    counts = (rel.groupBy(group_col, bucket_col)
              .agg(F.count(F.lit(1)).alias("cnt")))
    return psi_from_counts(counts, group_col, bucket_col)


def psi_from_counts(counts: DataFrame, group_col: str,
                    bucket_col: str) -> DataFrame:
    """psi_by_group over an already-aggregated (group, bucket, cnt)
    relation. Split out because bucket counts are a MONOID: per-shard or
    per-micro-batch count partials merge exactly (sum), so the streaming
    drift monitor (streaming/ingest.incremental_psi) reaches bit-equality
    with the batch score by merging its partials through this same
    function."""
    gb = counts.select(F.col(group_col), F.col(bucket_col),
                       F.col("cnt").alias("_cgb"))
    # every (group, bucket) pair over the OBSERVED bucket vocabulary —
    # absent pairs must contribute their smoothed mass, so build the
    # full cross of group totals x bucket marginals (groups*B rows, tiny)
    gtot = gb.groupBy(group_col).agg(F.sum("_cgb").alias("_ng"))
    btot = gb.groupBy(bucket_col).agg(F.sum("_cgb").alias("_cb"))
    scal = gb.agg(F.sum("_cgb").alias("_n"))
    nb = btot.agg(F.count(F.lit(1)).alias("_b"))
    full = (gtot.crossJoin(F.broadcast(btot))
            .join(gb, [group_col, bucket_col], "left")
            .crossJoin(F.broadcast(scal))
            .crossJoin(F.broadcast(nb))
            .withColumn("_cgb", F.coalesce(F.col("_cgb"), F.lit(0))))
    p = ((F.col("_cgb") + 1).cast("double")
         / (F.col("_ng") + F.col("_b")).cast("double"))
    q = ((F.col("_cb") + 1).cast("double")
         / (F.col("_n") + F.col("_b")).cast("double"))
    contrib = F.round((p - q) * F.log(p / q), 9).cast("decimal(18,9)")
    return (full
            .select(F.col(group_col), F.col("_ng"), contrib.alias("_c"))
            .groupBy(group_col, "_ng")
            .agg(F.round(F.sum("_c").cast("double"), 6).alias("psi"))
            .select(F.col(group_col), F.col("_ng").alias("n_rows"), "psi"))


def observed_load(df: DataFrame, cols: list[str] | None = None):
    """Attach single-pass load metrics to a DataFrame: row count plus
    per-column null counts, collected DURING whatever action the caller
    runs next (a write, a count) via Spark's Observation API — the
    metrics-while-writing pattern (Deequ's "analyzers on the ingestion
    pass"), with NO second scan of the input.

    Returns (df', fetch) where df' must be used for the action and
    fetch() — called AFTER the action completes — returns
    {"n_rows": ..., "null_<col>": ...}. The profile_table operator is
    the ad-hoc full profile; this is the always-on cheap subset a
    production load wires into every write.
    """
    from pyspark.sql import Observation

    cols = cols if cols is not None else df.columns
    obs = Observation("load_metrics")
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    metrics += [
        F.count(F.when(F.col(c).isNull(), 1)).alias(f"null_{c}")
        for c in cols
    ]
    out = df.observe(obs, *metrics)

    def fetch() -> dict:
        return dict(obs.get)

    return out, fetch


def pearson_exact(df: DataFrame, x_col: str, y_col: str,
                  group_col: str | None = None) -> DataFrame:
    """Pearson correlation over INTEGER-valued columns via the
    exact-sum identity:

        r = (n*Sxy - Sx*Sy)
            / (sqrt(n*Sxx - Sx^2) * sqrt(n*Syy - Sy^2))

    The five sums are exact BIGINTs out of ONE hash aggregation (map-
    side combinable — the whole statistic is one scan however wide the
    table); the tail is a short fixed IEEE chain (division, multiply,
    correctly-rounded sqrt), bit-exact cross-engine when mirrored.
    Note |r| may pass 1.0 by an ulp on perfectly-collinear data:
    sqrt(vx) * sqrt(vy) is two roundings of sqrt(vx * vy).
    r is NULL when either variance is zero (constant column) or n < 2.
    NULL x or y drops the ROW (both columns must be observed — pairwise
    deletion, the standard for correlation).

    Integer-exactness is the caller's contract: pass integer-valued
    columns (counts, lengths, scores, fixed-point encodings). Headroom:
    n * Sxy and Sx * Sy must fit int64 — and that is ENFORCED, not just
    documented (r13 advice): the aggregation also tracks max|x| and
    max|y| per group, and when n^2 * max|x| * max|y| (the upper bound
    on every int64 product the identity forms) could exceed 2^63-1 the
    group RAISES instead of returning a silently-wrapped r. The guard
    is evaluated on the already-aggregated group row (one comparison in
    DOUBLE with margin), so it costs two extra map-combinable maxes.

    The audit this was built for: reward-model LENGTH BIAS — correlate
    candidate score with response length over best-of-n pools; r > 0
    means the judge pays for verbosity (the classic RLHF failure).

    Output: (group?, n, sx, sy, sxy, sxx, syy, r)."""
    g = F.col(group_col) if group_col else F.lit(0)
    x, y = F.col(x_col).cast("long"), F.col(y_col).cast("long")
    base = (df.filter(F.col(x_col).isNotNull()
                      & F.col(y_col).isNotNull())
            .select(g.alias("_pg"), x.alias("_x"), y.alias("_y")))
    agg = base.groupBy("_pg").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("sx"), F.sum("_y").alias("sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("syy"),
        F.max(F.abs(F.col("_x"))).alias("_mx"),
        F.max(F.abs(F.col("_y"))).alias("_my"))
    n = F.col("n")
    # overflow guard: |Sab| <= n*max|a|*max|b|, so n^2*max|a|*max|b| is
    # an upper bound on |n*Sxy|, |Sx*Sy|, |n*Sxx|, |Sx^2| (with a<-b as
    # needed); compared in DOUBLE against 2^63-1 scaled by a 2-ulp margin
    nd = n.cast("double")
    mm = F.greatest(F.col("_mx"), F.col("_my")).cast("double")
    headroom = F.lit(float(2 ** 63 - 1) * (1.0 - 1e-9))
    ok = (nd * nd * mm * mm) <= headroom
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    out = (agg.withColumn(
        "r",
        F.when(~ok, F.raise_error(F.concat(
            F.lit("pearson_exact: n^2 * max|x| * max|y| exceeds int64 "
                  "headroom (n="), n.cast("string"),
            F.lit(", max|x|="), F.col("_mx").cast("string"),
            F.lit(", max|y|="), F.col("_my").cast("string"),
            F.lit(") — the exact-sum identity would silently wrap; "
                  "rescale the inputs"))).cast("double"))
         .otherwise(
            F.when((n >= 2) & (vx > 0) & (vy > 0),
                   (n * F.col("sxy") - F.col("sx") * F.col("sy"))
                   .cast("double")
                   / (F.sqrt(vx.cast("double"))
                      * F.sqrt(vy.cast("double"))))))
        .drop("_mx", "_my"))
    if group_col:
        return out.withColumnRenamed("_pg", group_col)
    return out.drop("_pg")


def pearson_exact_sql(n: str = "n", sx: str = "sx", sy: str = "sy",
                      sxy: str = "sxy", sxx: str = "sxx",
                      syy: str = "syy") -> str:
    """The r SQL twin over already-aggregated exact sums — the SAME
    guard and IEEE tree as pearson_exact."""
    vx = f"({n} * {sxx} - {sx} * {sx})"
    vy = f"({n} * {syy} - {sy} * {sy})"
    return (f"CASE WHEN {n} >= 2 AND {vx} > 0 AND {vy} > 0 THEN "
            f"CAST({n} * {sxy} - {sx} * {sy} AS DOUBLE)"
            f" / (SQRT(CAST({vx} AS DOUBLE)) * SQRT(CAST({vy} AS DOUBLE)))"
            f" END")
