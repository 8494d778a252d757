"""Time-series / graph / cleaning workload: the round-4 surface growth.

Hypertable-style resampling (gap-fill + LOCF, time-weighted averages),
gaps-and-islands streaks, bounded BFS over the co-purchase graph (the
recursive-CTE shape Spark lacks natively, driven as a Pregel-lite loop),
C4-style boilerplate removal, and the skew-salted join proven
result-identical to the plain join. Registered into the same registry as
workload.py; oracles follow the module's exactness rules (decimal sums,
INT casts, integer time gaps, identical aliases both sides).

Reference parity notes: the reference's event analytics stop at grouped
rollups over existing rows (etl.py's aggregations); these queries cover
the rows that DON'T exist (gap filling, streak holes) and the multi-hop
relationships its SQL layer cannot express.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_online_retail_spark.operators import graph, timeseries
from etl_online_retail_spark.operators.dedup import remove_repeated_segments
from etl_online_retail_spark.operators.joins import salted_join
from etl_online_retail_spark.workload import REV, _t, register

# shared construction parameters (Spark defaults == these)
GAPFILL_USER_MOD = 3      # gap-fill users: user_id % 3 == 0
COPURCHASE_MIN_ORDERS = 2  # co-purchase edge support threshold
COPURCHASE_SEED_MOD = 499  # seed parts: p_partkey % 499 == 0
COPURCHASE_MAX_HOPS = 4
SEGMENT_WIDTH = 10         # boilerplate segment = 10 consecutive tokens
SEGMENT_MIN_DF = 3         # C4's "appears in >= 3 documents"
SALT_BUCKETS = 8


# ---------------------------------------------------------------------------
# time series: gap-fill + LOCF (Timescale time_bucket_gapfill/locf shape)

_GAPFILL_ORACLE = f"""
WITH ev AS (
  SELECT user_id, date_trunc('hour', ts) AS bucket, ts, event_id, value
  FROM events WHERE user_id % {GAPFILL_USER_MOD} = 0),
obs AS (
  SELECT user_id, bucket, v FROM (
    SELECT user_id, bucket, value AS v,
           ROW_NUMBER() OVER (PARTITION BY user_id, bucket
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM ev) WHERE rn = 1),
bounds AS (
  SELECT user_id, MIN(bucket) AS b0, MAX(bucket) AS b1
  FROM ev GROUP BY user_id),
spine AS (
  SELECT user_id, unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket
  FROM bounds)
SELECT s.user_id, s.bucket,
       last_value(o.v IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled,
       (o.v IS NOT NULL) AS is_observed
FROM spine s LEFT JOIN obs o ON s.user_id = o.user_id AND s.bucket = o.bucket
"""


@register("events_gapfill_locf", _GAPFILL_ORACLE, "M6-ts-gapfill-locf")
def q_events_gapfill_locf(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").filter(
        F.col("user_id") % GAPFILL_USER_MOD == 0)
    return timeseries.gapfill_locf(ev, "user_id", "ts", "value",
                                   tiebreak_col="event_id", step="hour")


# gaps-and-islands: consecutive-active-day streaks per user

_STREAKS_ORACLE = """
WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
r AS (
  SELECT user_id, day,
         day - CAST(ROW_NUMBER() OVER (
           PARTITION BY user_id ORDER BY day) AS INTEGER) AS anchor
  FROM d),
i AS (
  SELECT user_id, anchor, COUNT(*) AS len, MIN(day) AS start
  FROM r GROUP BY user_id, anchor),
agg AS (
  SELECT user_id, CAST(SUM(len) AS INTEGER) AS n_active_days,
         CAST(COUNT(*) AS INTEGER) AS n_streaks,
         CAST(MAX(len) AS INTEGER) AS longest_streak
  FROM i GROUP BY user_id),
best AS (
  SELECT i.user_id, MIN(i.start) AS longest_streak_start
  FROM i JOIN agg ON i.user_id = agg.user_id
  WHERE i.len = agg.longest_streak GROUP BY i.user_id)
SELECT agg.user_id, n_active_days, n_streaks, longest_streak,
       longest_streak_start
FROM agg JOIN best ON agg.user_id = best.user_id
"""


@register("user_activity_streaks", _STREAKS_ORACLE, "M6-ts-gaps-islands")
def q_user_activity_streaks(spark, sf_dir):
    return timeseries.activity_streaks(
        _t(spark, sf_dir, "events"), "user_id", "ts")


# time-weighted average of the user's step series (LOCF weighting). The
# series end is the GLOBAL max ts (data-derived the same way on both
# engines; attached as a 1-row broadcast, the corpus-stats idiom).

_TWA_ORACLE = """
WITH mx AS (SELECT MAX(ts) AS end_ts FROM events),
w AS (
  SELECT user_id, ts, value,
         COALESCE(LEAD(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id),
                  (SELECT end_ts FROM mx)) AS nxt
  FROM events),
g AS (
  SELECT user_id, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         (epoch_us(nxt) - epoch_us(ts)) // 1000 AS gap
  FROM w),
f AS (SELECT * FROM g WHERE gap > 0)
SELECT user_id,
       ROUND(CAST(SUM(cents * gap) AS DOUBLE)
             / CAST(SUM(gap) AS DOUBLE) / 100.0, 6) AS twa,
       CAST(SUM(gap) AS BIGINT) AS total_ms
FROM f GROUP BY user_id
"""


@register("user_value_twa", _TWA_ORACLE, "M6-ts-time-weighted-avg")
def q_user_value_twa(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    end_ts = ev.agg(F.max("ts").alias("_end"))
    with_end = ev.crossJoin(F.broadcast(end_ts))
    return timeseries.time_weighted_avg(
        with_end, "user_id", "ts", "value", tiebreak_col="event_id",
        end_ts=F.col("_end"))


# ---------------------------------------------------------------------------
# graph: bounded BFS over the co-purchase graph (recursive-CTE twin)

_HOPS_ORACLE = f"""
WITH RECURSIVE e AS (
  SELECT src, dst FROM (
    SELECT a.l_partkey AS src, b.l_partkey AS dst,
           COUNT(DISTINCT a.l_orderkey) AS n
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    GROUP BY 1, 2)
  WHERE n >= {COPURCHASE_MIN_ORDERS}),
s AS (SELECT p_partkey AS node FROM part
      WHERE p_partkey % {COPURCHASE_SEED_MOD} = 0),
walk(node, d) AS (
  SELECT node, 0 FROM s
  UNION
  SELECT e.dst, w.d + 1 FROM walk w JOIN e ON e.src = w.node
  WHERE w.d < {COPURCHASE_MAX_HOPS})
SELECT node, CAST(MIN(d) AS INTEGER) AS dist FROM walk GROUP BY node
"""


@register("part_copurchase_hops", _HOPS_ORACLE, "M6-graph-khop-bfs")
def q_part_copurchase_hops(spark, sf_dir):
    edges = graph.copurchase_edges(_t(spark, sf_dir, "lineitem"),
                                   min_orders=COPURCHASE_MIN_ORDERS)
    seeds = (_t(spark, sf_dir, "part")
             .filter(F.col("p_partkey") % COPURCHASE_SEED_MOD == 0)
             .select(F.col("p_partkey").alias("node")))
    return graph.khop_distances(edges, seeds,
                                max_hops=COPURCHASE_MAX_HOPS)


# ---------------------------------------------------------------------------
# cleaning: C4-style boilerplate removal (segment df >= 3 -> cut)


def _boilerplate_oracle() -> str:
    from etl_online_retail_spark.functions.text import normalize_sql

    w = SEGMENT_WIDTH
    toks = f"regexp_split_to_array({normalize_sql('text')}, '\\s+')"
    n_seg = f"CAST(ceil(len(toks) / {w}.0) AS BIGINT)"
    return f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
s AS (
  SELECT doc_id,
         unnest(generate_series(0, {n_seg} - 1)) AS pos,
         unnest(list_transform(generate_series(0, {n_seg} - 1),
                i -> array_to_string(toks[(i*{w}+1):(i*{w}+{w})], ' ')))
           AS seg
  FROM t),
f AS (SELECT seg FROM s GROUP BY seg
      HAVING COUNT(DISTINCT doc_id) >= {SEGMENT_MIN_DF}),
m AS (
  SELECT s.doc_id, s.pos, s.seg, (f.seg IS NOT NULL) AS dropped
  FROM s LEFT JOIN f ON s.seg = f.seg)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       md5(COALESCE(string_agg(CASE WHEN NOT dropped THEN seg END,
                               ' ' ORDER BY pos), '')) AS cleaned_md5
FROM m GROUP BY doc_id
"""


@register("boilerplate_removal", _boilerplate_oracle(),
          "M6-curation-boilerplate-c4")
def q_boilerplate_removal(spark, sf_dir):
    cleaned = remove_repeated_segments(
        _t(spark, sf_dir, "documents"),
        width=SEGMENT_WIDTH, min_df=SEGMENT_MIN_DF)
    return cleaned.select("doc_id", "n_segments", "n_dropped",
                          F.md5("cleaned").alias("cleaned_md5"))


# ---------------------------------------------------------------------------
# joins: the salted skew-buster, oracle-proven identical to the plain join
# (the oracle KNOWS NOTHING about salting — result identity is the claim)

_SALTED_ORACLE = f"""
SELECT n_name AS nation, CAST(SUM({REV}) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1
"""


@register("salted_revenue_by_nation", _SALTED_ORACLE, "M6-join-salted-skew")
def q_salted_revenue_by_nation(spark, sf_dir):
    from etl_online_retail_spark.functions.money import net_revenue

    # pre-aggregate below the join (the star-query rewrite): the salted
    # probe then carries one row per order, and the x SALT_BUCKETS
    # replication cost applies to the small side only
    li = (_t(spark, sf_dir, "lineitem")
          .select(F.col("l_orderkey").alias("o_orderkey"),
                  net_revenue().alias("_r"))
          .groupBy("o_orderkey")
          .agg(F.sum("_r").alias("_rev"), F.count(F.lit(1)).alias("_cnt")))
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = salted_join(li, o, "o_orderkey", salt_buckets=SALT_BUCKETS)
    return (joined
            .join(F.broadcast(c), joined.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .groupBy(F.col("n_name").alias("nation"))
            .agg(F.sum("_rev").cast("double").alias("revenue"),
                 F.sum("_cnt").alias("n_items")))


# ---------------------------------------------------------------------------
# data quality: one-scan table profiler (the Deequ/GE "describe" shape)

_PROFILE_COLS = [
    ("o_orderkey", "numeric"), ("o_custkey", "numeric"),
    ("o_orderstatus", "string"), ("o_totalprice", "numeric"),
    ("o_orderdate", "ts"), ("o_orderpriority", "string"),
]


def _profile_oracle() -> str:
    from etl_online_retail_spark.operators.profile import profile_oracle_sql

    return profile_oracle_sql("orders", _PROFILE_COLS)


@register("orders_profile", _profile_oracle(), "M6-quality-profile")
def q_orders_profile(spark, sf_dir):
    from etl_online_retail_spark.operators.profile import profile_table

    return profile_table(_t(spark, sf_dir, "orders"),
                         [c for c, _ in _PROFILE_COLS])


# ---------------------------------------------------------------------------
# multimodal: REAL spectral audio analysis, oracle-exact by construction
# (synthetic tones are DFT-bin-aligned: 250 Hz = bin 32 at 8 kHz/1024, so
# the dominant bin/frequency are closed-form in the id while Spark
# genuinely renders, RIFF-encodes, decodes, and Fourier-transforms)

_SPECTRAL_ORACLE = """
SELECT doc_id AS media_id,
       CAST(32 * (1 + doc_id % 8) AS INTEGER) AS dominant_bin,
       CAST(250.0 * (1 + doc_id % 8) AS DOUBLE) AS dominant_hz
FROM documents
"""


@register("wav_spectral_stats", _SPECTRAL_ORACLE, "M6-multimodal-spectral")
def q_wav_spectral_stats(spark, sf_dir):
    from etl_online_retail_spark.multimodal.binary import (
        audio_spectral_features,
        synthetic_tone_media,
    )

    docs = (_t(spark, sf_dir, "documents")
            .repartition(spark.sparkContext.defaultParallelism))
    return (audio_spectral_features(synthetic_tone_media(docs))
            .select("media_id", "dominant_bin", "dominant_hz"))


# ---------------------------------------------------------------------------
# temporal: interval-overlap join — SCD2 segment versions x session
# windows for the same user, with the exact overlap duration in micros.
# Completes the temporal-join family (as-of / PIT / pairs-within /
# overlap). Both interval relations already have verified oracles
# (user_segment_scd2, session_stats); this composes them.

_OVERLAP_ORACLE = """
WITH obs AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER w AS prev_type,
         lag(ts) OVER w AS prev_ts
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
opens AS (
  SELECT user_id, ts, event_id, event_type FROM obs
  WHERE prev_ts IS NULL OR event_type IS DISTINCT FROM prev_type),
ver AS (
  SELECT user_id, event_type AS segment, ts AS effective_from,
         CAST(ROW_NUMBER() OVER w2 AS INTEGER) AS version,
         lead(ts) OVER w2 AS effective_to
  FROM opens WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)),
flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
           OR date_diff('microsecond', lag(ts) OVER w, ts) > 1800000000
         THEN 1 ELSE 0 END AS is_new
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
numbered AS (
  SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged),
sess AS (
  SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
         MIN(ts) AS session_start, MAX(ts) AS session_end
  FROM numbered GROUP BY user_id, session_seq)
SELECT v.user_id, v.version, v.segment, s.session_seq,
       CAST(epoch_us(LEAST(COALESCE(v.effective_to, s.session_end),
                           s.session_end))
            - epoch_us(GREATEST(v.effective_from, s.session_start))
            AS BIGINT) AS overlap_us
FROM ver v JOIN sess s ON v.user_id = s.user_id
WHERE GREATEST(v.effective_from, s.session_start)
      <= LEAST(COALESCE(v.effective_to, s.session_end), s.session_end)
"""


@register("segment_session_overlap", _OVERLAP_ORACLE,
          "M6-temporal-interval-overlap")
def q_segment_session_overlap(spark, sf_dir):
    from etl_online_retail_spark.operators.joins import interval_overlap_join
    from etl_online_retail_spark.operators.scd import scd2_from_changelog
    from etl_online_retail_spark.operators.sessionize import session_stats

    ev = _t(spark, sf_dir, "events")
    ver = (scd2_from_changelog(ev, key_col="user_id",
                               attr_cols=["event_type"], ts_col="ts",
                               tiebreak_col="event_id")
           .select("user_id", "version",
                   F.col("event_type").alias("segment"),
                   "effective_from", "effective_to"))
    sess = (session_stats(ev, gap_minutes=30)
            .select("user_id", "session_seq",
                    "session_start", "session_end"))
    joined = interval_overlap_join(
        ver, sess, "user_id",
        "effective_from", "effective_to", "session_start", "session_end")
    return joined.select(
        "user_id", "version", "segment", "session_seq",
        F.expr("timestampdiff(MICROSECOND, ov_start, ov_end)")
         .cast("bigint").alias("overlap_us"))


# ---------------------------------------------------------------------------
# diagnostics: key-skew statistics from the group-size HISTOGRAM (the
# salting decision input; rank math in closed form per histogram block —
# no global sort over the key relation, see operators/profile.py)

_SKEW_ORACLE = """
WITH sizes AS (SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id),
hist AS (SELECT c, COUNT(*) AS k FROM sizes GROUP BY c),
cum AS (SELECT c, k, SUM(k) OVER (ORDER BY c
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_keys
        FROM hist),
tot AS (SELECT CAST(SUM(c * k) AS BIGINT) AS n_rows,
               CAST(SUM(k) AS BIGINT) AS n_keys,
               CAST(MAX(c) AS BIGINT) AS mx FROM cum),
j AS (SELECT cum.*, tot.* FROM cum, tot)
SELECT n_rows, n_keys, mx AS max_key_rows,
       CAST(MIN(CASE WHEN cum_keys >= CAST(CEIL(0.5 * n_keys) AS BIGINT)
                THEN c END) AS BIGINT) AS p50_key_rows,
       CAST(MIN(CASE WHEN cum_keys >= CAST(CEIL(0.99 * n_keys) AS BIGINT)
                THEN c END) AS BIGINT) AS p99_key_rows,
       ROUND(CAST(mx AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) AS top_share,
       ROUND(CAST(SUM(c * k * (2 * cum_keys - k - n_keys)) AS DOUBLE)
             / (CAST(n_keys AS DOUBLE) * CAST(n_rows AS DOUBLE)), 6) AS gini
FROM j GROUP BY n_rows, n_keys, mx
"""


@register("user_key_skew", _SKEW_ORACLE, "M6-diagnostics-key-skew")
def q_user_key_skew(spark, sf_dir):
    from etl_online_retail_spark.operators.profile import key_skew_stats

    return key_skew_stats(_t(spark, sf_dir, "events"), "user_id")


# constraint SUGGESTION over the profile (Deequ's suggest step): pure
# rule projection on the one-scan profile relation — no second scan.
# The loop closes with operators/constraints.py on the next load.


def _suggest_oracle() -> str:
    from etl_online_retail_spark.operators.profile import profile_oracle_sql

    p = profile_oracle_sql("orders", _PROFILE_COLS)
    return f"""
WITH p AS ({p})
SELECT col_name, 'complete' AS rule, '' AS detail FROM p WHERE n_null = 0
UNION ALL
SELECT col_name, 'unique' AS rule, '' AS detail FROM p
WHERE n_null = 0 AND n_distinct = n_rows AND n_rows > 0
UNION ALL
SELECT col_name, 'non_negative' AS rule, '' AS detail FROM p
WHERE numeric_min >= 0
UNION ALL
SELECT col_name, 'fixed_width' AS rule,
       CAST(str_len_min AS VARCHAR) AS detail FROM p
WHERE str_len_min = str_len_max
UNION ALL
SELECT col_name, 'low_cardinality' AS rule,
       CAST(n_distinct AS VARCHAR) AS detail FROM p
WHERE n_distinct <= 20
"""


@register("orders_constraint_suggestions", _suggest_oracle(),
          "M6-quality-suggest")
def q_orders_constraint_suggestions(spark, sf_dir):
    from etl_online_retail_spark.operators.profile import (
        profile_table,
        suggest_constraints,
    )

    prof = profile_table(_t(spark, sf_dir, "orders"),
                         [c for c, _ in _PROFILE_COLS])
    return suggest_constraints(prof)


# PageRank over the co-purchase graph: iterative-numeric (driver-looped
# power iteration, lineage-truncated). HASH-VERIFIED since r5: exact=True
# runs the whole iteration in FIXED-POINT int64 (rank * 10^12, truncating
# integer divides — graph.PR_FP_SCALE), so every step is integer
# arithmetic with no IEEE rounding anywhere; a FIXED iteration count then
# equals an UNROLLED 10-step SQL oracle bit-for-bit (the EWMA/Holt
# sequential-fold discipline applied to power iteration — decimal-round
# folds were tried first and disagreed at ROUND half-boundaries between
# engines at sf0.01; integers cannot). Float-mode invariants stay
# pytest-asserted. Like part_copurchase_hops, the iterations execute at
# plan-build time, so both queries are excluded from bench.py's
# steady-state runs.

_PR_ITERS = 10
_PR_D = 0.85
_PR_DN = 85            # damping as integer percent (exact-mode carrier)
_PR_S = graph.PR_FP_SCALE

# shared graph CTEs: the support-thresholded co-purchase edge relation
# (distinct pairs by construction), its node set, out-degrees, and N
_PR_GRAPH = f"""
e AS MATERIALIZED (
  SELECT src, dst FROM (
    SELECT a.l_partkey AS src, b.l_partkey AS dst,
           COUNT(DISTINCT a.l_orderkey) AS n
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    GROUP BY 1, 2)
  WHERE n >= {COPURCHASE_MIN_ORDERS}),
nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e
          UNION SELECT DISTINCT dst FROM e),
deg AS MATERIALIZED (SELECT src, COUNT(*) AS _deg FROM e GROUP BY src),
nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes)"""


def _pr_step_ctes(i: int, rank_expr: str) -> str:
    """One unrolled power-iteration step over the fixed-point ranks:
    dangling mass and incoming contributions are plain integer SUMs
    over r{i-1} (order-independent), per-edge spread is a truncating
    integer divide, and r{i} applies rank_expr — all BIGINT."""
    p = f"r{i - 1}"
    return f"""
dang{i} AS (
  SELECT CAST(COALESCE(SUM(p.rank), 0) AS BIGINT) AS dang
  FROM {p} p LEFT JOIN deg d ON p.node = d.src
  WHERE d.src IS NULL),
inc{i} AS (
  SELECT e.dst AS node, CAST(SUM(p.rank // d._deg) AS BIGINT) AS _in
  FROM {p} p JOIN deg d ON p.node = d.src JOIN e ON e.src = p.node
  GROUP BY e.dst),
r{i} AS MATERIALIZED (
  SELECT n.node, CAST({rank_expr} AS BIGINT) AS rank
  FROM nodes n CROSS JOIN nn CROSS JOIN dang{i} dg
  LEFT JOIN inc{i} i ON i.node = n.node)"""


_PR_OUT = ("SELECT node, CAST(rank AS DOUBLE) / {s}.0 AS rank "
           "FROM r{k}").format(s=_PR_S, k=_PR_ITERS)


def _pagerank_oracle() -> str:
    steps = []
    for i in range(1, _PR_ITERS + 1):
        base = (f"(({100 - _PR_DN} * {_PR_S}::BIGINT"
                f" + {_PR_DN} * dg.dang) // (100 * nn.n))")
        steps.append(_pr_step_ctes(
            i, f"{base} + ({_PR_DN} * COALESCE(i._in, 0)) // 100"))
    return (f"WITH {_PR_GRAPH},\n"
            f"r0 AS (SELECT node, "
            f"CAST({_PR_S}::BIGINT // nn.n AS BIGINT) AS rank "
            f"FROM nodes CROSS JOIN nn),"
            + ",".join(steps)
            + "\n" + _PR_OUT)


def _ppr_oracle() -> str:
    seeds = (f"s AS MATERIALIZED (SELECT node FROM nodes WHERE node IN "
             f"(SELECT p_partkey FROM part "
             f"WHERE p_partkey % {COPURCHASE_SEED_MOD} = 0)),\n"
             f"ns AS MATERIALIZED (SELECT COUNT(*) AS ns FROM s)")
    steps = []
    for i in range(1, _PR_ITERS + 1):
        teleport = (f"(({100 - _PR_DN} * {_PR_S}::BIGINT"
                    f" + {_PR_DN} * dg.dang) // (100 * ns.ns))")
        rank = (f"CASE WHEN n.node IN (SELECT node FROM s) "
                f"THEN {teleport} ELSE 0 END "
                f"+ ({_PR_DN} * COALESCE(i._in, 0)) // 100")
        step = _pr_step_ctes(i, rank).replace(
            "CROSS JOIN nn CROSS JOIN",
            "CROSS JOIN nn CROSS JOIN ns CROSS JOIN")
        steps.append(step)
    return (f"WITH {_PR_GRAPH},\n{seeds},\n"
            f"r0 AS (SELECT n.node, CASE WHEN n.node IN "
            f"(SELECT node FROM s) "
            f"THEN CAST({_PR_S}::BIGINT // ns.ns AS BIGINT) "
            f"ELSE 0 END AS rank "
            f"FROM nodes n CROSS JOIN ns),"
            + ",".join(steps)
            + "\n" + _PR_OUT)


def _pr_rank_out():
    # built lazily: Column construction needs an active SparkContext
    return F.col("rank").cast("double") / F.lit(float(_PR_S))


@register("part_copurchase_rank", _pagerank_oracle(), "M6-graph-pagerank")
def q_part_copurchase_rank(spark, sf_dir):
    edges = graph.copurchase_edges(_t(spark, sf_dir, "lineitem"),
                                   min_orders=COPURCHASE_MIN_ORDERS)
    ranked = graph.pagerank(edges, max_iter=_PR_ITERS, damping=_PR_D,
                            exact=True)
    return ranked.select("node", _pr_rank_out().alias("rank"))


# personalized variant: relatedness to the seed parts, not global
# prestige — same fixed-point promotion, teleport mass returns to seeds
@register("part_copurchase_ppr", _ppr_oracle(),
          "M6-graph-pagerank-personalized")
def q_part_copurchase_ppr(spark, sf_dir):
    edges = graph.copurchase_edges(_t(spark, sf_dir, "lineitem"),
                                   min_orders=COPURCHASE_MIN_ORDERS)
    seeds = (_t(spark, sf_dir, "part")
             .filter(F.col("p_partkey") % COPURCHASE_SEED_MOD == 0)
             .select(F.col("p_partkey").alias("node")))
    ranked = graph.personalized_pagerank(edges, seeds, max_iter=_PR_ITERS,
                                         damping=_PR_D, exact=True)
    return ranked.select("node", _pr_rank_out().alias("rank"))


# intra-document segment dedup (RefinedWeb's within-page repetition cut)


def _intradoc_oracle() -> str:
    from etl_online_retail_spark.functions.text import normalize_sql

    w = SEGMENT_WIDTH
    toks = f"regexp_split_to_array({normalize_sql('text')}, '\\s+')"
    n_seg = f"CAST(ceil(len(toks) / {w}.0) AS BIGINT)"
    return f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
s AS (
  SELECT doc_id,
         unnest(generate_series(0, {n_seg} - 1)) AS pos,
         unnest(list_transform(generate_series(0, {n_seg} - 1),
                i -> array_to_string(toks[(i*{w}+1):(i*{w}+{w})], ' ')))
           AS seg
  FROM t),
m AS (
  SELECT doc_id, pos, seg,
         ROW_NUMBER() OVER (PARTITION BY doc_id, seg ORDER BY pos) AS occ
  FROM s)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       md5(COALESCE(string_agg(CASE WHEN occ = 1 THEN seg END,
                               ' ' ORDER BY pos), '')) AS cleaned_md5
FROM m GROUP BY doc_id
"""


@register("intradoc_dedup", _intradoc_oracle(), "M6-curation-intradoc-dedup")
def q_intradoc_dedup(spark, sf_dir):
    from etl_online_retail_spark.operators.dedup import dedup_within_doc

    cleaned = dedup_within_doc(_t(spark, sf_dir, "documents"),
                               width=SEGMENT_WIDTH)
    return cleaned.select("doc_id", "n_segments", "n_dropped",
                          F.md5("cleaned").alias("cleaned_md5"))


# EWMA: the sequential-fold recursive metric, hash-verified because both
# engines run the IDENTICAL fold in the identical order (alpha=0.5 makes
# every multiply an exact halving)

EWMA_ALPHA = 0.5

_EWMA_ORACLE = f"""
SELECT user_id,
       ROUND(list_reduce(list(value ORDER BY ts, event_id),
                         (acc, x) -> {EWMA_ALPHA} * x
                                     + {1.0 - EWMA_ALPHA} * acc), 6) AS ewma,
       CAST(COUNT(*) AS BIGINT) AS n_obs
FROM events GROUP BY user_id
"""


@register("user_value_ewma", _EWMA_ORACLE, "M6-ts-ewma")
def q_user_value_ewma(spark, sf_dir):
    return timeseries.ewma_last(_t(spark, sf_dir, "events"), "user_id",
                                "ts", "event_id", "value",
                                alpha=EWMA_ALPHA)


# Holt double exponential smoothing: level + trend, the forecasting step
# past EWMA. DuckDB's list_reduce seeds the accumulator with the FIRST
# element — [x1, 0.0], exactly the fold's init — and the lambda inlines
# new_level into the trend update (recomputing the same IEEE expression
# yields the same double). The pair rides a 2-element DOUBLE LIST, not a
# struct: DuckDB 1.0 mis-evaluates multi-reference struct accumulators
# inside list_reduce lambdas (verified: trend came back wrong from the
# 3rd element on), while list accumulators fold correctly.
# alpha = beta = 0.5: every multiply an exact halving.

HOLT_ALPHA = 0.5
HOLT_BETA = 0.5

_HOLT_NEW_L = (f"{HOLT_ALPHA} * x[1] "
               f"+ {1.0 - HOLT_ALPHA} * (acc[1] + acc[2])")

_HOLT_ORACLE = f"""
WITH f AS (
  SELECT user_id,
         list_reduce(
           list([CAST(value AS DOUBLE), CAST(0.0 AS DOUBLE)]
                ORDER BY ts, event_id),
           (acc, x) -> [
             {_HOLT_NEW_L},
             {HOLT_BETA} * (({_HOLT_NEW_L}) - acc[1])
             + {1.0 - HOLT_BETA} * acc[2]]) AS fold,
         COUNT(*) AS n
  FROM events GROUP BY user_id)
SELECT user_id,
       ROUND(fold[1], 6) AS level,
       ROUND(fold[2], 6) AS trend,
       ROUND(fold[1] + fold[2], 6) AS forecast_1,
       CAST(n AS BIGINT) AS n_obs
FROM f
"""


@register("user_value_holt", _HOLT_ORACLE, "M6-ts-holt")
def q_user_value_holt(spark, sf_dir):
    return timeseries.holt_last(_t(spark, sf_dir, "events"), "user_id",
                                "ts", "event_id", "value",
                                alpha=HOLT_ALPHA, beta=HOLT_BETA)


# ---------------------------------------------------------------------------
# relevance: TF-IDF cosine over a candidate-pair relation (the scoring
# stage behind any candidate generator; the pair source here is a cheap
# deterministic sampler — adjacent ids, every 7th — because the operator
# is agnostic to where candidates come from)


def _tfidf_oracle() -> str:
    from etl_online_retail_spark.workload_ext import TOK_BODY

    return f"""
WITH t AS (
  {TOK_BODY}),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY doc_id, term),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM t GROUP BY term),
nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM t),
w AS (
  SELECT doc_id, term,
         tf * (ln(CAST(n AS DOUBLE) / CAST(df AS DOUBLE)) + 1.0) AS w
  FROM tf JOIN df USING (term), nd),
norms AS (
  SELECT doc_id,
         sqrt(CAST(SUM(CAST(ROUND(w * w, 9) AS DECIMAL(18,9))) AS DOUBLE))
           AS nrm
  FROM w GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS id_a, a.doc_id + 1 AS id_b
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
  WHERE a.doc_id % 7 = 0),
num AS (
  SELECT p.id_a, p.id_b,
         CAST(SUM(CAST(ROUND(wa.w * wb.w, 9) AS DECIMAL(18,9))) AS DOUBLE)
           AS num
  FROM pairs p
  JOIN w wa ON wa.doc_id = p.id_a
  JOIN w wb ON wb.doc_id = p.id_b AND wb.term = wa.term
  GROUP BY p.id_a, p.id_b)
SELECT p.id_a, p.id_b,
       ROUND(COALESCE(num.num, 0.0) / (na.nrm * nb.nrm), 6) AS tfidf_cos
FROM pairs p
LEFT JOIN num ON num.id_a = p.id_a AND num.id_b = p.id_b
JOIN norms na ON na.doc_id = p.id_a
JOIN norms nb ON nb.doc_id = p.id_b
"""


@register("tfidf_pair_cosine", _tfidf_oracle(), "M6-relevance-tfidf-cosine")
def q_tfidf_pair_cosine(spark, sf_dir):
    from etl_online_retail_spark.operators.relevance import tfidf_pair_cosine

    docs = _t(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") % 7 == 0) \
            .select(F.col("doc_id").alias("id_a"),
                    (F.col("doc_id") + 1).alias("id_b"))
    existing = docs.select(F.col("doc_id").alias("id_b"))
    pairs = a.join(existing, "id_b", "left_semi").select("id_a", "id_b")
    return tfidf_pair_cosine(docs, pairs)


# ---------------------------------------------------------------------------
# product analytics: weekly cohort retention (the classic BI triangle —
# users grouped by first-active week, counted in each later week they
# return). Pure integer counts over two hash aggs and a keyed join;
# week arithmetic in integer days so both engines bucket identically.

_COHORT_ORACLE = """
WITH first_day AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id),
active AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
marked AS (
  SELECT f.user_id,
         CAST((f.d0 - DATE '1970-01-05') // 7 AS INTEGER) AS cohort_week,
         CAST((a.d - DATE '1970-01-05') // 7 AS INTEGER)
           - CAST((f.d0 - DATE '1970-01-05') // 7 AS INTEGER) AS week_offset
  FROM first_day f JOIN active a ON f.user_id = a.user_id)
SELECT cohort_week, week_offset,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM marked GROUP BY cohort_week, week_offset
"""


# revenue-weighted sibling: how much each cohort SPENDS as it ages, not
# just whether it returns — the LTV-curve input. Same integer week
# arithmetic; purchase sums stay DECIMAL until the final cast.
_COHORT_REV_ORACLE = """
WITH first_day AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id),
weekly AS (
  SELECT user_id, CAST((CAST(ts AS DATE) - DATE '1970-01-05') // 7
                       AS INTEGER) AS w,
         COUNT(*) AS n_purch,
         SUM(CAST(value AS DECIMAL(18,2))) AS rev
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
marked AS (
  SELECT f.user_id,
         CAST((f.d0 - DATE '1970-01-05') // 7 AS INTEGER) AS cohort_week,
         w.w - CAST((f.d0 - DATE '1970-01-05') // 7 AS INTEGER)
           AS week_offset,
         w.n_purch, w.rev
  FROM first_day f JOIN weekly w ON f.user_id = w.user_id)
SELECT cohort_week, week_offset,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_buyers,
       CAST(SUM(n_purch) AS BIGINT) AS n_purchases,
       CAST(SUM(rev) AS DOUBLE) AS revenue
FROM marked GROUP BY cohort_week, week_offset
"""


@register("cohort_revenue_retention", _COHORT_REV_ORACLE,
          "M6-analytics-cohort-ltv")
def q_cohort_revenue_retention(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")

    def week(day_col):
        return F.floor(F.datediff(day_col, F.lit("1970-01-05"))
                       / F.lit(7)).cast("int")

    first = (ev.groupBy("user_id")
             .agg(F.min(F.to_date("ts")).alias("_d0"))
             .withColumn("cohort_week", week(F.col("_d0"))))
    weekly = (ev.filter(F.col("event_type") == "purchase")
              .groupBy("user_id", week(F.to_date("ts")).alias("_w"))
              .agg(F.count(F.lit(1)).alias("_n"),
                   F.sum(F.col("value").cast("decimal(18,2)"))
                    .alias("_rev")))
    return (first.join(weekly, "user_id")
            .withColumn("week_offset", F.col("_w") - F.col("cohort_week"))
            .groupBy("cohort_week", "week_offset")
            .agg(F.count_distinct("user_id").alias("n_buyers"),
                 F.sum("_n").alias("n_purchases"),
                 F.sum("_rev").cast("double").alias("revenue")))


@register("cohort_retention", _COHORT_ORACLE, "M6-analytics-cohort")
def q_cohort_retention(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    # week index anchored on a Monday (1970-01-05), integer-day floor div
    def week(day_col):
        return F.floor(F.datediff(day_col, F.lit("1970-01-05"))
                       / F.lit(7)).cast("int")
    first = (ev.groupBy("user_id")
             .agg(F.min(F.to_date("ts")).alias("_d0"))
             .withColumn("cohort_week", week(F.col("_d0"))))
    active = ev.select("user_id", F.to_date("ts").alias("_d")).distinct()
    return (first.join(active, "user_id")
            .withColumn("week_offset",
                        week(F.col("_d")) - F.col("cohort_week"))
            .groupBy("cohort_week", "week_offset")
            .agg(F.count_distinct("user_id").alias("n_users")))
