"""Privacy-preserving release operators: k-anonymity over quasi-identifiers.

A released dataset is k-anonymous over a quasi-identifier (QI) tuple iff
every distinct QI combination is shared by at least k rows — no individual
can be singled out below the crowd size k. The operator family here is the
suppression form (withhold rows in under-k groups) plus the audit report a
data steward reviews before release; generalization (coarsening a column
until groups reach k) composes from ordinary expressions, e.g. banding a
numeric column before calling these.

Scale shape: one map-side-combinable hash agg over the QI tuple to get
group sizes, then either (a) a broadcast-or-shuffle semi-join of the input
against the surviving groups (k_anonymize — the group relation is
|distinct QI|, usually dwarfed by the input) or (b) the group-level report
alone (k_anonymity_report — never touches row width). No sort, no window,
no skew beyond the QI distribution itself, which the partial agg absorbs.

Reference parity: the reference pipeline stores raw customer rows with no
release gating (etl.py:150-210); this adds the governance layer a
warehouse feeding analysts/models needs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(df: DataFrame, qi_cols: Sequence[str],
                       k: int = 5) -> DataFrame:
    """Group-level audit: every distinct QI combination with its crowd
    size and whether a k-suppression release would withhold it.

    Output: (*qi_cols, n_rows BIGINT, suppressed BOOLEAN). The report
    itself is group-granular (it reveals QI values but no non-QI
    attributes), which is the standard steward-facing artifact.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    return (df.groupBy(*qi_cols)
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .withColumn("suppressed", F.col("n_rows") < k))


def l_diversity_report(df: DataFrame, qi_cols: Sequence[str],
                       sensitive_col: str, l: int = 2) -> DataFrame:
    """Distinct-l-diversity audit: k-anonymity's necessary companion.
    A k-anonymous group whose members all share one sensitive value
    still leaks that value for everyone in the group (the homogeneity
    attack); distinct l-diversity demands >= l distinct sensitive values
    per QI group.

    Output: (*qi_cols, n_rows BIGINT, n_sensitive BIGINT, diverse
    BOOLEAN). Same scale shape as the k-report — one hash agg over the
    QI tuple; the COUNT(DISTINCT sensitive) adds one Expand pass, the
    usual exact-distinct cost.
    """
    if l < 1:
        raise ValueError("l must be >= 1")
    return (df.groupBy(*qi_cols)
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.count_distinct(F.col(sensitive_col))
                  .alias("n_sensitive"))
            .withColumn("diverse", F.col("n_sensitive") >= l))


def t_closeness_report(df: DataFrame, qi_cols: Sequence[str],
                       sensitive_col: str, t_num: int = 1,
                       t_den: int = 4) -> DataFrame:
    """Distinct t-closeness audit (Li et al., ICDE 2007) — the third leg
    of the release triad: l-diversity stops the homogeneity attack, but
    a group can satisfy it and still LEAK by skew (e.g. 90% of one
    sensitive value where the population has 10% — the skewness
    attack). A QI group is t-close when the total-variation distance
    between its sensitive-value distribution and the GLOBAL one is <= t.

    All statistics are exact integers: with group size g, global size N,
    group value counts n_v and global value counts N_v,

        TVD = ( g*N + Σ_{v in group} (|n_v*N - N_v*g| - N_v*g) )
              / (2*g*N)

    (the absent-value tail Σ N_v*g collapses into g*N because global
    value counts sum to N — no group x value-domain cross join). The
    threshold test cross-multiplies: TVD <= t_num/t_den iff
    t_den*numerator <= t_num*(2*g*N) — integer comparison, no float
    anywhere in the verdict. Counts are DECIMAL(18,0) operands so every
    product stays inside DECIMAL(38,0) while surviving count ranges
    where BIGINT products overflow; the reported tvd double is one IEEE
    division of exact integers (cross-engine identical below the 2^53
    decimal-cast boundary — workload.py's documented rule).

    Output: (*qi_cols, n_rows BIGINT, tvd DOUBLE, t_close BOOLEAN).
    Scale shape: one hash agg over (QI, sensitive), one over QI, one
    global-value broadcast + scalar N broadcast, one fold per group —
    map-side combinable throughout, no window, no sort.
    """
    if t_num < 0 or t_den <= 0:
        raise ValueError("t must be a non-negative rational")
    d18 = "decimal(18,0)"
    gv = (df.groupBy(*qi_cols, sensitive_col)
          .agg(F.count(F.lit(1)).alias("_ngv")))
    glob_v = (df.groupBy(sensitive_col)
              .agg(F.count(F.lit(1)).alias("_nv")))
    n_tot = df.agg(F.count(F.lit(1)).alias("_n"))
    term = (F.abs(F.col("_ngv").cast(d18) * F.col("_n").cast(d18)
                  - F.col("_nv").cast(d18) * F.col("_g").cast(d18))
            - F.col("_nv").cast(d18) * F.col("_g").cast(d18))
    g_sizes = (df.groupBy(*qi_cols)
               .agg(F.count(F.lit(1)).alias("_g")))
    # NULL-SAFE joins (r7 review): a NULL QI value is its own group and
    # a NULL sensitive value is a real value of the domain — plain
    # name-list joins dropped both (an all-NULL group vanished from the
    # report entirely; mixed groups got a wrong TVD)
    qi_cond = None
    for c in qi_cols:
        e = gv[c].eqNullSafe(g_sizes[c])
        qi_cond = e if qi_cond is None else (qi_cond & e)
    folded = (gv
              .join(g_sizes, qi_cond)
              .drop(*[g_sizes[c] for c in qi_cols])
              .join(F.broadcast(glob_v),
                    gv[sensitive_col].eqNullSafe(glob_v[sensitive_col]))
              .drop(glob_v[sensitive_col])
              .crossJoin(F.broadcast(n_tot))
              .groupBy(*qi_cols)
              .agg(F.first("_g").alias("_g"), F.first("_n").alias("_n"),
                   F.sum(term).alias("_tail")))
    num = F.col("_g").cast(d18) * F.col("_n").cast(d18) + F.col("_tail")
    den = F.lit(2).cast(d18) * F.col("_g").cast(d18) \
        * F.col("_n").cast(d18)
    # decimal(9,0): a (2,0) cast threw NUMERIC_VALUE_OUT_OF_RANGE for
    # any legitimate threshold component >= 100, e.g. t = 3/100 (r7
    # review)
    small = "decimal(9,0)"
    return (folded.select(
        *qi_cols,
        F.col("_g").alias("n_rows"),
        F.round(num.cast("double") / den.cast("double"), 6).alias("tvd"),
        (F.lit(t_den).cast(small) * num
         <= F.lit(t_num).cast(small) * den).alias("t_close")))


def k_anonymize(df: DataFrame, qi_cols: Sequence[str],
                k: int = 5, broadcast: bool = True) -> DataFrame:
    """Suppression release: rows of df whose QI group has >= k members.

    Schema-preserving. The surviving-group relation is one row per
    distinct QI tuple — small next to the input for the narrow QIs this
    audit targets — so with broadcast=True (default) the filter join is
    hinted broadcast-semi (aggregate outputs carry no size estimate, so
    the static plan would otherwise shuffle BOTH sides into a sort-merge
    semi-join; plan-asserted in tests). For a WIDE/high-cardinality QI
    tuple the surviving-group relation can approach the input size and a
    forced broadcast OOMs instead of degrading: pass broadcast=False to
    let the planner (AQE) choose a shuffle semi-join.
    """
    keep = (k_anonymity_report(df, qi_cols, k)
            .filter(~F.col("suppressed"))
            .select(*qi_cols))
    if broadcast:
        keep = F.broadcast(keep)
    # NULL-SAFE semi-join (r7 review): the report treats a NULL QI value
    # as its own group (groupBy does), so the release must too — the
    # plain name-list join suppressed every NULL-QI row even when the
    # report said suppressed=false for its group
    cond = None
    for c in qi_cols:
        e = df[c].eqNullSafe(keep[c])
        cond = e if cond is None else (cond & e)
    return df.join(keep, cond, "left_semi")


def erasure_scope(tables: dict[str, DataFrame],
                  key_map: dict[str, str],
                  subjects: DataFrame,
                  subject_key: str = "subject_key") -> DataFrame:
    """Right-to-erasure impact audit (GDPR Art. 17 / CCPA delete): given
    the SUBJECT keys to forget and, per table, which column references
    the subject, report how many rows each table would lose and keep.

    Output: (table STRING, n_rows BIGINT, n_erased BIGINT,
    n_retained BIGINT) — the artifact a steward signs off before the
    destructive pass runs. Scale shape per table: the subject relation
    broadcasts (a deletion request batch is human-scale next to any
    fact table) and ONE conditional aggregation counts matches — no
    semi-join materialization, no shuffle of the fact beyond its scan.

    The destructive counterpart is erase_rows (an anti-join projection);
    running scope first and checking n_erased against the request size
    is the referential-integrity guard: a subject key that erases 0
    rows from a table it should hit signals a broken key mapping
    BEFORE any data is dropped.
    """
    subj = subjects.select(F.col(subject_key).alias("_skey")).distinct()
    if not tables:
        # empty scope is a valid (if odd) request — return the empty
        # report instead of IndexError (r7 review)
        return subjects.sparkSession.createDataFrame(
            [], "table string, n_rows bigint, n_erased bigint, "
                "n_retained bigint")
    outs = []
    for name, df in tables.items():
        key = key_map[name]
        flagged = df.join(
            F.broadcast(subj.withColumn("_hit", F.lit(1))),
            df[key] == F.col("_skey"), "left")
        outs.append(
            flagged.agg(
                F.lit(name).alias("table"),
                F.count(F.lit(1)).alias("n_rows"),
                F.count(F.col("_hit")).alias("n_erased"),
                (F.count(F.lit(1)) - F.count(F.col("_hit")))
                .alias("n_retained")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def erase_rows(df: DataFrame, key_col: str, subjects: DataFrame,
               subject_key: str = "subject_key") -> DataFrame:
    """The destructive pass: rows of df whose key is NOT in the subject
    set (left-anti against the broadcast-small deletion batch).
    Schema-preserving; pair with erasure_scope for the pre-flight audit
    and write the result with overwrite/MERGE semantics."""
    subj = subjects.select(F.col(subject_key).alias("_skey")).distinct()
    return df.join(F.broadcast(subj), df[key_col] == F.col("_skey"),
                   "left_anti")
