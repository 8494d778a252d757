"""Warehouse integrity checks (init_db.sql's declarative constraints,
enforced as load-time checks - SURVEY.md §2.1 S6: Spark treats PK/FK/NOT
NULL as informational, so the engine asserts them instead).

Each check returns a violation COUNT (0 = constraint holds) computed as
one aggregation - cheap enough to run on every load, and each maps to the
exact constraint the reference declares:

    not_null_violations     NOT NULL (init_db.sql:9,17,36,40-41)
    fixed_width_violations  CHAR(5)/CHAR(6) width semantics (SURVEY §7)
    unique_key_violations   PRIMARY KEY uniqueness (init_db.sql:8,16,24)
    fk_violations           FOREIGN KEY (sources/ddl.py; init_db.sql:37-39)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_online_retail_spark.sources.ddl import fk_violations  # noqa: F401  (re-export)


# Declared single-column keys of the catalog relations — the TPC-H-shaped
# schema contract mirroring the reference's PRIMARY KEY declarations
# (init_db.sql:8,16,24). Spark treats constraints as informational, so the
# engine asserts them on load (unique_key_violations / the integrity_audit
# query's orphan checks) — and that enforcement is exactly what licenses
# planner-side rewrites that ASSUME them (count_distinct_or_count below).
DECLARED_UNIQUE: dict[str, str] = {
    "customer": "c_custkey",
    "orders": "o_orderkey",
    "part": "p_partkey",
    "supplier": "s_suppkey",
    "nation": "n_nationkey",
    "region": "r_regionkey",
}


def count_distinct_or_count(relation: str, col: str, alias: str) -> F.Column:
    """COUNT(DISTINCT col) with the constraint-informed rewrite: when
    `col` is `relation`'s declared unique key, DISTINCT is an identity
    and the two-phase distinct expansion (Expand + extra exchange) is
    dead weight, so the plan gets a plain COUNT. This is the functional-
    dependency rewrite a constraint-aware planner applies automatically;
    Catalyst cannot (parquet carries no constraints), so the knowledge
    lives here, next to the enforcement that justifies it.

    ONLY sound when the relation passed is the base relation (or any
    1:1/broadcast-dim extension of it that cannot duplicate its rows —
    customers_by_nation's customer JOIN nation qualifies because
    c_nationkey -> nation is many-to-one into a unique dim key).

    Round-10 audit of every Spark-side COUNT DISTINCT in the registry:
    customers_by_nation (c_custkey over customer x broadcast nation) is
    the ONLY qualifying site. The rest count genuinely repeating values —
    l_orderkey within lineitem (orders_missing_big_parts, monthly_revenue,
    conversion funnels), ps_suppkey/ps_partkey within partsupp groups
    (TPC-H Q16-shape), user_id within events, n-grams and shingle hashes
    (diversity/decontamination), c_mktsegment within QI groups
    (l-diversity) — where the rewrite does not apply.
    """
    if DECLARED_UNIQUE.get(relation) == col:
        return F.count(col).alias(alias)
    return F.countDistinct(col).alias(alias)


def not_null_violations(df: DataFrame, cols: list[str]) -> int:
    if not cols:
        return 0   # a schema with no NOT NULL columns is a valid input
    pred = None
    for c in cols:
        p = F.col(c).isNull()
        pred = p if pred is None else (pred | p)
    return df.filter(pred).count()


def fixed_width_violations(df: DataFrame, col: str, width: int) -> int:
    """CHAR(n) semantics: every non-null value exactly n characters."""
    return df.filter(F.col(col).isNotNull()
                     & (F.length(col) != width)).count()


def unique_key_violations(df: DataFrame, key_cols: list[str]) -> int:
    """Rows participating in a duplicated key (0 = key is unique)."""
    dups = (df.groupBy(*key_cols)
              .agg(F.count(F.lit(1)).alias("_n"))
              .filter(F.col("_n") > 1)
              .agg(F.coalesce(F.sum("_n"), F.lit(0)).alias("_total")))
    return int(dups.collect()[0]._total)


def _null_flag(c: str):
    return F.count(F.when(F.col(c).isNull(), 1))


def _width_flag(c: str, width: int):
    return F.count(F.when(F.col(c).isNotNull()
                          & (F.length(c) != width), 1))


def _stack_rules(row_df: DataFrame, names: list[str]) -> DataFrame:
    """One-row aggregate -> (rule, n) rows (pure row expression)."""
    return row_df.select(F.explode(F.array(*[
        F.struct(F.lit(n).alias("rule"),
                 F.col(f"_r{i}").cast("bigint").alias("n"))
        for i, n in enumerate(names)
    ])).alias("_s")).select("_s.rule", "_s.n")


def _table_rules(df: DataFrame, rules: list[tuple[str, F.Column]],
                 pk: tuple[str, list[str]] | None = None) -> DataFrame:
    """All of one table's declarative rules in ONE SCAN.

    Row-level rules (NOT NULL, CHAR width, FK-miss flags from an
    already-joined lookup) are conditional counts in a single
    aggregation. A PK rule needs the per-key counts, so when present the
    scan goes groupBy(pk) FIRST (row-rule counts ride along as per-group
    partials, map-side combinable) and a second tiny aggregation over
    the keyed relation folds everything to one row — still one scan of
    the table, one shuffle, not one action per rule."""
    names = [n for n, _ in rules]
    aggs = [c.alias(f"_r{i}") for i, (_, c) in enumerate(rules)]
    if pk is None:
        return _stack_rules(df.agg(*aggs) if aggs
                            else df.limit(0).agg(F.count(F.lit(1))),
                            names)
    pk_name, pk_cols = pk
    per_key = (df.groupBy(*pk_cols)
               .agg(F.count(F.lit(1)).alias("_n"), *aggs))
    folded = per_key.agg(
        F.coalesce(F.sum(F.when(F.col("_n") > 1, F.col("_n"))),
                   F.lit(0)).alias("_pk"),
        *[F.sum(f"_r{i}").alias(f"_r{i}") for i in range(len(rules))])
    names = names + [pk_name]
    folded = folded.withColumn(f"_r{len(rules)}", F.col("_pk"))
    return _stack_rules(folded, names)


def _fk_miss(fact_key: str) -> F.Column:
    """Row-level FK flag for a fact ALREADY left-joined to the dim's
    DISTINCT key projection (marker `_fk_<fact_key>`): no dim match.
    NULL fact keys count as misses — exactly the `left_anti` semantics
    of fk_violations (a NULL never equals any dim key)."""
    return F.count(F.when(F.col(f"_fk_{fact_key}").isNull(), 1))


def fct_row_rules() -> "list[tuple[str, F.Column]]":
    """The fact table's row-level rules (built lazily — Column
    construction needs an active SparkContext)."""
    return [
        ("fct.invoice_id CHAR(6)", _width_flag("invoice_id", 6)),
        # two separately named rules (r7 review: one label counting
        # BOTH columns' NULLs sent the steward to the wrong column) —
        # init_db.sql lines 40-41 are two constraints
        ("fct.unit_price NOT NULL",
         F.count(F.when(F.col("unit_price").isNull(), 1))),
        ("fct.quantity NOT NULL",
         F.count(F.when(F.col("quantity").isNull(), 1))),
    ]


def warehouse_check_plan(wh) -> DataFrame:
    """Every reference constraint as ONE lazy plan — (rule, n) rows.

    Scan discipline (plan-asserted in tests/test_constraints.py): each
    table is scanned ONCE. The three FKs do not re-scan the fact — the
    fact branch left-joins all three (broadcast-sized) dim key
    projections in one pass and counts misses as conditional sums, so
    the whole sweep is 3 dim scans + 3 broadcast builds + 1 fact scan,
    versus the naive 10-action form's ~5 fact scans per load."""
    dims = _table_rules(
        wh.dim_customers,
        [("dim_customers.customer_id NOT NULL",
          _null_flag("customer_id")),
         ("dim_customers.customer_id CHAR(5)",
          _width_flag("customer_id", 5))],
        pk=("dim_customers PK", ["customer_dim_id"]),
    ).unionAll(_table_rules(
        wh.dim_products, [], pk=("dim_products PK", ["product_dim_id"]),
    )).unionAll(_table_rules(
        wh.dim_dates, [], pk=("dim_dates PK", ["date_dim_id"]),
    ))
    fct = wh.fct_invoices
    for fact_key, dim, dim_key in (
            ("customer_dim_id", wh.dim_customers, "customer_dim_id"),
            ("product_dim_id", wh.dim_products, "product_dim_id"),
            ("invoice_date_dim_id", wh.dim_dates, "date_dim_id")):
        keys = (dim.select(F.col(dim_key).alias(fact_key))
                .distinct()
                .withColumn(f"_fk_{fact_key}", F.lit(1)))
        fct = fct.join(F.broadcast(keys), on=fact_key, how="left")
    fct_rules = _table_rules(fct, fct_row_rules() + [
        ("fct->dim_customers FK", _fk_miss("customer_dim_id")),
        ("fct->dim_products FK", _fk_miss("product_dim_id")),
        ("fct->dim_dates FK", _fk_miss("invoice_date_dim_id")),
    ])
    return dims.unionAll(fct_rules)


def check_warehouse(wh) -> dict[str, int]:
    """All reference constraints over a RetailWarehouse; {} means clean.
    One Spark action total (the unioned warehouse_check_plan)."""
    rows = warehouse_check_plan(wh).collect()
    return {r["rule"]: int(r["n"]) for r in rows if r["n"]}


def observed_rules(df: DataFrame, rules: "list[tuple[str, F.Column]]"):
    """Ride a table's row-level rule counts on the caller's NEXT action
    (normally the load's own write) via the Observation API — zero extra
    scans, the observed_load pattern (operators/profile.py) specialised
    to constraint counts. Returns (df', fetch); use df' for the action,
    call fetch() after it completes for {rule: violation_count}.
    Row-level rules only (NOT NULL, CHAR width, pre-joined FK flags) —
    PK uniqueness needs a groupBy and cannot ride a write."""
    from pyspark.sql import Observation

    obs = Observation("constraint_metrics")
    out = df.observe(obs, *[c.alias(f"_r{i}")
                            for i, (_, c) in enumerate(rules)])

    def fetch() -> dict[str, int]:
        got = obs.get
        return {name: int(got[f"_r{i}"])
                for i, (name, _) in enumerate(rules)}

    return out, fetch


def quarantine(df: DataFrame,
               rules: "list[tuple[str, F.Column]]") \
        -> tuple[DataFrame, DataFrame]:
    """Split a load into (valid, invalid) by a rule list — the ACTION
    the violation counts above inform: instead of failing the load or
    silently keeping bad rows, route them to a quarantine table with an
    explanation a steward can triage (the Deequ/DLT "expectations with
    drop + log" pattern).

    rules: [(rule_name, predicate_that_holds_for_GOOD_rows), ...].
    Returns (valid, invalid) where invalid carries one extra column
    `violations` — a comma-joined list of every rule the row breaks
    (a row failing two rules appears ONCE with both names, not twice).

    One pass, no shuffle: both outputs are filters over the same
    projection, and the violation list is a pure row expression
    (concat of CASE WHENs). A NULL predicate result counts as a
    violation (unknown != proven good — the SQL three-valued-logic trap
    a naive `filter(pred)` + `filter(~pred)` split silently drops rows
    into neither side).
    """
    flags = [
        F.when(pred.isNull() | ~pred, F.lit(name)).alias(f"_viol_{i}")
        for i, (name, pred) in enumerate(rules)
    ]
    tagged = df.withColumn(
        "violations",
        F.concat_ws(",", *[f for f in flags]))
    valid = (tagged.filter(F.col("violations") == "")
             .drop("violations"))
    invalid = tagged.filter(F.col("violations") != "")
    return valid, invalid
