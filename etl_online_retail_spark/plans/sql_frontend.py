"""SQL front-end: the reference's SQL Lab entry point (SURVEY.md §3.3).

Raw SQL text -> Catalyst parse/analyze/optimize/execute, with the two
behaviors the reference's metastore shows Superset adding on top of
Postgres:
  * an enforced row limit on every statement (query."limit" column,
    10..100000) - applied as .limit(n), which Spark plans as
    CollectLimit/TakeOrderedAndProject rather than a full materialize;
  * analysis-time errors surfaced to the caller (the 16 failed queries in
    superset.db#query: unknown columns, JOIN without ON, bad HAVING all
    fail in Catalyst's analyzer with the same error class).
"""

from __future__ import annotations

import re

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession

DEFAULT_ENFORCED_LIMIT = 100_000

# Postgres's grammar requires a join specification (ON/USING) after
# every qualified JOIN; CROSS JOIN and NATURAL ... JOIN carry none by
# definition, and comma-style FROM lists ("FROM a, b WHERE a.id = b.id")
# are legal without one. Detect the failure class SYNTACTICALLY on the
# statement text — an analyzed-plan scan cannot tell the two apart,
# because a comma list also analyzes to a condition-less Join Inner
# (its WHERE predicate pushes into the join only at optimization).
_STRIP_SQL = re.compile(
    r"'(?:[^'\\]|\\.|'')*'"       # string literals ('' and \' escapes —
                                  # Spark's default escapedStringLiterals
                                  # =false admits backslash escapes)
    r"|\"(?:[^\"\\]|\\.)*\""      # double-quoted literals/identifiers
    r"|`(?:[^`]|``)*`"            # backtick identifiers (`` = escaped)
    r"|--[^\n]*|/\*.*?\*/",       # comments
    re.S)
_SQL_TOKEN = re.compile(r"[A-Za-z_][A-Za-z_0-9$]*|\(|\)|;")
_JOIN_MODIFIERS = {"LEFT", "RIGHT", "FULL", "INNER", "OUTER", "SEMI", "ANTI"}
# NOTE: LATERAL is deliberately NOT a boundary — "JOIN LATERAL (sub) s
# ON cond" is Postgres-legal and its ON must stay creditable to the
# JOIN; an ON between a qualified JOIN and the next boundary can only
# belong to that JOIN (ON appears nowhere else at the same depth).
_CLAUSE_BOUNDARY = {
    "JOIN", "WHERE", "GROUP", "ORDER", "HAVING", "LIMIT", "UNION",
    "EXCEPT", "INTERSECT", "MINUS", "WINDOW", "QUALIFY", ";"}


def _join_without_on(sql_text: str) -> bool:
    """True iff the statement contains a qualified JOIN (not CROSS, not
    NATURAL) with no ON/USING specification before the next same-depth
    clause boundary — the shape Postgres rejects at parse time."""
    toks: list[tuple[str, int]] = []   # (UPPER token, paren depth)
    depth = 0
    for m in _SQL_TOKEN.finditer(_STRIP_SQL.sub(" ", sql_text)):
        t = m.group(0)
        if t == "(":
            depth += 1
            continue
        if t == ")":
            depth -= 1
            continue
        toks.append((t.upper(), depth))
    for i, (tok, d) in enumerate(toks):
        if tok != "JOIN":
            continue
        j = i - 1                       # skip LEFT/FULL OUTER/... back to
        while j >= 0 and toks[j][0] in _JOIN_MODIFIERS:   # the qualifier
            j -= 1
        if j >= 0 and toks[j][0] in ("CROSS", "NATURAL"):
            continue                    # no ON by definition — legal
        satisfied = False
        for tok2, d2 in toks[i + 1:]:
            if d2 < d:                  # left the subexpression
                break
            if d2 != d:
                continue                # inside a subquery operand
            if tok2 in ("ON", "USING"):
                satisfied = True
                break
            if tok2 in _CLAUSE_BOUNDARY:
                break
        if not satisfied:
            return True
    return False


def _reject_implicit_cartesian(sql_text: str) -> None:
    """The reference's SQL Lab (Postgres) rejects `a JOIN b WHERE ...`
    — JOIN without ON/USING is a syntax error there
    (superset.db#query[56-61]). Spark's grammar parses it as an
    unconditioned inner join (an implicit cartesian product), which on
    a warehouse fact table is a silent combinatorial explosion instead
    of an error. Surface the reference's failure class here. Comma
    lists with WHERE predicates, CROSS JOIN and NATURAL JOIN all stay
    allowed — Postgres accepts every one of those."""
    if _join_without_on(sql_text):
        raise AnalysisException(
            "[IMPLICIT_CARTESIAN_PRODUCT] JOIN without an ON/USING "
            "condition is not allowed in the SQL Lab surface (the "
            "reference's Postgres rejects it as a syntax error). "
            "Write an explicit CROSS JOIN if a cartesian product is "
            f"intended. Statement: {sql_text.strip()[:200]}")


def run_sql(spark: SparkSession, sql_text: str,
            enforced_limit: int | None = DEFAULT_ENFORCED_LIMIT) -> DataFrame:
    """Execute ad-hoc SQL with an enforced row limit.

    AnalysisException / ParseException propagate to the caller - that IS
    the reference behavior (failed rows in the query history with the DB
    error message attached). JOIN-without-ON additionally raises here
    (Postgres rejects it; Spark alone would run the cartesian).

    The cartesian guard runs BEFORE spark.sql(): Postgres rejects the
    shape at parse time, and spark.sql() eagerly EXECUTES DDL/DML
    statements — checking after it would let a CTAS/INSERT containing
    the unconditioned join run the explosion before the rejection.
    """
    _reject_implicit_cartesian(sql_text)
    df = spark.sql(sql_text)
    if enforced_limit is not None:
        df = df.limit(enforced_limit)
    return df


def sql_lab(spark: SparkSession, sf_dir: str, sql_text: str,
            enforced_limit: int | None = DEFAULT_ENFORCED_LIMIT) -> DataFrame:
    """The complete SQL Lab experience: every catalog table registered
    as a temp view over sf_dir (through catalog.load_table, so schema
    pins and the events timestamp-flavor sniff apply), then the
    statement executes under the enforced limit. A user of the
    reference's ad-hoc SQL surface points their query here unchanged —
    Spark SQL covers the ANSI constructs the reference's query history
    shows (joins, grouping, windows, CTEs), and the 16 failure shapes
    in that history (unknown column, JOIN without ON, bad HAVING) raise
    Catalyst analysis errors to the caller just as Postgres errored
    there."""
    from etl_online_retail_spark import catalog

    for name in catalog.SCHEMAS:
        catalog.load_table(spark, name, sf_dir).createOrReplaceTempView(name)
    return run_sql(spark, sql_text, enforced_limit)
