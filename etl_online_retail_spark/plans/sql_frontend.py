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

# A Join node in the ANALYZED plan with no condition prints as a bare
# "Join Inner" / "Join LeftOuter" line (with a condition it prints
# "Join Inner, (cond)"). Explicit "Join Cross" is the user saying
# CROSS JOIN and stays allowed.
_IMPLICIT_CARTESIAN = re.compile(
    r"\bJoin (Inner|LeftOuter|RightOuter|FullOuter)\s*$")


def _reject_implicit_cartesian(df: DataFrame, sql_text: str) -> None:
    """The reference's SQL Lab (Postgres) rejects `a JOIN b WHERE ...`
    — JOIN without ON/USING is a syntax error there
    (superset.db#query[56-61]). Spark's grammar parses it as an
    unconditioned inner join (an implicit cartesian product), which on
    a warehouse fact table is a silent combinatorial explosion instead
    of an error. Surface the reference's failure class at analysis
    time: scan the analyzed plan for a condition-less non-cross Join."""
    plan = df._jdf.queryExecution().analyzed().toString()
    for line in plan.splitlines():
        if _IMPLICIT_CARTESIAN.search(line.strip()):
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
    """
    df = spark.sql(sql_text)
    _reject_implicit_cartesian(df, sql_text)
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
