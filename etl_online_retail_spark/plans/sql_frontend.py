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

from pyspark.sql import DataFrame, SparkSession

DEFAULT_ENFORCED_LIMIT = 100_000


def run_sql(spark: SparkSession, sql_text: str,
            enforced_limit: int | None = DEFAULT_ENFORCED_LIMIT) -> DataFrame:
    """Execute ad-hoc SQL with an enforced row limit.

    AnalysisException / ParseException propagate to the caller - that IS
    the reference behavior (failed rows in the query history with the DB
    error message attached).
    """
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
