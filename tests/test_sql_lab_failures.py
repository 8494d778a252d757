"""SQL Lab failure parity (SURVEY.md §3.3).

The reference's superset.db query history records 27 failed ad-hoc
statements; their error shapes cluster into the classes below. Each
class, adapted to the same retail warehouse schema (sources/ddl.py ==
init_db.sql), must raise the matching Catalyst error through
plans/sql_frontend.run_sql — the reference surface shows the DB error in
the query history, so OUR surface must error too, not silently run.

Reference rows cited per class (superset/superset.db#query ids).
"""

from __future__ import annotations

import pytest
from pyspark.errors import AnalysisException, ParseException

from etl_online_retail_spark.plans.sql_frontend import run_sql

FAILURE_CLASSES = [
    # (class, reference ids, adapted statement, expected exception,
    #  error-class fragment expected in the message)
    ("syntax_missing_comma", "q36",
     "SELECT date, country cust_country SUM(quantity * unit_price) rev "
     "FROM retail.fct_invoices",
     ParseException, "PARSE_SYNTAX_ERROR"),
    ("syntax_trailing_comma", "q79-81",
     "SELECT country, COUNT(DISTINCT customer_id) cnt, "
     "FROM retail.fct_invoices inv JOIN retail.dim_customers cust "
     "ON inv.customer_dim_id = cust.customer_dim_id GROUP BY country",
     ParseException, "PARSE_SYNTAX_ERROR"),
    ("unknown_column", "q46,q48-49,q66",
     "SELECT SUM(quantity * unit_price) revenue FROM retail.fct_invoices "
     "WHERE invoice_date_id >= 20091201",
     AnalysisException, "UNRESOLVED_COLUMN"),
    ("unknown_relation", "q5",
     "SELECT * FROM fct_invoices",   # unqualified, schema not set
     AnalysisException, "TABLE_OR_VIEW_NOT_FOUND"),
    ("join_without_on", "q56-61",
     "SELECT SUM(quantity * unit_price) revenue "
     "FROM retail.fct_invoices invoices "
     "JOIN retail.dim_customers customers "
     "WHERE invoices.invoice_date_dim_id >= 20091201",
     AnalysisException, "IMPLICIT_CARTESIAN_PRODUCT"),
    ("non_grouped_column", "q14,q16,q51,q64-65",
     "SELECT customer_id, country, SUM(quantity) s "
     "FROM retail.fct_invoices i JOIN retail.dim_customers c "
     "ON i.customer_dim_id = c.customer_dim_id GROUP BY country",
     AnalysisException, "MISSING_AGGREGATION"),
    ("aggregate_misuse_in_having", "q34-35",
     "SELECT country, SUM(quantity) s "
     "FROM retail.fct_invoices i JOIN retail.dim_customers c "
     "ON i.customer_dim_id = c.customer_dim_id GROUP BY country "
     "HAVING SUM(quantity) > MAX(SUM(quantity))",
     AnalysisException, "NESTED_AGGREGATE_FUNCTION"),
    ("multiple_statements", "q20",
     "SELECT MAX(date) FROM retail.dim_dates; "
     "DROP TABLE retail.dim_dates;",
     ParseException, "PARSE_SYNTAX_ERROR"),
]


@pytest.fixture(scope="module")
def retail_schema(spark):
    from etl_online_retail_spark.sources.ddl import init_warehouse

    init_warehouse(spark)
    yield spark
    spark.sql("DROP DATABASE IF EXISTS retail CASCADE")


@pytest.mark.parametrize(
    "cls,ref,sql,exc,fragment",
    FAILURE_CLASSES, ids=[c[0] for c in FAILURE_CLASSES])
def test_sql_lab_failure_class(retail_schema, cls, ref, sql, exc, fragment):
    with pytest.raises(exc) as ei:
        run_sql(retail_schema, sql).collect()
    assert fragment in str(ei.value), (cls, str(ei.value)[:300])


def test_explicit_cross_join_stays_allowed(retail_schema):
    """The cartesian guard only rejects the IMPLICIT form — a user who
    writes CROSS JOIN gets the product they asked for."""
    out = run_sql(
        retail_schema,
        "SELECT c.customer_dim_id, d.date_dim_id "
        "FROM retail.dim_customers c CROSS JOIN retail.dim_dates d",
        enforced_limit=5)
    assert out.count() <= 5


def test_comma_join_with_where_predicate_stays_allowed(retail_schema):
    """Postgres accepts comma-style FROM lists — they are not the
    JOIN-without-ON failure class even though they analyze to the same
    condition-less Join Inner before optimization (ADVICE r6)."""
    out = run_sql(
        retail_schema,
        "SELECT COUNT(*) AS n "
        "FROM retail.fct_invoices i, retail.dim_customers c "
        "WHERE i.customer_dim_id = c.customer_dim_id")
    assert out.collect()[0].n >= 0


def test_join_without_on_in_subquery_still_rejected(retail_schema):
    from pyspark.errors import AnalysisException as AE

    with pytest.raises(AE, match="IMPLICIT_CARTESIAN_PRODUCT"):
        run_sql(
            retail_schema,
            "SELECT * FROM (SELECT i.quantity FROM retail.fct_invoices i "
            "JOIN retail.dim_customers c) s").collect()


def test_subquery_operand_does_not_satisfy_outer_join(retail_schema):
    """An ON inside a subquery operand must not count for the outer
    JOIN that carries the subquery."""
    from pyspark.errors import AnalysisException as AE

    with pytest.raises(AE, match="IMPLICIT_CARTESIAN_PRODUCT"):
        run_sql(
            retail_schema,
            "SELECT * FROM retail.dim_customers c JOIN "
            "(SELECT i.customer_dim_id FROM retail.fct_invoices i "
            "JOIN retail.dim_dates d ON i.invoice_date_dim_id = "
            "d.date_dim_id) s").collect()


def test_join_keyword_inside_string_literal_ignored(retail_schema):
    out = run_sql(
        retail_schema,
        "SELECT 'JOIN without ON' AS note, COUNT(*) AS n "
        "FROM retail.dim_customers")
    assert out.collect()[0].note == "JOIN without ON"


def test_backslash_escaped_quote_in_literal(retail_schema):
    """Spark's default string literals admit \\' escapes; the stripper
    must not leak the tail of such a literal into the token stream
    (review r7: 'O\\'Brien JOIN' false-rejected)."""
    out = run_sql(
        retail_schema,
        "SELECT 'O\\'Brien JOIN' AS s FROM retail.dim_customers LIMIT 1")
    assert out.collect()[0].s == "O'Brien JOIN"


def test_join_lateral_with_on_stays_allowed(retail_schema):
    """JOIN LATERAL (subquery) alias ON cond is Postgres-legal — the
    LATERAL keyword must not cut the scan off before the ON
    (review r7)."""
    out = run_sql(
        retail_schema,
        "SELECT c.customer_dim_id, s.x FROM retail.dim_customers c "
        "JOIN LATERAL (SELECT c.customer_dim_id AS x) s ON true",
        enforced_limit=5)
    assert out.count() <= 5


def test_conditioned_joins_pass_the_cartesian_guard(retail_schema):
    out = run_sql(
        retail_schema,
        "SELECT COUNT(*) AS n FROM retail.fct_invoices i "
        "JOIN retail.dim_customers c "
        "ON i.customer_dim_id = c.customer_dim_id "
        "LEFT JOIN retail.dim_products p "
        "ON i.product_dim_id = p.product_dim_id")
    assert out.collect()[0].n >= 0
