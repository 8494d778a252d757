"""Query entry points above the DataFrame layer (SURVEY.md §3.2-3.3):
the Superset-style semantic (chart) layer and the SQL Lab front-end."""

from etl_online_retail_spark.plans.semantic import ChartSpec, chart_query  # noqa: F401
from etl_online_retail_spark.plans.sql_frontend import run_sql  # noqa: F401
