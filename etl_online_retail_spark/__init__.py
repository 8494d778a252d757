"""PySpark-native analytics engine with the query/data-processing surface of
minkminkk/etl-online-retail, rebuilt Spark-first (DataFrame/SQL/Catalyst).

The reference (/root/reference) is a pandas+Airflow ETL into a Postgres star
schema with a Superset BI layer; there is no bespoke execution engine there
(SURVEY.md). This package re-expresses its full operator inventory — scans,
cleaning filters, star-schema build (SCD1 keep-last dims, surrogate keys,
date spine), BI aggregations (grouped/global SUM, COUNT DISTINCT, ROLLUP,
HAVING, top-k, time grains) — as lazy DataFrame plans that Catalyst/Tungsten
optimize, plus the large-scale training-data extensions the reference lacks
(dedup families, similarity search, text analysis, streaming, multimodal).

Layout:
    session      SparkSession factory tuned for the local[*] harness
    catalog      explicit StructType schemas + schema-enforced parquet loaders
    functions/   scalar column expressions (datetime, text, vectors, hashing)
    operators/   composable DataFrame -> DataFrame operators
    sources/     boundary readers/writers (parquet staging, excel ingest, ...)
    plans/       semantic (chart) layer + SQL front-end with enforced limits
    streaming/   Structured Streaming surface (windows, watermark, sessions)
    pipeline/    the end-to-end retail ETL (the reference DAG, one Spark job)
    multimodal/  opaque-binary column plumbing with stubbed decoders
"""

from etl_online_retail_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
