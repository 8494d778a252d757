"""Embedding quantization: int8 scalar quantization + reconstruction audit.

Vector stores at 100 TB keep embeddings quantized (4x smaller, SIMD
distance kernels) and need an audit of what the compression costs. This
module implements symmetric per-vector int8 quantization — scale =
max|x| / 127, q_i = round(x_i / scale) — and the standard reconstruction
metrics (max absolute element error, cosine between original and
dequantized vector).

All per-element math is JVM-side array expressions (transform / zip_with /
array_max): order-independent (max) or sequential folds (cosine) so a
loop-based oracle matches bit-for-bit. No arrays in query OUTPUT — the
driver's pandas canonicalization cannot hash them — only scalar metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_online_retail_spark.functions.vectors import as_double, cosine

INT8_MAX = 127.0


def quantization_audit(vectors: DataFrame, id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Per-vector int8 quantization metrics.

    Output: (id_col, scale, max_abs_err, cos_recon) — scale rounded to 9dp
    for output only (full precision is used in the arithmetic), error
    metrics to 6dp. A zero vector quantizes to itself (scale 0, error 0,
    cos_recon 0 by the zero-norm convention).
    """
    v = as_double(vec_col)
    base = (vectors
            .select(F.col(id_col), v.alias("_v"))
            .withColumn("_ma", F.array_max(F.transform(F.col("_v"), F.abs)))
            .withColumn("_scale", F.col("_ma") / F.lit(INT8_MAX)))
    # dequantized vector: round to the int8 grid, back to float space.
    # _scale is a materialized column, so referencing it inside the lambda
    # is a row-field read, not a re-evaluated expression (HOF rule 7).
    dq = F.transform(
        F.col("_v"),
        lambda x: F.round(x / F.col("_scale"), 0) * F.col("_scale"))
    base = base.withColumn(
        "_dq", F.when(F.col("_scale") == 0.0, F.col("_v")).otherwise(dq))
    err = F.array_max(
        F.zip_with(F.col("_v"), F.col("_dq"), lambda a, b: F.abs(a - b)))
    return base.select(
        F.col(id_col),
        F.round(F.col("_scale"), 9).alias("scale"),
        F.round(err, 6).alias("max_abs_err"),
        F.round(cosine(F.col("_v"), F.col("_dq")), 6).alias("cos_recon"))


def quantize_sql(id_col: str = "vec_id", vec_col: str = "embedding",
                 table: str = "embeddings") -> str:
    """DuckDB twin of quantization_audit (same fold/maximum structure)."""
    from etl_online_retail_spark.functions.vectors import cosine_sql

    return f"""
WITH base AS (
  SELECT {id_col},
         list_transform({vec_col}, x -> x::DOUBLE) AS v,
         list_max(list_transform({vec_col}, x -> abs(x::DOUBLE)))
           / {INT8_MAX!r} AS s
  FROM {table}),
dq AS (
  SELECT {id_col}, v, s,
         CASE WHEN s = 0.0 THEN v
              ELSE list_transform(v, x -> round(x / s, 0) * s) END AS d
  FROM base)
SELECT {id_col}, ROUND(s, 9) AS scale,
  ROUND(list_max(list_transform(list_zip(v, d),
                 p -> abs(p[1]::DOUBLE - p[2]::DOUBLE))), 6) AS max_abs_err,
  ROUND({cosine_sql('v', 'd')}, 6) AS cos_recon
FROM dq
"""
