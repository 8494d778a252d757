"""Vector math over array<float> embedding columns (similarity extensions).

Dot products / norms / cosine as JVM-side array expressions
(zip_with + aggregate): sequential left-to-right folds, so the float
summation order is deterministic and matches a loop-based oracle. Elements
are cast to double FIRST so both engines accumulate in float64.

At 100 TB these expressions run inside whole-stage codegen per row with no
Python boundary; the brute-force top-k and LSH-bucketed variants built on
them live in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    d = dot(a, b)
    denom = norm(a) * norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(d / denom)


# DuckDB twins. list_reduce folds left-to-right like F.aggregate, so the
# accumulation order (and thus the exact float result) matches Spark.
def dot_sql(a: str, b: str) -> str:
    return (f"list_reduce(list_prepend(0.0::DOUBLE, "
            f"list_transform(list_zip({a}, {b}), "
            f"p -> p[1]::DOUBLE * p[2]::DOUBLE)), (acc, x) -> acc + x)")


def norm_sql(a: str) -> str:
    return (f"sqrt(list_reduce(list_prepend(0.0::DOUBLE, "
            f"list_transform({a}, x -> x::DOUBLE * x::DOUBLE)), "
            f"(acc, x) -> acc + x))")


def cosine_sql(a: str, b: str) -> str:
    return (f"(CASE WHEN {norm_sql(a)} * {norm_sql(b)} = 0.0 THEN 0.0 "
            f"ELSE {dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}) END)")


# Integer-lattice (exact-mode) twins — r13. floor(x * scale) on the
# double-cast component is one IEEE multiply + floor, bit-identical in
# Spark, numpy and DuckDB; the folds below then run entirely in BIGINT,
# so the results are order-independent exact integers (inside double's
# 2^53 range too, so DuckDB's list arithmetic cannot round). See
# operators/similarity.py's exact-mode ANN section for the overflow
# budget.
def int_vec_sql(a: str, scale: int = 1000) -> str:
    return (f"list_transform({a}, "
            f"x -> CAST(floor(x::DOUBLE * {scale}) AS BIGINT))")


def int_dot_sql(a: str, b: str) -> str:
    return (f"list_reduce(list_prepend(0::BIGINT, "
            f"list_transform(list_zip({a}, {b}), p -> p[1] * p[2])), "
            f"(acc, x) -> acc + x)")


def int_l2_sql(a: str, b: str) -> str:
    return (f"list_reduce(list_prepend(0::BIGINT, "
            f"list_transform(list_zip({a}, {b}), "
            f"p -> (p[1] - p[2]) * (p[1] - p[2]))), "
            f"(acc, x) -> acc + x)")
