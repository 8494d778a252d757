"""Schema evolution: union relations whose schemas drifted between loads.

Real ingestion feeds drift: a new export adds a column, an upstream type
widens (int -> bigint, float -> double, a decimal gains precision). The
reference hard-pins dtypes per read (etl.py:46-64) and would crash on
drift; a warehouse that ingests continuously needs the union-with-
evolution semantics lakehouse formats call schema merging:

  * columns are aligned BY NAME (never position);
  * a column missing on one side materializes as NULLs of the final type;
  * differing numeric types resolve to the WIDER one (the lossless
    direction); decimals take max(integer digits) + max(scale), capped
    at Spark's 38-digit ceiling;
  * any pair without a lossless widening (string vs int, struct shape
    changes) raises loudly — silent casts are how warehouses corrupt.

Pure plan surgery: two projections and a unionByName — no shuffle, no
data pass beyond the union itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# lossless widening lattice for primitive numerics
_RANK = {
    T.ByteType(): 1, T.ShortType(): 2, T.IntegerType(): 3, T.LongType(): 4,
    T.FloatType(): 5, T.DoubleType(): 6,
}


def _widen(a: T.DataType, b: T.DataType, name: str) -> T.DataType:
    if a == b:
        return a
    if isinstance(a, T.DecimalType) and isinstance(b, T.DecimalType):
        scale = max(a.scale, b.scale)
        intd = max(a.precision - a.scale, b.precision - b.scale)
        if intd + scale > 38:
            raise TypeError(
                f"schema evolution on {name!r}: decimal union "
                f"({a.simpleString()} vs {b.simpleString()}) exceeds "
                f"the 38-digit ceiling")
        return T.DecimalType(intd + scale, scale)
    if a in _RANK and b in _RANK:
        floats = (T.FloatType(), T.DoubleType())
        a_f, b_f = a in floats, b in floats
        if a_f != b_f:
            # integral x floating crossing: promote to DOUBLE, never
            # float32 (a float32 target silently corrupts any integer
            # >= 2^24). Double is the conventional mergeSchema landing
            # spot; ints past 2^53 still lose precision there — the ONE
            # permitted lossy crossing, inherent to the drift itself.
            return T.DoubleType()
        return a if _RANK[a] >= _RANK[b] else b
    raise TypeError(
        f"schema evolution on {name!r}: no lossless widening between "
        f"{a.simpleString()} and {b.simpleString()}")


def evolved_schema(old: T.StructType, new: T.StructType) -> T.StructType:
    """The union schema: old's column order first, then new-only columns
    in their own order; every field nullable (either side may lack it)."""
    fields: list[T.StructField] = []
    new_by_name = {f.name: f for f in new.fields}
    for f in old.fields:
        if f.name in new_by_name:
            t = _widen(f.dataType, new_by_name[f.name].dataType, f.name)
        else:
            t = f.dataType
        fields.append(T.StructField(f.name, t, True))
    old_names = {f.name for f in old.fields}
    for f in new.fields:
        if f.name not in old_names:
            fields.append(T.StructField(f.name, f.dataType, True))
    return T.StructType(fields)


def evolve_union(old: DataFrame, new: DataFrame) -> DataFrame:
    """Union two drifted relations under the evolved schema."""
    target = evolved_schema(old.schema, new.schema)

    def conform(df: DataFrame) -> DataFrame:
        have = {f.name: f.dataType for f in df.schema.fields}
        cols = []
        for f in target.fields:
            if f.name in have:
                c = F.col(f.name)
                if have[f.name] != f.dataType:
                    c = c.cast(f.dataType)
                cols.append(c.alias(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        return df.select(*cols)

    return conform(old).unionByName(conform(new))
