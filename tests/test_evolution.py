"""Schema evolution union + late-arriving dimension flow."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_online_retail_spark.operators.evolution import (
    evolve_union,
    evolved_schema,
)
from etl_online_retail_spark.operators.surrogate import (
    backfill_late_dims,
    resolve_with_unknown,
)


def test_evolve_union_aligns_widens_and_nullfills(spark):
    old = spark.createDataFrame(
        [(1, 10, 1.5)], "id INT, qty INT, price FLOAT")
    new = spark.createDataFrame(
        [(2, 20_000_000_000, 2.5, "eu")],
        "id INT, qty BIGINT, price DOUBLE, region STRING")
    out = evolve_union(old, new)
    sch = {f.name: f.dataType for f in out.schema.fields}
    assert sch["qty"] == T.LongType()          # widened, lossless
    assert sch["price"] == T.DoubleType()
    assert sch["region"] == T.StringType()     # new-only column
    assert [f.name for f in out.schema.fields] \
        == ["id", "qty", "price", "region"]    # old order first
    rows = {r.id: r for r in out.collect()}
    assert rows[1].region is None              # null-filled on old rows
    assert rows[2].qty == 20_000_000_000
    assert all(f.nullable for f in out.schema.fields)


def test_evolve_union_decimal_and_refusals(spark):
    a = T.StructType([T.StructField("v", T.DecimalType(10, 2))])
    b = T.StructType([T.StructField("v", T.DecimalType(12, 4))])
    assert evolved_schema(a, b)["v"].dataType == T.DecimalType(12, 4)
    # string vs int: no lossless widening -> loud refusal
    c = spark.createDataFrame([("x",)], "v STRING")
    d = spark.createDataFrame([(1,)], "v INT")
    with pytest.raises(TypeError, match="lossless"):
        evolve_union(c, d)
    # decimal blow-past-38 refusal
    wide_a = T.StructType([T.StructField("v", T.DecimalType(38, 0))])
    wide_b = T.StructType([T.StructField("v", T.DecimalType(38, 10))])
    with pytest.raises(TypeError, match="38"):
        evolved_schema(wide_a, wide_b)


def test_late_arriving_dim_parks_then_backfills(spark):
    facts = spark.createDataFrame(
        [(100, "A"), (101, "B"), (102, "C")], "fact_id INT, sku STRING")
    dim_v1 = spark.createDataFrame(
        [("A", 2)], "sku STRING, product_dim_id INT")
    resolved = resolve_with_unknown(facts, dim_v1, "sku",
                                    "product_dim_id")
    by = {r.fact_id: r for r in resolved.collect()}
    assert by[100].product_dim_id == 2 and by[100]._dim_resolved
    # B and C outran the dim feed: parked on the unknown member
    for fid in (101, 102):
        assert by[fid].product_dim_id == 1 and not by[fid]._dim_resolved

    # the dim feed catches up with B; C is still missing
    dim_v2 = spark.createDataFrame(
        [("A", 2), ("B", 3)], "sku STRING, product_dim_id INT")
    filled = backfill_late_dims(resolved, dim_v2, "sku",
                                "product_dim_id")
    by2 = {r.fact_id: r for r in filled.collect()}
    assert by2[100].product_dim_id == 2        # untouched
    assert by2[101].product_dim_id == 3 and by2[101]._dim_resolved
    assert by2[102].product_dim_id == 1 and not by2[102]._dim_resolved
    assert filled.count() == 3                 # no row lost or duplicated

    # idempotent: a second backfill against the same dim changes nothing
    again = backfill_late_dims(filled, dim_v2, "sku", "product_dim_id")
    assert sorted(map(tuple, again.collect())) \
        == sorted(map(tuple, filled.collect()))


def test_evolve_union_int_float_crossing_promotes_to_double(spark):
    old = spark.createDataFrame([(16_777_217,)], "v BIGINT")
    new = spark.createDataFrame([(1.5,)], "v FLOAT")
    out = evolve_union(old, new)
    assert out.schema["v"].dataType == T.DoubleType()
    vals = sorted(r.v for r in out.collect())
    assert vals[1] == 16_777_217.0     # survives (float32 would corrupt)


def test_evolved_schema_lattice_properties():
    """The widening lattice is symmetric (up to column order) and
    idempotent — the algebra a multi-load union chain relies on."""
    import itertools

    from etl_online_retail_spark.operators.evolution import evolved_schema

    types = [T.IntegerType(), T.LongType(), T.FloatType(), T.DoubleType(),
             T.DecimalType(10, 2), T.DecimalType(14, 4), T.StringType()]
    for a, b in itertools.product(types, types):
        sa = T.StructType([T.StructField("v", a)])
        sb = T.StructType([T.StructField("v", b)])
        try:
            ab = evolved_schema(sa, sb)["v"].dataType
        except TypeError:
            # refusal must be symmetric too
            with pytest.raises(TypeError):
                evolved_schema(sb, sa)
            continue
        ba = evolved_schema(sb, sa)["v"].dataType
        assert ab == ba, (a, b)                        # symmetric
        sab = T.StructType([T.StructField("v", ab)])
        assert evolved_schema(sab, sa)["v"].dataType == ab   # idempotent
        assert evolved_schema(sab, sb)["v"].dataType == ab
