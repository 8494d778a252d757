"""Int8 quantization audit: grid bound, zero vector, reconstruction."""

from __future__ import annotations

from etl_online_retail_spark.operators.quantize import quantization_audit


def _audit(spark, rows):
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return {r.vec_id: r for r in quantization_audit(df).collect()}


def test_error_bounded_by_half_step(spark):
    out = _audit(spark, [(1, [1.0, -0.5, 0.25, 0.0])])
    r = out[1]
    # max quantization error of round-to-grid is scale/2
    assert r.scale == round(1.0 / 127.0, 9)
    assert r.max_abs_err <= 1.0 / 127.0 / 2 + 1e-9
    assert r.cos_recon > 0.999


def test_zero_vector_is_fixed_point(spark):
    r = _audit(spark, [(1, [0.0, 0.0, 0.0])])[1]
    assert (r.scale, r.max_abs_err, r.cos_recon) == (0.0, 0.0, 0.0)


def test_extreme_element_survives_exactly(spark):
    # the max-magnitude element maps to exactly +/-127 -> zero error there
    r = _audit(spark, [(1, [2.0, 1.0])])[1]
    assert r.max_abs_err < 2.0 / 127.0  # only the 1.0 element carries error
