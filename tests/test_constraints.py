"""Integrity-check operators + the full warehouse constraint sweep."""

from __future__ import annotations

import pytest

from etl_online_retail_spark.operators.constraints import (
    check_warehouse,
    fixed_width_violations,
    not_null_violations,
    unique_key_violations,
)


def test_individual_checks(spark):
    df = spark.createDataFrame(
        [("12345", 1), (None, 2), ("1234", 3), ("12345", 4), ("12345", 4)],
        "key string, id int")
    assert not_null_violations(df, ["key"]) == 1
    assert fixed_width_violations(df, "key", 5) == 1  # '1234'; null ignored
    assert unique_key_violations(df, ["id"]) == 2     # two rows share id 4
    assert unique_key_violations(df, ["key", "id"]) == 2


@pytest.fixture(scope="module")
def warehouse(spark):
    from etl_online_retail_spark.pipeline.retail import build_warehouse
    from tests.test_pipeline_golden import RAW_SCHEMA, ROWS

    return build_warehouse(spark.createDataFrame(ROWS, RAW_SCHEMA))


def test_warehouse_satisfies_all_reference_constraints(warehouse):
    assert check_warehouse(warehouse) == {}
