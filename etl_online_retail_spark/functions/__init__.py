"""Scalar column-expression surface (SURVEY.md §2.10).

Everything here is a pure pyspark.sql.functions composition - JVM-side,
whole-stage-codegen friendly, no Python UDFs in any hot path. Modules:

    datetime_fns  smart date keys, ISO calendar attrs, time grains (T1-T3, P5)
    money         exact decimal money arithmetic (DECIMAL(8,2) semantics)
    text          normalization, tokens, shingles, lang-id, quality, fingerprint
    hashing       portable polynomial/minhash/simhash building blocks
    vectors       dot/norm/cosine over array<float> embedding columns
"""

from etl_online_retail_spark.functions import (  # noqa: F401
    datetime_fns,
    hashing,
    money,
    text,
    vectors,
)
