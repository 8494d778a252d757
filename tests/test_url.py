"""URL canonicalization (functions/url.py): step semantics on
adversarial inputs, and Spark/DuckDB twin PARITY — both engines
canonicalize the same messy spellings and must agree bit-exactly (the
registry query proves correctness against a closed form; this proves
the SQL twin implements the same function everywhere, including inputs
the fixture never generates)."""

from __future__ import annotations

import duckdb
import pytest

from etl_online_retail_spark.functions.url import (
    canonical_url,
    canonical_url_sql,
)

CASES = [
    # (input, expected canonical)
    ("http://Example.COM/a/b?x=1", "http://example.com/a/b?x=1"),
    ("HTTP://HOST:80/p?b=2&a=1#frag", "http://host/p?a=1&b=2"),
    ("https://host:443/p?a=1", "https://host/p?a=1"),
    ("https://host:8443/p", "https://host:8443/p"),   # non-default kept
    ("http://host:443/p", "http://host:443/p"),       # wrong default kept
    ("http://host/a/?utm_source=x&utm_medium=y", "http://host/a"),
    ("http://host/a?fbclid=abc&x=1&gclid=z", "http://host/a?x=1"),
    ("http://host/", "http://host"),
    ("http://host", "http://host"),
    ("http://host/a//", "http://host/a"),
    ("http://host/a?", "http://host/a"),
    ("http://host/p?utm_x=1&utm_x=2", "http://host/p"),
    # value containing '=' splits on the FIRST '=' for the key test
    ("http://host/p?gclid=a=b&k=v", "http://host/p?k=v"),
    ("ftp://Host/f", "ftp://host/f"),                 # other schemes pass
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "u string")
    got = [r.c for r in df.select(canonical_url("u").alias("c")).collect()]
    assert got == [want for _, want in CASES]


def test_canonical_url_sql_twin_parity(spark):
    con = duckdb.connect()
    sql = canonical_url_sql("u")
    for u, want in CASES:
        duck = con.execute(f"SELECT {sql} FROM (SELECT ? AS u)",
                           [u]).fetchone()[0]
        assert duck == want, (u, duck)


def test_canonical_url_sort_is_bytewise(spark):
    # parameter order must be deterministic and engine-identical for
    # mixed-case keys (bytewise: uppercase sorts before lowercase)
    u = "http://h/p?b=1&A=2"
    df = spark.createDataFrame([(u,)], "u string")
    got = df.select(canonical_url("u").alias("c")).collect()[0].c
    assert got == "http://h/p?A=2&b=1"
    duck = duckdb.connect().execute(
        f"SELECT {canonical_url_sql('u')} FROM (SELECT ? AS u)",
        [u]).fetchone()[0]
    assert duck == got
