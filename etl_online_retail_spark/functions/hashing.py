"""Portable hashing building blocks for dedup/similarity operators.

Engine-native hash functions differ (Spark murmur3 vs DuckDB's internal
hash), so every hash here is built from arithmetic both engines evaluate
identically: a polynomial rolling hash over character codepoints modulo a
31-bit prime, and affine universal-hash families with constants generated
once in Python and inlined into BOTH the Spark expressions and the oracle
SQL. Verified cross-engine: poly_hash/minhash/bit-extraction produce
bit-identical values on Spark 4.1 and DuckDB 1.0.

All loops are array expressions (transform/aggregate) - JVM-side, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 31-bit prime: a*h+b stays far below int64 overflow (DuckDB raises on
# overflow; Spark wraps - neither may ever be hit).
PRIME = 1_000_000_007
_MULT = 31


def hash_family(k: int, seed: int = 42) -> list[tuple[int, int]]:
    """k deterministic (a, b) pairs for the affine family (a*h + b) % PRIME.

    A simple LCG keyed by seed; constants are inlined as literals on both
    engines so the family can never drift between them.
    """
    pairs = []
    state = seed
    for _ in range(k):
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        a = state % (PRIME - 2) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        b = state % (PRIME - 1)
        pairs.append((a, b))
    return pairs


def poly_hash(col: Column | str) -> Column:
    """Polynomial rolling hash of a string -> BIGINT in [0, PRIME).

    h = fold(codepoints, 0, (acc, c) -> (acc*31 + c) % PRIME)

    DuckDB twin: list_reduce(list_prepend(0::BIGINT,
        list_transform(string_split(s, ''), c -> ascii(c)::BIGINT)),
        (a, b) -> (a*31 + b) % 1000000007)
    """
    c = F.col(col) if isinstance(col, str) else col
    codes = F.transform(F.split(c, ""), lambda ch: F.ascii(ch).cast("bigint"))
    return F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * _MULT + x) % PRIME,
    )


def poly_hash_sql(expr: str) -> str:
    """DuckDB SQL twin of poly_hash for the oracle."""
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(string_split({expr}, ''), c -> ascii(c)::BIGINT)), "
        f"(a, b) -> (a * {_MULT} + b) % {PRIME})"
    )


def affine(h: Column, a: int, b: int) -> Column:
    """(a*h + b) % PRIME on a BIGINT column."""
    return (h * F.lit(a) + F.lit(b)) % F.lit(PRIME)


def affine_sql(expr: str, a: int, b: int) -> str:
    return f"(({expr}) * {a}::BIGINT + {b}::BIGINT) % {PRIME}"


def minhash_signature(hashes: Column, k: int, seed: int = 42) -> Column:
    """MinHash signature: array of k mins over a BIGINT-array column.

    minhash_j = min over set of (a_j*h + b_j) % PRIME. Evaluated per row as
    k array_min(transform(...)) expressions - no shuffle, no UDF.
    """
    def _affine_fn(a: int, b: int):
        # closure factory: default-arg captures (lambda h, a=a, b=b) would
        # change the arity pyspark's higher-order functions introspect
        return lambda h: affine(h, a, b)

    sig = [
        F.array_min(F.transform(hashes, _affine_fn(a, b)))
        for (a, b) in hash_family(k, seed)
    ]
    return F.array(*sig)


def minhash_signature_sql(hashes_expr: str, k: int, seed: int = 42) -> str:
    """DuckDB SQL twin of minhash_signature."""
    parts = [
        f"list_min(list_transform({hashes_expr}, h -> {affine_sql('h', a, b)}))"
        for (a, b) in hash_family(k, seed)
    ]
    return "[" + ", ".join(parts) + "]"


def bit(h: Column, i: int) -> Column:
    """Bit i of a BIGINT column as 0/1."""
    return F.shiftright(h, i).bitwiseAND(F.lit(1))


def bit_sql(expr: str, i: int) -> str:
    return f"((({expr}) >> {i}) & 1)"
