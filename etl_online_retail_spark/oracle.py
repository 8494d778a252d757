"""Spark-vs-DuckDB differential comparison (the engine's test strategy,
SURVEY.md §5: the reference ships no tests, so oracle-differential checks
are the primary gate).

Rows are compared order-insensitively: columns sorted by name, cells
normalized to strings, row multiset hashed.
"""

from __future__ import annotations

import datetime
import hashlib
import math
from dataclasses import dataclass


def norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def row_strings(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    h = hashlib.sha256()
    for line in row_strings(cols, rows):
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    duck_rows: int
    schema_ok: bool
    hash_ok: bool
    spark_only: list[str]
    duck_only: list[str]


def compare(name: str, spark_cols: list[str], spark_rows: list[tuple],
            duck_cols: list[str], duck_rows: list[tuple],
            sample: int = 3) -> CompareResult:
    schema_ok = (sorted(c.lower() for c in spark_cols)
                 == sorted(c.lower() for c in duck_cols))
    hash_ok = table_hash(spark_cols, spark_rows) == table_hash(duck_cols, duck_rows)
    ok = schema_ok and hash_ok and len(spark_rows) == len(duck_rows)
    spark_only: list[str] = []
    duck_only: list[str] = []
    if not hash_ok:
        s = row_strings(spark_cols, spark_rows)
        d = row_strings(duck_cols, duck_rows)
        dset, sset = set(d), set(s)
        spark_only = [x for x in s if x not in dset][:sample]
        duck_only = [x for x in d if x not in sset][:sample]
    return CompareResult(name, ok, len(spark_rows), len(duck_rows),
                         schema_ok, hash_ok, spark_only, duck_only)


def duckdb_connection(sf_dir: str):
    """DuckDB connection with the catalog tables registered as views."""
    import duckdb

    con = duckdb.connect()
    for name in ("region nation customer supplier part orders lineitem "
                 "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    return con
