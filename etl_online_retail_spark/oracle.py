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


def norm_cell_canon(v) -> str:
    """Cell renderer for the PANDAS canonicalization path.

    The driver compares Spark and DuckDB results after converting both to
    pandas dataframes, where DuckDB HUGEINT/DECIMAL become float64 and DATE
    becomes a midnight Timestamp.  This renderer reproduces that view so the
    local gate fails exactly where the driver would:

    - numpy ints render as plain ints, numpy floats as float repr — so a
      BIGINT-vs-HUGEINT(float64) divergence ("99111" vs "99111.0") is a
      caught mismatch, unlike the old fetchall path which re-integered it;
    - decimal.Decimal renders with its literal scale ("1.50") — so a
      DECIMAL output column mismatches the float the other engine yields;
    - midnight datetimes collapse to the bare date — DuckDB's DATE →
      Timestamp('... 00:00:00') must equal Spark's datetime.date.
    """
    import numpy as np

    if v is None:
        return "NULL"
    try:
        if v != v:  # NaN / NaT — pandas renders SQL NULL as either,
            return "NULL"  # depending on dtype; collapse all NA-likes
    except (TypeError, ValueError):
        pass
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    if isinstance(v, datetime.datetime):
        if (v.tzinfo is None and v.hour == 0 and v.minute == 0
                and v.second == 0 and v.microsecond == 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


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


def row_strings(cols: list[str], rows: list[tuple], cell=norm_cell) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(cell(r[i]) for i in order) for r in rows)


def table_hash(cols: list[str], rows: list[tuple], cell=norm_cell) -> str:
    h = hashlib.sha256()
    for line in row_strings(cols, rows, cell):
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
            sample: int = 3, cell=norm_cell) -> CompareResult:
    schema_ok = (sorted(c.lower() for c in spark_cols)
                 == sorted(c.lower() for c in duck_cols))
    hash_ok = (table_hash(spark_cols, spark_rows, cell)
               == table_hash(duck_cols, duck_rows, cell))
    ok = schema_ok and hash_ok and len(spark_rows) == len(duck_rows)
    spark_only: list[str] = []
    duck_only: list[str] = []
    if not hash_ok:
        s = row_strings(spark_cols, spark_rows, cell)
        d = row_strings(duck_cols, duck_rows, cell)
        dset, sset = set(d), set(s)
        spark_only = [x for x in s if x not in dset][:sample]
        duck_only = [x for x in d if x not in sset][:sample]
    return CompareResult(name, ok, len(spark_rows), len(duck_rows),
                         schema_ok, hash_ok, spark_only, duck_only)


def compare_frames(name: str, spark_df, duck_df,
                   sample: int = 3) -> CompareResult:
    """Driver-parity compare: both sides as PANDAS dataframes.

    Use `spark_df.toPandas()` and duckdb `rel.df()` — the same conversions
    the driver's gate applies — so HUGEINT→float64, DECIMAL→float64 and
    DATE→midnight-Timestamp parity hazards surface locally instead of only
    in CORRECTNESS_r{N}.json (the round-1 fetchall gate masked 4 red rows).
    """
    scols = list(spark_df.columns)
    dcols = list(duck_df.columns)
    srows = list(spark_df.itertuples(index=False, name=None))
    drows = list(duck_df.itertuples(index=False, name=None))
    return compare(name, scols, srows, dcols, drows,
                   sample=sample, cell=norm_cell_canon)


def duckdb_connection(sf_dir: str):
    """DuckDB connection with the catalog tables registered as views."""
    import duckdb

    con = duckdb.connect()
    for name in ("region nation customer supplier part orders lineitem "
                 "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    return con
