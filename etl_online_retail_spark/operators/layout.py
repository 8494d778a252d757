"""Z-order (Morton) data layout: multi-dimensional pruning from a
one-dimensional sort.

A parquet scan prunes row groups by min/max statistics, which only helps
for columns correlated with the file sort order. Sorting by the Z-VALUE —
the bit-interleaving of two (or more) key columns — keeps every contiguous
chunk of rows narrow in BOTH dimensions at once, so predicates on either
column (or both) skip most row groups. This is the layout trick behind
Delta/Iceberg OPTIMIZE ZORDER; here it is an explicit operator: compute
the z-value (pure integer bit arithmetic — engine-portable, oracle-
verifiable), repartitionByRange + sortWithinPartitions on it, write.

Scale shape: the z-value is a per-row expression (no shuffle); laying out
N rows is exactly one range-shuffle + local sort — the same cost as any
single-column sort, but buying pruning on every interleaved dimension.

No counterpart in the reference (its warehouse relies on Postgres btree
indexes, init_db.sql:17-36); this is what replaces those indexes in a
columnar lake.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # per-dimension; 2 dims x 16 bits = 32-bit z-values


def z_value(a: Column, b: Column, bits: int = Z_BITS) -> Column:
    """Morton interleave of the low `bits` bits of two non-negative
    BIGINT columns: bit i of `a` lands at position 2i, bit i of `b` at
    2i+1. Callers with wider domains reduce first (e.g. pmod or scale);
    2*bits must stay < 63."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (z
             + F.shiftleft(F.shiftright(a.cast("bigint"), i)
                           .bitwiseAND(F.lit(1)), 2 * i)
             + F.shiftleft(F.shiftright(b.cast("bigint"), i)
                           .bitwiseAND(F.lit(1)), 2 * i + 1))
    return z


def z_value_sql(a_expr: str, b_expr: str, bits: int = Z_BITS) -> str:
    """DuckDB twin of z_value (same bit arithmetic)."""
    terms = []
    for i in range(bits):
        terms.append(f"(((({a_expr})::BIGINT >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({b_expr})::BIGINT >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_write(df: DataFrame, a_col: str, b_col: str, out_dir: str,
                 n_files: int = 32, bits: int = Z_BITS) -> None:
    """Write `df` z-ordered on (a_col, b_col): range-partition by the
    z-value so files tile the z-curve, sort within partitions so row
    groups tile it too. Readers filtering on EITHER column prune via
    ordinary parquet min/max stats."""
    z = z_value(F.col(a_col), F.col(b_col), bits)
    (df.withColumn("_z", z)
     .repartitionByRange(n_files, "_z")
     .sortWithinPartitions("_z")
     .drop("_z")
     .write.mode("overwrite").parquet(out_dir))


def parquet_layout_stats(spark, path: str,
                         columns: list[str]) -> DataFrame:
    """Physical-layout introspection: per (file, row group, column) the
    row count and min/max footer statistics — the metadata every scan
    planner prunes with (and the evidence behind the z-order pruning
    claims). Footers are read driver-side with pyarrow: the work is
    FILE-COUNT bounded (a few KB per footer, no data pages touched),
    the same boundedness class as the codebook/vocabulary collects.

    Values surface as STRINGS so one relation covers every column type
    (the cross-engine caveat: integer and string stats stringify
    identically everywhere; float/timestamp reprs can differ between
    engines' printers, so oracle-checked queries should stick to
    int/string columns). Output: (file_idx INT, row_group INT,
    n_rows BIGINT, column STRING, min_value STRING, max_value STRING),
    file_idx ordered by file name for determinism.
    """
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.endswith(".parquet"))
    else:
        files = [path]
    rows = []
    for fi, fname in enumerate(files):
        meta = pq.ParquetFile(fname).metadata
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            by_name = {g.column(i).path_in_schema: g.column(i)
                       for i in range(g.num_columns)}
            for col in columns:
                c = by_name[col]
                st = c.statistics
                # a chunk can carry a statistics object WITHOUT min/max
                # (all-NULL column): has_min_max=False with st.min None —
                # emit NULL, never the literal string "None"
                has = st is not None and st.has_min_max
                rows.append((fi, rg, g.num_rows, col,
                             str(st.min) if has else None,
                             str(st.max) if has else None))
    return spark.createDataFrame(
        rows, "file_idx INT, row_group INT, n_rows BIGINT, "
              "column STRING, min_value STRING, max_value STRING")
