"""Z-order layout: bit-interleave correctness and the pruning it buys.

The pruning assertion reads real parquet footer statistics (pyarrow) —
the same min/max row-group stats a Spark scan prunes with — rather than
trusting the locality claim abstractly.
"""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from etl_online_retail_spark.operators.layout import z_value, zorder_write


def _interleave_py(a: int, b: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_z_value_matches_python_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (255, 255), (123, 45), (65535, 1)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {(r.a, r.b): r.z for r in
           df.select("a", "b",
                     z_value(F.col("a"), F.col("b"), 16).alias("z"))
           .collect()}
    for a, b in rows:
        assert got[(a, b)] == _interleave_py(a, b, 16), (a, b)


def _files_overlapping(path: str, col: str, lo: int, hi: int) -> int:
    """Files whose [min, max] footer stats for `col` intersect [lo, hi] —
    exactly the files a stats-pruned scan must read."""
    import glob

    n = 0
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    mins.append(c.statistics.min)
                    maxs.append(c.statistics.max)
        if mins and not (hi < min(mins) or lo > max(maxs)):
            n += 1
    return n


def test_zorder_write_prunes_both_dimensions(spark, tmp_path):
    """A 256x256 grid written z-ordered: a narrow predicate on EITHER
    dimension must overlap only a minority of files, where a layout
    sorted on one dimension alone cannot prune the other at all."""
    grid = (spark.range(256 * 256)
            .select((F.col("id") % 256).alias("a"),
                    (F.col("id") / 256).cast("long").alias("b")))

    zdir = str(tmp_path / "zorder")
    zorder_write(grid, "a", "b", zdir, n_files=16, bits=8)
    adir = str(tmp_path / "asort")
    (grid.repartitionByRange(16, "a").sortWithinPartitions("a")
     .write.mode("overwrite").parquet(adir))

    # narrow band in each dimension (1/16 of the domain)
    za = _files_overlapping(zdir, "a", 0, 15)
    zb = _files_overlapping(zdir, "b", 0, 15)
    assert za <= 8 and zb <= 8, (za, zb)  # prunes in BOTH dims
    # the single-dim layout reads every file for the other dimension
    ab = _files_overlapping(adir, "b", 0, 15)
    assert ab >= 15, ab
    # and both layouts return identical data
    assert (spark.read.parquet(zdir).count()
            == spark.read.parquet(adir).count() == 256 * 256)
