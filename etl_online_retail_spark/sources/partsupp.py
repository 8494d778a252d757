"""Synthesized deterministic `partsupp` (SURVEY.md §2 TPC-H shapes).

The driver testdata ships no partsupp table, so the Q2/Q9/Q11/Q16/Q20
shapes previously proxied `ps_supplycost`/`ps_availqty` off part and the
fact table (round-6 verdict gap #3). This module closes it with a
partsupp that is a PURE INTEGER FUNCTION of (p_partkey, supplier count):
both engines derive the identical relation from the same two parquet
tables, so the queries over it stay hash-exact with no new file at rest.

Shape follows the TPC-H generator (public spec, dbgen 4.2.1): each part
gets exactly ``SUPPLIERS_PER_PART`` (4) suppliers, spread across the
supplier space by a stride of S/4 so a part's suppliers never cluster —
adapted to the testdata's 0-based contiguous keys, with the rotation
term ``p_partkey // S`` keeping the assignment from being periodic in
the part key. Distinctness: the i-th offsets ``i * (S div 4)`` are
pairwise distinct mod S for S >= 4, so the 4 (partkey, suppkey) rows
per part are genuinely 4 suppliers.

Cost/quantity attributes are affine-mod hashes of the key pair (the
same trick the spec's dbgen RNG serves — deterministic per key, flat
across the domain), kept in INTEGER cents / units so every aggregate
over them is order-independent and cross-engine exact:

  ps_availqty         1 .. 9999            (INT, spec range)
  ps_supplycost_cents 100 .. 100099        (BIGINT: 1.00 .. 1000.99)
  ps_supplycost       cents / 100.0        (DOUBLE; one exact IEEE
                                            division — display only,
                                            aggregates use the cents)

Scale: the relation is |part| x 4 rows built map-side — the part scan
crosses a broadcast 4-row index and a broadcast 1-row supplier count;
the only exchanges are those broadcasts plus the COUNT's one-row
partial->final SinglePartition pair (bounded by construction; plan-
tested). No part-sized data ever shuffles, nothing materializes; the
result is dimension-sized, so fact joins against it broadcast under
the usual size guard.

Reference parity: the reference warehouse has no partsupp either
(init_db.sql:1-42); this exists for the TPC-H decision-support surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_online_retail_spark.catalog import load_table

SUPPLIERS_PER_PART = 4

# The suppkey assignment, availqty and supplycost formulas — ONE source
# of truth, spliced into both engines' texts. `{pk}`/`{sk}`/`{s}`/`{i}`
# are column references; all arithmetic is BIGINT-exact (max product
# ~1e5 * partkey, overflow-free to partkey ~9e13).
_SUPPKEY_F = "({pk} + {pk} {div} {s} + {i} * ({s} {div} 4)) % {s}"
_AVAILQTY_F = "CAST(({pk} * 47 + {sk} * 31) % 9999 + 1 AS INTEGER)"
_COST_CENTS_F = "({pk} * 7919 + {sk} * 104729) % 100000 + 100"


def _body(div: str) -> str:
    """The shared derivation in one engine's integer-division dialect
    (Spark: DIV, DuckDB: //)."""
    sk = _SUPPKEY_F.format(pk="p_partkey", s="s_cnt", i="i", div=div)
    return (
        "SELECT ps_partkey, ps_suppkey, "
        + _AVAILQTY_F.format(pk="ps_partkey", sk="ps_suppkey")
        + " AS ps_availqty, "
        + _COST_CENTS_F.format(pk="ps_partkey", sk="ps_suppkey")
        + " AS ps_supplycost_cents, "
        "CAST(" + _COST_CENTS_F.format(pk="ps_partkey", sk="ps_suppkey")
        + " AS DOUBLE) / 100.0 AS ps_supplycost "
        "FROM (SELECT p_partkey AS ps_partkey, "
        f"CAST({sk} AS BIGINT) AS ps_suppkey "
        "FROM part "
        "CROSS JOIN (SELECT 0 AS i UNION ALL SELECT 1 "
        "UNION ALL SELECT 2 UNION ALL SELECT 3) AS idx "
        "CROSS JOIN (SELECT COUNT(*) AS s_cnt FROM supplier) AS sc) AS b"
    )


# DuckDB CTE body: oracle twins embed this as `WITH partsupp AS (...)`.
PARTSUPP_ORACLE_BODY = _body("//")


def load_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthesized partsupp as a Spark relation — same rows as
    PARTSUPP_ORACLE_BODY evaluates to in DuckDB, by construction."""
    part = load_table(spark, "part", sf_dir).select("p_partkey")
    s_cnt = (load_table(spark, "supplier", sf_dir)
             .agg(F.count(F.lit(1)).alias("s_cnt")))
    idx = spark.range(SUPPLIERS_PER_PART).select(F.col("id").alias("i"))
    sk = _SUPPKEY_F.format(pk="p_partkey", s="s_cnt", i="i", div="DIV")
    base = (part
            .crossJoin(F.broadcast(idx))
            .crossJoin(F.broadcast(s_cnt))
            .select(F.col("p_partkey").alias("ps_partkey"),
                    F.expr(f"CAST({sk} AS BIGINT)").alias("ps_suppkey")))
    cents = _COST_CENTS_F.format(pk="ps_partkey", sk="ps_suppkey")
    return base.select(
        "ps_partkey", "ps_suppkey",
        F.expr(_AVAILQTY_F.format(pk="ps_partkey", sk="ps_suppkey"))
         .alias("ps_availqty"),
        F.expr(cents).alias("ps_supplycost_cents"),
        (F.expr(cents).cast("double") / F.lit(100.0))
        .alias("ps_supplycost"))
