"""Workload-registry hygiene: the driver contract's invariants hold for
every registered query (no Spark session needed - pure metadata)."""

from __future__ import annotations

import __spark_entry__ as entrymod
from etl_online_retail_spark.workload import _REGISTRY

EXPECTED_ROWS_ONLY = {"approx_customers_by_nation", "knn_ivf",
                      "knn_vectorized", "semantic_dedup",
                      "approx_length_percentiles", "bpe_vocab_merges",
                      # PQ: KMeans codebooks are iteratively fit (like
                      # knn_ivf); recall vs exact L2 is pytest-asserted
                      "knn_pq",
                      # PCA: BLAS projection, float reduction order —
                      # orthonormality/energy invariants pytest-asserted
                      "embedding_pca",
                      # numpy-batch scorer: einsum summation order differs
                      # from the SQL fold at ulp level (6dp hash could flip
                      # on boundary pairs); pair-set/score agreement vs the
                      # oracle-exact fold is tolerance-tested
                      "embedding_near_dups_vectorized",
                      # Unigram-LM tokenizer: iterative driver-coordinated
                      # EM (the bpe_vocab_merges class); distributed ==
                      # sequential reference + partition invariance are
                      # pytest-asserted in tests/test_unigram.py
                      "unigram_vocab", "unigram_token_stats"}
# (r5) part_copurchase_rank / part_copurchase_ppr left this set: the
# registered queries now run the FIXED-POINT int64 power iteration
# (graph.PR_FP_SCALE) and hash-verify against unrolled SQL oracles.


def test_every_query_has_survey_reference():
    for name, q in _REGISTRY.items():
        assert q.survey_ref.strip(), f"{name} lacks a SURVEY.md reference"


def test_oracle_coverage_is_complete_except_documented():
    qs = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    assert oracles <= qs
    assert qs - oracles == EXPECTED_ROWS_ONLY, (
        "rows-only set drifted; document any new non-SQL-expressible op "
        f"here: {sorted(qs - oracles)}")


def test_bench_coverage_is_structural():
    """Every registered query must be benched (HEADLINE or ITERATIVE) or
    carry a written exclusion reason in bench.EXCLUDED — the "bench
    everything" policy enforced structurally, not by convention
    (round-8 verdict #8). The three sets must also be disjoint and
    contain no stale (unregistered) names."""
    import bench

    qs = set(entrymod.queries())
    headline, iterative, excluded = (
        set(bench.HEADLINE), set(bench.ITERATIVE), set(bench.EXCLUDED))
    assert headline.isdisjoint(iterative)
    assert excluded.isdisjoint(headline | iterative)
    unbenched = qs - headline - iterative - excluded
    assert not unbenched, (
        "registered queries neither benched nor documented-excluded: "
        f"{sorted(unbenched)} — add to bench.HEADLINE (steady-state), "
        "bench.ITERATIVE (algorithm runs at plan build) or bench.EXCLUDED "
        "(with a reason) at registration time")
    stale = (headline | iterative | excluded) - qs - set(bench.CONDITIONAL)
    assert not stale, f"bench lists name unregistered queries: {sorted(stale)}"
    for name, reason in bench.EXCLUDED.items():
        assert reason.strip(), f"EXCLUDED[{name!r}] needs a written reason"


def test_front_extensions_all_exist_in_registry():
    """The hand-maintained interleave list is load-bearing for the
    driver's prefix sample: a typo'd or renamed query here would
    silently vanish from the rotation (round-5 advice)."""
    missing = [n for n in entrymod._FRONT_EXTENSIONS if n not in _REGISTRY]
    assert not missing, f"_FRONT_EXTENSIONS names not registered: {missing}"


def test_reattest_names_registered_and_lead_rotation():
    """_REATTEST_FIRST entries must name real queries, and every entry
    whose newest committed driver row predates its rewrite round must
    land in the driver's 50-query prefix — that's the mechanism's whole
    point (VERDICT r8 item 1: re-attest code rewritten after its last
    attestation). Entries already attested at-or-after their rewrite
    round self-clean out of the jump set."""
    missing = [n for n in entrymod._REATTEST_FIRST if n not in _REGISTRY]
    assert not missing, f"_REATTEST_FIRST names not registered: {missing}"
    last = entrymod._attestation_last_round()
    stale = {n for n, rw in entrymod._REATTEST_FIRST.items()
             if last.get(n, -1) < rw}
    prefix = set(list(entrymod.queries())[:50])
    assert stale <= prefix, f"stale rewrites missing from the driver "\
                            f"prefix: {sorted(stale - prefix)}"


def test_rotation_prefix_prefers_unattested_queries():
    """The driver samples a 50-query prefix; the rotation must surface
    >=20 names absent from the most recent committed CORRECTNESS file
    so each round attests a fresh slice (round-5 verdict #5)."""
    import glob
    import json
    import os

    import re

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(
        glob.glob(os.path.join(here, "CORRECTNESS_r*.json")),
        # numeric, not lexicographic (r99 < r100) — matches
        # __spark_entry__._attestation_recency
        key=lambda p: int(re.search(r"_r(\d+)\.json$", p).group(1)))
    if not files:
        return
    last = set(json.load(open(files[-1])))
    prefix = list(entrymod.queries())[:50]
    fresh = [n for n in prefix if n not in last]
    assert len(fresh) >= 20, (len(fresh), fresh)


def test_rotation_keeps_every_query_exactly_once():
    from etl_online_retail_spark.workload import queries as reg_queries

    rotated = list(entrymod.queries())
    assert sorted(rotated) == sorted(reg_queries())
    assert len(rotated) == len(set(rotated))


def test_oracles_are_single_select_statements():
    import re

    for name, sql in entrymod.oracle_sql().items():
        s = sql.strip().rstrip(";")
        assert s.upper().startswith(("SELECT", "WITH")), name
        # a ';' INSIDE a string literal is data, not a statement break
        # (warc_record_stats' 'text/plain; charset=utf-8'); strip
        # quoted literals — '' escapes first — before the check
        bare = re.sub(r"'(?:[^']|'')*'", "", s)
        assert ";" not in bare, f"{name}: multiple statements"


def test_names_are_stable_identifiers():
    for name in entrymod.queries():
        assert name.replace("_", "").isalnum() and name == name.lower(), name


def test_oracle_outputs_have_driver_safe_types():
    """No oracle may emit HUGEINT / DECIMAL / LIST output columns.

    The driver canonicalizes results via pandas: DuckDB HUGEINT and DECIMAL
    become float64 (mismatching Spark's BIGINT/Decimal rendering) and LIST
    becomes an unhashable ndarray — each is a guaranteed red CORRECTNESS
    row even when values agree (round-1 lesson: 5 rows lost to this).
    """
    from etl_online_retail_spark.oracle import duckdb_connection

    con = duckdb_connection("/root/testdata/sf0.001")
    bad = []
    for name, sql in entrymod.oracle_sql().items():
        rel = con.sql(sql)
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ).upper()
            if "HUGEINT" in t or "DECIMAL" in t or t.endswith("[]") or "LIST" in t or "STRUCT" in t:
                bad.append((name, col, t))
    assert not bad, f"driver-unsafe oracle output types: {bad}"
