"""IVF ANN recall vs brute force; salted-join equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_online_retail_spark.catalog import load_table
from etl_online_retail_spark.operators.joins import salted_join
from etl_online_retail_spark.operators.similarity import brute_force_topk, ivf_topk

SF = "/root/testdata/sf0.001"


def test_ivf_recall_against_bruteforce(spark):
    emb = load_table(spark, "embeddings", SF).cache()
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    exact = {(r.query_id, r.neighbour_id)
             for r in brute_force_topk(emb, queries, k=5).collect()}
    approx = {(r.query_id, r.neighbour_id)
              for r in ivf_topk(emb, queries, k=5, n_clusters=8,
                                n_probe=4).collect()}
    # probing half the clusters must recover a solid fraction of true
    # neighbours; exactness is not the contract - recall is
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall:.2f}"
    # every query returns exactly k ranked rows
    counts = {r.query_id for r in queries.select(
        F.col("vec_id").alias("query_id")).collect()}
    assert len(approx) == 5 * len(counts)


def test_vectorized_topk_matches_fold_topk(spark):
    from etl_online_retail_spark.operators.similarity import (
        brute_force_topk_vectorized,
    )

    emb = load_table(spark, "embeddings", SF).cache()
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    fold = {(r.query_id, r.rank): (r.neighbour_id, r.cos_sim)
            for r in brute_force_topk(emb, queries, k=5).collect()}
    vec = {(r.query_id, r.rank): (r.neighbour_id, r.cos_sim)
           for r in brute_force_topk_vectorized(emb, queries, k=5).collect()}
    assert set(fold) == set(vec)
    for key, (nid, sim) in fold.items():
        vnid, vsim = vec[key]
        # same neighbour at each rank; scores equal to 1e-6 (summation
        # order differs between BLAS and the sequential fold)
        assert vnid == nid and abs(vsim - sim) <= 1e-6, (key, fold[key], vec[key])


def test_auto_n_planes_scales_with_corpus():
    from etl_online_retail_spark.operators.similarity import (
        LSH_MAX_PLANES,
        LSH_MIN_PLANES,
        auto_n_planes,
    )

    assert auto_n_planes(100) == LSH_MIN_PLANES          # tiny corpus
    assert auto_n_planes(1 << 20) == 10                  # 1M/1024 buckets
    assert auto_n_planes(10**12) == LSH_MAX_PLANES       # clamped
    # monotone: more vectors never means fewer planes
    prev = 0
    for n in (10**3, 10**5, 10**7, 10**9, 10**11):
        cur = auto_n_planes(n)
        assert cur >= prev
        prev = cur


def test_lsh_vectorized_scorer_agrees_with_fold(spark):
    """scorer='vectorized' (numpy einsum over Arrow batches) must produce
    the same pair set as the oracle-exact fold, with scores equal to well
    inside the 6dp rounding (they differ only in float summation order).
    Threshold low enough that real pairs survive at sf0.001."""
    from etl_online_retail_spark.operators.similarity import lsh_near_duplicates

    emb = load_table(spark, "embeddings", SF).cache()
    fold = {(r.id_a, r.id_b): r.cos_sim for r in
            lsh_near_duplicates(emb, threshold=0.3, n_planes=4,
                                scorer="fold").collect()}
    vec = {(r.id_a, r.id_b): r.cos_sim for r in
           lsh_near_duplicates(emb, threshold=0.3, n_planes=4,
                               scorer="vectorized").collect()}
    assert fold, "fixture produced no pairs - threshold too high"
    assert set(fold) == set(vec)
    for k in fold:
        assert abs(fold[k] - vec[k]) <= 1e-6

    # non-integral ids refuse the vectorized path loudly
    import pytest

    str_ids = emb.withColumn("vec_id", F.col("vec_id").cast("string"))
    with pytest.raises(ValueError, match="integral ids"):
        lsh_near_duplicates(str_ids, threshold=0.3, n_planes=4,
                            scorer="vectorized").collect()


def test_lsh_multiprobe_is_superset_of_single_probe(spark):
    from etl_online_retail_spark.operators.similarity import lsh_near_duplicates

    emb = load_table(spark, "embeddings", SF).cache()
    single = {(r.id_a, r.id_b) for r in
              lsh_near_duplicates(emb, threshold=0.3, n_planes=6,
                                  probes=1).collect()}
    multi = {(r.id_a, r.id_b) for r in
             lsh_near_duplicates(emb, threshold=0.3, n_planes=6,
                                 probes=3).collect()}
    # probe 0 IS the single-probe family; extra probes only add candidates
    assert single <= multi
    # auto plane sizing runs end-to-end (small corpus -> MIN planes)
    auto = lsh_near_duplicates(emb, threshold=0.3, n_planes=None, probes=1)
    assert auto.count() >= 0


def test_jaccard_skew_cap(spark):
    from etl_online_retail_spark.operators.dedup import (
        auto_shingle_cap,
        jaccard_pairs,
    )

    # decision logic: off at oracle scale, scales with corpus above it
    assert auto_shingle_cap(500) is None
    assert auto_shingle_cap(20_000) is None
    assert auto_shingle_cap(20_001) == 500
    assert auto_shingle_cap(1_000_000) == 10_000
    docs = load_table(spark, "documents", SF).cache()
    uncapped = {(r.id_a, r.id_b) for r in
                jaccard_pairs(docs, threshold=0.3,
                              max_shingle_df=None).collect()}
    # default "auto" stays uncapped (bit-exact) at test scale
    auto = {(r.id_a, r.id_b) for r in
            jaccard_pairs(docs, threshold=0.3).collect()}
    assert auto == uncapped
    # an explicit cap only drops shingles -> jaccard under-counts -> subset
    capped = {(r.id_a, r.id_b) for r in
              jaccard_pairs(docs, threshold=0.3,
                            max_shingle_df=3).collect()}
    assert capped <= uncapped


def test_salted_join_matches_plain_join(spark):
    li = load_table(spark, "lineitem", SF).select("l_orderkey", "l_quantity")
    o = load_table(spark, "orders", SF).select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice")
    plain = li.join(o, "l_orderkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q")).collect()[0]
    salted = salted_join(li, o, "l_orderkey", salt_buckets=4).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q")).collect()[0]
    assert (plain.n, plain.q) == (salted.n, salted.q)


def test_semantic_dedup_invariants(spark):
    from etl_online_retail_spark.operators.similarity import semantic_dedup

    emb = load_table(spark, "embeddings", SF).cache()
    n = emb.count()
    out = semantic_dedup(emb, n_clusters=8, threshold=0.5, seed=42)
    rows = out.collect()
    # one verdict per vector
    assert len(rows) == n
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cl, members in by_cluster.items():
        reps = [r for r in members if r.cos_to_rep == 1.0 and r.is_kept]
        assert len(reps) >= 1  # the representative row survives per cluster
        for r in members:
            if r.cos_to_rep == 1.0:
                assert r.is_kept  # representative always survives
            elif r.cos_to_rep >= 0.5:
                assert not r.is_kept  # near the rep -> dropped
            else:
                assert r.is_kept  # far from the rep -> kept
    # deterministic under the fixed seed
    again = semantic_dedup(emb, n_clusters=8, threshold=0.5, seed=42).collect()
    assert {(r.vec_id, r.cluster_id, r.is_kept) for r in again} == \
           {(r.vec_id, r.cluster_id, r.is_kept) for r in rows}


def test_ivf_written_index_prunes_partitions(spark, tmp_path):
    from etl_online_retail_spark.operators.similarity import (
        ivf_topk_indexed,
        write_ivf_index,
    )

    emb = load_table(spark, "embeddings", SF).cache()
    path = str(tmp_path / "ivf")
    write_ivf_index(emb, path, n_clusters=8, seed=42)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    out = ivf_topk_indexed(spark, path, queries, k=5, n_probe=4)

    # the probe scan must carry the centroid partition filter
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_centroid" in plan.split(
        "PartitionFilters")[1][:200], plan[:2000]

    # probing half the lists recovers a solid fraction of true neighbours
    exact = {(r.query_id, r.neighbour_id)
             for r in brute_force_topk(emb, queries, k=5).collect()}
    approx = {(r.query_id, r.neighbour_id) for r in out.collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"indexed IVF recall too low: {recall:.2f}"
    # every query returns exactly k rows
    assert len(approx) == 5 * queries.count()
    # the written index probe agrees with the in-memory IVF at equal params
    mem = {(r.query_id, r.neighbour_id)
           for r in ivf_topk(emb, queries, k=5, n_clusters=8,
                             n_probe=4).collect()}
    assert approx == mem


def test_auto_probes_hits_recall_target():
    import math

    from etl_online_retail_spark.operators.similarity import auto_probes

    # near-identical threshold + few planes -> single probe suffices
    # (p_plane = 1 - acos(0.99)/pi ≈ 0.955, squared ≈ 0.91 >= 0.9)
    assert auto_probes(0.99, 2) == 1
    # lower threshold + many planes -> more probes, monotone in planes
    prev = 0
    for planes in (4, 8, 12, 16):
        m = auto_probes(0.5, planes, recall_target=0.9)
        assert m >= prev
        prev = m
    # the returned m actually achieves the target (un-clamped cases)
    for t, planes in ((0.7, 6), (0.8, 8), (0.6, 4)):
        m = auto_probes(t, planes, recall_target=0.9, max_probes=64)
        p = (1 - math.acos(t) / math.pi) ** planes
        assert 1 - (1 - p) ** m >= 0.9
        if m > 1:  # minimality: one fewer probe would miss the target
            assert 1 - (1 - p) ** (m - 1) < 0.9


def test_pq_recall_against_exact_l2(spark):
    import numpy as np

    from etl_online_retail_spark.operators.similarity import (
        pq_encode,
        pq_topk_refined,
        train_pq_codebooks,
    )

    emb = load_table(spark, "embeddings", SF).cache()
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    books = train_pq_codebooks(emb, m_subspaces=16, n_codes=16)
    codes = pq_encode(emb, books)
    approx = {(r.query_id, r.neighbour_id)
              for r in pq_topk_refined(codes, emb, queries, books,
                                       k=5, refine=10).collect()}

    # exact L2 top-5 (PQ approximates L2, not cosine) via numpy
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    exact = set()
    for r in [x for x in rows if x.vec_id % 50 == 0]:
        d2 = ((mat - np.asarray(r.embedding, dtype=np.float64)) ** 2).sum(1)
        order = [i for i in np.lexsort((ids, d2)) if ids[i] != r.vec_id][:5]
        exact |= {(r.vec_id, int(ids[i])) for i in order}

    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"PQ recall too low: {recall:.2f}"
    n_queries = len({q for q, _ in exact})
    assert len(approx) == 5 * n_queries  # k ranked rows per query


def test_pq_codes_are_compact_and_deterministic(spark):
    from etl_online_retail_spark.operators.similarity import (
        pq_encode,
        train_pq_codebooks,
    )

    emb = load_table(spark, "embeddings", SF).cache()
    books = train_pq_codebooks(emb, m_subspaces=16, n_codes=16)
    # codebook geometry: 16 books of 16 centroids x 4 dims (8-byte codes)
    assert len(books) == 16
    assert all(len(b) == 16 and len(b[0]) == 4 for b in books)
    a = {r.vec_id: tuple(r.codes) for r in pq_encode(emb, books).collect()}
    b = {r.vec_id: tuple(r.codes) for r in pq_encode(emb, books).collect()}
    assert a == b  # encoding is deterministic run-to-run
    assert all(len(c) == 16 and all(0 <= x < 16 for x in c)
               for c in a.values())  # one 4-bit code per subspace


def test_distributed_pq_trainer_partition_invariant_and_usable(spark):
    """train_pq_codebooks_distributed: decimal-sum centroid updates make
    the codebooks IDENTICAL under any input partitioning (the whole
    point of the distributed path — float means would drift with task
    order), and the books it produces drive the same encode/ADC/refine
    search as the driver-trained ones at comparable recall."""
    import math

    import numpy as np

    from etl_online_retail_spark.operators.similarity import (
        pq_encode,
        pq_topk_refined,
        train_pq_codebooks_distributed,
    )

    emb = load_table(spark, "embeddings", SF).cache()
    books = train_pq_codebooks_distributed(
        emb, m_subspaces=16, n_codes=16, n_iters=4)
    assert len(books) == 16
    assert all(len(b) == 16 and len(b[0]) == 4 for b in books)
    assert all(math.isfinite(x) for b in books for c in b for x in c)

    # bit-identical books from a differently-partitioned input
    rebooks = train_pq_codebooks_distributed(
        emb.repartition(7), m_subspaces=16, n_codes=16, n_iters=4)
    assert books == rebooks

    # the books are USABLE: ADC + refine recall vs exact L2, same
    # harness and bound as the driver-trained test above
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    codes = pq_encode(emb, books)
    approx = {(r.query_id, r.neighbour_id)
              for r in pq_topk_refined(codes, emb, queries, books,
                                       k=5, refine=10).collect()}
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    exact = set()
    for r in [x for x in rows if x.vec_id % 50 == 0]:
        d2 = ((mat - np.asarray(r.embedding, dtype=np.float64)) ** 2).sum(1)
        order = [i for i in np.lexsort((ids, d2)) if ids[i] != r.vec_id][:5]
        exact |= {(r.vec_id, int(ids[i])) for i in order}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"distributed-PQ recall too low: {recall:.2f}"


def test_distributed_pq_trainer_pads_small_corpus(spark):
    """Fewer distinct rows than n_codes: the seeding pads with the last
    seen centroid (same contract as the driver trainer) instead of
    leaving zero rows — every code word stays a valid centroid."""
    from etl_online_retail_spark.operators.similarity import (
        train_pq_codebooks_distributed,
    )

    emb = load_table(spark, "embeddings", SF).filter(F.col("vec_id") < 6)
    books = train_pq_codebooks_distributed(
        emb, m_subspaces=4, n_codes=16, n_iters=2)
    assert len(books) == 4 and all(len(b) == 16 for b in books)
    for b in books:
        # padded tail codes repeat a real centroid, not zeros
        assert b[-1] == b[5] or any(x != 0.0 for x in b[-1])


def test_ivf_int_full_probe_equals_bruteforce_int(spark):
    """Probing EVERY list makes exact-mode IVF a partition of exact-mode
    brute force: identical (query, rank) -> (neighbour, dot) tables —
    the strongest internal check on the assignment/probe machinery
    (the oracle gate checks it against DuckDB independently)."""
    from etl_online_retail_spark.operators.similarity import (
        brute_force_topk_int,
        ivf_topk_int,
    )

    emb = load_table(spark, "embeddings", SF).cache()
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    brute = {(r.query_id, r.rank): (r.neighbour_id, r.dot_q)
             for r in brute_force_topk_int(emb, queries, k=5).collect()}
    full = {(r.query_id, r.rank): (r.neighbour_id, r.dot_q)
            for r in ivf_topk_int(emb, queries, k=5, n_clusters=8,
                                  n_probe=8).collect()}
    assert brute == full


def test_exact_twins_are_integer_and_deterministic(spark):
    """Exact-mode scores are int64 and bit-stable under repartitioning
    (the order-independence the float paths cannot promise)."""
    from etl_online_retail_spark.operators.similarity import (
        pq_topk_int,
    )

    emb = load_table(spark, "embeddings", SF).cache()
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    one = sorted((r.query_id, r.rank, r.neighbour_id, r.adc_q)
                 for r in pq_topk_int(emb, queries, k=5).collect())
    two = sorted(
        (r.query_id, r.rank, r.neighbour_id, r.adc_q)
        for r in pq_topk_int(emb.repartition(7), queries, k=5).collect())
    assert one == two
    assert all(isinstance(t[3], int) for t in one)


def test_pq_int_encode_ties_take_lowest_code(spark):
    """Two identical codebook entries (duplicate seed vectors) must
    encode to the LOWER code — numpy argmin first-occurrence == the
    oracle's ORDER BY l2, code."""
    from etl_online_retail_spark.operators.similarity import pq_topk_int

    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0]),   # the two seeds/codes
            (2, [0.5, 0.5]),                     # EQUIDISTANT from both
            (3, [1.0, 0.0])]                     # the query (== seed 0)
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = pq_topk_int(df, df.filter("vec_id = 3"), m_subspaces=1,
                      n_codes=2, k=3)
    got = {(r.neighbour_id, r.adc_q) for r in out.collect()}
    # vec 2 quantizes to (500, 500): L2 500_000 to BOTH codes — the tie
    # must resolve to code 0, whose query-table distance is 0 (code 1's
    # is 2e6, so a wrong tie-break is observable in the ADC score)
    assert got == {(0, 0), (1, 2_000_000), (2, 0)}
