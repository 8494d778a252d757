"""Connected components: star-contraction vs min-label propagation."""

from __future__ import annotations

import random

from etl_online_retail_spark.operators.dedup import (
    duplicate_clusters,
    duplicate_clusters_star,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


def _labels(df):
    return {r.doc_id: r.cluster_id for r in df.collect()}


def test_star_handles_long_chain_in_log_rounds(spark):
    # path graph 0-1-2-...-63: diameter 63. Min-label propagation needs a
    # round per hop; star contraction collapses it in O(log^2 n) rounds —
    # 12 iterations must fully converge where propagation could not.
    chain = _pairs(spark, [(i, i + 1) for i in range(63)])
    out = _labels(duplicate_clusters_star(chain, max_iterations=12))
    assert out == {i: 0 for i in range(64)}


def test_star_matches_propagation_on_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 40
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(30)]
        edges = [(a, b) for a, b in edges if a != b]
        pairs = _pairs(spark, edges)
        a = _labels(duplicate_clusters(pairs))
        b = _labels(duplicate_clusters_star(pairs))
        assert a == b, f"trial {trial}: {a} != {b}"


def test_star_disjoint_components_and_self_pairs(spark):
    pairs = _pairs(spark, [(1, 2), (2, 1), (5, 5), (7, 8), (9, 9)])
    out = _labels(duplicate_clusters_star(pairs))
    assert out == {1: 1, 2: 1, 5: 5, 7: 7, 8: 7, 9: 9}
