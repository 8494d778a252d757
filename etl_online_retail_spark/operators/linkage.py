"""Fuzzy record linkage: blocked and q-gram-filtered Levenshtein joins.

The naive blocked join (every in-block pair through the distance function)
is per-block quadratic — measured ~factor^2 under replication
(PERFORMANCE.md). `qgram_fuzzy_pairs` is the EXACT scale path: a
candidate-generation join on shared character q-grams with a count filter,
then distance verification on the survivors only.

Count-filter soundness (distinct-gram form): one edit operation touches at
most q gram positions, so d edits destroy at most d*q occurrences — a
distinct gram vanishes only if all its occurrences die, hence two strings
within distance d share >= max(|D(a)|, |D(b)|) - d*q DISTINCT q-grams
(D = distinct gram set). Pairs below the bound cannot be within distance d
and are never scored. Strings with |D| <= d*q can't be pruned (the bound
is vacuous) and take the naive in-block path — exactness holds for every
input, not just well-behaved ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_online_retail_spark.functions.text import char_ngrams


def contracted_fuzzy_pairs(df: DataFrame, key_col: str, name_col: str,
                           block_col: str, max_dist: int = 2,
                           strategy: str = "naive") -> DataFrame:
    """Distinct-name contraction for fuzzy linkage (same output contract).

    Any per-row blocking scheme wastes work when names repeat: with U
    distinct (block, name) values among N rows, every pairwise algorithm
    re-scores the same name pair (N/U)^2 times. Contract first — the pair
    search runs on the U-row distinct relation (via the chosen strategy:
    "naive" in-block, "qgram" prefix filter, or "segment" PassJoin), and
    the matched NAME pairs then expand back through two equi-joins on
    (block, name) to key-level pairs. The expansion is output-bound, so
    total cost is candidates(U) + |result| instead of candidates(N) —
    contraction turns row-count scale into name-cardinality scale, which
    is the term that actually grows at 100 TB. The name-pair relation is
    dim-sized, so both expansion joins broadcast it.

    Output rows are (key_a < key_b) with names attached to their own key,
    exactly like blocked_fuzzy_pairs; identical-name pairs are excluded
    by contract there, so ordering name pairs lexicographically loses
    nothing.
    """
    strat = {"naive": blocked_fuzzy_pairs,
             "qgram": qgram_fuzzy_pairs,
             "segment": segment_fuzzy_pairs}[strategy]
    names = (df.select(F.col(block_col).alias("_cblk"),
                       F.col(name_col).alias("_cnm"))
             .distinct()
             # composite key: carries the block through the strategy call
             # (their outputs drop the block column); within a block the
             # struct ordering degenerates to name ordering
             .select(F.struct(F.col("_cblk"), F.col("_cnm")).alias("_ck"),
                     "_cnm", "_cblk"))
    np = strat(names, "_ck", "_cnm", "_cblk", max_dist)
    name_pairs = np.select(F.col("key_a").getField("_cblk").alias("_mblk"),
                           F.col("name_a").alias("_mna"),
                           F.col("name_b").alias("_mnb"),
                           "edit_dist")
    ka = df.select(F.col(key_col).alias("_ka"),
                   F.col(name_col).alias("_mna"),
                   F.col(block_col).alias("_mblk"))
    kb = df.select(F.col(key_col).alias("_kb"),
                   F.col(name_col).alias("_mnb"),
                   F.col(block_col).alias("_mblk"))
    exp = (ka.join(F.broadcast(name_pairs), ["_mblk", "_mna"])
             .join(kb, ["_mblk", "_mnb"]))
    swap = F.col("_ka") > F.col("_kb")
    return exp.select(
        F.when(swap, F.col("_kb")).otherwise(F.col("_ka")).alias("key_a"),
        F.when(swap, F.col("_ka")).otherwise(F.col("_kb")).alias("key_b"),
        F.when(swap, F.col("_mnb")).otherwise(F.col("_mna")).alias("name_a"),
        F.when(swap, F.col("_mna")).otherwise(F.col("_mnb")).alias("name_b"),
        "edit_dist")


def segment_fuzzy_pairs(df: DataFrame, key_col: str, name_col: str,
                        block_col: str, max_dist: int = 2) -> DataFrame:
    """Exact segment-blocked edit-distance self-join (PassJoin-style).

    Same output contract as blocked_fuzzy_pairs. Partition every name into
    d+1 contiguous segments (even split, long segments last). Pigeonhole:
    d edit operations touch at most d segments, so for any pair within
    distance d at least one segment of the SHORTER string survives
    untouched and appears verbatim in the longer one, start-shifted by at
    most d (net insertions/deletions before it are bounded by d). The
    candidate join is therefore an equi-join on (block, indexed-length,
    segment-index, segment-text) between a segment INDEX (d+1 rows per
    name — broadcastable) and probe substrings (one per feasible
    (length, segment, shift), ~(d+1)^2*(2d+1) per name), followed by
    distance verification. This beats the q-gram prefix filter when the
    gram vocabulary saturates (e.g. catalog names drawn from a small word
    list): a ~len/(d+1)-char segment stays selective where 2-grams
    collide corpus-wide.

    Probing only index lengths <= own length covers every pair: the
    pigeonhole argument applies to the shorter side's segments, and
    equal-length pairs probe each other (dedup'd). Names shorter than
    d+1 chars can't be segmented; they take the naive in-block path.
    """
    d = max_dist
    nseg = d + 1
    base = (df.select(F.col(key_col).alias("_k"),
                      F.col(name_col).alias("_n"),
                      F.col(block_col).alias("_blk"))
            .withColumn("_len", F.length("_n")))
    long_side = base.filter(F.col("_len") >= nseg).cache()
    short_side = base.filter(F.col("_len") < nseg)

    # even partition of a length-l name: first (nseg - l%nseg) segments get
    # l div nseg chars, the rest one more; start/len are closed forms
    def seg_start(l: str, i: str) -> str:
        return (f"{i} * ({l} div {nseg}) "
                f"+ greatest(0, {i} - ({nseg} - {l} % {nseg}))")

    def seg_len(l: str, i: str) -> str:
        return f"({l} div {nseg}) + if({i} >= {nseg} - {l} % {nseg}, 1, 0)"

    index = long_side.select(
        F.col("_k").alias("key_s"), F.col("_n").alias("name_s"),
        F.col("_blk").alias("_iblk"), F.col("_len").alias("_il"),
        F.expr(
            f"inline(transform(sequence(0, {d}), i -> named_struct("
            f"'_ii', i, "
            f"'_iseg', substring(_n, 1 + {seg_start('_len', 'i')}, "
            f"                   {seg_len('_len', 'i')}))))"))
    # probe: for every indexed length l in [len-d, len] and segment i, the
    # substrings at starts within +-d of that segment's home position
    probe = (long_side.select(
        F.col("_k").alias("key_r"), F.col("_n").alias("name_r"), "_blk",
        F.expr(
            f"explode(array_distinct(flatten(flatten("
            f"transform(sequence(greatest({nseg}, _len - {d}), _len), l -> "
            f"  transform(sequence(0, {d}), i -> "
            f"    filter(transform("
            f"      sequence({seg_start('l', 'i')} - {d}, "
            f"               {seg_start('l', 'i')} + {d}), q -> "
            f"      if(q >= 0 and q + {seg_len('l', 'i')} <= _len, "
            f"         named_struct('_l', l, '_i', i, "
            f"                      '_seg', substring(_n, q + 1, "
            f"                                        {seg_len('l', 'i')})), "
            f"         null)), x -> x is not null)))))))").alias("_pk"))
        .select("key_r", "name_r", "_blk",
                F.col("_pk._l").alias("_pl"), F.col("_pk._i").alias("_pi"),
                F.col("_pk._seg").alias("_pseg")))
    cands = (probe.join(
                 F.broadcast(index),
                 (F.col("_blk") == F.col("_iblk"))
                 & (F.col("_pl") == F.col("_il"))
                 & (F.col("_pi") == F.col("_ii"))
                 & (F.col("_pseg") == F.col("_iseg")))
             # name inequality pushed into the candidate join (same move
             # as qgram's): equal names match on every segment, so the
             # pushdown keeps their whole fan-out out of the distinct
             .filter((F.col("key_r") != F.col("key_s"))
                     & (F.col("name_r") != F.col("name_s")))
             .select(F.when(F.col("key_r") < F.col("key_s"),
                            F.struct(F.col("key_r").alias("key_a"),
                                     F.col("name_r").alias("name_a"),
                                     F.col("key_s").alias("key_b"),
                                     F.col("name_s").alias("name_b")))
                      .otherwise(
                            F.struct(F.col("key_s").alias("key_a"),
                                     F.col("name_s").alias("name_a"),
                                     F.col("key_r").alias("key_b"),
                                     F.col("name_r").alias("name_b")))
                      .alias("_p"))
             .select("_p.*")
             .distinct())
    # name inequality holds from the candidate join; the length band
    # holds by probe construction (_pl == _il with _pl >= len_r - d and
    # _il = len_s, symmetric across orientations) — only distance runs
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"), max_dist)
    verified = (cands
                .filter(dist >= 0)
                .select("key_a", "key_b", "name_a", "name_b",
                        dist.cast("int").alias("edit_dist")))

    # unsegmentable names: naive join of short x everything within block
    sa = short_side.select(F.col("_k").alias("key_a"),
                           F.col("_n").alias("name_a"), "_blk")
    all_b = base.select(F.col("_k").alias("key_b"),
                        F.col("_n").alias("name_b"), "_blk")
    lb = short_side.select(F.col("_k").alias("key_b"),
                           F.col("_n").alias("name_b"), "_blk")
    la = long_side.select(F.col("_k").alias("key_a"),
                          F.col("_n").alias("name_a"), "_blk")
    dist2 = F.levenshtein(F.col("name_a"), F.col("name_b"), max_dist)
    fallback = (sa.join(all_b, "_blk").filter(F.col("key_a") < F.col("key_b"))
                .unionByName(la.join(lb, "_blk")
                             .filter(F.col("key_a") < F.col("key_b")))
                .filter((F.col("name_a") != F.col("name_b"))
                        & (F.abs(F.length("name_a") - F.length("name_b"))
                           <= max_dist)
                        & (dist2 >= 0))
                .select("key_a", "key_b", "name_a", "name_b",
                        dist2.cast("int").alias("edit_dist")))
    return verified.unionByName(fallback)


def blocked_fuzzy_pairs(df: DataFrame, key_col: str, name_col: str,
                        block_col: str, max_dist: int = 2) -> DataFrame:
    """All in-block pairs within edit distance: (key_a, key_b, name_a,
    name_b, edit_dist). Bounded Levenshtein (early exit) + length-bound
    prune; quadratic in block size — see qgram_fuzzy_pairs for scale."""
    a = df.select(F.col(key_col).alias("key_a"),
                  F.col(name_col).alias("name_a"),
                  F.col(block_col).alias("_blk"))
    b = df.select(F.col(key_col).alias("key_b"),
                  F.col(name_col).alias("name_b"),
                  F.col(block_col).alias("_blk"))
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"), max_dist)
    len_ok = F.abs(F.length("name_a") - F.length("name_b")) <= max_dist
    return (a.join(b, "_blk")
            .filter((F.col("key_a") < F.col("key_b"))
                    & (F.col("name_a") != F.col("name_b"))
                    & len_ok & (dist >= 0))
            .select("key_a", "key_b", "name_a", "name_b",
                    dist.cast("int").alias("edit_dist")))


def qgram_fuzzy_pairs(df: DataFrame, key_col: str, name_col: str,
                      block_col: str, max_dist: int = 2,
                      q: int = 2) -> DataFrame:
    """Exact prefix-filtered variant of blocked_fuzzy_pairs (same output).

    PPJoin-style: strings within distance d share >= max(|D(a)|,|D(b)|) -
    d*q distinct q-grams, so under ANY fixed global gram ordering their
    first d*q+1 grams must intersect (pigeonhole). The ordering is chosen
    by ascending global frequency (rarest first, gram tiebreak), making
    the candidate join's fan-out sum-of-RARE-gram-frequencies^2 — tiny —
    instead of block^2 or common-gram^2. Candidates are then distance-
    verified; short/repeat-heavy names (|D| <= d*q, vacuous bound) fall
    back to the naive in-block join, so the union is exhaustive for every
    input.

    Three further exactness-preserving prunes ride the candidate join
    (all evaluated BEFORE the distinct, which is the dominant shuffle):

    * length band |len(a)-len(b)| <= d — a Levenshtein lower bound, so a
      violating pair can never reach the output;
    * PPJoin+'s POSITION filter: overlap(Da, Db) >= alpha :=
      max(|Da|,|Db|) - d*q for any true pair, and for the pair's FIRST
      shared gram in the global order (positions i in Da, j in Db) no
      intersection element precedes it, so overlap <= 1 +
      min(|Da|-i, |Db|-j). Rows where that bound < alpha are pruned;
      every true pair survives via its first-shared-gram row, and the
      distinct needs only one surviving row per pair;
    * the distinct runs on (key_a, key_b) ALONE — names are re-attached
      afterwards from the (output-bound) base relation, so the shuffle
      carries two longs per candidate instead of two name strings.

    Precondition (shared with every linkage entry point but load-bearing
    for the keys-only distinct specifically): `key_col` is a RECORD KEY —
    unique per row, one name per key. The re-attachment join relies on
    keys determining names; duplicate keys would fan the join back out
    (and with conflicting names, attach names the candidate never
    matched). All call sites pass p_partkey or the contraction's
    distinct (block, name) struct, both unique by construction.

    Measured at sf0.1 (20k parts, 64 distinct names, 25 brands —
    deliberately repeat-heavy): the position+length filters cut the
    3.70M-row candidate fan-out by 13% and the keys-only distinct the
    rest, 4.1 -> 3.7 s end-to-end. The remaining floor is COPY
    MULTIPLICITY (~12.5 rows per distinct (brand, name): every filter
    here is per-row, so equal-name copies multiply candidates
    quadratically no matter how sharp the per-pair prune is). That term
    is exactly what contracted_fuzzy_pairs(strategy="qgram") removes
    (benched ~0.2 s on the same data); on corpora whose names are
    near-unique the filters bite and the contraction is a no-op, so the
    two compose rather than compete.
    """
    from pyspark.sql import Window

    base = (df.select(F.col(key_col).alias("_k"),
                      F.col(name_col).alias("_n"),
                      F.col(block_col).alias("_blk"),
                      char_ngrams(F.col(name_col), q).alias("_g"))
            .withColumn("_gs", F.size("_g"))
            .cache())
    bound = max_dist * q
    long_side = base.filter(F.col("_gs") > bound)
    short_side = base.filter(F.col("_gs") <= bound).drop("_g", "_gs")

    grams = long_side.select("_k", "_n", "_blk", "_gs",
                             F.explode("_g").alias("_gram"))
    freq = grams.groupBy("_gram").agg(F.count(F.lit(1)).alias("_f"))
    w = Window.partitionBy("_k").orderBy(F.asc("_f"), F.asc("_gram"))
    # _rn is the gram's position in the FULL ordered distinct-gram set
    # (computed before the prefix cut) — the position filter's bound
    # needs the true position, not the position within the prefix
    prefix = (grams.join(F.broadcast(freq), "_gram")
              .withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") <= bound + 1)
              .select("_k", "_n", "_blk", "_gram", "_gs", "_rn"))
    pa = prefix.select(F.col("_k").alias("key_a"),
                       F.col("_n").alias("name_a"),
                       F.col("_gs").alias("_gsa"),
                       F.col("_rn").alias("_rna"), "_blk", "_gram")
    pb = prefix.select(F.col("_k").alias("key_b"),
                       F.col("_n").alias("name_b"),
                       F.col("_gs").alias("_gsb"),
                       F.col("_rn").alias("_rnb"), "_blk", "_gram")
    # every prune lives INSIDE the candidate join so nothing redundant
    # reaches the distinct: name inequality (the output contract — equal
    # names share their ENTIRE prefix on repeat-heavy data), the length
    # band (Levenshtein lower bound), and the position filter (docstring)
    alpha = F.greatest(F.col("_gsa"), F.col("_gsb")) - bound
    pos_ok = (1 + F.least(F.col("_gsa") - F.col("_rna"),
                          F.col("_gsb") - F.col("_rnb")) >= alpha)
    cand_keys = (pa.join(pb, ["_blk", "_gram"])
                 .filter((F.col("key_a") < F.col("key_b"))
                         & (F.col("name_a") != F.col("name_b"))
                         & (F.abs(F.length("name_a") - F.length("name_b"))
                            <= max_dist)
                         & pos_ok)
                 .select("key_a", "key_b")
                 .distinct())
    # names re-attached output-bound (two longs per candidate crossed the
    # shuffle, not two strings); name inequality and the length band hold
    # by construction — keys determine names — so only the distance runs
    na = base.select(F.col("_k").alias("key_a"), F.col("_n").alias("name_a"))
    nb = base.select(F.col("_k").alias("key_b"), F.col("_n").alias("name_b"))
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"), max_dist)
    verified = (cand_keys.join(na, "key_a").join(nb, "key_b")
                .filter(dist >= 0)
                .select("key_a", "key_b", "name_a", "name_b",
                        dist.cast("int").alias("edit_dist")))

    # unprunable names: naive join of short x (short + long) within block
    all_side = base.select(F.col("_k").alias("key_b"),
                           F.col("_n").alias("name_b"), "_blk")
    sa = short_side.select(F.col("_k").alias("key_a"),
                           F.col("_n").alias("name_a"), "_blk")
    dist2 = F.levenshtein(F.col("name_a"), F.col("name_b"), max_dist)
    short_pairs_l = (sa.join(all_side, "_blk")
                     .filter(F.col("key_a") < F.col("key_b")))
    sb = short_side.select(F.col("_k").alias("key_b"),
                           F.col("_n").alias("name_b"), "_blk")
    la = long_side.select(F.col("_k").alias("key_a"),
                          F.col("_n").alias("name_a"), "_blk")
    short_pairs_r = (la.join(sb, "_blk")
                     .filter(F.col("key_a") < F.col("key_b")))
    fallback = (short_pairs_l.unionByName(short_pairs_r)
                .filter((F.col("name_a") != F.col("name_b"))
                        & (F.abs(F.length("name_a") - F.length("name_b"))
                           <= max_dist)
                        & (dist2 >= 0))
                .select("key_a", "key_b", "name_a", "name_b",
                        dist2.cast("int").alias("edit_dist")))
    return verified.unionByName(fallback)


# ---------------------------------------------------------------------------
# survivorship: collapse a cluster of duplicate records into one GOLDEN
# RECORD, attribute by attribute — the step after linkage/clustering in
# an MDM pipeline (fuzzy candidates -> connected components -> THIS).
# Each attribute picks its survivor by an explicit, deterministic rule;
# nothing positional survives a shuffle.

def golden_records(df: "DataFrame", cluster_col: str,
                   rules: "dict[str, tuple]") -> "DataFrame":
    """One row per cluster. `rules` maps output column -> rule:

      ("latest", value_col, order_col, tie_col)  value of the row with
          the greatest (order_col, tie_col) — recency survivorship;
      ("mode", value_col)  most frequent value, ties to the smallest —
          consensus survivorship;
      ("max", value_col) / ("min", value_col) / ("count",)  plain
          aggregates.

    Shape: one groupBy for the direct aggregates; "latest" rides the
    same groupBy via max_by with a struct order key; each "mode" adds
    one (cluster, value) counting pass joined back (value-cardinality
    sized). All deterministic — ties break on explicit columns, never
    partition order.
    """
    aggs, modes = [], []
    for out, rule in sorted(rules.items()):
        kind = rule[0]
        if kind == "latest":
            _, vcol, ocol, tcol = rule
            key = F.struct(F.col(ocol), F.col(tcol))
            aggs.append(F.max_by(F.col(vcol), key).alias(out))
        elif kind == "mode":
            modes.append((out, rule[1]))
        elif kind == "max":
            aggs.append(F.max(rule[1]).alias(out))
        elif kind == "min":
            aggs.append(F.min(rule[1]).alias(out))
        elif kind == "count":
            aggs.append(F.count(F.lit(1)).alias(out))
        else:
            raise ValueError(f"unknown survivorship rule {rule!r}")
    out_df = df.groupBy(cluster_col).agg(*aggs)
    for out, vcol in modes:
        counted = (df.groupBy(cluster_col, vcol)
                   .agg(F.count(F.lit(1)).alias("_n")))
        # most frequent; ties to the SMALLEST value: min_by on the
        # struct (-n, value) gives both orderings in one total order
        pick = (counted.groupBy(cluster_col)
                .agg(F.min_by(F.col(vcol),
                              F.struct((-F.col("_n")).alias("_neg"),
                                       F.col(vcol))).alias(out)))
        out_df = out_df.join(pick, cluster_col)
    return out_df
