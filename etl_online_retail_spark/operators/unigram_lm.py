"""Distributed Unigram-LM subword tokenizer training (Kudo 2018 — the
SentencePiece unigram model), the OTHER industrial tokenizer beside BPE.

BPE learns a merge sequence bottom-up; the unigram model starts from an
OVER-complete piece inventory and prunes it down under an EM-trained
unigram language model: each word's best segmentation is the Viterbi path
maximizing Σ ln p(piece), expected piece counts re-estimate p, and the
lowest-evidence pieces are dropped until the target vocabulary remains.
This module runs hard-EM (Viterbi counts), which keeps every statistic an
INTEGER — the property that makes the distributed training bit-identical
to a sequential run.

Classic industrial formulation (same as operators/bpe.py, the reference
pattern for tokenizer training at scale): train on the word-frequency
dictionary, not the raw corpus. The corpus-sized work is ONE aggregation
(word counts); seeding explodes substrings of the DISTINCT words (a
vocabulary-sized relation, Zipf-bounded far below the corpus) with the
candidate ranking a TakeOrderedAndProject top-k; each EM round is one
Arrow-batched Viterbi sweep over the word table followed by one integer
hash-aggregation of piece counts (map-side combined — piece-count rows
are pre-summed per Arrow batch before they ever hit the shuffle). Driver
state per round is the piece table (bounded by n_seed), never the corpus
— the bounded-collect discipline of the repo's other iterative jobs.

Determinism (the whole contract): Viterbi breaks score ties by fewer
pieces then lexicographic piece sequence; E-step counts are integers
(count × word frequency), so their distributed sum is order-independent;
the M-step log-probs are the same ln(c/total) IEEE doubles everywhere;
pruning ranks by (count DESC, piece ASC) and never drops single
characters (coverage floor: a zero-count required character keeps count
1). A distributed run therefore equals the sequential reference
function-for-function (tested), like bpe.py's merge-sequence equality.
"""

from __future__ import annotations

import math
from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_online_retail_spark.operators.bpe import word_frequencies

UNIGRAM_MAX_PIECE_LEN = 8
UNIGRAM_N_SEED = 1024
UNIGRAM_VOCAB_SIZE = 256
UNIGRAM_SHRINK = 0.75
UNIGRAM_EM_ITERS = 2

# Bound on the DRIVER-merged E-step partial relation (r15, VERDICT item
# 2): the per-task partials are n_tasks x |inventory| rows. At the
# bench scale that is KB; with thousands of input partitions times a
# multi-thousand-piece inventory it is a multi-GB collect per EM round
# — the §5 "driver does data work" shape. Past this row bound the
# partials are reduced in-plan to |inventory| rows first (one map-side-
# combined groupBy), so the collect stays inventory-bounded at any
# partition count. Integer adds are order-independent, so both venues
# produce identical counts (tested).
UNIGRAM_DRIVER_MERGE_MAX_ROWS = 262_144


def _viterbi(word: str, logp: dict[str, float],
             max_len: int) -> list[str] | None:
    """Best segmentation of `word` under piece log-probs — max total
    logp, ties to fewer pieces, then lexicographic piece sequence. None
    when the word cannot be covered (impossible once all its characters
    are in the vocabulary). Pure function shared verbatim by the Arrow
    batches and the sequential reference, so every executor and the
    driver run the identical DP in the identical order."""
    n = len(word)
    NEG = float("-inf")
    # best[i] = (score, -n_pieces, path tuple) for word[:i]
    best: list[tuple] = [(0.0, 0, ())] + [(NEG, 0, ())] * n
    get = logp.get
    for i in range(1, n + 1):
        # r14: identical acceptance rule to the original tuple-building
        # loop (strictly-better on (score, -pieces, lexicographic path),
        # candidates visited in the same j order), but the path tuple is
        # only CONCATENATED for winners and for exact (score, pieces)
        # ties — the old shape allocated an O(i)-sized tuple per
        # candidate, which dominated the EM sweep's Python time
        cand_s = NEG
        cand_np = 0
        cand_path = None
        for j in range(max(0, i - max_len), i):
            prev = best[j]
            if prev[0] == NEG:
                continue
            lp = get(word[j:i])
            if lp is None:
                continue
            s = prev[0] + lp
            if cand_path is None or s > cand_s:
                cand_s, cand_np = s, prev[1] - 1
                cand_path = prev[2] + (word[j:i],)
            elif s == cand_s:
                np_ = prev[1] - 1
                if np_ > cand_np:
                    cand_s, cand_np = s, np_
                    cand_path = prev[2] + (word[j:i],)
                elif np_ == cand_np:
                    path = prev[2] + (word[j:i],)
                    if path < cand_path:
                        cand_path = path
        if cand_path is not None:
            best[i] = (cand_s, cand_np, cand_path)
    return list(best[n][2]) if best[n][0] != NEG else None


def _mstep(counts: dict[str, int], chars: set[str]) -> dict[str, float]:
    """Integer counts -> log-probs. Zero-count pieces drop unless they
    are required single characters, which keep a floor count of 1."""
    kept = {p: c for p, c in counts.items() if c > 0 or p in chars}
    for ch in chars:
        if kept.get(ch, 0) == 0:
            kept[ch] = 1
    total = sum(kept.values())
    return {p: math.log(c / total) for p, c in kept.items()}


def _prune(counts: dict[str, int], chars: set[str], keep: int) -> dict:
    """Top-`keep` pieces by (count DESC, piece ASC); single characters
    are exempt (coverage floor) and don't consume budget."""
    multi = sorted(((p, c) for p, c in counts.items() if p not in chars),
                   key=lambda pc: (-pc[1], pc[0]))
    out = {p: c for p, c in multi[:keep]}
    for ch in chars:
        out[ch] = max(counts.get(ch, 0), 1)
    return out


def seed_candidates(words: DataFrame, n_seed: int = UNIGRAM_N_SEED,
                    max_piece_len: int = UNIGRAM_MAX_PIECE_LEN,
                    ) -> tuple[dict[str, int], set[str]]:
    """Over-complete initial inventory: the n_seed most frequent
    substrings (length 2..max_piece_len, all positions, frequency =
    occurrences × word freq) plus every single character. The substring
    explosion runs over the DISTINCT-word relation as pure array
    expressions; the ranking is orderBy().limit() — per-partition heaps,
    no global sort."""
    # project the length ONCE (rule 7, r7 review): F.length("word")
    # referenced inside the nested lambdas would re-evaluate per (i, ln)
    # cell; a plain column reference is free
    words = words.withColumn("_len", F.length("word"))
    w, n = F.col("word"), F.col("_len")
    # sequence(2, 1) descends in Spark, so every (i, ln) cell carries an
    # explicit in-bounds guard; nulls (descending artifacts + would-be
    # truncated substrings at the word tail) are filtered after explode
    subs = F.flatten(F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.transform(
            F.sequence(F.lit(2), F.greatest(
                F.least(F.lit(max_piece_len), n - i + 1), F.lit(1))),
            lambda ln: F.when((ln >= 2) & (i + ln - 1 <= n),
                              F.substring(w, i, ln)))))
    cand = (words
            .select(F.explode(subs).alias("piece"), "freq")
            .filter(F.col("piece").isNotNull())
            .groupBy("piece").agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("piece")).limit(n_seed))
    chars_df = (words
                .select(F.explode(F.split(w, "")).alias("piece"), "freq")
                .filter(F.col("piece") != "")
                .groupBy("piece").agg(F.sum("freq").alias("cnt")))
    # ONE action for both relations (r15): chars (length-1 pieces) and
    # candidates (length>=2 by construction) are disjoint, so a flagged
    # union collects in a single job — the old shape paid two driver
    # collects per train. The orderBy().limit() top-k semantics are
    # unchanged inside the union branch.
    rows = (chars_df.withColumn("_char", F.lit(True))
            .unionByName(cand.withColumn("_char", F.lit(False)))
            .collect())
    counts = {r["piece"]: int(r["cnt"]) for r in rows if r["_char"]}
    chars = set(counts)
    for r in rows:
        if not r["_char"]:
            counts.setdefault(r["piece"], int(r["cnt"]))
    return counts, chars


def _estep_distributed(words: DataFrame, logp: dict[str, float],
                       max_len: int,
                       n_tasks: int | None = None) -> dict[str, int]:
    """One Viterbi sweep over the (word, freq) table: Arrow batches
    segment each word and pre-sum piece counts per TASK (one partial
    frame per task, inventory-bounded), and the driver merges the
    partials — integer adds, order-independent. r14: the merge used to
    be a groupBy shuffle + collect; the partial relation is
    n_partitions x |inventory| rows (KB-scale at bench partition
    counts), so collecting partials directly removes one exchange +
    one stage from EVERY EM round (the bench pays ~13 rounds per
    train). r15 (VERDICT item 2): the driver merge is BOUNDED — when
    n_tasks x |inventory| exceeds UNIGRAM_DRIVER_MERGE_MAX_ROWS the
    partials reduce in-plan to |inventory| rows first, keeping the
    collect inventory-bounded at any partition count. Callers pass
    n_tasks (the cached word relation's partition count) so the check
    costs nothing per round."""
    lp = dict(logp)  # pinned closure copy

    def sweep(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: Counter = Counter()
        for pdf in batches:
            for word, freq in zip(pdf["word"], pdf["freq"]):
                seg = _viterbi(word, lp, max_len)
                if seg is None:  # unreachable once chars are seeded
                    continue
                for piece in seg:
                    acc[piece] += int(freq)
        yield pd.DataFrame({"piece": list(acc.keys()),
                            "cnt": list(acc.values())})

    partials = words.mapInPandas(sweep, "piece string, cnt long")
    if n_tasks is None:
        n_tasks = words.rdd.getNumPartitions()
    if n_tasks * max(len(lp), 1) > UNIGRAM_DRIVER_MERGE_MAX_ROWS:
        partials = (partials.groupBy("piece")
                    .agg(F.sum("cnt").alias("cnt")))
    acc: Counter = Counter()
    for r in partials.collect():
        acc[r["piece"]] += int(r["cnt"])
    return dict(acc)


def _train_loop(estep, seed_counts: dict[str, int], chars: set[str],
                vocab_size: int, shrink: float, em_iters: int,
                max_len: int) -> dict[str, float]:
    """Shared EM + prune schedule: `estep(logp) -> counts` is the only
    thing that differs between the distributed and sequential paths."""
    counts = dict(seed_counts)
    logp = _mstep(counts, chars)
    while len(logp) > vocab_size + len(chars):
        for _ in range(em_iters):
            counts = estep(logp)
            logp = _mstep(counts, chars)
        keep = max(vocab_size,
                   int((len(logp) - len(chars)) * shrink))
        counts = _prune(counts, chars, keep)
        logp = _mstep(counts, chars)
    counts = estep(logp)
    return _mstep(counts, chars)


def unigram_train(docs: DataFrame, vocab_size: int = UNIGRAM_VOCAB_SIZE,
                  n_seed: int = UNIGRAM_N_SEED,
                  max_piece_len: int = UNIGRAM_MAX_PIECE_LEN,
                  shrink: float = UNIGRAM_SHRINK,
                  em_iters: int = UNIGRAM_EM_ITERS,
                  text_col: str = "text") -> list[tuple[str, float]]:
    """Train the unigram piece inventory distributed; returns
    [(piece, logp)] sorted by (logp DESC, piece ASC) — vocab_size
    multi-character pieces plus the character floor."""
    words = word_frequencies(docs, text_col).cache()
    seed_counts, chars = seed_candidates(words, n_seed, max_piece_len)
    # partition count of the (now materialized) cached word relation,
    # read once: the E-step's driver-merge bound needs it every round
    n_tasks = words.rdd.getNumPartitions()
    logp = _train_loop(
        lambda lp: _estep_distributed(words, lp, max_piece_len, n_tasks),
        seed_counts, chars, vocab_size, shrink, em_iters, max_piece_len)
    words.unpersist()
    return sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))


def unigram_train_sequential(word_freqs: dict[str, int],
                             vocab_size: int = UNIGRAM_VOCAB_SIZE,
                             n_seed: int = UNIGRAM_N_SEED,
                             max_piece_len: int = UNIGRAM_MAX_PIECE_LEN,
                             shrink: float = UNIGRAM_SHRINK,
                             em_iters: int = UNIGRAM_EM_ITERS,
                             ) -> list[tuple[str, float]]:
    """Single-process reference: identical schedule, identical helpers,
    plain-Python seeding and E-step — the equality target the
    distributed trainer is tested against (bpe.py's venue pattern)."""
    counts: Counter = Counter()
    chars: set[str] = set()
    for word, freq in word_freqs.items():
        for ch in word:
            chars.add(ch)
            counts[ch] += freq
    sub_counts: Counter = Counter()
    for word, freq in word_freqs.items():
        n = len(word)
        for i in range(n):
            for ln in range(2, min(max_piece_len, n - i) + 1):
                sub_counts[word[i:i + ln]] += freq
    top = sorted(sub_counts.items(),
                 key=lambda pc: (-pc[1], pc[0]))[:n_seed]
    seed = dict(counts)
    for piece, c in top:
        seed.setdefault(piece, c)

    def estep(logp: dict[str, float]) -> dict[str, int]:
        acc: Counter = Counter()
        for word, freq in word_freqs.items():
            seg = _viterbi(word, logp, max_piece_len)
            if seg is None:
                continue
            for piece in seg:
                acc[piece] += freq
        return dict(acc)

    logp = _train_loop(estep, seed, chars, vocab_size, shrink,
                       em_iters, max_piece_len)
    return sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))


def unigram_tokenize(docs: DataFrame, vocab: list[tuple[str, float]],
                     id_col: str = "doc_id", text_col: str = "text",
                     max_piece_len: int = UNIGRAM_MAX_PIECE_LEN,
                     ) -> DataFrame:
    """Apply a trained inventory: (id, n_ws_tokens, n_pieces, pieces).
    One Arrow-batched Viterbi pass; the piece table rides the closure
    (KB-sized — broadcast semantics for free). Out-of-inventory
    characters fall back to one piece per character (byte-fallback's
    shape), so tokenization is total."""
    from etl_online_retail_spark.functions.text import normalize, tokens

    lp = dict(vocab)
    ml = max_piece_len
    base = docs.select(
        F.col(id_col),
        tokens(normalize(text_col)).alias("_toks"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids, n_ws, n_pieces, pieces = [], [], [], []
            for rid, toks in zip(pdf[id_col], pdf["_toks"]):
                out: list[str] = []
                nt = 0
                # NULL text -> NULL token array -> None here (r7
                # review): emit the empty tokenization, don't crash
                for w in (toks if toks is not None else ()):
                    if not w:
                        continue
                    nt += 1
                    seg = cache.get(w)
                    if seg is None:
                        seg = _viterbi(w, lp, ml) or list(w)
                        cache[w] = seg
                    out.extend(seg)
                ids.append(rid)
                n_ws.append(nt)
                n_pieces.append(len(out))
                pieces.append(out)
            yield pd.DataFrame({id_col: ids, "n_ws_tokens": n_ws,
                                "n_pieces": n_pieces, "pieces": pieces})

    id_type = docs.schema[id_col].dataType.simpleString()
    return base.mapInPandas(
        run, f"{id_col} {id_type}, n_ws_tokens long, n_pieces long, "
             "pieces array<string>")
