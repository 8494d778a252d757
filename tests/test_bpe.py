"""BPE merge learning matches a reference in-memory implementation."""

from __future__ import annotations

from collections import Counter

from etl_online_retail_spark.operators.bpe import (
    bpe_segment,
    bpe_train,
    word_frequencies,
)


def _reference_bpe(word_freqs: dict[str, int], n_merges: int):
    """Straight-line Sennrich BPE on a word-frequency dict."""
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        # count desc, pair asc — the operator's deterministic tiebreak
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == best[0]
                        and syms[i + 1] == best[1]):
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


CORPUS = [
    (1, "low low low low low"),
    (2, "lower lower newest newest"),
    (3, "newest newest newest newest"),
    (4, "widest widest widest"),
]


def test_bpe_train_matches_reference_in_both_venues(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    wf = {r.word: r.freq for r in word_frequencies(docs).collect()}
    assert wf == {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    want = _reference_bpe(wf, 8)
    # small-vocab venue (collected loop)
    assert bpe_train(docs, n_merges=8) == want
    # distributed venue (driver_threshold=0 forces the round loop)
    assert bpe_train(docs, n_merges=8, driver_threshold=0) == want
    # sanity: the famous example's early merges contain 'es' -> 'est'
    joined = ["".join(p) for p in want]
    assert "es" in joined and "est" in joined


def test_bpe_segment_compresses_with_more_merges(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges = bpe_train(docs, n_merges=10)
    none = {r.doc_id: r.n_tokens_bpe
            for r in bpe_segment(docs, []).collect()}
    full = {r.doc_id: r.n_tokens_bpe
            for r in bpe_segment(docs, merges).collect()}
    for d in none:
        assert full[d] <= none[d]
    # with zero merges every char is a token
    assert none[1] == 5 * 3
    # 'newest' fully merges within 10 rounds on this corpus -> few tokens
    assert full[3] <= 8


def test_batched_rounds_match_sequential_on_chained_merges(spark):
    """On a corpus whose merges are strictly chained (each builds on the
    last), batching must degrade to one merge per round and still match."""
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    wf = {r.word: r.freq for r in word_frequencies(docs).collect()}
    want = _reference_bpe(wf, 8)
    stats: dict = {}
    assert bpe_train(docs, n_merges=8, driver_threshold=0,
                     stats=stats) == want


# disjoint-alphabet words with strictly distinct frequencies: the top
# pairs (a,b):5 (c,d):4 (e,f):3 are symbol-independent, so one batched
# sweep may apply all three
INDEPENDENT_CORPUS = [
    (1, "ab ab ab ab ab"),
    (2, "cd cd cd cd"),
    (3, "ef ef ef"),
]


def test_batched_rounds_match_sequential_and_cut_sweeps(spark):
    """Batched distributed rounds yield the identical merge sequence with
    fewer explode+agg sweeps (ROADMAP 13)."""
    docs = spark.createDataFrame(INDEPENDENT_CORPUS, "doc_id long, text string")
    wf = {r.word: r.freq for r in word_frequencies(docs).collect()}
    want = _reference_bpe(wf, 8)
    assert len(want) == 3
    batched_stats: dict = {}
    got = bpe_train(docs, n_merges=8, driver_threshold=0,
                    stats=batched_stats)
    assert got == want
    sequential_stats: dict = {}
    got_seq = bpe_train(docs, n_merges=8, driver_threshold=0, batch_k=1,
                        stats=sequential_stats)
    assert got_seq == want
    assert batched_stats["rounds"] < sequential_stats["rounds"]


def test_select_merge_batch_guards_exactness():
    from etl_online_retail_spark.operators.bpe import _select_merge_batch

    def p(l, r):
        return f"{l}\x00{r}"

    # disjoint strict-count prefix: all accepted
    assert _select_merge_batch(
        [(p("a", "b"), 10), (p("c", "d"), 9), (p("e", "f"), 8)],
        complete=True) == [("a", "b"), ("c", "d"), ("e", "f")]
    # stop at first overlap; strict dominance over the stop bound holds
    assert _select_merge_batch(
        [(p("a", "b"), 10), (p("c", "d"), 9), (p("b", "e"), 8)],
        complete=True) == [("a", "b"), ("c", "d")]
    # tie with the stop bound truncates (equal-count lex upsets possible)
    assert _select_merge_batch(
        [(p("a", "b"), 10), (p("c", "d"), 8), (p("b", "e"), 8)],
        complete=True) == [("a", "b")]
    # overlap at rank 2 with equal count: argmax fallback
    assert _select_merge_batch(
        [(p("a", "b"), 10), (p("b", "c"), 10)],
        complete=True) == [("a", "b")]
    # incomplete fetch: boundary ties are unsafe, last count is the bound
    assert _select_merge_batch(
        [(p("a", "b"), 10), (p("c", "d"), 9)],
        complete=False) == [("a", "b")]
    assert _select_merge_batch(
        [(p("a", "b"), 10), (p("c", "d"), 9), (p("e", "f"), 8)],
        complete=False) == [("a", "b"), ("c", "d")]
