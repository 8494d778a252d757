"""Cross-document duplicate SPAN detection (exact substring dedup shape).

The document-level dedup operators (operators/dedup.py) answer "are these
two documents near-copies"; this module answers the finer question LLM
data pipelines actually act on: WHICH token ranges inside each document
are verbatim repeats of text seen elsewhere in the corpus (license
blocks, navigation chrome, quoted boilerplate). This is the shape of
"Deduplicating Training Data Makes Language Models Better" (Lee et al.,
2022): find every duplicated window of >= W tokens, then merge the
overlapping windows into maximal excisable spans per document.

The suffix-array machinery of the paper is a single-machine construction;
the distributed re-expression is sliding windows + a frequency join:

    1. tokenize once, build ALL stride-1 W-token windows per doc
       (pure array expressions — zero shuffle);
    2. one map-side-combinable hash agg over the window text finds
       windows occurring >= min_count times corpus-wide;
    3. join occurrences back (shuffle on the window key) and merge
       overlapping/adjacent windows per doc with one ordered window pass
       (classic gaps-and-islands: a window starts a new span iff its
       start exceeds the running max end of everything before it).

Every duplicated substring of length >= W is covered by at least one
duplicated W-window, so the merged spans are exactly the maximal regions
the suffix-array method would excise (granularity W: span boundaries snap
to window extents).

Scale notes (100 TB lens): the corpus-sized relations shuffle once on the
window key (step 2/3) and once on doc_id (island merge — or zero if the
corpus is bucketed by doc_id). Window strings here are the join key so the
DuckDB twin is collision-free-exact; at petabyte scale key on
poly_hash(win) (functions/hashing.py) instead — same plan, 8-byte keys.
The windows relation is W x corpus tokens in size; W is a constant (the
paper uses 50) and the explode is deterministic, so there is no skew
beyond the corpus's own window-frequency skew, which the min_count agg
absorbs map-side.

Reference parity: the reference has no span-level operator (its cleaning
is row filters, etl.py:150-170); this extends the M6 curation family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_online_retail_spark.functions.text import (
    normalize,
    tokens,
    word_ngrams_all_of_tokens,
)


def window_occurrences(docs: DataFrame, width: int,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(id, pos, win): every stride-1 `width`-token window of the
    normalized token stream, with its 0-based start position. Documents
    with fewer than `width` tokens contribute no rows."""
    norm = normalize(text_col)
    toks = tokens(norm)
    wins = word_ngrams_all_of_tokens(F.col("_toks"), width)
    return (docs
            .filter(F.trim(norm) != "")
            .select(F.col(id_col), toks.alias("_toks"))
            .select(id_col, F.posexplode(wins).alias("pos", "win")))


def duplicate_spans(docs: DataFrame, width: int = 5, min_count: int = 2,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Maximal duplicated token spans per document.

    A window is duplicated iff its exact text occurs >= min_count times
    corpus-wide (counting every occurrence, so verbatim repeats WITHIN one
    document count too). Overlapping and back-to-back duplicated windows
    merge into one span.

    Output: (id_col, span_start, span_end, n_windows, dup_tokens) — one
    row per maximal span, [span_start, span_end) in 0-based token
    positions, n_windows = duplicated windows merged into the span,
    dup_tokens = span length. All integers: oracle-hash-exact.
    """
    # cache: occ feeds BOTH the frequency agg and the occurrence probe —
    # uncached, the tokenize + window-explode lineage runs twice (rule 7;
    # measured ~1.5x on the sf0.1 bench query). At 100 TB: persist(DISK)
    # or stage the window relation once.
    occ = window_occurrences(docs, width, id_col, text_col).cache()
    dup = (occ.groupBy("win")
           .agg(F.count(F.lit(1)).alias("_n"))
           .filter(F.col("_n") >= min_count)
           .select("win"))
    hits = occ.join(dup, "win").select(id_col, "pos")

    by_doc = Window.partitionBy(id_col).orderBy("pos")
    prev_max_end = (F.max(F.col("pos") + width)
                    .over(by_doc.rowsBetween(Window.unboundedPreceding, -1)))
    brk = F.when(prev_max_end.isNull()
                 | (F.col("pos") > prev_max_end), 1).otherwise(0)
    islands = (hits
               .withColumn("_brk", brk)
               .withColumn("_isl", F.sum("_brk").over(
                   by_doc.rowsBetween(Window.unboundedPreceding, 0))))
    return (islands.groupBy(id_col, "_isl")
            .agg(F.min("pos").cast("bigint").alias("span_start"),
                 (F.max("pos") + width).cast("bigint").alias("span_end"),
                 F.count(F.lit(1)).alias("n_windows"),
                 (F.max("pos") + width - F.min("pos")).cast("bigint")
                 .alias("dup_tokens"))
            .drop("_isl"))


def excise_spans(docs: DataFrame, width: int = 5, min_count: int = 2,
                 id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """The ACTION to duplicate_spans' measurement (the C4-removal
    pattern, boilerplate_removal's sibling): rebuild each document with
    its duplicated spans cut out.

    Output: (id_col, n_tokens BIGINT, dup_tokens BIGINT, cleaned STRING)
    for every tokenizable document — untouched docs pass through with
    dup_tokens = 0, fully-duplicated docs come back with cleaned = ''.

    Shape: the token relation left-anti joins the span relation on
    doc_id + position-in-[start,end) — the only shuffles key on doc_id
    (token reassembly would shuffle there anyway), per-doc fan-out is
    tokens x spans-in-doc, and the span relation is output-bounded. The
    surviving tokens reassemble in position order via one grouped sort.
    """
    norm = normalize(text_col)
    # cache: the token relation feeds the total count AND the anti-join
    # probe (rule 7)
    toks = (docs
            .filter(F.trim(norm) != "")
            .select(id_col, F.posexplode(tokens(norm)).alias("pos", "tok"))
            .cache())
    # alias the span side's id: both relations descend from `docs`, so a
    # toks[id] == spans[id] condition trips Spark's self-join attribute
    # disambiguation (it warns and CAN mis-resolve to a trivially-true
    # compare); distinct names make the equi-part unambiguous
    spans = duplicate_spans(docs, width, min_count, id_col, text_col) \
        .select(F.col(id_col).alias("_span_id"), "span_start", "span_end")
    cut = (toks.join(
        spans,
        (F.col(id_col) == F.col("_span_id"))
        & (F.col("pos") >= F.col("span_start"))
        & (F.col("pos") < F.col("span_end")),
        "left_anti"))
    kept = (cut.groupBy(id_col)
            .agg(F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"])).alias("cleaned"),
                F.count(F.lit(1)).alias("_n_kept")))
    totals = (toks.groupBy(id_col)
              .agg(F.count(F.lit(1)).alias("n_tokens")))
    return (totals.join(kept, id_col, "left")
            .select(id_col, "n_tokens",
                    (F.col("n_tokens")
                     - F.coalesce(F.col("_n_kept"), F.lit(0)))
                    .cast("bigint").alias("dup_tokens"),
                    F.coalesce(F.col("cleaned"), F.lit(""))
                    .alias("cleaned")))


def span_dedup_stats(docs: DataFrame, width: int = 5, min_count: int = 2,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Per-document roll-up of duplicate_spans: how much of each affected
    document is excisable. (id, n_spans, dup_tokens_total)."""
    spans = duplicate_spans(docs, width, min_count, id_col, text_col)
    return (spans.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_spans"),
                 F.sum("dup_tokens").alias("dup_tokens_total")))
