"""Sequence packing: lay documents out into fixed-size training sequences.

The standard pretraining data layout ("concat and chunk"): tokens of all
documents are concatenated in a deterministic order and cut every `budget`
tokens; a document may straddle a cut. This module computes each document's
placement — global token offset and the range of sequence ids it lands in —
without materializing tokens: one windowed running sum per group.

Scale notes: the window partitions by the grouping column (source shard),
so the plan is a single hash-partitioned Exchange + sort per group — no
global single-partition window, no joins. At 100 TB you pack per shard
(source, date, ...) exactly like this; sequence ids are then (group, seq)
pairs, which is what downstream loaders consume anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(docs: DataFrame, budget: int, tokens_col: Column | str,
                   id_col: str = "doc_id",
                   group_col: str = "source") -> DataFrame:
    """Assign each document its packed placement under a token budget.

    Documents are ordered by `id_col` within each `group_col` partition
    (total, deterministic order). Output adds:
      n_tokens      token count of the doc
      start_offset  first token's offset in the group's concatenated stream
      first_seq     sequence id holding the doc's first token
      last_seq      sequence id holding the doc's last token (== first_seq
                    for empty docs, which occupy no tokens)

    Integer division throughout (`div`), so offsets stay exact BIGINTs at
    any corpus size — no double rounding past 2^53 tokens.
    """
    tok = (F.col(tokens_col) if isinstance(tokens_col, str)
           else tokens_col).cast("bigint")
    w = (Window.partitionBy(group_col).orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = (docs
           .withColumn("n_tokens", tok)
           .withColumn("_cum_end", F.sum("n_tokens").over(w).cast("bigint"))
           .withColumn("start_offset", F.col("_cum_end") - F.col("n_tokens")))
    first = F.expr(f"start_offset div {int(budget)}")
    last = F.when(F.col("n_tokens") == 0, first) \
            .otherwise(F.expr(f"(_cum_end - 1) div {int(budget)}"))
    return (out
            .withColumn("first_seq", first)
            .withColumn("last_seq", last)
            .drop("_cum_end"))


def packing_summary(packed: DataFrame,
                    group_col: str = "source") -> DataFrame:
    """Per-group packing stats: docs, tokens, sequences spanned."""
    return (packed.groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").cast("bigint").alias("total_tokens"),
                 (F.max("last_seq") + 1).cast("bigint").alias("n_sequences")))


def length_bucket_batches(docs: DataFrame, id_col: str, tokens_col: Column,
                          batch_size: int,
                          bucketed: bool = True) -> DataFrame:
    """Length-bucketed batch assembly for padded (non-packed) training:
    docs are grouped into power-of-two length buckets (capacity = next
    power of two >= n_tokens), ordered deterministically inside each
    bucket by the sampling hash, and cut into fixed-count batches. Each
    batch pads every member to ITS OWN max length, so per-batch waste =
    batch_count * max(n_tokens) - sum(n_tokens). Output: one row per
    batch (bucket_cap, batch_id, n_docs, real_tokens, padded_tokens).

    bucketed=False computes the naive baseline — one global bucket, same
    arithmetic — whose single-partition window is exactly the thing
    bucketing avoids; it exists as the measured comparison, not a scale
    path. Shape (bucketed): one shuffle on the bucket key; ~60 buckets
    however large the corpus, each window sorting only its own bucket.

    Integer arithmetic throughout (capacity from the BIT LENGTH of
    n_tokens - 1, never floating log2) — hash-verifiable cross-engine.
    """
    from etl_online_retail_spark.operators.sampling import _hval

    tok = tokens_col.cast("bigint")
    # next power of two >= t: 1 << bit_length(t - 1); t == 1 -> 1
    # (bit length via the binary-string trick — integer-exact, the HDR
    # sketch's octave discipline; shift count must ride an expr because
    # the python shiftleft binding takes a literal int only)
    base = (docs.select(F.col(id_col).alias("_id"), tok.alias("_t"))
            .filter(F.col("_t") >= 1)
            .withColumn(
                "_bl",
                F.when(F.col("_t") <= 1, F.lit(0)).otherwise(
                    F.length(F.conv((F.col("_t") - 1).cast("string"),
                                    10, 2))).cast("int"))
            .withColumn(
                "_cap",
                F.expr("shiftleft(CAST(1 AS BIGINT), _bl)")
                if bucketed else F.lit(0).cast("bigint"))
            .drop("_bl"))
    w = (Window.partitionBy("_cap")
         .orderBy(_hval(F.col("_id")).asc(), F.col("_id").asc()))
    batched = (base.withColumn("_rn", F.row_number().over(w))
               .withColumn("batch_id",
                           F.expr(f"(_rn - 1) div {int(batch_size)}")
                           .cast("bigint")))
    return (batched.groupBy(F.col("_cap").alias("bucket_cap"), "batch_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("_t").cast("bigint").alias("real_tokens"),
                 (F.max("_t") * F.count(F.lit(1))).cast("bigint")
                 .alias("padded_tokens")))


def chunk_offsets(docs: DataFrame, window: int = 64, stride: int = 48,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Sliding-window retrieval chunking: one row per (doc, chunk) with
    token offsets [start_tok, start_tok + chunk_len). The RAG indexing
    primitive — pure per-row sequence explosion, no shuffle. Docs
    shorter than the window yield exactly one chunk; empty docs none."""
    from etl_online_retail_spark.functions.text import token_count

    base = (docs.select(F.col(id_col),
                        token_count(text_col).alias("_n"))
            .filter(F.col("_n") > 0))
    n_chunks = (F.when(F.col("_n") <= window, F.lit(1))
                .otherwise(F.ceil((F.col("_n") - window)
                                  / F.lit(float(stride))).cast("int") + 1))
    return (base.withColumn("_nc", n_chunks)
            .select(id_col, "_n",
                    F.explode(F.sequence(F.lit(1), F.col("_nc")))
                     .alias("_i"))
            .select(id_col,
                    (F.col("_i") - 1).cast("int").alias("chunk_id"),
                    ((F.col("_i") - 1) * stride).cast("int")
                     .alias("start_tok"),
                    F.least(F.lit(window),
                            F.col("_n") - (F.col("_i") - 1) * stride)
                     .cast("int").alias("chunk_len")))


def pack_loss_spans(docs: DataFrame, budget: int,
                    len_col: Column | str, spans_col: Column | str,
                    id_col: str = "doc_id",
                    group_col: str = "source") -> DataFrame:
    """Pack SFT training strings under a token budget and RE-BASE their
    loss spans into packed-sequence coordinates — the layout a trainer
    actually consumes (r13, verdict task 4).

    `pack_sequences` places whole documents; this places their LOSS
    SPANS: each doc occupies [start_offset, start_offset + len) in its
    group's concatenated stream (same windowed running sum, same
    deterministic id order), a span [s, e) within the doc re-bases to
    global [start_offset + s, start_offset + e) and then SPLITS at
    every budget-multiple cut it straddles. Output: one row per
    (doc, span, sequence) piece —
      group_col, id_col, span_idx   which span of which doc
      seq_id                        the packed sequence holding the piece
      local_start, local_end        [start, end) INSIDE that sequence

    so sum(local_end - local_start) over a doc's rows == its total loss
    chars, and every piece lies in [0, budget). Empty spans vanish.
    Integer arithmetic throughout (exact BIGINTs past 2^53 tokens, like
    pack_sequences); `spans_col` is the array<struct<start,end>> that
    operators/conversations.loss_spans emits.

    Scale shape: the running sum is one hash-partitioned window per
    group (no global sort), the split is a per-row sequence explode
    bounded by ceil(span_len / budget) + 1 — map-only after the window.
    """
    b = int(budget)
    n = (F.col(len_col) if isinstance(len_col, str)
         else len_col).cast("bigint")
    spans = F.col(spans_col) if isinstance(spans_col, str) \
        else spans_col
    w = (Window.partitionBy(group_col).orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    base = (docs
            .withColumn("_len", n)
            .withColumn("_off",
                        (F.sum("_len").over(w) - F.col("_len"))
                        .cast("bigint"))
            .select(group_col, id_col, "_off",
                    F.posexplode(spans).alias("span_idx", "_s")))
    placed = (base
              .withColumn("_gs", F.col("_off")
                          + F.col("_s")["start"].cast("bigint"))
              .withColumn("_ge", F.col("_off")
                          + F.col("_s")["end"].cast("bigint"))
              .filter(F.col("_ge") > F.col("_gs"))
              .withColumn("seq_id", F.explode(F.sequence(
                  F.expr(f"_gs div {b}"), F.expr(f"(_ge - 1) div {b}")))))
    cut = F.col("seq_id") * b
    return placed.select(
        group_col, id_col, F.col("span_idx").cast("int").alias("span_idx"),
        F.col("seq_id").cast("bigint").alias("seq_id"),
        (F.greatest(F.col("_gs"), cut) - cut).cast("bigint")
        .alias("local_start"),
        (F.least(F.col("_ge"), cut + b) - cut).cast("bigint")
        .alias("local_end"))
