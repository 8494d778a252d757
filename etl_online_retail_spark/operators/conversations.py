"""Conversation (SFT/chat) data preparation: parse, validate, flatten.

Instruction-tuning corpora arrive as JSON conversations — arrays of
{role, content} turns. Before they reach a trainer the pipeline must
(1) parse them against a pinned schema, (2) validate the turn protocol
(an optional leading system turn, then strict user/assistant
alternation starting with user — out-of-order roles are the classic
silent corruption in scraped SFT sets), and (3) flatten each
conversation through a chat template into the single training string.

Everything here is JVM Column algebra: from_json with a pinned schema
(never inferred), higher-order transform/forall for the protocol check,
array_join for the template render. No Python touches a turn, so the
100 TB cost is one codegen'd map stage.

HOF discipline (PERFORMANCE.md rule 7): every lambda references only
its own arguments.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TURNS_SCHEMA = T.ArrayType(T.StructType([
    T.StructField("role", T.StringType()),
    T.StructField("content", T.StringType()),
]))

DEFAULT_TEMPLATE = ("<|", "|>")  # role wrapped as <|role|> before content


def parse_conversations(df: DataFrame, json_col: str,
                        out_col: str = "turns") -> DataFrame:
    """Pinned-schema JSON parse: malformed documents become NULL turn
    arrays (count them to audit — the permissive crawl convention),
    never a job failure."""
    return df.withColumn(out_col,
                         F.from_json(F.col(json_col), TURNS_SCHEMA))


def alternation_ok(turns: Column | str) -> Column:
    """True iff the turn protocol holds: an OPTIONAL single leading
    system turn, then user/assistant strictly alternating starting with
    user, at least one full exchange, ENDING with an assistant turn
    (the completion the trainer targets — a trailing unanswered user
    turn is untrainable), and no NULL roles. NULL arrays are invalid
    (the parse already flagged them)."""
    t = F.col(turns) if isinstance(turns, str) else turns
    # drop a leading system turn, then check parity positions
    body = F.when(F.element_at(t, 1)["role"] == "system",
                  F.slice(t, 2, F.size(t) - 1)).otherwise(t)
    parity = F.forall(
        F.transform(body, lambda x, i: x["role"] == F.when(
            i % 2 == 0, F.lit("user")).otherwise(F.lit("assistant"))),
        lambda ok: ok)
    # NULL contents are invalid too (r12 review): flatten_chat's concat
    # nulls a turn with missing content and array_join then SKIPS it —
    # the training string silently loses the turn and the loss spans go
    # NULL, exactly the corruption this validator exists to catch
    contents = F.forall(t, lambda x: x["content"].isNotNull())
    # a NULL role nulls its comparison and forall propagates it —
    # coalesce to invalid rather than unknown
    return (t.isNotNull() & (F.size(t) >= 2) & (F.size(body) >= 2)
            & F.coalesce(parity, F.lit(False))
            & F.coalesce(contents, F.lit(False))
            & F.coalesce(F.element_at(t, -1)["role"] == "assistant",
                         F.lit(False))).alias("alternation_ok")


def flatten_chat(turns: Column | str,
                 template: tuple[str, str] = DEFAULT_TEMPLATE) -> Column:
    """The single training string: each turn rendered as
    <|role|>content, concatenated in stored order."""
    t = F.col(turns) if isinstance(turns, str) else turns
    lo, hi = template
    return F.array_join(
        F.transform(t, lambda x: F.concat(
            F.lit(lo), x["role"], F.lit(hi), x["content"])), "")


def loss_spans(turns: Column | str,
               template: tuple[str, str] = DEFAULT_TEMPLATE) -> Column:
    """[(start, end)) char offsets of ASSISTANT contents within
    flatten_chat's output — the spans a trainer computes loss on (all
    other characters are prompt/template and get masked). One
    sequential F.aggregate fold over the turns: the accumulator carries
    the running offset and the spans collected so far, so offsets are
    exact whatever the roles' order or multiplicity."""
    t = F.col(turns) if isinstance(turns, str) else turns
    lo, hi = template
    tag_extra = len(lo) + len(hi)
    init = F.struct(
        F.lit(0).cast("int").alias("pos"),
        F.expr("CAST(array() AS array<struct<start:int,end:int>>)")
         .alias("spans"))

    def step(acc, x):
        content_start = (acc["pos"] + F.length(x["role"])
                         + F.lit(tag_extra)).cast("int")
        content_end = (content_start + F.length(x["content"])).cast("int")
        span = F.struct(content_start.alias("start"),
                        content_end.alias("end"))
        return F.struct(
            content_end.alias("pos"),
            F.when(x["role"] == "assistant",
                   F.concat(acc["spans"], F.array(span)))
             .otherwise(acc["spans"]).alias("spans"))

    return F.aggregate(t, init, step, lambda acc: acc["spans"])


def sft_prep(df: DataFrame, json_col: str, id_col: str = "doc_id",
             template: tuple[str, str] = DEFAULT_TEMPLATE) -> DataFrame:
    """The composed stage: parse -> validate -> flatten.
    (id, n_turns, alternation_ok, flat); a trainer filters on
    alternation_ok and reads flat."""
    parsed = parse_conversations(df, json_col)
    return parsed.select(
        F.col(id_col),
        F.size("turns").alias("n_turns"),
        alternation_ok("turns"),
        flatten_chat("turns", template).alias("flat"))
