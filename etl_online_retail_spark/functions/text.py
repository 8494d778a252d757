"""Text-analysis column expressions (training-data pipeline extensions).

The reference has no text surface beyond length/digit filters (etl.py:67-81);
these are the operators a large-scale training-data pipeline needs: language
ID, quality scoring, token counting, shingling, and document fingerprinting.
All are built-in-function compositions (JVM-side, codegen-friendly) with
exact DuckDB SQL twins for the oracle gate - no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from etl_online_retail_spark.functions.hashing import PRIME, poly_hash

# Tiny deterministic stopword lists per language for the n-gram/stopword
# lang-id heuristic. Word choice matters less than determinism: the score is
# "fraction of whitespace tokens found in the language's list".
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "von", "mit", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "des", "une", "que", "dans"],
    "es": ["el", "la", "los", "de", "que", "es", "en", "un", "una", "por"],
}

_WS = r"\s+"


def normalize(col: Column | str) -> Column:
    """Lowercase, strip non-alphanumerics (keeps spaces), collapse whitespace.

    Twin SQL: trim(regexp_replace(regexp_replace(lower(t),
        '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))
    """
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(F.lower(c), "[^a-z0-9 ]", " ")
    return F.trim(F.regexp_replace(cleaned, " +", " "))


def normalize_sql(expr: str) -> str:
    return (f"trim(regexp_replace(regexp_replace(lower({expr}), "
            f"'[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of already-trimmed text -> array<string>."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), _WS)


def token_count(col: Column | str) -> Column:
    """Whitespace token count; 0 for empty text.

    Twin SQL: CASE WHEN trim(t)='' THEN 0
              ELSE len(regexp_split_to_array(trim(t), '\\s+')) END
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.trim(c) == "", F.lit(0)).otherwise(F.size(tokens(c))).cast("int")


def token_count_sql(expr: str) -> str:
    return (f"CAST(CASE WHEN trim({expr}) = '' THEN 0 "
            f"ELSE len(regexp_split_to_array(trim({expr}), '\\s+')) END AS INTEGER)")


def char_ngrams(col: Column | str, n: int = 3) -> Column:
    """Distinct character n-grams (shingles) of the string -> array<string>.

    Built from the char array with zip_with (see _ngrams_of_array for why
    substring(s, i, n) inside a transform lambda would be quadratic).
    Matches the DuckDB twin (generate_series + substring) value-for-value.
    """
    c = F.col(col) if isinstance(col, str) else col
    chars = F.split(c, "")
    grams = _ngrams_of_array(chars, n, sep="")
    return F.array_distinct(F.filter(grams, lambda g: F.length(g) == n))


def char_ngrams_sql(expr: str, n: int = 3) -> str:
    return (
        f"list_distinct(list_filter(list_transform("
        f"generate_series(1, greatest(length({expr}) - {n - 1}, 1)), "
        f"i -> substring({expr}, i, {n})), g -> length(g) = {n}))"
    )


def _ngrams_of_array(arr: Column, n: int, sep: str = " ") -> Column:
    """n-grams of an array column via zip_with over shifted slices.

    Performance-critical shape: a lambda that references an OUTER
    expression (e.g. element_at(split(normalize(s)), i)) makes Catalyst
    re-evaluate that expression per array element - O(len^2) per row and
    ~30x slower in practice. zip_with only touches its bound lambda
    variables, so the source array is evaluated once however it was built.
    """
    m = F.greatest(F.size(arr) - (n - 1), F.lit(0))
    out = F.slice(arr, 1, m)
    for j in range(1, n):
        shifted = F.slice(arr, j + 1, m)
        out = F.zip_with(out, shifted, lambda a, b: F.concat(a, F.lit(sep), b))
    return out


def word_ngrams(col: Column | str, n: int = 2, *,
                normalized: bool = False) -> Column:
    """Distinct word n-grams of normalized text -> array<string>.

    Word-level shingles are far more discriminative than char shingles on
    short texts (char-3 jaccard saturates ~0.5 on small vocabularies). The
    empty-array guard for texts with < n tokens is explicit so the Spark
    and SQL twins agree (concat semantics over out-of-bounds differ).

    normalized=True: col already holds normalize() output — lets a caller
    that materialized the normalization once (e.g. the curation pipeline's
    cached base relation) skip the three regex passes per consumer.
    """
    toks = tokens(col if normalized else normalize(col))
    empty = F.array().cast("array<string>")
    return F.when(F.size(toks) < n, empty).otherwise(
        F.array_distinct(_ngrams_of_array(toks, n)))


def word_ngrams_sql(expr: str, n: int = 2) -> str:
    norm = normalize_sql(expr)
    ws = f"regexp_split_to_array({norm}, '\\s+')"
    parts = " || ' ' || ".join(f"({ws})[i + {j}]" for j in range(n))
    return (f"(CASE WHEN len({ws}) < {n} THEN []::VARCHAR[] "
            f"ELSE list_distinct(list_transform("
            f"generate_series(1, len({ws}) - {n - 1}), i -> {parts})) END)")


def word_shingle_hashes(col: Column | str, n: int = 2, *,
                        normalized: bool = False) -> Column:
    """Distinct word n-gram shingles as portable BIGINT hashes."""
    return F.array_distinct(
        F.transform(word_ngrams(col, n, normalized=normalized),
                    lambda g: _gram_hash(g))
    )


def word_ngrams_of_tokens(toks: Column, n: int = 2) -> Column:
    """word_ngrams over an already-MATERIALIZED token array column.

    The token expression (normalize -> 2 regex passes -> split) is
    referenced ~5x inside the n-gram expression (size guard + n slices);
    inlined, codegen does not reliably fold those copies, so the regex
    pipeline can run several times per row. Corpus-scale callers should
    project `tokens(normalize(text))` into its own column first and build
    n-grams from that column reference (measured ~2x on the shingle
    pipelines at sf0.1).
    """
    empty = F.array().cast("array<string>")
    return F.when(F.size(toks) < n, empty).otherwise(
        F.array_distinct(_ngrams_of_array(toks, n)))


def word_shingle_hashes_of_tokens(toks: Column, n: int = 2) -> Column:
    """word_shingle_hashes over a materialized token array column."""
    return F.array_distinct(
        F.transform(word_ngrams_of_tokens(toks, n), lambda g: _gram_hash(g)))


def word_ngrams_all_of_tokens(toks: Column, n: int = 2) -> Column:
    """word_ngrams_all (multiset) over a materialized token array column."""
    empty = F.array().cast("array<string>")
    return F.when(F.size(toks) < n, empty).otherwise(_ngrams_of_array(toks, n))


def word_shingle_hashes_all_of_tokens(toks: Column, n: int = 2) -> Column:
    """Multiset word-shingle hashes (one entry PER OCCURRENCE, positions
    implied by order) — the passage-level view cross-document repetition
    analysis needs, vs the distinct-set view dedup signatures use."""
    return F.transform(word_ngrams_all_of_tokens(toks, n),
                       lambda g: _gram_hash(g))


def word_shingle_hashes_sql(expr: str, n: int = 2) -> str:
    gram_hash = ("list_reduce(list_prepend(0::BIGINT, "
                 "list_transform(string_split(g, ''), c -> ascii(c)::BIGINT)), "
                 f"(a, b) -> (a * 31 + b) % {PRIME})")
    return (f"list_distinct(list_transform({word_ngrams_sql(expr, n)}, "
            f"g -> {gram_hash}))")


def shingle_hashes(col: Column | str, n: int = 3) -> Column:
    """Distinct n-gram shingles as portable BIGINT hashes -> array<bigint>."""
    return F.array_distinct(
        F.transform(char_ngrams(col, n), lambda g: _gram_hash(g))
    )


def _gram_hash(g: Column) -> Column:
    codes = F.transform(F.split(g, ""), lambda ch: F.ascii(ch).cast("bigint"))
    return F.aggregate(codes, F.lit(0).cast("bigint"),
                       lambda acc, x: (acc * 31 + x) % PRIME)


def shingle_hashes_sql(expr: str, n: int = 3) -> str:
    gram_hash = ("list_reduce(list_prepend(0::BIGINT, "
                 "list_transform(string_split(g, ''), c -> ascii(c)::BIGINT)), "
                 f"(a, b) -> (a * 31 + b) % {PRIME})")
    return (f"list_distinct(list_transform({char_ngrams_sql(expr, n)}, "
            f"g -> {gram_hash}))")


def word_ngrams_all(col: Column | str, n: int = 2, *,
                    normalized: bool = False) -> Column:
    """ALL word n-grams (with repeats) of normalized text -> array<string>.

    The non-distinct twin of word_ngrams: repetition analysis needs the
    multiset (a doc that repeats one phrase has many copies of one gram).
    """
    toks = tokens(col if normalized else normalize(col))
    empty = F.array().cast("array<string>")
    return F.when(F.size(toks) < n, empty).otherwise(_ngrams_of_array(toks, n))


def word_ngrams_all_sql(expr: str, n: int = 2) -> str:
    norm = normalize_sql(expr)
    ws = f"regexp_split_to_array({norm}, '\\s+')"
    parts = " || ' ' || ".join(f"({ws})[i + {j}]" for j in range(n))
    return (f"(CASE WHEN len({ws}) < {n} THEN []::VARCHAR[] "
            f"ELSE list_transform("
            f"generate_series(1, len({ws}) - {n - 1}), i -> {parts}) END)")


def word_shingle_hashes_all_sql(expr: str, n: int = 2) -> str:
    """DuckDB twin of word_shingle_hashes_all_of_tokens."""
    gram_hash = ("list_reduce(list_prepend(0::BIGINT, "
                 "list_transform(string_split(g, ''), c -> ascii(c)::BIGINT)), "
                 f"(a, b) -> (a * 31 + b) % {PRIME})")
    return (f"list_transform({word_ngrams_all_sql(expr, n)}, "
            f"g -> {gram_hash})")


def redaction_count(col: Column | str, pattern: str) -> Column:
    """Number of denylist/PII pattern matches in the text -> INT."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0))).cast("int")


def redaction_count_sql(expr: str, pattern: str) -> str:
    return (f"CAST(len(regexp_extract_all({expr}, '{pattern}')) AS INTEGER)")


def redacted(col: Column | str, pattern: str,
             replacement: str = "[REDACTED]") -> Column:
    """Text with every pattern match replaced (Spark regexp_replace is
    global by default; the SQL twin needs the 'g' flag)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, pattern, replacement)


def redacted_sql(expr: str, pattern: str,
                 replacement: str = "[REDACTED]") -> str:
    return f"regexp_replace({expr}, '{pattern}', '{replacement}', 'g')"


def stopword_ratio(col: Column | str, lang: str, *,
                   normalized: bool = False) -> Column:
    """Fraction of whitespace tokens that are in lang's stopword list."""
    c = F.col(col) if isinstance(col, str) else col
    toks = tokens(c if normalized else normalize(c))
    hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS[lang])))
    return (hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double"))


def stopword_ratio_sql(expr: str, lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    norm = normalize_sql(expr)
    toks = f"regexp_split_to_array({norm}, '\\s+')"
    return (f"(len(list_filter({toks}, t -> t IN ({words})))::DOUBLE / "
            f"greatest(len({toks}), 1)::DOUBLE)")


BPE_PRETOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+"


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-style pre-tokenizer count: runs of letters, runs of digits, and
    runs of other non-space symbols each count as one pre-token (the
    GPT-2-family pre-tokenization shape, simplified to ASCII classes).

    Twin SQL: len(regexp_extract_all(t, '<re>')).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_PRETOKEN_RE), F.lit(0))).cast("int")


def bpe_ish_token_count_sql(expr: str) -> str:
    return (f"CAST(len(regexp_extract_all({expr}, "
            f"'{BPE_PRETOKEN_RE}')) AS INTEGER)")


def fingerprint(col: Column | str, *, normalized: bool = False) -> Column:
    """Rolling-hash document fingerprint over normalized text -> BIGINT.

    Normalization first so trivial formatting changes don't alter the
    fingerprint - the standard content-defined fingerprint for exact dedup.
    """
    c = F.col(col) if isinstance(col, str) else col
    return poly_hash(c if normalized else normalize(c))


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.length(F.regexp_replace(c, "[^a-zA-Z0-9 ]", ""))
    return ((F.length(c) - stripped).cast("double")
            / F.greatest(F.length(c), F.lit(1)).cast("double"))


def punct_ratio_sql(expr: str) -> str:
    return (f"((length({expr}) - length(regexp_replace({expr}, "
            f"'[^a-zA-Z0-9 ]', '', 'g')))::DOUBLE / "
            f"greatest(length({expr}), 1)::DOUBLE)")
