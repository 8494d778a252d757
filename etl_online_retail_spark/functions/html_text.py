"""HTML -> text extraction (stdlib html.parser) — the step between a
crawl's raw responses (sources/warc.py) and every text-curation
operator (quality, lang-id, dedup): markup is stripped, script/style
subtrees are dropped whole, and character/entity references decode to
their characters.

Per-document Python is unavoidable here (HTML is a stateful grammar,
not a columnar expression), so the column-level wrapper follows the
multimodal codec contract: Arrow-batched mapInPandas, map-only, no
shuffle — the per-core ceiling is stated in PERFORMANCE.md and the
swap-in for a C extractor keeps the same signature.

Whitespace policy is the caller's: collapse=True (the curation default)
normalizes every inter-text gap to single spaces — tag boundaries count
as gaps, so `<p>a</p><p>b</p>` is "a b" — while collapse=False
concatenates text nodes verbatim (what the round-trip oracle uses:
escape(text) embedded in a single element extracts back bit-equal).
"""

from __future__ import annotations

from html.parser import HTMLParser

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# subtrees whose character data is code/markup, never document text
# (none are void elements, so every start tag legitimately pushes depth)
_DROP = {"script", "style", "template", "noscript"}


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        # convert_charrefs=True (the default) decodes &amp; / &#x27; /
        # &quot; into characters inside handle_data — entity decoding
        # comes from the stdlib table, not a hand-rolled subset
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._drop_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _DROP:
            self._drop_depth += 1

    def handle_endtag(self, tag):
        if tag in _DROP and self._drop_depth > 0:
            self._drop_depth -= 1

    def handle_data(self, data):
        if self._drop_depth == 0 and data:
            self.parts.append(data)


def html_to_text(html: str, collapse: bool = True) -> str:
    """Visible text of an HTML document (script/style dropped,
    entities decoded). collapse=True joins on single spaces."""
    p = _TextExtractor()
    p.feed(html)
    p.close()
    if collapse:
        # text-NODE boundaries count as gaps (join with a space before
        # splitting): <p>a</p><p>b</p> is "a b", never "ab"
        return " ".join(" ".join(p.parts).split())
    return "".join(p.parts)


# block-level elements: entering or leaving one ends the current text
# block (the segmentation unit the link-density heuristic scores)
_BLOCKS = {"p", "div", "li", "ul", "ol", "td", "th", "tr", "table",
           "h1", "h2", "h3", "h4", "h5", "h6", "article", "section",
           "header", "footer", "nav", "aside", "blockquote", "pre",
           "figure", "figcaption", "main", "form", "body"}


class _BlockSegmenter(HTMLParser):
    """Text blocks with per-block link-character counts — the
    readability/jusText-class signal: boilerplate (navigation, related
    links, footers) is text that lives mostly inside anchors."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int]] = []  # (text, link_chars)
        self._parts: list[str] = []
        self._link_chars = 0
        self._drop_depth = 0
        self._anchor_depth = 0

    def _flush(self) -> None:
        text = " ".join("".join(self._parts).split())
        if text:
            self.blocks.append((text, self._link_chars))
        self._parts = []
        self._link_chars = 0
        # clamp anchor state at every block boundary (r12 review): one
        # unclosed <a> — ubiquitous in real crawl markup — would
        # otherwise mark EVERY later block ~100% link density and the
        # extractor would drop the whole page. Trade-off: an anchor
        # legitimately wrapping block content (HTML5 card links) loses
        # its link-ness for the inner blocks; per-block scoring is the
        # jusText convention and unclosed anchors are far more common.
        self._anchor_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _DROP:
            self._drop_depth += 1
        elif tag in _BLOCKS:
            self._flush()
        elif tag == "a":
            self._anchor_depth += 1

    def handle_endtag(self, tag):
        if tag in _DROP:
            if self._drop_depth > 0:
                self._drop_depth -= 1
        elif tag in _BLOCKS:
            self._flush()
        elif tag == "a" and self._anchor_depth > 0:
            self._anchor_depth -= 1

    def handle_data(self, data):
        if self._drop_depth == 0 and data:
            self._parts.append(data)
            if self._anchor_depth > 0:
                self._link_chars += len(data)

    def close(self):
        super().close()
        self._flush()


def text_blocks(html: str) -> list[tuple[str, float]]:
    """(block_text, link_density) per block, whitespace-collapsed.
    link_density = anchor characters / block characters (whitespace
    normalization shifts totals slightly; the RAW character counts are
    used, matching jusText's definition closely enough for the 0.5-class
    thresholds in use)."""
    p = _BlockSegmenter()
    p.feed(html)
    p.close()
    return [(t, lc / len(t) if t else 0.0) for t, lc in p.blocks]


def extract_main_content(html: str,
                         max_link_density: float = 0.5) -> str:
    """Visible MAIN text: blocks whose link density is below the
    threshold, joined with newlines. Navigation bars, related-link
    lists and footers are text that lives (almost) entirely inside
    anchors, so they score ~1.0 and drop; prose with inline links
    scores low and survives — the standard first-order main-content
    heuristic (jusText / readability), which is how a crawl pipeline
    extracts TRAINING text rather than site chrome."""
    return "\n".join(t for t, d in text_blocks(html)
                     if d < max_link_density)


HTML_TEXT_SCHEMA_SUFFIX = [T.StructField("text", T.StringType())]


def _extract_df(df: DataFrame, html_col: str, id_col: str,
                fn) -> DataFrame:
    """(id_col, text) via an html->text callable, Arrow-batched.

    html_col may be STRING (markup) or BINARY (a crawl response body —
    decoded as UTF-8 with replacement, the crawl-curation convention:
    a mojibake document should flow to the quality filter and get
    scored down, not kill the job)."""
    import pandas as pd

    is_binary = dict(df.dtypes)[html_col] == "binary"
    out_schema = T.StructType(
        [df.schema[id_col]] + HTML_TEXT_SCHEMA_SUFFIX)

    def run(batches):
        for pdf in batches:
            htmls = pdf[html_col]
            if is_binary:
                # null-safe: one null cell must not kill the job — the
                # operator is total, null in -> null out (r12 review)
                htmls = htmls.map(
                    lambda b: None if b is None
                    else bytes(b).decode("utf-8", "replace"))
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "text": htmls.map(
                    lambda h: None if h is None else fn(h)),
            })

    return df.select(id_col, html_col).mapInPandas(run, out_schema)


def extract_html_text(df: DataFrame, html_col: str, id_col: str,
                      collapse: bool = True) -> DataFrame:
    """(id_col, text): ALL visible text per row (see html_to_text)."""
    return _extract_df(df, html_col, id_col,
                       lambda h: html_to_text(h, collapse=collapse))


def extract_main_text(df: DataFrame, html_col: str, id_col: str,
                      max_link_density: float = 0.5) -> DataFrame:
    """(id_col, text): MAIN-content text per row — site chrome dropped
    by block link density (see extract_main_content)."""
    return _extract_df(
        df, html_col, id_col,
        lambda h: extract_main_content(
            h, max_link_density=max_link_density))
