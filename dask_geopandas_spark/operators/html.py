"""HTML -> text extraction for crawled-corpus ingestion (beyond the
reference's surface — BASELINE.json north star: the front door every
published crawl pipeline passes through before ANY other operator —
C4, CCNet and RefinedWeb all start from raw HTML/WET).

The whole chain is native Spark SQL expressions (JVM-side, whole-stage
codegen) — no UDF, no per-row Python: script/style/comment removal and
tag stripping are regexp chains, block segmentation is one
sentinel-substitution + split, and the per-block boilerplate signals
(link density and text density, the jusText/trafilatura heuristics)
are higher-order array functions over the block list.  Every construct
has an exact DuckDB twin (inline ``(?is)`` flags, explicit ASCII
classes, non-greedy quantifiers — identical Java-regex/RE2 semantics;
no backreferences or lookarounds), so the driver oracle replicates the
extraction bit-for-bit.

Deliberate scope (the regexp-subset contract):

* tags are delimited by ``<`` .. ``>`` — a literal ``>`` inside a
  QUOTED attribute value truncates that tag early (rare in real
  markup; a conforming parser escapes it);
* entities: the named set every generator emits (``&lt; &gt; &quot;
  &#39; &apos; &nbsp; &amp;``) decodes; other numeric refs pass
  through as text;
* an unterminated ``<script>``/``<style>`` swallows the rest of the
  document (what a browser does).

At 100 TB this matters: extraction runs inside the scan stage of the
very first pass over a crawl, so keeping it codegen (not even an
Arrow batch boundary) means the HTML bytes are touched exactly once,
co-partitioned with whatever dedup/quality pass runs next.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import _WS

# Block-level elements: opening OR closing tag ends a text block (the
# jusText segmentation).  \b guards prefixes (<p> vs <pre>), so
# alternation order is cosmetic; longest-first anyway.  Inline tags
# (<a> <b> <span> ...) are stripped without a block break.
_BLOCK_TAGS = ("blockquote|figcaption|article|section|header|footer"
               "|figure|thead|tbody|tfoot|table|title|aside|main|form"
               "|html|head|body|pre|nav|div|h[1-6]|hr|br|ul|ol|li|dl"
               "|dt|dd|tr|td|th|p")
_BLOCK_RE = f"(?is)</?({_BLOCK_TAGS})\\b[^>]*>"
# \x1E (record separator) as the block sentinel: source newlines are
# plain whitespace in HTML, so splitting on them would invent blocks
_SENT = "\x1E"
_ANCHOR_RE = "(?is)<a\\b[^>]*>(.*?)</a[^>]*>"
# entity decode pairs, applied in order AFTER tag stripping; &amp;
# LAST so double-escaped text (&amp;lt;) decodes one level, and so a
# decoded '<' can never be re-read as markup
_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "),
             ("&amp;", "&"))


def strip_noise(html: Column) -> Column:
    """Remove the non-content byte ranges: ``<script>``/``<style>``
    elements (content and all), HTML comments, and any stray block
    sentinel.  Unterminated script/style swallows to end-of-document
    (browser behavior)."""
    # comments FIRST: a commented-out <script> must not trip the
    # unterminated-script rule below and swallow the document
    c = F.regexp_replace(html, "(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, "(?is)<script\\b[^>]*>.*?</script[^>]*>",
                         " ")
    c = F.regexp_replace(c, "(?is)<style\\b[^>]*>.*?</style[^>]*>", " ")
    c = F.regexp_replace(c, "(?is)<(script|style)\\b[^>]*>.*$", " ")
    return F.regexp_replace(c, _SENT, " ")


def _strip_inline(c: Column) -> Column:
    """Drop remaining (inline) tags without inserting whitespace —
    ``super<b>b</b>`` stays ``superb``; block boundaries were already
    sentinel-substituted."""
    return F.regexp_replace(c, "<[^>]*>", "")


def _clean_fragment(c: Column) -> Column:
    """Inline-tag strip + entity decode + whitespace collapse + trim —
    the per-block text normalization."""
    c = _strip_inline(c)
    for a, b in _ENTITIES:
        c = F.replace(c, F.lit(a), F.lit(b))
    return F.trim(F.regexp_replace(c, _WS + "+", " "))


def html_blocks(html: Column) -> Column:
    """Segment HTML into text blocks with boilerplate signals — an
    ``array<struct<text, text_len, raw_len, link_len>>`` of the
    non-empty blocks in document order:

    * ``text``     — cleaned block text (tags stripped, entities
      decoded, whitespace collapsed);
    * ``text_len`` — length of ``text``;
    * ``raw_len``  — length of the raw fragment INCLUDING inline
      markup (``text_len/raw_len`` is the jusText text-density:
      markup-heavy blocks score low);
    * ``link_len`` — cleaned length of text inside ``<a>`` elements
      (``link_len/text_len`` is the link-density boilerplate signal:
      navigation and footer blocks approach 1).
    """
    c = F.regexp_replace(strip_noise(html), _BLOCK_RE, _SENT)
    parts = F.split(c, _SENT)

    def per_block(b: Column) -> Column:
        text = _clean_fragment(b)
        link_len = F.aggregate(
            F.regexp_extract_all(b, F.lit(_ANCHOR_RE), 1),
            F.lit(0),
            lambda acc, a: acc + F.length(_clean_fragment(a)))
        return F.struct(text.alias("text"),
                        F.length(text).alias("text_len"),
                        F.length(b).alias("raw_len"),
                        link_len.alias("link_len"))

    return F.filter(F.transform(parts, per_block),
                    lambda s: s["text_len"] > 0)


def html_to_text(html: Column, main_only: bool = False,
                 max_link_density: float = 0.5,
                 min_text_len: int = 1) -> Column:
    """Extracted document text: block texts joined with ``\\n`` in
    document order.  ``main_only=True`` applies the boilerplate
    filter first — keep a block only if its link density
    (``link_len/text_len``) is at most ``max_link_density`` AND its
    cleaned length is at least ``min_text_len`` (the two-signal
    jusText core: navigation/footer chrome is link-dense and short,
    body prose is neither)."""
    blocks = html_blocks(html)
    if main_only:
        blocks = F.filter(
            blocks,
            lambda s: (s["text_len"] >= F.lit(int(min_text_len)))
            & (s["link_len"] <= F.lit(float(max_link_density))
               * s["text_len"]))
    return F.array_join(F.transform(blocks, lambda s: s["text"]), "\n")


def extract_text(df: DataFrame, html_col: str = "html",
                 out_col: str = "text", main_only: bool = False,
                 max_link_density: float = 0.5,
                 min_text_len: int = 1) -> DataFrame:
    """DataFrame form of `html_to_text`: adds ``out_col`` with the
    extracted (optionally boilerplate-filtered) text.  Pure
    projection — composes into the scan stage of the first pass over
    a crawl, ahead of dedup/quality operators."""
    return df.withColumn(out_col, html_to_text(
        F.col(html_col), main_only=main_only,
        max_link_density=max_link_density, min_text_len=min_text_len))


def extract_blocks(df: DataFrame, html_col: str = "html",
                   id_col: str = "doc_id") -> DataFrame:
    """Exploded per-block view with the boilerplate signals — one row
    per non-empty text block: (id, block_id, text, text_len, raw_len,
    link_len, link_density, text_density).  This is the inspection /
    training surface for boilerplate classifiers; `html_to_text` is
    the two-signal shortcut."""
    b = df.select(F.col(id_col),
                  F.posexplode(html_blocks(F.col(html_col)))
                  .alias("block_id", "b"))
    return b.select(
        id_col, "block_id", F.col("b.text").alias("text"),
        F.col("b.text_len").alias("text_len"),
        F.col("b.raw_len").alias("raw_len"),
        F.col("b.link_len").alias("link_len"),
        (F.col("b.link_len")
         / F.greatest(F.col("b.text_len"), F.lit(1)).cast("double"))
        .alias("link_density"),
        (F.col("b.text_len")
         / F.greatest(F.col("b.raw_len"), F.lit(1)).cast("double"))
        .alias("text_density"))


def html_escape(text: Column) -> Column:
    """The inverse grafting helper: escape ``& < >`` so arbitrary text
    embeds losslessly in generated HTML (``&`` first — the exact
    inverse of `_clean_fragment`'s decode order)."""
    c = F.replace(text, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    return F.replace(c, F.lit(">"), F.lit("&gt;"))
