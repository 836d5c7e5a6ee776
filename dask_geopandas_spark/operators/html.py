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
  &#39; &apos; &nbsp; &amp;``) decodes, and so do NUMERIC character
  references — ``&#8217;`` / ``&#x2019;`` style, ubiquitous in real
  crawl HTML — via a native codepoint→UTF-8 rebuild (other NAMED
  entities, the long ``&eacute;``-style tail, pass through as text;
  a reference without its closing ``;`` passes through);
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
# \b after the closing 'a' too: '</a[^>]*>' would also match the
# closing tag of any element whose NAME starts with 'a' (</abbr>,
# </address>) and truncate anchor text early, undercounting link_len
_ANCHOR_RE = "(?is)<a\\b[^>]*>(.*?)</a\\b[^>]*>"
# entity decode pairs, applied in order AFTER tag stripping; &amp;
# LAST so double-escaped text (&amp;lt;) decodes one level, and so a
# decoded '<' can never be re-read as markup.  Numeric character
# references (&#NNN; / &#xHH;) decode BETWEEN the named set and
# &amp; — after the named set so '&lt;' produced by '&#38;lt;' stays
# literal text, before '&amp;' so '&amp;#8217;' yields the literal
# bytes '&#8217;' (one decode level each, the sequential-replace
# analogue of a single spec-conforming pass)
_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "))
_NUM_REF = "&#([0-9]{1,7}|[Xx][0-9A-Fa-f]{1,6});"


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


def _codepoint_char(body: Column) -> Column:
    """One numeric character reference body ('8217' or 'x2019') ->
    the character, built NATIVELY: parse the codepoint (``conv`` for
    hex), emit its UTF-8 byte sequence as a hex string (the standard
    1-4 byte arithmetic — shifts and remainders, all codegen), then
    ``decode(unhex(...), 'UTF-8')``.  Spark's own ``chr()`` is
    mod-256 Latin-1, useless for the typographic range (&#8217; et
    al.) real crawl HTML is full of.  Out-of-range codepoints (0,
    surrogates, > U+10FFFF) fall back to the raw reference text —
    the pass-through the named-entity chain already applies to
    anything it doesn't know."""
    cp = F.when(body.rlike("^[Xx]"),
                F.conv(F.substring(body, 2, 7), 16, 10).cast("long")) \
        .otherwise(body.cast("long"))

    def bh(b: Column) -> Column:  # one byte -> two hex digits
        return F.lpad(F.hex(b), 2, "0")

    def tail(shift: int) -> Column:  # 10xxxxxx continuation byte
        return bh(F.lit(128) + F.shiftright(cp, shift) % F.lit(64))

    hexs = (F.when(cp < 0x80, bh(cp))
            .when(cp < 0x800, F.concat(
                bh(F.lit(192) + F.shiftright(cp, 6)), tail(0)))
            .when(cp < 0x10000, F.concat(
                bh(F.lit(224) + F.shiftright(cp, 12)), tail(6), tail(0)))
            .otherwise(F.concat(
                bh(F.lit(240) + F.shiftright(cp, 18)), tail(12),
                tail(6), tail(0))))
    valid = (cp.isNotNull() & (cp > 0) & (cp <= 0x10FFFF)
             & ~((cp >= 0xD800) & (cp <= 0xDFFF)))
    return F.when(valid, F.decode(F.unhex(hexs), "UTF-8")) \
        .otherwise(F.concat(F.lit("&#"), body, F.lit(";")))


def _decode_numeric_refs(c: Column) -> Column:
    """Decode every ``&#NNN;`` / ``&#xHH;`` in a string natively:
    split on the reference pattern (the literal segments), extract
    the reference bodies in order, and interleave segment + decoded
    char back together with ``zip_with`` — no UDF, no per-row
    Python."""
    segs = F.split(c, _NUM_REF)
    refs = F.regexp_extract_all(c, F.lit(_NUM_REF), 1)
    return F.concat(
        F.element_at(segs, 1),
        F.array_join(
            F.zip_with(F.transform(refs, _codepoint_char),
                       F.slice(segs, 2, F.size(refs)),
                       lambda d, s: F.concat(d, s)), ""))


def _clean_fragment(c: Column) -> Column:
    """Inline-tag strip + entity decode (named, then numeric refs,
    then ``&amp;``) + whitespace collapse + trim — the per-block text
    normalization.

    The numeric-ref decode runs behind a ``contains('&#')`` guard on
    the RAW fragment: ref-free blocks — the overwhelming majority in
    real crawl HTML — take a branch with no decode chain at all (the
    r9-shape chain).  Testing the raw bytes is sound because no
    ``_ENTITIES`` replacement output ends in ``&``, so the replaces
    can never CREATE a ``&#`` that was not in the raw fragment; a
    false positive (``&#`` inside a tag attribute, or not followed by
    a valid reference) just takes the decode branch, where the chain
    is the identity on ref-less text.  Hoisting the guard OUTSIDE the
    whole chain matters: a mid-chain ``when(contains(...))`` re-runs
    the replace chain for the condition AND the taken branch (HOF
    expressions are interpreted, no common-subexpression reuse) —
    measured barely better than unconditional decode; the hoisted
    form is output-invariant (pytest-pinned guard-on == guard-off).
    Known accepted edge: ``&#38;amp;`` numeric-decodes to the literal
    text ``&amp;`` and the final ``&amp;`` replace then yields ``&``
    — one decode level deeper than a spec-conforming single pass.
    Only ``&#38;`` / ``&#x26;`` immediately followed by ``amp;`` is
    affected (``&#38;lt;`` et al. are safe: named entities run
    first)."""
    def chain(x: Column, decode: bool) -> Column:
        x = _strip_inline(x)
        for a, b in _ENTITIES:
            x = F.replace(x, F.lit(a), F.lit(b))
        if decode:
            x = _decode_numeric_refs(x)
        x = F.replace(x, F.lit("&amp;"), F.lit("&"))
        return F.trim(F.regexp_replace(x, _WS + "+", " "))

    return F.when(c.contains("&#"), chain(c, True)) \
        .otherwise(chain(c, False))


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
