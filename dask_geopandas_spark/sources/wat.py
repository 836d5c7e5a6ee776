"""WAT metadata source — the third Common Crawl container format
(alongside `.warc` raw fetches and `.wet` extracted text, both in
`sources/warc.py`, and the CDX index): a WAT file is a WARC whose
``metadata`` records carry a JSON envelope describing each capture —
HTTP headers, HTML head metadata, and most importantly the page's
OUTLINKS, which is what the crawl's link graph (and so
`operators/graph.pagerank` host ranks) is built from without ever
touching page bytes.

`read_wat` = `read_warc(records='metadata')` + ONE native
``from_json`` with a PRUNED schema (title + links only — Spark prunes
the JSON parse to requested fields; the raw envelope is available
with ``keep_json=True``), so the whole links pass over a crawl is the
container parse plus codegen.  `wat_link_edges` explodes the parsed
links into a (src, dst) host-level edge frame ready for
`operators/graph.pagerank` / `degrees`.

Public format reference: the Common Crawl "Web Archive
Transformation" envelope (``Envelope.Payload-Metadata.
HTTP-Response-Metadata.HTML-Metadata.{Head.Title, Links[].url}``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .warc import read_warc

# pruned WAT envelope: exactly the fields the pipeline consumes —
# from_json ignores everything else in the document
_WAT_SCHEMA = (
    "`Envelope` struct<"
    "`Payload-Metadata` struct<"
    "`HTTP-Response-Metadata` struct<"
    "`HTML-Metadata` struct<"
    "`Head` struct<`Title` string>, "
    "`Links` array<struct<`url` string, `text` string>>"
    ">>>>"
)


def read_wat(spark: SparkSession, path: str,
             keep_json: bool = False, **read_warc_kwargs) -> DataFrame:
    """Read WAT file(s) into (warc_file, record_offset, url, title,
    links) — ``links`` is the page's outlink url array, ``url`` the
    captured page (WARC-Target-URI).  ``keep_json`` adds the raw
    envelope string for custom extraction.  Remaining kwargs pass to
    `read_warc` (chunk_bytes, url_prefix, filesystem, ...) — range
    ownership and in-task pushdowns apply unchanged."""
    recs = read_warc(spark, path, records="metadata",
                     **read_warc_kwargs)
    js = F.decode(F.col("payload"), "UTF-8")
    env = F.from_json(js, _WAT_SCHEMA)
    html_meta = env["Envelope"]["Payload-Metadata"][
        "HTTP-Response-Metadata"]["HTML-Metadata"]
    cols = [
        "warc_file", "record_offset", "url",
        html_meta["Head"]["Title"].alias("title"),
        F.transform(html_meta["Links"], lambda l: l["url"])
        .alias("links"),
    ]
    if keep_json:
        cols.append(js.alias("wat_json"))
    return recs.select(*cols)


def url_host(url: Column) -> Column:
    """Lowercased host of an absolute URL (userinfo stripped, port
    kept), native; NULL for non-URLs — the node key for host-level
    link graphs."""
    h = F.lower(F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]+)",
        1))
    return F.when(h != "", h)


def wat_link_edges(wat: DataFrame, level: str = "host") -> DataFrame:
    """Explode `read_wat` output into a link-graph edge frame:
    (src, dst) at ``level`` = 'host' (the CC host-graph shape —
    self-loops dropped, NULL hosts dropped) or 'url' (raw page ->
    target url edges, fragment-stripped).  Feed the result to
    `operators/graph.pagerank` / `degrees`; dedup happens there."""
    if level not in ("host", "url"):
        raise ValueError(f"level must be 'host' or 'url', got {level!r}")
    exploded = wat.select(F.col("url").alias("_src_url"),
                          F.explode("links").alias("_dst_url"))
    if level == "url":
        strip = lambda c: F.regexp_replace(c, "#.*$", "")  # noqa: E731
        return exploded.select(
            strip(F.col("_src_url")).alias("src"),
            strip(F.col("_dst_url")).alias("dst"))
    src = url_host(F.col("_src_url"))
    dst = url_host(F.col("_dst_url"))
    return (exploded.select(src.alias("src"), dst.alias("dst"))
            .where(F.col("src").isNotNull() & F.col("dst").isNotNull()
                   & (F.col("src") != F.col("dst"))))
