"""WARC / WET container source & sink — the step AHEAD of the HTML
extractor in every published crawl pipeline: C4, CCNet and RefinedWeb
all start from Common Crawl WARC (raw fetches) or WET (pre-extracted
text) files, so a training-data engine whose front door is
`operators/html.extract_text` needs the container reader that feeds
it (beyond the reference's surface — the reference is a geospatial
engine; this module follows its SOURCE pattern: pure-Python format
codec + a distributed part list, sources/shapefile.py:280 and
sources/flatgeobuf.py precedents).

Distribution model (the part list):

* ``.warc.gz`` / ``.wet.gz`` — Common Crawl ships ONE GZIP MEMBER PER
  RECORD (the spec's recommendation, the reason random access into a
  100-TB crawl is possible at all).  The file splits into compressed
  byte ranges of ``chunk_bytes``; each task scans ITS OWN range for
  the first validated member boundary (gzip magic + the decompressed
  prefix must read ``WARC/`` — a deterministic test every task
  resolves identically) and inflates member-by-member until it
  crosses its range end, so a single huge file reads in parallel
  WITHOUT a prior index pass and each record is owned by exactly one
  task.  A file compressed as one solid member degrades gracefully to
  one task (documented CC practice makes this rare).
* plain ``.warc`` / ``.wet`` — ranges align on validated record
  heads: ``WARC/x.y`` version line + parseable header block with a
  ``Content-Length``, chained to the following record when the bytes
  are in view.  A payload that EMBEDS a full well-formed WARC record
  could in principle fool a range scan (warc-in-warc); pass
  ``chunk_bytes=None`` (one task per file, sequential
  Content-Length chaining — exact) or prefer the member-aligned
  ``.gz`` form if that matters.

Payloads stay raw ``binary`` — response records carry HTTP headers +
body, conversion (WET) records carry extracted text bytes;
`http_response_body` / `payload_text` are native column helpers for
the two, so ``read_warc -> canonicalize_url -> extract_text -> dedup``
composes as one scan-stage pipeline with zero Python in the hot path
after the container parse itself (Arrow-batched ``mapInPandas``, one
task per part — the same boundary every other pure-Python source in
this package pays, amortized over whole record batches).
"""

from __future__ import annotations

import glob
import os
import zlib

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, LongType, StringType,
                               StructField, StructType)

from . import fs as FS

_SCHEMA = StructType([
    StructField("warc_file", StringType()),
    StructField("record_offset", LongType()),
    StructField("rec_type", StringType()),
    StructField("url", StringType()),
    StructField("warc_date", StringType()),
    StructField("content_type", StringType()),
    StructField("content_length", LongType()),
    StructField("payload", BinaryType()),
])

_GZ_MAGIC = b"\x1f\x8b\x08"
_MAX_HEADER = 64 * 1024  # a WARC header block larger than this is junk


class _Window:
    """Growable forward view over a file from a fixed start offset —
    each part task reads its own byte range plus whatever tail its
    LAST record needs, never the whole file."""

    def __init__(self, f, start: int, grow: int = 8 << 20):
        f.seek(start)
        self.f = f
        self.buf = bytearray()
        self.eof = False
        self.grow = grow

    def ensure(self, n: int) -> None:
        while len(self.buf) < n and not self.eof:
            chunk = self.f.read(max(self.grow, n - len(self.buf)))
            if not chunk:
                self.eof = True
                break
            self.buf += chunk

    def ensure_all(self) -> None:
        while not self.eof:
            chunk = self.f.read(self.grow)
            if not chunk:
                self.eof = True
                break
            self.buf += chunk


def _parse_header(buf, pos: int):
    """Parse one WARC record header starting at ``pos`` (which must
    point at the ``WARC/`` version line).  Returns (headers dict
    lower-cased, payload_start, content_length) or None if the bytes
    are not a well-formed header block."""
    end = buf.find(b"\r\n\r\n", pos, pos + _MAX_HEADER)
    if end < 0:
        return None
    block = bytes(buf[pos:end])
    lines = block.split(b"\r\n")
    if not lines[0].startswith(b"WARC/"):
        return None
    ver = lines[0][5:]
    if not ver or not ver.replace(b".", b"").isdigit():
        return None
    headers = {}
    for ln in lines[1:]:
        i = ln.find(b":")
        if i <= 0:
            return None
        headers[ln[:i].strip().lower().decode("ascii", "replace")] = \
            ln[i + 1:].strip()
    cl = headers.get("content-length")
    if cl is None or not cl.isdigit():
        return None
    return headers, end + 4, int(cl)


def _record_row(headers, payload, file_name, offset, want_payload):
    def s(k):
        v = headers.get(k)
        return v.decode("utf-8", "replace") if v is not None else None

    return {
        "warc_file": file_name,
        "record_offset": offset,
        "rec_type": s("warc-type"),
        "url": s("warc-target-uri"),
        "warc_date": s("warc-date"),
        "content_type": s("content-type"),
        "content_length": len(payload),
        "payload": bytes(payload) if want_payload else None,
    }


def _valid_plain_start(buf, pos: int, chain: bool = True):
    """Is ``pos`` a believable record head?  Header must parse; when
    the following bytes are in view, the chain must continue with
    another record head or end cleanly (cuts payload false positives
    to warc-in-warc constructions, documented above)."""
    h = _parse_header(buf, pos)
    if h is None:
        return False
    _, pstart, clen = h
    if chain:
        nxt = pstart + clen + 4
        if len(buf) >= nxt + 5:
            if bytes(buf[pstart + clen:nxt]) != b"\r\n\r\n":
                return False
            if not bytes(buf[nxt:nxt + 5]) == b"WARC/":
                return False
    return True


def _iter_plain(win: _Window, start: int, end: int | None, file_name,
                want_payload: bool):
    """Yield record rows from an uncompressed window; the task owns
    records whose head offset lies in [start, end)."""
    pos = 0
    if start != 0:
        # align: first validated record head at or after our range
        # start (the head search needs header bytes in view)
        span = (end - start if end is not None else 0) + _MAX_HEADER
        win.ensure(span)
        while True:
            cand = win.buf.find(b"WARC/", pos)
            if cand < 0 or (end is not None and start + cand >= end):
                return
            win.ensure(cand + _MAX_HEADER)
            if _valid_plain_start(win.buf, cand):
                pos = cand
                break
            pos = cand + 5
    while end is None or start + pos < end:
        win.ensure(pos + _MAX_HEADER)
        if pos >= len(win.buf):
            return
        # tolerate record separators / trailing junk before the head
        head = win.buf.find(b"WARC/", pos)
        if head < 0:
            return
        win.ensure(head + _MAX_HEADER)
        h = _parse_header(win.buf, head)
        if h is None:
            return
        if end is not None and start + head >= end:
            return
        headers, pstart, clen = h
        win.ensure(pstart + clen + 4)
        payload = win.buf[pstart:pstart + clen]
        if len(payload) < clen:
            return  # truncated tail
        yield _record_row(headers, payload, file_name, start + head,
                          want_payload)
        pos = pstart + clen
