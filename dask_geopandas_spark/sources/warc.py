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
    StructField("record_length", LongType()),
    StructField("rec_type", StringType()),
    StructField("url", StringType()),
    StructField("warc_date", StringType()),
    StructField("content_type", StringType()),
    StructField("content_length", LongType()),
    StructField("payload", BinaryType()),
    StructField("record_id", StringType()),
    StructField("concurrent_to", StringType()),
])

_GZ_MAGIC = b"\x1f\x8b\x08"
_MAX_HEADER = 64 * 1024  # a WARC header block larger than this is junk


class _Window:
    """Growable forward view over a file from a fixed start offset —
    each part task reads its own byte range plus whatever tail its
    LAST record needs, never the whole file.  Iterators TRIM consumed
    bytes as they go (``del buf[:n]`` after each record/member), so
    peak buffer memory is one record/member plus the read-ahead
    granularity — a ``chunk_bytes=None`` pass over a 1 GB file never
    holds the gigabyte."""

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


def _record_row(headers, payload, file_name, offset, want_payload,
                rec_len):
    def s(k):
        v = headers.get(k)
        return v.decode("utf-8", "replace") if v is not None else None

    return {
        "warc_file": file_name,
        "record_offset": offset,
        "record_length": rec_len,
        "rec_type": s("warc-type"),
        "url": s("warc-target-uri"),
        "warc_date": s("warc-date"),
        "content_type": s("content-type"),
        "content_length": len(payload),
        "payload": bytes(payload) if want_payload else None,
        "record_id": s("warc-record-id"),
        "concurrent_to": s("warc-concurrent-to"),
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
    shift = 0  # bytes trimmed off the window front (memory bound)
    while end is None or start + shift + pos < end:
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
        if end is not None and start + shift + head >= end:
            return
        headers, pstart, clen = h
        win.ensure(pstart + clen + 4)
        payload = win.buf[pstart:pstart + clen]
        if len(payload) < clen:
            return  # truncated tail
        yield _record_row(headers, payload, file_name,
                          start + shift + head, want_payload,
                          pstart + clen + 4 - head)
        cut = pstart + clen
        del win.buf[:cut]
        shift += cut
        pos = 0


def _find_forward(win: _Window, needle: bytes, pos: int) -> int:
    """Find ``needle`` at or after window-relative ``pos``, growing
    the window as needed; -1 once EOF exhausts the search."""
    while True:
        cand = win.buf.find(needle, pos)
        if cand >= 0:
            return cand
        if win.eof:
            return -1
        pos = max(pos, len(win.buf) - len(needle) + 1)
        win.ensure(len(win.buf) + win.grow)


def _probe_gz_member(win: _Window, pos: int) -> bool:
    """Is window-relative ``pos`` a believable gzip MEMBER boundary of
    a WARC file?  The deterministic test every range task resolves
    identically (module docstring): bytes must inflate and the first
    five decompressed bytes must read ``WARC/``.  A 3-byte magic
    landing inside another member's deflate stream fails this in the
    first few bytes; a valid member passes immediately."""
    d = zlib.decompressobj(31)
    out = b""
    p = pos
    for _ in range(4):  # 256 KiB of input is far past any real header
        win.ensure(p + (1 << 16))
        chunk = bytes(win.buf[p:p + (1 << 16)])
        if not chunk:
            return False
        try:
            out += d.decompress(chunk)
        except zlib.error:
            return False
        if len(out) >= 5:
            return out[:5] == b"WARC/"
        if d.eof:
            return False  # member ended with <5 bytes — not a record
        p += len(chunk)
    return False


def _inflate_gz_member(win: _Window, pos: int):
    """Inflate ONE gzip member starting at window-relative ``pos``.
    Returns (decompressed bytes, compressed length) — the length is
    how far the next member boundary sits — or None on a truncated
    or corrupt member (file tail)."""
    d = zlib.decompressobj(31)
    out = bytearray()
    p = pos
    while True:
        win.ensure(p + (4 << 20))
        chunk = bytes(win.buf[p:p + (4 << 20)])
        if not chunk:
            return None
        try:
            out += d.decompress(chunk)
        except zlib.error:
            return None
        p += len(chunk)
        if d.eof:
            return bytes(out), (p - pos) - len(d.unused_data)


def _iter_records_in(data: bytes, file_name: str, offset: int,
                     want_payload: bool, rec_len: int):
    """Yield record rows from fully-inflated member bytes.  CC ships
    one record per member; a multi-record member (or a whole solid
    file inflated as one member) parses through sequentially —
    ``record_offset`` is the containing member's COMPRESSED offset,
    the unit of random access in the .gz form."""
    pos = 0
    n = len(data)
    while pos < n:
        head = data.find(b"WARC/", pos)
        if head < 0:
            return
        h = _parse_header(data, head)
        if h is None:
            pos = head + 5
            continue
        headers, pstart, clen = h
        payload = data[pstart:pstart + clen]
        if len(payload) < clen:
            return  # truncated tail
        yield _record_row(headers, payload, file_name, offset,
                          want_payload, rec_len)
        pos = pstart + clen


def _iter_gz(win: _Window, start: int, end: int | None, file_name: str,
             want_payload: bool):
    """Yield record rows from a member-per-record gzip window; the
    task owns members whose COMPRESSED start offset lies in
    [start, end) — the same range-ownership contract as
    `_iter_plain`, resolved by the deterministic member probe."""
    # align: first validated member boundary at or after our start
    pos = 0
    while True:
        cand = _find_forward(win, _GZ_MAGIC, pos)
        if cand < 0 or (end is not None and start + cand >= end):
            return
        if _probe_gz_member(win, cand):
            pos = cand
            break
        pos = cand + 1
    shift = 0  # bytes trimmed off the window front (memory bound)
    while end is None or start + shift + pos < end:
        m = _inflate_gz_member(win, pos)
        if m is None:
            return  # truncated member at the file tail
        data, consumed = m
        if data[:5] == b"WARC/":
            yield from _iter_records_in(data, file_name,
                                        start + shift + pos,
                                        want_payload, consumed)
        cut = pos + consumed
        del win.buf[:cut]
        shift += cut
        pos = 0
        # members are back-to-back in a well-formed file; tolerate
        # stray bytes between them by re-aligning on the magic
        win.ensure(pos + 3)
        if bytes(win.buf[pos:pos + 3]) != _GZ_MAGIC:
            cand = _find_forward(win, _GZ_MAGIC, pos)
            if cand < 0:
                return
            pos = cand


def _list_warc(path: str, filesystem=None) -> list:
    """(uri, size) pairs — sizes come from the SAME listing call, one
    LIST for a whole directory (a CC segment is ~80k files; a listing
    followed by one stat per file would cost minutes of serial
    driver-side round-trips before the first task launches)."""
    suf = (".warc", ".wet", ".wat",
           ".warc.gz", ".wet.gz", ".wat.gz")
    if filesystem is not None or FS.has_scheme(path) \
            or os.path.isdir(path):
        return FS.list_files_with_sizes(path, suffixes=suf,
                                        filesystem=filesystem)
    if any(c in path for c in "*?["):
        return [(f, os.path.getsize(f)) for f in sorted(glob.glob(path))]
    return [(path, os.path.getsize(path))]


def _row_filter(records, url_prefix, max_payload_bytes):
    """In-task record filter shared by the batch and streaming
    readers: WARC-Type set, URL prefix(es), payload-size cap (NULLs
    the payload, keeps the row) — all applied BEFORE the Arrow
    transfer.  Returns row -> row | None."""
    if records is None:
        rec_filter = None
    elif isinstance(records, str):
        rec_filter = {records}
    else:
        rec_filter = set(records)
    prefixes = None if url_prefix is None else (
        (url_prefix,) if isinstance(url_prefix, str)
        else tuple(url_prefix))
    cap = None if max_payload_bytes is None else int(max_payload_bytes)

    def keep(r):
        if rec_filter is not None and r["rec_type"] not in rec_filter:
            return None
        if prefixes is not None and (
                r["url"] is None
                or not r["url"].startswith(prefixes)):
            return None
        if cap is not None and r["content_length"] > cap:
            r["payload"] = None
        return r

    return keep


def read_warc(spark: SparkSession, path: str,
              chunk_bytes: int | None = 64 << 20, payload: bool = True,
              records=None, url_prefix=None,
              max_payload_bytes: int | None = None,
              filesystem=None) -> DataFrame:
    """Read WARC / WET container file(s) into a DataFrame of records.

    ``path``: one file, a directory, or a glob of
    ``.warc/.wet(.gz)`` files.  ``chunk_bytes`` sets the byte range
    each task owns (the part list, module docstring) — pass ``None``
    for one task per file (sequential Content-Length chaining, the
    exact fallback for pathological plain-WARC payloads).
    ``records`` filters by WARC-Type before the rows leave the task
    (``'response'``, ``'conversion'``, or an iterable of types);
    ``payload=False`` drops the payload bytes (record survey scans —
    headers only cross the Arrow boundary).

    Two more in-task pushdowns, applied BEFORE the Arrow transfer (at
    100 TB the bytes you don't move dominate the bytes you parse):
    ``url_prefix`` keeps only records whose WARC-Target-URI starts
    with the given prefix (or any of an iterable of prefixes — the
    domain-targeted extraction shape); ``max_payload_bytes`` NULLs
    the payload of any record past the cap while keeping the row and
    its true ``content_length`` (a single pathological multi-GB
    fetch can no longer blow an executor; filter or refetch the
    survivors by offset via `read_warc_records`).

    Schema: (warc_file, record_offset, rec_type, url, warc_date,
    content_type, content_length, payload) — ``record_offset`` is the
    record head's byte offset (plain) or the containing gzip member's
    compressed offset (.gz), the unit of random access CC's
    one-member-per-record layout exists to provide.

    Compose with `http_response_body` (response records) or
    `payload_text` (WET conversion records) + `operators/html
    .extract_text` — the container parse is the only Python in the
    pipeline; everything downstream is native codegen."""
    files = _list_warc(path, filesystem)
    if not files:
        raise FileNotFoundError(path)
    keep = _row_filter(records, url_prefix, max_payload_bytes)

    parts = []
    for fp, size in files:
        if size == 0:
            continue
        gz = fp.lower().endswith(".gz")
        cb = size if chunk_bytes is None else max(int(chunk_bytes), 1)
        for s in range(0, size, cb):
            parts.append((fp, s, min(s + cb, size), gz))
    if not parts:
        return spark.createDataFrame([], _SCHEMA)
    # range-partition the part list on (path, start): each task owns a
    # CONTIGUOUS run of ranges — per-file sequential forward reads
    # instead of random seeks across the crawl — and the partition
    # count scales with the cluster (a 100-TB crawl at 64 MB chunks is
    # ~1.6M parts; a fixed cap would starve a large cluster)
    npart = min(len(parts),
                max(spark.sparkContext.defaultParallelism * 4, 64))
    part_df = spark.createDataFrame(
        parts, "path string, start long, end long, gz boolean")
    if len(parts) <= npart:
        # one part per task: locality is moot, skip the range-sampling
        # pass (a measurable fixed cost on toy inputs)
        part_df = part_df.repartition(npart)
    else:
        part_df = (part_df.repartitionByRange(npart, "path", "start")
                   .sortWithinPartitions("path", "start"))
    fnames = [fld.name for fld in _SCHEMA.fields]
    want_payload = bool(payload)

    def read_part(batches):
        for pdf in batches:
            for pth, s, e, gz in zip(pdf["path"], pdf["start"],
                                     pdf["end"], pdf["gz"]):
                s, e = int(s), int(e)
                rows = []
                with FS.open_input(pth, filesystem) as f:
                    win = _Window(f, s)
                    it = (_iter_gz if gz else _iter_plain)(
                        win, s, e, pth, want_payload)
                    for r in it:
                        if keep(r) is None:
                            continue
                        rows.append(r)
                        if len(rows) >= 2048:
                            yield pd.DataFrame(rows, columns=fnames)
                            rows = []
                if rows:
                    yield pd.DataFrame(rows, columns=fnames)

    return part_df.mapInPandas(read_part, schema=_SCHEMA)


def http_status(payload: Column) -> Column:
    """HTTP status code of a ``response`` record's payload, native:
    the integer after the first token of the status line (``HTTP/1.1
    200 OK``).  NULL for payloads that do not start with an HTTP
    status line — so ``http_status(payload) == 200`` is the standard
    keep-only-successful-fetches filter, applied before any byte of
    body text is touched."""
    s = F.decode(F.substring(payload, 1, 64), "ISO-8859-1")
    code = F.regexp_extract(s, r"^HTTP/[0-9.]+ ([0-9]{3})", 1)
    return F.when(code != "", code.cast("int"))


def read_warc_records(locations: DataFrame, payload: bool = True,
                      filesystem=None) -> DataFrame:
    """Random-access fetch of SPECIFIC records — the selective-refetch
    shape a CDX-style index enables at 100 TB: build the index once
    with ``read_warc(path, payload=False)`` (headers + offsets only),
    store it as parquet keyed however the lookups come (url host,
    digest, ...), join the wanted keys against it, and feed the
    resulting (warc_file, record_offset) frame here — only the
    matched members are ever decompressed, not the crawl.

    ``locations`` needs (warc_file, record_offset) columns —
    `read_warc`'s own output qualifies.  Offsets are the values
    `read_warc` reported: a gzip member's compressed start (.gz — the
    member's records are returned) or a record head (plain).  Rows
    whose offset does not validate as a record/member are DROPPED
    (fetch what the index promised; validate the index, not the
    fetch).  Partitioning is the caller's (an index join's output is
    already spread); rows are sorted per partition so same-file
    fetches share one open handle and read roughly forward."""
    want_payload = bool(payload)
    locs = locations.select("warc_file", "record_offset") \
        .sortWithinPartitions("warc_file", "record_offset")
    fnames = [fld.name for fld in _SCHEMA.fields]

    def fetch(batches):
        rows = []
        cur, fh = None, None
        try:
            for pdf in batches:
                for fp, off in zip(pdf["warc_file"],
                                   pdf["record_offset"]):
                    off = int(off)
                    if fp != cur:
                        if fh is not None:
                            fh.close()
                        fh = FS.open_input(fp, filesystem)
                        cur = fp
                    win = _Window(fh, off)
                    if fp.lower().endswith(".gz"):
                        m = _inflate_gz_member(win, 0)
                        if m is None:
                            continue
                        rows.extend(_iter_records_in(
                            m[0], fp, off, want_payload, m[1]))
                    else:
                        win.ensure(_MAX_HEADER)
                        h = _parse_header(win.buf, 0)
                        if h is None:
                            continue
                        headers, pstart, clen = h
                        win.ensure(pstart + clen)
                        pay = win.buf[pstart:pstart + clen]
                        if len(pay) < clen:
                            continue
                        rows.append(_record_row(
                            headers, pay, fp, off, want_payload,
                            pstart + clen + 4))
                    # flush like read_warc's read_part: a big batch
                    # of big payloads must not accumulate unbounded
                    if len(rows) >= 2048:
                        yield pd.DataFrame(rows, columns=fnames)
                        rows = []
        finally:
            if fh is not None:
                fh.close()
        if rows:
            yield pd.DataFrame(rows, columns=fnames)

    return locs.mapInPandas(fetch, schema=_SCHEMA)


def to_warc(df: DataFrame, path: str, payload_col: str = "payload",
            url_col: str = "url", rec_type: str = "conversion",
            content_type: str | None = None,
            warc_date: str = "2026-01-01T00:00:00Z",
            gzip_members: bool = True, filesystem=None,
            flush_bytes: int = 4 << 20,
            concurrent_to_col: str | None = None) -> None:
    """Write a DataFrame as WARC file(s): one ``part-*.warc(.gz)``
    per Spark partition under ``path``, gzip form ONE MEMBER PER
    RECORD (the CC layout `read_warc`'s part list banks on).

    ``payload_col`` (binary or string — strings encode UTF-8) is the
    record payload; ``url_col`` (optional column) becomes
    WARC-Target-URI.  ``rec_type`` / ``content_type`` / ``warc_date``
    are COLUMN NAMES when present in ``df``, literal values for every
    record otherwise.  Records carry a deterministic
    ``WARC-Record-ID`` (payload md5), so the write is byte-stable —
    a retried task overwrites its own part with identical bytes."""
    import hashlib

    cols = set(df.columns)
    if payload_col not in cols:
        raise ValueError(f"payload column {payload_col!r} not in {sorted(cols)}")
    FS.makedirs(path, filesystem)
    suffix = ".warc.gz" if gzip_members else ".warc"
    use_cols = [payload_col] + [c for c in (url_col, rec_type,
                                            content_type, warc_date,
                                            concurrent_to_col)
                                if c is not None and c in cols]
    src = df.select(*dict.fromkeys(use_cols))

    def field(pdf, name, i):
        if name is not None and name in pdf.columns:
            v = pdf[name].iloc[i]
            return None if v is None or v != v else str(v)
        return name

    def write_part(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        out = None
        buf, buflen = [], 0
        n = 0
        for pdf in batches:
            for i in range(len(pdf)):
                pay = pdf[payload_col].iloc[i]
                if pay is None:
                    continue
                if isinstance(pay, str):
                    pay = pay.encode("utf-8")
                else:
                    pay = bytes(pay)
                hdr = [b"WARC/1.0",
                       b"WARC-Type: "
                       + (field(pdf, rec_type, i) or "resource").encode()]
                url = field(pdf, url_col if url_col in pdf.columns
                            else None, i)
                if url is not None:
                    hdr.append(b"WARC-Target-URI: " + url.encode())
                hdr.append(b"WARC-Date: "
                           + (field(pdf, warc_date, i) or "").encode())
                hdr.append(b"WARC-Record-ID: <urn:md5:"
                           + hashlib.md5(pay).hexdigest().encode() + b">")
                if concurrent_to_col is not None \
                        and concurrent_to_col in pdf.columns:
                    ct = field(pdf, concurrent_to_col, i)
                    if ct is not None:
                        hdr.append(b"WARC-Concurrent-To: " + ct.encode())
                ctype = field(pdf, content_type, i)
                if ctype is not None:
                    hdr.append(b"Content-Type: " + ctype.encode())
                hdr.append(b"Content-Length: "
                           + str(len(pay)).encode())
                rec = b"\r\n".join(hdr) + b"\r\n\r\n" + pay + b"\r\n\r\n"
                if gzip_members:
                    c = zlib.compressobj(6, zlib.DEFLATED, 31)
                    rec = c.compress(rec) + c.flush()
                if out is None:
                    fpath = FS.join(path, f"part-{pid:05d}{suffix}")
                    # compression=None: pyarrow's open_output_stream
                    # would otherwise auto-gzip the WHOLE file by its
                    # .gz extension — on top of the per-record
                    # members, breaking the member-per-record
                    # random-access layout
                    fsys, p = FS.resolve_fs(fpath, filesystem)
                    out = fsys.open_output_stream(p, compression=None)
                buf.append(rec)
                buflen += len(rec)
                if buflen >= flush_bytes:
                    out.write(b"".join(buf))
                    buf, buflen = [], 0
                n += 1
        if out is not None:
            if buf:
                out.write(b"".join(buf))
            out.close()
        yield pd.DataFrame({"files": [1 if n else 0]})

    src.mapInPandas(write_part, schema="files long").collect()


def http_response_body(payload: Column) -> Column:
    """HTTP headers + body -> body BYTES, native (zero-UDF): a WARC
    ``response`` record's payload is the full HTTP message; the body
    starts after the first CRLFCRLF.  Bytes round-trip losslessly
    through ISO-8859-1 (a 1:1 byte<->char map), so the split is one
    decode / instr / substring / encode chain inside whole-stage
    codegen.  A payload with no header separator (non-HTTP resource
    records) passes through whole."""
    s = F.decode(payload, "ISO-8859-1")
    i = F.instr(s, "\r\n\r\n")
    body = F.when(i > 0, F.substring(s, i + F.lit(4), F.length(s))) \
        .otherwise(s)
    return F.encode(body, "ISO-8859-1")


def payload_text(payload: Column, charset: str = "UTF-8") -> Column:
    """Conversion (WET) record payload -> text: one native decode.
    WET payloads are the crawl's pre-extracted UTF-8 text — this plus
    `read_warc(records='conversion')` is the C4-replication front
    door, feeding `clean_text` / dedup with zero Python past the
    container parse."""
    return F.decode(payload, charset)


def concurrent_join(records: DataFrame, primary: str = "response",
                    secondary: str = "metadata", how: str = "left",
                    prefix: str = "meta_") -> DataFrame:
    """Pair each PRIMARY record with the SECONDARY records that point
    at it via ``WARC-Concurrent-To`` — the Common Crawl container
    shape where a response's language / detected charset / fetch
    timings live in a paired ``metadata`` record (and the original
    HTTP request in a paired ``request`` record) of the same capture.
    One `read_warc` pass feeds both sides: filter twice, equi-join
    ``secondary.concurrent_to == primary.record_id``.

    Returns the primary rows plus the secondary's payload /
    content_type / content_length under ``prefix`` (default
    ``meta_``); ``how='left'`` keeps responses with no paired record
    (NULL meta columns), ``'inner'`` drops them.  A primary with
    SEVERAL paired secondaries yields one row per pair.

    Distributed shape: both sides are projections of the SAME scan —
    the join is a hash equi-join on the record id (unique,
    skew-free); the secondary side carries only its payload columns.
    At crawl scale the paired records sit adjacent in the same gzip
    members, so co-partitioning by file would make this shuffle-free
    — kept as a plain equi-join until a stored-layout variant is
    needed (cf. sources/bucketed.py for the pattern)."""
    prim = records.filter(F.col("rec_type") == primary)
    sec = (records.filter((F.col("rec_type") == secondary)
                          & F.col("concurrent_to").isNotNull())
           .select(F.col("concurrent_to").alias("_ct"),
                   F.col("payload").alias(f"{prefix}payload"),
                   F.col("content_type").alias(f"{prefix}content_type"),
                   F.col("content_length")
                   .alias(f"{prefix}content_length")))
    return (prim.join(sec, prim["record_id"] == sec["_ct"], how)
            .drop("_ct"))


def streaming_read_warc(spark: SparkSession, path: str,
                        payload: bool = True, records=None,
                        url_prefix=None,
                        max_payload_bytes: int | None = None,
                        max_files_per_trigger: int | None = None) -> DataFrame:
    """STREAMING WARC source — the continuous form of `read_warc`:
    watch a directory (or glob) for newly landed ``.warc/.wet(.gz)``
    files via Spark's ``binaryFile`` stream source and parse each
    file's records inside the stream, so the crash-safe ingestion
    family (`streaming_ingest_dedup` / `streaming_ingest_neardup` /
    `streaming_index_documents`) can start from the crawl's REAL
    input format instead of pre-parsed rows.  Same schema and
    ``records=`` / ``payload=`` / ``url_prefix=`` /
    ``max_payload_bytes=`` contract as `read_warc` (all in-task,
    ahead of the Arrow transfer).

    Distribution model: the binaryFile source delivers WHOLE files
    (one row per file), so each file parses within one task and
    parallelism comes from many files per trigger — the natural CC
    shape (a segment is ~80k ~1 GB files).  Size executor memory for
    one file's bytes + its largest record; for single huge files use
    batch `read_warc`, whose chunked part list splits within a file.
    Exactly-once bookkeeping (which FILES are new) is the stream
    checkpoint's; record-level idempotence stays with the downstream
    ingesters' commit markers."""
    keep = _row_filter(records, url_prefix, max_payload_bytes)
    want_payload = bool(payload)
    fnames = [fld.name for fld in _SCHEMA.fields]

    reader = (spark.readStream.format("binaryFile")
              .option("pathGlobFilter",
                      "*.{warc,wet,warc.gz,wet.gz}")
              .schema("path string, modificationTime timestamp, "
                      "length long, content binary"))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               str(int(max_files_per_trigger)))
    src = reader.load(path).select("path", "content")

    def parse(batches):
        import io

        for pdf in batches:
            for pth, content in zip(pdf["path"], pdf["content"]):
                content = bytes(content)
                win = _Window(io.BytesIO(content), 0)
                it = (_iter_gz if pth.lower().endswith(".gz")
                      else _iter_plain)(win, 0, len(content), pth,
                                        want_payload)
                rows = []
                for r in it:
                    if keep(r) is None:
                        continue
                    rows.append(r)
                    if len(rows) >= 2048:
                        yield pd.DataFrame(rows, columns=fnames)
                        rows = []
                if rows:
                    yield pd.DataFrame(rows, columns=fnames)

    return src.mapInPandas(parse, schema=_SCHEMA)


def surt_key(url: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key of a URL,
    native — the sort/prefix key every CDX index uses so one DOMAIN's
    records are contiguous: host lowercased and reversed on dots
    (``com,example``), default ports and a leading ``www.`` dropped,
    then ``)`` + the path/query lowercased.  Non-default ports are
    KEPT (``com,example:8080)`` — the real CC urlkey form): :80 drops
    for http, :443 for https.  Subset of the published SURT spec (no
    scheme-relative or userinfo forms — the shapes CC index lines
    actually carry); non-URL inputs yield NULL."""
    scheme = F.lower(F.regexp_extract(
        url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]+)", 1))
    host = F.regexp_extract(hostport, r"^([^:]+)", 1)
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    default = ((scheme == "http") & (port == "80")) | \
        ((scheme == "https") & (port == "443"))
    host = F.regexp_replace(host, r"^www\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    rev = F.when((port != "") & ~default,
                 F.concat(rev, F.lit(":"), port)).otherwise(rev)
    tail = F.lower(F.regexp_extract(url,
                                    r"^[A-Za-z][A-Za-z0-9+.-]*://"
                                    r"[^/?#]*([/?#].*)?$", 1))
    tail = F.when(tail == "", F.lit("/")).otherwise(tail)
    return F.when(host != "", F.concat(rev, F.lit(")"), tail))


def write_cdx(df: DataFrame, path: str, digest_col: str | None = None,
              compression: str | None = "gzip") -> None:
    """Write a CDXJ index — the Common Crawl index line format
    (``<surt> <timestamp> <json>``) — from `read_warc(payload=False)`
    output (or any frame with url / warc_date / warc_file /
    record_offset / content_length / rec_type / content_type
    columns).  One native projection + a text write (gzip by
    default): the whole index pass over a crawl is
    ``read_warc(payload=False)`` -> ``write_cdx`` with zero Python
    past the container parse.  The ``length`` field is the COMPRESSED
    record length (the gzip member span `read_warc` reports as
    ``record_length``) — what standard CDX consumers (warcio,
    cdx-toolkit) use for HTTP range fetches; frames without a
    ``record_length`` column fall back to the uncompressed
    ``content_length`` (a documented divergence — fine for the
    internal read_cdx -> read_warc_records path, which fetches by
    offset alone).  Records without a URL (warcinfo) are
    skipped — they cannot be looked up by key.  Lines are sorted
    within partitions by the SURT key so per-file runs serve prefix
    scans; sort globally (``df.orderBy``) before calling for a
    fully-sorted single index."""
    ts = F.date_format(
        F.to_timestamp(F.col("warc_date"),
                       "yyyy-MM-dd'T'HH:mm:ss'Z'"), "yyyyMMddHHmmss")
    length_col = ("record_length" if "record_length" in df.columns
                  else "content_length")
    payload = {
        "url": F.col("url"),
        "mime": F.col("content_type"),
        "rec_type": F.col("rec_type"),
        "length": F.col(length_col).cast("string"),
        "offset": F.col("record_offset").cast("string"),
        "filename": F.col("warc_file"),
    }
    if digest_col is not None:
        payload["digest"] = F.col(digest_col)
    js = F.to_json(F.struct(*[v.alias(k) for k, v in
                              sorted(payload.items())]))
    line = F.concat_ws(" ", surt_key(F.col("url")),
                       F.coalesce(ts, F.lit("00000000000000")), js)
    out = (df.filter(F.col("url").isNotNull())
           .select(line.alias("value"))
           .sortWithinPartitions("value"))
    w = out.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.text(path)


def read_cdx(spark: SparkSession, path: str,
             base_path: str | None = None) -> DataFrame:
    """Read CDXJ index lines (``<surt> <timestamp> <json>`` — the
    Common Crawl index format, which `write_cdx` emits) into
    (urlkey, cdx_ts, url, mime, rec_type, digest, warc_file,
    record_offset, record_length) — ``warc_file`` + ``record_offset``
    feed `read_warc_records` DIRECTLY, so a domain lookup is:
    ``read_cdx(...).filter(col('urlkey').startswith('com,example'))``
    -> fetch.  Entirely native (one text scan + split + from_json);
    gzip index files decompress in the scan.  CC ships RELATIVE
    filenames (``crawl-data/...``) — pass ``base_path`` to resolve
    them against your mirror root."""
    parts = F.split(F.col("value"), " ", 3)
    m = F.from_json(F.element_at(parts, 3), "map<string,string>")
    warc_file = m["filename"]
    if base_path is not None:
        warc_file = F.concat(F.lit(base_path.rstrip("/") + "/"),
                             warc_file)
    return (spark.read.text(path)
            .filter(F.length(F.trim(F.col("value"))) > 0)
            .select(
                F.element_at(parts, 1).alias("urlkey"),
                F.element_at(parts, 2).alias("cdx_ts"),
                m["url"].alias("url"),
                m["mime"].alias("mime"),
                m["rec_type"].alias("rec_type"),
                m["digest"].alias("digest"),
                warc_file.alias("warc_file"),
                m["offset"].cast("long").alias("record_offset"),
                m["length"].cast("long").alias("record_length")))


def cdx_diff(old: DataFrame, new: DataFrame, key_col: str = "urlkey",
             ts_col: str = "cdx_ts",
             digest_col: str = "digest") -> DataFrame:
    """Diff two crawls by their CDX indexes — the monthly-crawl
    comparison workflow (what changed since the last crawl decides
    what gets refetched, re-extracted, re-deduped): returns one row
    per urlkey seen in EITHER crawl with ``status`` in
    ``new`` (only in the new crawl) / ``gone`` (only in the old) /
    ``changed`` (both, content digest differs) / ``unchanged``,
    plus (old_ts, old_digest, new_ts, new_digest).

    Each side first reduces to its LATEST capture per urlkey
    (``ts`` desc, digest desc tie-break — a pure function of the
    index, so re-runs and the SQL oracle agree); presence is judged
    on the timestamp (never NULL in CDX), digests compare
    null-safely, so an absent-digest capture diffs as itself rather
    than masquerading as a missing row.

    Distributed shape: one urlkey-keyed window per side + one
    full-outer equi-join on urlkey — three shuffles on the same key,
    no row multiplication; at 100 TB both sides are index files
    (~1/1000 the crawl), and a domain-scoped diff pushes its
    ``urlkey`` prefix filter into both scans."""
    from pyspark.sql import Window

    def latest(df, prefix):
        w = (Window.partitionBy(key_col)
             .orderBy(F.col(ts_col).desc(), F.col(digest_col).desc()))
        return (df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .select(F.col(key_col).alias("urlkey"),
                        F.col(ts_col).alias(f"{prefix}_ts"),
                        F.col(digest_col).alias(f"{prefix}_digest")))

    j = latest(old, "old").join(latest(new, "new"), "urlkey", "full")
    status = (F.when(F.col("old_ts").isNull(), F.lit("new"))
              .when(F.col("new_ts").isNull(), F.lit("gone"))
              .when(F.col("old_digest").eqNullSafe(F.col("new_digest")),
                    F.lit("unchanged"))
              .otherwise(F.lit("changed")))
    return j.select("urlkey", status.alias("status"), "old_ts",
                    "old_digest", "new_ts", "new_digest")
