"""WARC / WET container source & sink (sources/warc.py) — the crawl
front door: range-owned parallel reads of plain and member-per-record
gzip files, the `to_warc` sink, and the two native payload helpers.

The load-bearing properties pinned here:
* chunked == whole: every record is owned by exactly ONE task for any
  chunk_bytes, including boundaries landing mid-record / mid-member;
* gz == plain: the two container forms parse to identical rows;
* hand-written spec-shaped bytes (multi-record members, stray bytes,
  extra headers) parse the same as the sink's output.
"""

import glob
import gzip
import os
import zlib

import pytest
from pyspark.sql import functions as F

from dask_geopandas_spark.sources.warc import (http_response_body,
                                               payload_text, read_warc,
                                               to_warc)


def _record(rec_type, url, payload: bytes, extra=()):
    hdr = [b"WARC/1.0", b"WARC-Type: " + rec_type.encode()]
    if url:
        hdr.append(b"WARC-Target-URI: " + url.encode())
    hdr.append(b"WARC-Date: 2026-01-01T00:00:00Z")
    for k, v in extra:
        hdr.append(k.encode() + b": " + v.encode())
    hdr.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(hdr) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _gz_member(rec: bytes) -> bytes:
    c = zlib.compressobj(6, zlib.DEFLATED, 31)
    return c.compress(rec) + c.flush()


def _rows(df):
    return sorted(
        (r["rec_type"], r["url"], r["content_length"],
         None if r["payload"] is None else bytes(r["payload"]))
        for r in df.collect())


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """50 conversion records with size-skewed payloads, written as
    plain .warc and member-per-record .warc.gz by hand (NOT via the
    sink — the reader must parse spec bytes, not its own dialect)."""
    base = tmp_path_factory.mktemp("warc")
    recs = [
        _record("conversion", f"https://ex{i}.com/p",
                (f"text {i} " * (1 + (i * 37) % 40)).encode())
        for i in range(50)
    ]
    with open(base / "a.warc", "wb") as f:
        f.write(b"".join(recs))
    with open(base / "a.warc.gz", "wb") as f:
        f.write(b"".join(_gz_member(r) for r in recs))
    return str(base), recs


class TestRoundtrip:
    def test_gz_equals_plain_equals_chunked(self, spark, corpus):
        base, recs = corpus
        whole = _rows(read_warc(spark, base + "/a.warc",
                                chunk_bytes=None))
        assert len(whole) == 50
        assert whole[0][0] == "conversion"
        # every payload byte-exact
        got = {u: p for _, u, _, p in whole}
        assert got["https://ex7.com/p"] == \
            ("text 7 " * (1 + (7 * 37) % 40)).encode()
        for df in (read_warc(spark, base + "/a.warc"),
                   read_warc(spark, base + "/a.warc", chunk_bytes=211),
                   read_warc(spark, base + "/a.warc.gz"),
                   read_warc(spark, base + "/a.warc.gz",
                             chunk_bytes=173)):
            assert _rows(df) == whole

    def test_boundary_straddling_records_owned_once(self, spark,
                                                    tmp_path):
        """chunk_bytes far smaller than one record: every boundary
        lands mid-record/mid-member, so each task must chain into its
        neighbour's range for the tail of ITS records and emit
        nothing for heads it does not own."""
        recs = [_record("conversion", f"https://big{i}.com",
                        bytes([65 + i]) * 5000) for i in range(8)]
        with open(tmp_path / "b.warc", "wb") as f:
            f.write(b"".join(recs))
        with open(tmp_path / "b.warc.gz", "wb") as f:
            f.write(b"".join(_gz_member(r) for r in recs))
        for fn in ("b.warc", "b.warc.gz"):
            rows = _rows(read_warc(spark, str(tmp_path / fn),
                                   chunk_bytes=900))
            assert [u for _, u, _, _ in rows] == \
                sorted(f"https://big{i}.com" for i in range(8)), fn
            assert all(cl == 5000 for _, _, cl, _ in rows)

    def test_solid_single_member_gz_degrades_to_one_owner(
            self, spark, tmp_path):
        """A .gz compressed as ONE member (gzip of the whole file):
        only the task owning offset 0 finds a boundary; the rest must
        emit nothing — records appear exactly once."""
        recs = [_record("conversion", f"https://s{i}.com",
                        (f"solid {i} " * 30).encode()) for i in range(12)]
        with open(tmp_path / "solid.warc.gz", "wb") as f:
            f.write(gzip.compress(b"".join(recs), mtime=0))
        rows = _rows(read_warc(spark, str(tmp_path / "solid.warc.gz"),
                               chunk_bytes=300))
        assert [u for _, u, _, _ in rows] == \
            sorted(f"https://s{i}.com" for i in range(12))

    def test_multi_record_member_and_stray_bytes(self, spark,
                                                 tmp_path):
        """One member holding THREE records (non-CC but spec-legal)
        plus stray padding between members: parse-through +
        re-alignment."""
        tri = _gz_member(b"".join(
            _record("metadata", f"https://m{i}.com", b"x" * 10)
            for i in range(3)))
        single = _gz_member(_record("conversion", "https://one.com",
                                    b"payload!"))
        with open(tmp_path / "m.warc.gz", "wb") as f:
            f.write(tri + b"\x00\x00junk" + single)
        rows = _rows(read_warc(spark, str(tmp_path / "m.warc.gz")))
        assert [u for _, u, _, _ in rows] == \
            ["https://one.com", "https://m0.com", "https://m1.com",
             "https://m2.com"]  # _rows sorts by rec_type first

    def test_sink_roundtrip_and_read_file_routing(self, spark,
                                                  tmp_path):
        from dask_geopandas_spark.sources.file import read_file

        rows = [(i, f"https://w{i}.com/p", f"body {i}") for i in
                range(20)]
        df = spark.createDataFrame(rows,
                                   "doc_id long, url string, payload string")
        to_warc(df, str(tmp_path / "wet"), rec_type="conversion",
                content_type="text/plain")
        files = glob.glob(str(tmp_path / "wet" / "*.warc.gz"))
        assert files  # member-per-record gz is the default form
        # raw bytes really are member-per-record (N member magics)
        raw = open(files[0], "rb").read()
        assert not raw.startswith(b"WARC/")  # compressed
        out = read_warc(spark, str(tmp_path / "wet"))
        got = sorted((r["url"], bytes(r["payload"]).decode(),
                      r["content_type"]) for r in out.collect())
        assert got == sorted((u, p, "text/plain") for _, u, p in rows)
        # read_file routes *.wet.gz / *.warc.gz to read_warc
        os.rename(files[0], files[0].replace(".warc.gz", ".wet.gz"))
        for f in glob.glob(str(tmp_path / "wet" / "*.warc.gz")):
            os.rename(f, f.replace(".warc.gz", ".wet.gz"))
        routed = read_file(spark, str(tmp_path / "wet") + "/*.wet.gz")
        assert routed.count() == 20
        assert "payload" in routed.columns


class TestSinkOptions:
    def test_per_row_columns_and_null_payload_skip(self, spark,
                                                   tmp_path):
        """rec_type / content_type / warc_date are COLUMN names when
        present in the frame, literals otherwise; NULL payloads write
        no record (there is nothing to store)."""
        rows = [(1, "https://a.com", "resp body", "response",
                 "application/http", "2025-01-02T03:04:05Z"),
                (2, "https://b.com", "wet text", "conversion",
                 "text/plain", "2025-06-07T08:09:10Z"),
                (3, "https://c.com", None, "conversion",
                 "text/plain", "2025-01-01T00:00:00Z")]
        df = spark.createDataFrame(
            rows, "id long, url string, payload string, rt string, "
                  "ct string, wd string")
        to_warc(df, str(tmp_path / "w"), rec_type="rt",
                content_type="ct", warc_date="wd")
        got = {r["url"]: r for r in
               read_warc(spark, str(tmp_path / "w")).collect()}
        assert set(got) == {"https://a.com", "https://b.com"}  # 3 skipped
        assert got["https://a.com"]["rec_type"] == "response"
        assert got["https://a.com"]["content_type"] == "application/http"
        assert got["https://a.com"]["warc_date"] == "2025-01-02T03:04:05Z"
        assert got["https://b.com"]["rec_type"] == "conversion"
        assert bytes(got["https://b.com"]["payload"]) == b"wet text"

    def test_incremental_flush_is_byte_identical(self, spark,
                                                 tmp_path):
        """to_warc streams records to the part file, flushing every
        flush_bytes — a single-partition many-record write must NOT
        buffer the whole output (r11 advice).  A tiny flush_bytes
        (many flushes) and a huge one (single final flush) must
        produce byte-identical files."""
        import glob as _g

        rows = [(i, f"https://f.com/{i}", f"payload {i} " * 20)
                for i in range(200)]
        df = spark.createDataFrame(
            rows, "id long, url string, payload string").coalesce(1)
        to_warc(df, str(tmp_path / "small"), flush_bytes=64)
        to_warc(df, str(tmp_path / "big"), flush_bytes=1 << 30)
        small = sorted(_g.glob(str(tmp_path / "small" / "part-*")))
        big = sorted(_g.glob(str(tmp_path / "big" / "part-*")))
        assert len(small) == len(big) == 1
        assert open(small[0], "rb").read() == open(big[0], "rb").read()
        assert read_warc(spark, str(tmp_path / "small")).count() == 200

    def test_binary_payload_and_plain_form(self, spark, tmp_path):
        body = bytes(range(256)) * 3
        df = spark.createDataFrame([(1, "https://bin.com", body)],
                                   "id long, url string, payload binary")
        to_warc(df, str(tmp_path / "p"), gzip_members=False)
        r = read_warc(spark, str(tmp_path / "p")).head()
        assert bytes(r["payload"]) == body
        assert r["content_length"] == len(body)


class TestOptions:
    def test_records_filter_and_payload_off(self, spark, tmp_path):
        recs = [_record("warcinfo", None, b"software: test"),
                _record("request", "https://q.com", b"GET / HTTP/1.1"),
                _record("response", "https://q.com",
                        b"HTTP/1.1 200 OK\r\nX: y\r\n\r\n<html>Q</html>"),
                _record("conversion", "https://q.com", b"Q text")]
        with open(tmp_path / "mix.warc.gz", "wb") as f:
            f.write(b"".join(_gz_member(r) for r in recs))
        p = str(tmp_path / "mix.warc.gz")
        assert read_warc(spark, p).count() == 4
        resp = read_warc(spark, p, records="response").collect()
        assert len(resp) == 1 and resp[0]["rec_type"] == "response"
        two = read_warc(spark, p, records=("response", "conversion"))
        assert two.count() == 2
        # payload=False: headers only; content_length still real
        meta = read_warc(spark, p, payload=False,
                         records="response").head()
        assert meta["payload"] is None
        assert meta["content_length"] == len(recs[2].split(
            b"\r\n\r\n", 1)[1]) - 4  # minus the record separator

    def test_url_prefix_and_payload_cap_pushdowns(self, spark,
                                                  tmp_path):
        """In-task pushdowns: url_prefix drops rows before the Arrow
        transfer; max_payload_bytes NULLs oversized payloads but keeps
        the row and its true content_length."""
        recs = [_record("conversion", f"https://keep{i}.com/x",
                        b"k" * (10 + i)) for i in range(3)]
        recs += [_record("conversion", f"https://drop{i}.com/x",
                         b"d" * 10) for i in range(3)]
        recs += [_record("conversion", "https://keep9.com/big",
                         b"B" * 5000), _record("metadata", None, b"m")]
        with open(tmp_path / "p.warc.gz", "wb") as f:
            f.write(b"".join(_gz_member(r) for r in recs))
        p = str(tmp_path / "p.warc.gz")
        kept = read_warc(spark, p, url_prefix="https://keep").collect()
        assert sorted(r["url"] for r in kept) == \
            ["https://keep0.com/x", "https://keep1.com/x",
             "https://keep2.com/x", "https://keep9.com/big"]
        multi = read_warc(spark, p, url_prefix=("https://keep0",
                                                "https://drop1"))
        assert multi.count() == 2
        capped = {r["url"]: (r["content_length"], r["payload"])
                  for r in read_warc(spark, p, url_prefix="https://keep",
                                     max_payload_bytes=100).collect()}
        assert capped["https://keep9.com/big"][0] == 5000
        assert capped["https://keep9.com/big"][1] is None
        assert bytes(capped["https://keep0.com/x"][1]) == b"k" * 10

    def test_http_status(self, spark):
        from dask_geopandas_spark.sources.warc import http_status

        rows = [(1, b"HTTP/1.1 200 OK\r\nX: y\r\n\r\nbody"),
                (2, b"HTTP/1.0 404 Not Found\r\n\r\n"),
                (3, b"not http at all"), (4, None)]
        df = spark.createDataFrame(rows, "id long, payload binary")
        got = {r["id"]: r["s"] for r in df.select(
            "id", http_status(F.col("payload")).alias("s")).collect()}
        assert got == {1: 200, 2: 404, 3: None, 4: None}

    def test_http_response_body_and_payload_text(self, spark):
        # non-UTF8 body bytes must round-trip (latin-1 1:1 map)
        body = bytes(range(256))
        pay = b"HTTP/1.1 200 OK\r\nContent-Type: a\r\n\r\n" + body
        df = spark.createDataFrame([(1, pay), (2, b"no separator"),
                                    (3, None)],
                                   "id long, payload binary")
        got = {r["id"]: r["b"] for r in df.select(
            "id", http_response_body(F.col("payload")).alias("b"))
            .collect()}
        assert bytes(got[1]) == body
        assert bytes(got[2]) == b"no separator"
        assert got[3] is None
        tdf = spark.createDataFrame([(1, "héllo".encode("utf-8"))],
                                    "id long, payload binary")
        assert tdf.select(payload_text(F.col("payload")).alias("t")) \
            .head()["t"] == "héllo"

    def test_offsets_are_random_access_keys(self, spark, corpus):
        """record_offset in the .gz form = the member's compressed
        start: gzip-decompressing the file from that offset must
        yield exactly that record."""
        base, recs = corpus
        rows = read_warc(spark, base + "/a.warc.gz").collect()
        raw = open(base + "/a.warc.gz", "rb").read()
        r = next(x for x in rows if x["url"] == "https://ex3.com/p")
        d = zlib.decompressobj(31)
        member = d.decompress(raw[r["record_offset"]:])
        assert member == _record("conversion", "https://ex3.com/p",
                                 bytes(r["payload"]))

    def test_read_warc_records_random_access(self, spark, corpus):
        """The CDX-fetch shape: index the corpus payload-free, pick a
        subset of (warc_file, record_offset) rows, fetch ONLY those —
        payloads byte-exact, in both container forms, invalid offsets
        dropped."""
        from dask_geopandas_spark.sources.warc import read_warc_records

        base, recs = corpus
        for fn in ("a.warc", "a.warc.gz"):
            idx = read_warc(spark, f"{base}/{fn}", payload=False)
            want = idx.filter(
                F.col("url").isin("https://ex3.com/p",
                                  "https://ex31.com/p",
                                  "https://ex44.com/p"))
            got = sorted(
                (r["url"], bytes(r["payload"]).decode())
                for r in read_warc_records(
                    want.select("warc_file", "record_offset"))
                .collect())
            assert [u for u, _ in got] == ["https://ex3.com/p",
                                           "https://ex31.com/p",
                                           "https://ex44.com/p"], fn
            assert got[0][1] == "text 3 " * (1 + (3 * 37) % 40)
            # a bogus offset is dropped, not fatal
            bogus = spark.createDataFrame(
                [(f"{base}/{fn}", 7)],
                "warc_file string, record_offset long")
            assert read_warc_records(bogus).count() == 0

    def test_streaming_read_warc_equals_batch(self, spark, tmp_path):
        """The streaming source (binaryFile watch + in-stream parse)
        must deliver exactly what batch read_warc reads — two files
        landed, availableNow, records= honored."""
        from dask_geopandas_spark.sources.warc import \
            streaming_read_warc

        src = tmp_path / "watch"
        src.mkdir()
        recs_a = [_record("conversion", f"https://sa{i}.com",
                          (f"wet {i} " * 5).encode()) for i in range(6)]
        recs_b = [_record("response", "https://sb.com",
                          b"HTTP/1.1 200 OK\r\n\r\nbody"),
                  _record("conversion", "https://sb2.com", b"more")]
        with open(src / "f0.wet.gz", "wb") as f:
            f.write(b"".join(_gz_member(r) for r in recs_a))
        with open(src / "f1.warc", "wb") as f:
            f.write(b"".join(recs_b))
        stream = streaming_read_warc(spark, str(src),
                                     records="conversion")
        out = str(tmp_path / "out")
        q = (stream.writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        got = sorted(
            (r["url"], bytes(r["payload"]))
            for r in spark.read.parquet(out).collect())
        batch = sorted(
            (r["url"], bytes(r["payload"]))
            for r in read_warc(spark, str(src),
                               records="conversion").collect())
        assert got == batch and len(got) == 7

    def test_empty_and_missing(self, spark, tmp_path):
        with pytest.raises(FileNotFoundError):
            read_warc(spark, str(tmp_path / "nope") + "/*.warc")
        (tmp_path / "z.warc").write_bytes(b"")
        assert read_warc(spark, str(tmp_path / "z.warc")).count() == 0


class TestPipelinePlan:
    def test_single_python_stage_past_the_parse(self, spark, tmp_path):
        """The crawl chain's 100-TB contract: the container parse is
        the ONLY Python in the plan — HTTP split, extraction and URL
        canonicalization all ride the same native projection."""
        from dask_geopandas_spark.operators.html import extract_text
        from dask_geopandas_spark.operators.textstats import \
            canonicalize_url

        df = spark.createDataFrame(
            [(1, "https://EX.com/p?utm_source=x",
              "HTTP/1.1 200 OK\r\n\r\n<html><p>hi</p></html>")],
            "i long, url string, payload string")
        to_warc(df, str(tmp_path / "w"), rec_type="response")
        recs = read_warc(spark, str(tmp_path / "w"))
        out = extract_text(
            recs.select(canonicalize_url(F.col("url")).alias("curl"),
                        payload_text(http_response_body(
                            F.col("payload"))).alias("html")),
            html_col="html", out_col="text")
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted")
        assert "ArrowEvalPython" not in plan
        assert "BatchEvalPython" not in plan
        assert plan.count(") MapInPandas") == 1  # the parse, only


class TestCdxIndex:
    """CDXJ index (the Common Crawl index format): surt keys, the
    write_cdx/read_cdx roundtrip, and the domain-lookup join into
    read_warc_records."""

    def test_surt_key_cases(self, spark):
        from dask_geopandas_spark.sources.warc import surt_key

        cases = [
            ("https://www.Example.COM/Path?Q=1",
             "com,example)/path?q=1"),
            # non-default port KEPT (real CC urlkey form)
            ("http://sub.site.org:8080/a", "org,site,sub:8080)/a"),
            # scheme-default ports dropped
            ("http://site.org:80/a", "org,site)/a"),
            ("https://site.org:443/a", "org,site)/a"),
            # :443 on http is NOT that scheme's default — kept
            ("http://site.org:443/a", "org,site:443)/a"),
            ("https://example.com", "com,example)/"),
            ("https://user:pw@host.net/x", "net,host)/x"),
            ("not a url", None),
            (None, None),
        ]
        df = spark.createDataFrame(
            [(i, u) for i, (u, _) in enumerate(cases)],
            "i long, url string")
        got = {r["i"]: r["k"] for r in df.select(
            "i", surt_key(F.col("url")).alias("k")).collect()}
        for i, (_, want) in enumerate(cases):
            assert got[i] == want, cases[i]

    def test_roundtrip_and_domain_fetch(self, spark, tmp_path):
        from dask_geopandas_spark.sources.warc import (read_cdx,
                                                       read_warc_records,
                                                       write_cdx)

        rows = [(i, f"https://d{i % 3}.com/p{i}", f"text {i}")
                for i in range(12)]
        df = spark.createDataFrame(rows,
                                   "id long, url string, payload string")
        to_warc(df, str(tmp_path / "crawl"), rec_type="conversion",
                content_type="text/plain",
                warc_date="2026-02-03T04:05:06Z")
        idx_src = read_warc(spark, str(tmp_path / "crawl"),
                            payload=False)
        write_cdx(idx_src, str(tmp_path / "cdx"))
        import glob as _g
        files = _g.glob(str(tmp_path / "cdx" / "*.txt.gz"))
        assert files  # gzip text by default
        idx = read_cdx(spark, str(tmp_path / "cdx"))
        assert idx.count() == 12
        r = idx.filter(F.col("url") == "https://d1.com/p1").head()
        assert r["urlkey"] == "com,d1)/p1"
        assert r["cdx_ts"] == "20260203040506"
        assert r["mime"] == "text/plain"
        # CC-conformant length: the COMPRESSED record length — the
        # byte slice [offset, offset+length) is exactly one gzip
        # member that inflates to the record (the HTTP range-fetch
        # contract standard CDX consumers rely on)
        import zlib as _z
        raw = open(r["warc_file"], "rb").read()
        member = raw[r["record_offset"]:
                     r["record_offset"] + r["record_length"]]
        blob = _z.decompress(member, 31)
        assert blob.startswith(b"WARC/1.0")
        assert b"text 1" in blob
        # THE point of surt: one domain's records via a prefix filter,
        # then only those members fetched
        want = idx.filter(F.col("urlkey").startswith("com,d2)"))
        got = sorted(
            (x["url"], bytes(x["payload"]).decode()) for x in
            read_warc_records(want.select("warc_file",
                                          "record_offset")).collect())
        assert got == sorted((f"https://d2.com/p{i}", f"text {i}")
                             for i in range(12) if i % 3 == 2)


class TestOwnershipProperty:
    """Hypothesis: for arbitrary record sets and ANY chunk size, the
    union of per-range reads equals the whole-file read with every
    record owned exactly once — the core invariant the part list
    banks on, in both container forms.  Pure-Python (the iterators
    directly), so hundreds of examples cost no Spark jobs.  Payloads
    include WARC-lookalike decoys (version line + unparseable
    header) to stress the plain-form head validator; a payload
    embedding a full VALID chained record is the documented
    warc-in-warc exclusion (use chunk_bytes=None or .gz)."""

    def test_hypothesis_chunked_union_equals_whole(self):
        import io

        from hypothesis import given, settings
        from hypothesis import strategies as st

        from dask_geopandas_spark.sources.warc import (_iter_gz,
                                                       _iter_plain,
                                                       _Window)

        decoy = (b"xxWARC/1.0\r\nWARC-Type: t\r\n"
                 b"Content-Length: nope\r\n\r\nyy")
        payload = st.one_of(
            st.binary(min_size=0, max_size=300),
            st.just(decoy),
            st.just(b"WARC/9.9\r\n\r\n"),
            st.just(b"\x1f\x8b\x08 fake gzip magic"))
        payloads = st.lists(payload, min_size=1, max_size=10)

        @settings(max_examples=60, deadline=None)
        @given(payloads, st.integers(min_value=1, max_value=2500),
               st.booleans())
        def check(ps, cb, gz):
            recs = [_record("conversion", f"https://h{i}.com", p)
                    for i, p in enumerate(ps)]
            blob = (b"".join(_gz_member(r) for r in recs) if gz
                    else b"".join(recs))
            it = _iter_gz if gz else _iter_plain

            def rows(s, e):
                win = _Window(io.BytesIO(blob), s)
                return [(r["record_offset"], r["url"],
                         r["payload"])
                        for r in it(win, s, e, "f", True)]

            whole = sorted(rows(0, len(blob)))
            assert len(whole) == len(ps)  # nothing lost, ever
            chunked = []
            for s in range(0, len(blob), cb):
                chunked.extend(rows(s, min(s + cb, len(blob))))
            assert sorted(chunked) == whole

        check()


class TestConcurrentJoin:
    """Response <-> metadata/request pairing via WARC-Concurrent-To —
    the CC container shape where a capture's language / charset /
    request live in paired records (one read pass, filter twice,
    equi-join on the record id)."""

    def _crawl(self, spark, tmp_path):
        from dask_geopandas_spark.sources.warc import to_warc

        resp = [(i, f"https://c.com/p{i}",
                 f"HTTP/1.1 200 OK\r\nX-Url: p{i}\r\n\r\nbody {i}")
                for i in range(6)]
        df = spark.createDataFrame(resp,
                                   "i long, url string, body string")
        rid = F.concat(F.lit("<urn:md5:"), F.md5(F.col("body")),
                       F.lit(">"))
        responses = df.select(
            "url", F.col("body").alias("payload"),
            F.lit("response").alias("rt"),
            F.lit(None).cast("string").alias("ct"))
        metas = (df.filter(F.col("i") % 2 == 0)
                 .select("url",
                         F.concat(F.lit("languages: l"),
                                  F.col("i").cast("string"))
                         .alias("payload"),
                         F.lit("metadata").alias("rt"),
                         rid.alias("ct")))
        reqs = (df.filter(F.col("i") == 0)
                .select("url", F.lit("GET /p0 HTTP/1.1").alias("payload"),
                        F.lit("request").alias("rt"), rid.alias("ct")))
        to_warc(responses.unionByName(metas).unionByName(reqs),
                str(tmp_path / "crawl"), rec_type="rt",
                concurrent_to_col="ct")

    def test_left_and_inner_pairing(self, spark, tmp_path):
        from dask_geopandas_spark.sources.warc import (concurrent_join,
                                                       read_warc)

        self._crawl(spark, tmp_path)
        recs = read_warc(spark, str(tmp_path / "crawl"))
        left = concurrent_join(recs).collect()
        assert len(left) == 6
        got = {r["url"]: r["meta_payload"] for r in left}
        assert bytes(got["https://c.com/p2"]) == b"languages: l2"
        assert got["https://c.com/p1"] is None
        inner = concurrent_join(recs, how="inner")
        assert inner.count() == 3
        # request records pair through the same mechanism
        req = concurrent_join(recs, secondary="request", how="inner",
                              prefix="req_").collect()
        assert len(req) == 1
        assert bytes(req[0]["req_payload"]) == b"GET /p0 HTTP/1.1"
        assert req[0]["url"] == "https://c.com/p0"

    def test_ids_roundtrip(self, spark, tmp_path):
        """to_warc's deterministic record ids and the concurrent_to
        header survive the container roundtrip."""
        import hashlib

        from dask_geopandas_spark.sources.warc import read_warc

        self._crawl(spark, tmp_path)
        recs = read_warc(spark, str(tmp_path / "crawl")).collect()
        by_type = {}
        for r in recs:
            by_type.setdefault(r["rec_type"], []).append(r)
        assert len(by_type["response"]) == 6
        assert len(by_type["metadata"]) == 3
        for r in recs:
            want = "<urn:md5:" + hashlib.md5(
                bytes(r["payload"])).hexdigest() + ">"
            assert r["record_id"] == want
        resp_ids = {r["record_id"] for r in by_type["response"]}
        for m in by_type["metadata"]:
            assert m["concurrent_to"] in resp_ids


class TestWat:
    """WAT metadata source (sources/wat.py) — the CC link-graph
    format: JSON envelopes in WARC metadata records, parsed with one
    pruned from_json."""

    def _crawl(self, spark, tmp_path):
        from dask_geopandas_spark.sources.warc import to_warc

        docs = spark.range(10)
        links = F.array(
            F.concat(F.lit("https://h"),
                     ((F.col("id") * 7 + 3) % 5).cast("string"),
                     F.lit(".com/p")),
            F.concat(F.lit("https://h"),
                     ((F.col("id") * 13 + 1) % 5).cast("string"),
                     F.lit(".com/q#frag")),
            F.lit("not a url"))
        head = F.struct(F.concat(F.lit("Doc "),
                                 F.col("id").cast("string"))
                        .alias("Title")).alias("Head")
        lnk = F.transform(
            links, lambda u: F.struct(u.alias("url"),
                                      F.lit("t").alias("text"))
        ).alias("Links")
        env = F.to_json(F.struct(F.struct(F.struct(F.struct(
            F.struct(head, lnk).alias("HTML-Metadata")
        ).alias("HTTP-Response-Metadata")).alias("Payload-Metadata"))
            .alias("Envelope")))
        src = docs.select(
            F.concat(F.lit("https://h"),
                     (F.col("id") % 5).cast("string"),
                     F.lit(".com/doc-"), F.col("id").cast("string"))
            .alias("url"),
            env.alias("payload"))
        to_warc(src, str(tmp_path / "wat"), rec_type="metadata",
                content_type="application/json")

    def test_roundtrip_title_links_json(self, spark, tmp_path):
        from dask_geopandas_spark.sources.wat import read_wat

        self._crawl(spark, tmp_path)
        wat = read_wat(spark, str(tmp_path / "wat"), keep_json=True)
        rows = {r["url"]: r for r in wat.collect()}
        assert len(rows) == 10
        r = rows["https://h1.com/doc-1"]
        assert r["title"] == "Doc 1"
        assert r["links"] == ["https://h0.com/p",
                              "https://h4.com/q#frag", "not a url"]
        assert '"Envelope"' in r["wat_json"]
        # default: no raw json column
        assert "wat_json" not in read_wat(
            spark, str(tmp_path / "wat")).columns

    def test_host_and_url_edges(self, spark, tmp_path):
        from dask_geopandas_spark.sources.wat import (read_wat,
                                                      wat_link_edges)

        self._crawl(spark, tmp_path)
        wat = read_wat(spark, str(tmp_path / "wat"))
        hosts = wat_link_edges(wat)  # host level
        got = {(r["src"], r["dst"]) for r in hosts.collect()}
        # non-URL links and self-loops dropped
        assert all(s.startswith("h") and d.startswith("h")
                   for s, d in got)
        assert not any(s == d for s, d in got)
        urls = wat_link_edges(wat, level="url").collect()
        # url level keeps everything, fragment-stripped
        assert any(r["dst"] == "https://h4.com/q" for r in urls)
        assert any(r["dst"] == "not a url" for r in urls)
        with pytest.raises(ValueError):
            wat_link_edges(wat, level="domain")

    def test_read_file_routes_wat(self, spark, tmp_path):
        import glob as _g
        import os as _os

        from dask_geopandas_spark.sources.file import read_file

        self._crawl(spark, tmp_path)
        for f in _g.glob(str(tmp_path / "wat" / "*.warc.gz")):
            _os.rename(f, f.replace(".warc.gz", ".wat.gz"))
        routed = read_file(spark, str(tmp_path / "wat") + "/*.wat.gz")
        assert "links" in routed.columns and "title" in routed.columns
        assert routed.count() == 10

    def test_feeds_pagerank(self, spark, tmp_path):
        from dask_geopandas_spark.operators.graph import pagerank
        from dask_geopandas_spark.sources.wat import (read_wat,
                                                      wat_link_edges)

        self._crawl(spark, tmp_path)
        edges = wat_link_edges(read_wat(spark, str(tmp_path / "wat")))
        pr = pagerank(edges, iters=3)
        rows = pr.collect()
        # h2 participates only in self-loops by construction (ids
        # 2 and 7 link to their own host), which drop — 4 nodes
        assert sorted(r["node"] for r in rows) == \
            ["h0.com", "h1.com", "h3.com", "h4.com"]
        assert sum(r["pagerank"] for r in rows) == pytest.approx(
            1.0, abs=1e-9)


class TestCdxDiff:
    """Cross-crawl CDX diff (sources/warc.cdx_diff): latest-capture
    reduction, the four statuses, null-safe digest compare."""

    def _cdx(self, spark, rows):
        return spark.createDataFrame(
            rows, "urlkey string, cdx_ts string, digest string")

    def test_four_statuses_and_latest_capture(self, spark):
        from dask_geopandas_spark.sources.warc import cdx_diff

        old = self._cdx(spark, [
            ("com,a)/", "20260101", "d1"),
            ("com,a)/", "20251201", "stale"),   # older capture loses
            ("com,b)/", "20260101", "d2"),
            ("com,gone)/", "20260101", "d3"),
        ])
        new = self._cdx(spark, [
            ("com,a)/", "20260201", "d1"),      # unchanged
            ("com,b)/", "20260201", "d2x"),     # changed
            ("com,new)/", "20260201", "d4"),    # new
        ])
        got = {r["urlkey"]: r.asDict() for r in
               cdx_diff(old, new).collect()}
        assert got["com,a)/"]["status"] == "unchanged"
        assert got["com,a)/"]["old_digest"] == "d1"   # not 'stale'
        assert got["com,b)/"]["status"] == "changed"
        assert got["com,gone)/"]["status"] == "gone"
        assert got["com,gone)/"]["new_ts"] is None
        assert got["com,new)/"]["status"] == "new"
        assert got["com,new)/"]["old_digest"] is None
        assert len(got) == 4

    def test_null_digest_is_presence_not_absence(self, spark):
        from dask_geopandas_spark.sources.warc import cdx_diff

        old = self._cdx(spark, [("com,x)/", "20260101", None)])
        new = self._cdx(spark, [("com,x)/", "20260201", None),
                                ("com,y)/", "20260201", None)])
        got = {r["urlkey"]: r["status"] for r in
               cdx_diff(old, new).collect()}
        # both digests NULL -> null-safe equal -> unchanged, not new
        assert got == {"com,x)/": "unchanged", "com,y)/": "new"}

    def test_same_ts_tiebreak_deterministic(self, spark):
        from dask_geopandas_spark.sources.warc import cdx_diff

        old = self._cdx(spark, [("com,t)/", "20260101", "a"),
                                ("com,t)/", "20260101", "b")])
        new = self._cdx(spark, [("com,t)/", "20260201", "b")])
        row = cdx_diff(old, new).head()
        assert row["old_digest"] == "b"  # digest desc tie-break
        assert row["status"] == "unchanged"
