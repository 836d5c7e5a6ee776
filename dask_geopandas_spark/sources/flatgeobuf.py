"""FlatGeobuf source & sink — pure Python, no GDAL.

The reference reads FlatGeobuf through ``read_file``/pyogrio (reference
io/file.py:49-149); GDAL is absent in this environment, but FlatGeobuf
is a fully-published open format (flatgeobuf.org: 8 magic bytes, a
size-prefixed FlatBuffers header, an optional packed Hilbert R-tree,
then size-prefixed FlatBuffers features), so this module serves it
natively — including the index, which is what makes the format
DISTRIBUTABLE:

* the packed R-tree's **leaf level** stores one 40-byte node per
  feature — ``(minx, miny, maxx, maxy, byte_offset)`` — at a fixed
  position (the last ``features_count`` nodes of the index block), so
  the exact byte range of any run of features comes from one range
  read of the leaf slice, exactly like the shapefile ``.shx`` trick
  but with bboxes attached; multi-file reads derive those parts
  EXECUTOR-side (``mapInPandas`` over the file list — the distributed
  footer gather ``read_parquet`` makes), and unchunked reads skip the
  leaf level entirely (header + 40-byte index root per file);
* those leaf bboxes double as a **spatial pushdown**: ``bbox=`` prunes
  whole chunks before a single read task launches — at 100 TB the scan
  touches only the byte ranges whose features can intersect the query
  window (the format stores features in Hilbert order, so bbox-local
  features are byte-local too) — and a per-feature envelope refinement
  inside the parse makes the result window-EXACT (pyogrio parity);
* files without an index degrade to one sequential part per file —
  the sink therefore always writes the index.

The attribute schema is declared in the header (columns vector), so
the Spark schema is exact and driver-side, no sampling.

FlatBuffers encoding/decoding is implemented here directly from the
published wire format (vtable-based tables, little-endian scalars,
size-prefixed roots) — ~120 lines each way; the flatbuffers pip
package is not required.

Writer: one ``part-*.fgb`` per Spark partition inside a directory
(features Hilbert-sorted per file, packed R-tree included), mirroring
the engine's other sinks; the reader accepts a single ``.fgb``, a
directory of them, or a glob.
"""

from __future__ import annotations

import glob
import os
import struct

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.types import (BinaryType, BooleanType, DoubleType, LongType,
                               StringType, StructField, StructType)

from . import fs as FS
from ..geometry import wkb as W

MAGIC = bytes([0x66, 0x67, 0x62, 0x03, 0x66, 0x67, 0x62, 0x01])
NODE_BYTES = 40  # 4 doubles + uint64 per packed-R-tree node
_DEFAULT_NODE_SIZE = 16
# driver-side leaf-level scan block (~10 MB of nodes per read); module
# constant so tests can shrink it to exercise block boundaries
_LEAF_BLOCK_NODES = 1 << 18
# when part derivation goes distributed (a Spark job costs ~0.5 s of
# Python-worker round-trip — only worth it when the driver-side
# alternative is real work): many files, or a leaf volume whose serial
# driver scan would take longer than the job
_DISTRIBUTE_MIN_FILES = 16
_DRIVER_LEAF_BYTES = 32 << 20

# fgb ColumnType enum (header.fbs)
_CT_BYTE, _CT_UBYTE, _CT_BOOL, _CT_SHORT, _CT_USHORT = 0, 1, 2, 3, 4
_CT_INT, _CT_UINT, _CT_LONG, _CT_ULONG = 5, 6, 7, 8
_CT_FLOAT, _CT_DOUBLE, _CT_STRING, _CT_JSON = 9, 10, 11, 12
_CT_DATETIME, _CT_BINARY = 13, 14

_CT_FIXED = {_CT_BYTE: ("<b", 1), _CT_UBYTE: ("<B", 1), _CT_BOOL: ("<B", 1),
             _CT_SHORT: ("<h", 2), _CT_USHORT: ("<H", 2), _CT_INT: ("<i", 4),
             _CT_UINT: ("<I", 4), _CT_LONG: ("<q", 8), _CT_ULONG: ("<Q", 8),
             _CT_FLOAT: ("<f", 4), _CT_DOUBLE: ("<d", 8)}


# ======================================================================
# minimal FlatBuffers builder (wire format per the published spec:
# tables reference a vtable of uint16 field offsets; scalars inline,
# strings/vectors/tables via forward uoffsets; built back-to-front)
# ======================================================================
class _FB:
    def __init__(self):
        self.buf = bytearray()
        self.minalign = 1

    # `n` below = bytes written so far = an object's distance from the
    # buffer END, which is the address space FlatBuffers aligns in.
    @property
    def n(self) -> int:
        return len(self.buf)

    def _prep(self, size: int, additional: int) -> None:
        self.minalign = max(self.minalign, size)
        pad = (-(self.n + additional)) % size
        if pad:
            self.buf[0:0] = bytes(pad)

    def _push(self, fmt: str, v) -> None:
        self.buf[0:0] = struct.pack(fmt, v)

    def scalar(self, fmt: str, size: int, v) -> None:
        self._prep(size, 0)
        self._push(fmt, v)

    def ref(self, off: int) -> None:
        """Prepend a uoffset to an object previously built at
        offset-from-end ``off``."""
        self._prep(4, 0)
        self._push("<I", self.n - off + 4)

    def bytes_vec(self, data: bytes) -> int:
        self._prep(4, len(data))
        self.buf[0:0] = data
        self._push("<I", len(data))
        return self.n

    def f64_vec(self, arr) -> int:
        data = np.ascontiguousarray(arr, dtype="<f8").tobytes()
        self._prep(8, len(data) + 4)
        self.buf[0:0] = data
        self._push("<I", len(data) // 8)
        return self.n

    def u32_vec(self, arr) -> int:
        data = np.ascontiguousarray(arr, dtype="<u4").tobytes()
        self._prep(4, len(data) + 4)
        self.buf[0:0] = data
        self._push("<I", len(data) // 4)
        return self.n

    def string(self, s: str) -> int:
        data = s.encode("utf-8")
        self._prep(4, len(data) + 1)
        self.buf[0:0] = data + b"\x00"
        self._push("<I", len(data))
        return self.n

    def ref_vec(self, offs: list) -> int:
        self._prep(4, 4 * len(offs))
        for off in reversed(offs):
            self._push("<I", self.n - off + 4)
        self._push("<I", len(offs))
        return self.n

    def table(self, fields: list) -> int:
        """fields: list of (slot_index, kind, value) with kind one of
        'ref' (offset-from-end of a built object), 'bool', 'u8', 'u16',
        'u64', 'i32'.  Returns the table's offset-from-end."""
        if fields:
            nslots = max(s for s, _, _ in fields) + 1
        else:
            nslots = 0
        slots = [0] * nslots
        obj_start = self.n
        for slot, kind, v in fields:  # last field lands closest to start
            if kind == "ref":
                self.ref(v)
            elif kind == "bool" or kind == "u8":
                self.scalar("<B", 1, int(v))
            elif kind == "u16":
                self.scalar("<H", 2, int(v))
            elif kind == "u64":
                self.scalar("<Q", 8, int(v))
            elif kind == "i32":
                self.scalar("<i", 4, int(v))
            else:
                raise ValueError(kind)
            slots[slot] = self.n
        self._prep(4, 0)
        self._push("<i", 0)  # soffset placeholder at table start
        tbl = self.n
        while slots and slots[-1] == 0:
            slots.pop()
        vt_len = 4 + 2 * len(slots)
        for s in reversed(slots):
            self._push("<H", (tbl - s) if s else 0)
        self._push("<H", tbl - obj_start)  # table inline size incl. soffset
        self._push("<H", vt_len)
        vt = self.n
        # patch the placeholder: soffset = vtable position relative to table
        pos = len(self.buf) - tbl
        struct.pack_into("<i", self.buf, pos, vt - tbl)
        return tbl

    def finish(self, root: int) -> bytes:
        self._prep(self.minalign, 4)
        self._push("<I", self.n - root + 4)
        return bytes(self.buf)


# ======================================================================
# minimal FlatBuffers reader
# ======================================================================
def _root(buf: bytes) -> int:
    return struct.unpack_from("<I", buf, 0)[0]


def _field(buf: bytes, tbl: int, idx: int) -> int:
    """Absolute position of field ``idx``'s inline data, or 0."""
    vt = tbl - struct.unpack_from("<i", buf, tbl)[0]
    vt_len = struct.unpack_from("<H", buf, vt)[0]
    slot = 4 + 2 * idx
    if slot >= vt_len:
        return 0
    off = struct.unpack_from("<H", buf, vt + slot)[0]
    return tbl + off if off else 0


def _f_scalar(buf, tbl, idx, fmt, default=0):
    p = _field(buf, tbl, idx)
    return struct.unpack_from(fmt, buf, p)[0] if p else default


def _f_indirect(buf, tbl, idx) -> int:
    """Absolute position of a referenced object (string/vector/table)."""
    p = _field(buf, tbl, idx)
    return p + struct.unpack_from("<I", buf, p)[0] if p else 0


def _f_string(buf, tbl, idx) -> str | None:
    p = _f_indirect(buf, tbl, idx)
    if not p:
        return None
    ln = struct.unpack_from("<I", buf, p)[0]
    return buf[p + 4:p + 4 + ln].decode("utf-8", "replace")


def _f_vec(buf, tbl, idx, dtype) -> np.ndarray | None:
    p = _f_indirect(buf, tbl, idx)
    if not p:
        return None
    ln = struct.unpack_from("<I", buf, p)[0]
    item = np.dtype(dtype).itemsize
    return np.frombuffer(buf, dtype=dtype, count=ln, offset=p + 4).copy() \
        if ln else np.empty(0, dtype=dtype)


def _f_table_vec(buf, tbl, idx) -> list:
    p = _f_indirect(buf, tbl, idx)
    if not p:
        return []
    ln = struct.unpack_from("<I", buf, p)[0]
    out = []
    for i in range(ln):
        ep = p + 4 + 4 * i
        out.append(ep + struct.unpack_from("<I", buf, ep)[0])
    return out


# ======================================================================
# header
# ======================================================================
def _spark_type(ct: int):
    if ct == _CT_BOOL:
        return BooleanType()
    if ct in (_CT_BYTE, _CT_UBYTE, _CT_SHORT, _CT_USHORT, _CT_INT,
              _CT_UINT, _CT_LONG, _CT_ULONG):
        return LongType()
    if ct in (_CT_FLOAT, _CT_DOUBLE):
        return DoubleType()
    if ct == _CT_BINARY:
        return BinaryType()
    return StringType()  # String / Json / DateTime


def _column_type_for(dt) -> int:
    if isinstance(dt, BooleanType):
        return _CT_BOOL
    if isinstance(dt, LongType):
        return _CT_LONG
    if isinstance(dt, DoubleType):
        return _CT_DOUBLE
    if isinstance(dt, BinaryType):
        return _CT_BINARY
    return _CT_STRING


class _Header:
    __slots__ = ("geometry_type", "has_z", "columns", "features_count",
                 "index_node_size", "crs", "header_end")

    def __init__(self, raw: bytes):
        if raw[:len(MAGIC)] != MAGIC:
            raise ValueError("not a FlatGeobuf buffer (bad magic)")
        size = struct.unpack_from("<I", raw, len(MAGIC))[0]
        if len(raw) < len(MAGIC) + 4 + size:
            raise ValueError(
                f"FlatGeobuf header truncated: need {size} bytes, "
                f"have {len(raw) - len(MAGIC) - 4} — pass a larger prefix")
        buf = raw[len(MAGIC) + 4:len(MAGIC) + 4 + size]
        t = _root(buf)
        self.geometry_type = _f_scalar(buf, t, 2, "<B", 0)
        self.has_z = bool(_f_scalar(buf, t, 3, "<B", 0))
        self.columns = []  # (name, column_type)
        for ct in _f_table_vec(buf, t, 7):
            self.columns.append((_f_string(buf, ct, 0) or "",
                                 _f_scalar(buf, ct, 1, "<B", 0)))
        self.features_count = _f_scalar(buf, t, 8, "<Q", 0)
        self.index_node_size = _f_scalar(buf, t, 9, "<H", _DEFAULT_NODE_SIZE)
        self.crs = None
        crs_t = _f_indirect(buf, t, 10)
        if crs_t:
            code = _f_scalar(buf, crs_t, 1, "<i", 0)
            org = _f_string(buf, crs_t, 0)
            wkt = _f_string(buf, crs_t, 4)
            if code:
                self.crs = f"{org or 'EPSG'}:{code}"
            elif wkt:
                self.crs = wkt
        self.header_end = len(MAGIC) + 4 + size


def _read_header(fp: str, filesystem=None) -> _Header:
    """Parse a file's header, growing the prefix read if the header
    exceeds the default 64 KiB (wide foreign column metadata)."""
    with FS.open_input(fp, filesystem) as f:
        raw = f.read(1 << 16)
        if raw[:len(MAGIC)] != MAGIC:
            raise ValueError(f"not a FlatGeobuf file: {fp}")
        size = struct.unpack_from("<I", raw, len(MAGIC))[0]
        need = len(MAGIC) + 4 + size
        if len(raw) < need:
            raw += f.read(need - len(raw))
    return _Header(raw)


def _rtree_num_nodes(num_items: int, node_size: int) -> int:
    n, total = num_items, num_items
    while n != 1:
        n = (n + node_size - 1) // node_size
        total += n
    return total


# ======================================================================
# feature -> row
# ======================================================================
def _geom_to_wkb(buf: bytes, g: int, layer_type: int, has_z: bool):
    gtype = _f_scalar(buf, g, 6, "<B", 0) or layer_type
    xy = _f_vec(buf, g, 1, "<f8")
    z = _f_vec(buf, g, 2, "<f8") if has_z else None
    ends = _f_vec(buf, g, 0, "<u4")

    def pts():
        p = xy.reshape(-1, 2)
        if z is not None and len(z) == len(p):
            return np.column_stack([p, z])
        return p

    def split(arr):
        if ends is None or len(ends) == 0:
            return [arr]
        out, s = [], 0
        for e in ends.astype(np.int64):
            out.append(arr[s:e])
            s = int(e)
        return out

    hz = z is not None and len(z) > 0
    if gtype == W.POINT:
        return W.serialize_geometry(W.POINT, pts()[0], hz) if xy is not None \
            and len(xy) else None
    if gtype == W.MULTIPOINT:
        return W.serialize_geometry(W.MULTIPOINT, pts(), hz)
    if gtype == W.LINESTRING:
        return W.serialize_geometry(W.LINESTRING, pts(), hz)
    if gtype == W.MULTILINESTRING:
        return W.serialize_geometry(W.MULTILINESTRING, split(pts()), hz)
    if gtype == W.POLYGON:
        return W.serialize_geometry(W.POLYGON, split(pts()), hz)
    if gtype in (W.MULTIPOLYGON, W.GEOMETRYCOLLECTION):
        # nested parts (feature.fbs: Geometry.parts)
        parts = _f_table_vec(buf, g, 7)
        if gtype == W.MULTIPOLYGON:
            rings = []
            any_z = False
            for pg in parts:
                pxy = _f_vec(buf, pg, 1, "<f8").reshape(-1, 2)
                pz = _f_vec(buf, pg, 2, "<f8") if has_z else None
                if pz is not None and len(pz) == len(pxy):
                    pxy = np.column_stack([pxy, pz])
                    any_z = True
                pe = _f_vec(buf, pg, 0, "<u4")
                if pe is None or len(pe) == 0:
                    rings.append([pxy])
                else:
                    rs, s = [], 0
                    for e in pe.astype(np.int64):
                        rs.append(pxy[s:e])
                        s = int(e)
                    rings.append(rs)
            return W.serialize_geometry(W.MULTIPOLYGON, rings, any_z)
        members = []
        for pg in parts:
            sub = _geom_to_wkb(buf, pg, 0, has_z)
            if sub is not None:
                members.append(sub)
        # re-parse members into (kind, parts) tuples is wasteful; build
        # the collection directly from member WKBs
        body = struct.pack("<I", len(members)) + b"".join(members)
        code = W.GEOMETRYCOLLECTION + (1000 if hz else 0)
        return b"\x01" + struct.pack("<I", code) + body
    return None


def _parse_properties(buf: bytes, f: int, columns: list, out: dict) -> None:
    p = _f_indirect(buf, f, 1)
    present = set()
    if p:
        ln = struct.unpack_from("<I", buf, p)[0]
        data = buf[p + 4:p + 4 + ln]
        pos = 0
        while pos + 2 <= len(data):
            ci = struct.unpack_from("<H", data, pos)[0]
            pos += 2
            name, ct = columns[ci]
            if ct in _CT_FIXED:
                fmt, sz = _CT_FIXED[ct]
                v = struct.unpack_from(fmt, data, pos)[0]
                pos += sz
                if ct == _CT_BOOL:
                    v = bool(v)
                elif ct in (_CT_FLOAT, _CT_DOUBLE):
                    v = float(v)
                else:
                    v = int(v)
            else:
                ln2 = struct.unpack_from("<I", data, pos)[0]
                pos += 4
                raw = data[pos:pos + ln2]
                pos += ln2
                v = raw if ct == _CT_BINARY else raw.decode("utf-8", "replace")
            out[name].append(v)
            present.add(name)
    for name, _ in columns:
        if name not in present:
            out[name].append(None)


def _feature_envelopes(geoms: list) -> np.ndarray:
    """(n, 4) per-feature (minx, miny, maxx, maxy) from WKB blobs; NaN
    rows for null/empty geometries (so bbox comparisons drop them).
    Vectorized: features' coordinate runs are contiguous in parse
    order, so one ``minimum.reduceat`` per bound covers every feature
    (the rare NaN-coordinate feature falls back to a nan-aware
    slice)."""
    b = W.parse_wkb(geoms)
    env = np.full((b.n, 4), np.nan)
    if b.n == 0 or len(b.xs) == 0:
        return env
    first = np.searchsorted(b.path_geom, np.arange(b.n), "left")
    last = np.searchsorted(b.path_geom, np.arange(b.n), "right")
    starts = b.path_offsets[first].astype(np.int64)
    ends = b.path_offsets[last].astype(np.int64)
    has = ends > starts
    if not bool(np.any(has)):
        return env
    seg = starts[has]
    env[has, 0] = np.minimum.reduceat(b.xs, seg)
    env[has, 1] = np.minimum.reduceat(b.ys, seg)
    env[has, 2] = np.maximum.reduceat(b.xs, seg)
    env[has, 3] = np.maximum.reduceat(b.ys, seg)
    bad = np.where(has & np.isnan(env).any(axis=1))[0]
    for i in bad:  # NaN coords inside a feature: ignore them, as before
        s, e = int(starts[i]), int(ends[i])
        with np.errstate(all="ignore"):
            env[i] = (np.nanmin(b.xs[s:e]), np.nanmin(b.ys[s:e]),
                      np.nanmax(b.xs[s:e]), np.nanmax(b.ys[s:e]))
    return env


def _parse_features(raw: bytes, start: int, end: int, hdr: _Header,
                    want: set, geometry: str | None, bbox=None) -> dict:
    cols = {n: [] for n, _ in hdr.columns if n in want}
    wanted_cols = [(n, c) for n, c in hdr.columns if n in want]
    # properties are positional over the FULL column list; parse all,
    # keep wanted
    full = {n: [] for n, _ in hdr.columns}
    # bbox refinement needs each feature's envelope, so geometries are
    # parsed even when the geometry column itself is pruned away
    parse_geom = geometry is not None or bbox is not None
    geoms = []
    pos = start
    while pos + 4 <= end:
        size = struct.unpack_from("<I", raw, pos)[0]
        fbuf = raw[pos + 4:pos + 4 + size]
        pos += 4 + size
        t = _root(fbuf)
        if parse_geom:
            g = _f_indirect(fbuf, t, 0)
            geoms.append(
                _geom_to_wkb(fbuf, g, hdr.geometry_type, hdr.has_z)
                if g else None)
        _parse_properties(fbuf, t, hdr.columns, full)
    out = {n: full[n] for n, _ in wanted_cols}
    if geometry is not None:
        out[geometry] = geoms
    if bbox is not None and geoms:
        # per-feature envelope refinement: the index prunes CHUNKS, this
        # makes the result window-EXACT (envelope-intersects semantics,
        # pyogrio/OGR parity).  Null/empty geometries have NaN envelopes
        # and NaN comparisons are False, so they drop under bbox.
        env = _feature_envelopes(geoms)
        keep = ((env[:, 0] <= bbox[2]) & (env[:, 2] >= bbox[0])
                & (env[:, 1] <= bbox[3]) & (env[:, 3] >= bbox[1]))
        out = {n: [v for v, k in zip(vals, keep) if k]
               for n, vals in out.items()}
    return out


# ======================================================================
# reader
# ======================================================================
def _file_parts(fp: str, filesystem, chunksize: int | None,
                bbox) -> tuple[list, tuple | None]:
    """One file -> (``[(fp, start_byte, end_byte), ...]``, envelope).

    With ``chunksize=None`` this is O(1) reads — the header plus the
    index ROOT node (40 bytes), whose box is the file envelope and
    answers the bbox prune; the leaf level is never touched.  Only a
    chunked read scans the leaf level (in ~10 MB blocks) to learn
    per-chunk byte offsets and boxes.  Pure function of the file, so it
    runs identically driver-side (single file) and executor-side
    (multi-file ``mapInPandas`` fan-out in :func:`_derive_parts`).
    Envelope is ``None`` for unindexed files (no summary available)."""
    h = _read_header(fp, filesystem)
    fsys, p = FS.resolve_fs(fp, filesystem)
    fsize = int(fsys.get_file_info(p).size)
    n, ns = h.features_count, h.index_node_size
    if not (ns > 0 and n > 0):
        # No index: the whole data section reads as ONE sequential part
        # (feature boundaries are unknowable without walking the bytes).
        # bbox still applies EXACTLY via the per-feature envelope
        # refinement in _parse_features.
        return [(fp, h.header_end, fsize)], None
    num_nodes = _rtree_num_nodes(n, ns)
    leaf_at = h.header_end + (num_nodes - n) * NODE_BYTES
    data_at = h.header_end + num_nodes * NODE_BYTES
    with FS.open_input(fp, filesystem) as f:
        f.seek(h.header_end)
        root = np.frombuffer(f.read(NODE_BYTES), dtype="<f8")
        env = (float(root[0]), float(root[1]),
               float(root[2]), float(root[3]))
        if chunksize is None:
            # single part per file: the root box already answers the
            # bbox prune and spatial_partitions — skip the leaf scan
            # entirely (a billion-feature file has a 40 GB leaf level)
            if bbox is not None and not (
                    env[0] <= bbox[2] and env[2] >= bbox[0]
                    and env[1] <= bbox[3] and env[3] >= bbox[1]):
                return [], env
            return [(fp, data_at, fsize)], env
        per = max(int(chunksize), 1)
        # The leaf level is scanned in BLOCKS (a multiple of the chunk
        # size, ~10 MB per read) rather than one gulp.  Each block
        # overlaps the next by one node so every chunk's end byte-offset
        # is in hand.
        blk = per * max(1, _LEAF_BLOCK_NODES // per)
        parts = []
        for bs in range(0, n, blk):
            be = min(bs + blk, n)
            cnt = be - bs + (1 if be < n else 0)
            f.seek(leaf_at + bs * NODE_BYTES)
            block = np.frombuffer(f.read(cnt * NODE_BYTES),
                                  dtype="<f8").reshape(-1, 5)
            boxes = block[:, :4]
            offs = block[:, 4].view("<u8").astype(np.int64)
            for s in range(bs, be, per):
                e = min(s + per, n)
                ls, le = s - bs, e - bs
                if bbox is not None:
                    bx = boxes[ls:le]
                    if not bool(np.any((bx[:, 0] <= bbox[2])
                                       & (bx[:, 2] >= bbox[0])
                                       & (bx[:, 1] <= bbox[3])
                                       & (bx[:, 3] >= bbox[1]))):
                        continue
                end_b = (data_at + int(offs[le])) if e < n else fsize
                parts.append((fp, data_at + int(offs[ls]), end_b))
    return parts, env


def _derive_parts(spark: SparkSession, files: list, filesystem,
                  chunksize: int | None, bbox,
                  distributed: bool | None = None) -> tuple[list, list | None]:
    """Part list + per-file envelopes for a set of .fgb files.

    Small inputs derive on the driver; large ones fan the per-file
    index reads out as a ``mapInPandas`` pass over the file list (the
    same move ``read_parquet``'s distributed footer gather makes,
    geoparquet.py) — the driver then never performs a leaf-level scan,
    only collects the O(parts) derived ranges.  "Large" = more than
    ``_DISTRIBUTE_MIN_FILES`` files, or a chunked read whose total
    leaf volume (40 B/feature, from the headers' feature counts)
    exceeds ``_DRIVER_LEAF_BYTES`` — a Spark job has a fixed
    ~half-second cost that a few small driver range-reads should not
    pay, while a billion-feature lake must never serialize 40 GB of
    leaf scans through the driver.  Unchunked reads never leaf-scan at
    all (header + root node per file), so only the file count matters
    there.  Both paths call the same pure :func:`_file_parts`, so
    their output is identical; ``distributed`` forces a path (tests
    pin the parity)."""
    if distributed is None:
        if len(files) > _DISTRIBUTE_MIN_FILES:
            distributed = True
        elif chunksize is None:
            distributed = False
        else:
            leaf_bytes = sum(
                _read_header(fp, filesystem).features_count * NODE_BYTES
                for fp in files)
            distributed = leaf_bytes > _DRIVER_LEAF_BYTES
    if not distributed:
        parts, file_boxes = [], []
        for fp in files:
            prts, env = _file_parts(fp, filesystem, chunksize, bbox)
            parts.extend(prts)
            file_boxes = None if env is None else (
                file_boxes + [env] if file_boxes is not None else None)
        return parts, file_boxes or None

    file_df = spark.createDataFrame(
        [(f,) for f in files], "path: string"
    ).repartition(min(len(files), 512))
    pschema = ("path string, start long, end long, minx double, "
               "miny double, maxx double, maxy double, has_env boolean, "
               "is_part boolean")

    def derive(batches):
        for pdf in batches:
            recs = []
            for fp in pdf["path"]:
                prts, env = _file_parts(fp, filesystem, chunksize, bbox)
                he = env is not None
                ev = env if he else (0.0, 0.0, 0.0, 0.0)
                # envelope-only row keeps the file's cover (and its
                # index-less-ness) visible even when bbox pruned every
                # chunk, matching the driver path's bookkeeping
                recs.append((fp, -1, -1, *ev, he, False))
                for f_, s, e in prts:
                    recs.append((f_, int(s), int(e), *ev, he, True))
            yield pd.DataFrame(
                recs, columns=["path", "start", "end", "minx", "miny",
                               "maxx", "maxy", "has_env", "is_part"])

    rows = sorted(file_df.mapInPandas(derive, schema=pschema).collect(),
                  key=lambda r: (r["path"], r["start"]))
    parts = [(r["path"], int(r["start"]), int(r["end"]))
             for r in rows if r["is_part"]]
    env_rows = [r for r in rows if not r["is_part"]]
    if any(not r["has_env"] for r in env_rows):
        file_boxes = None  # one unindexed file drops the cover
    else:
        file_boxes = [(r["minx"], r["miny"], r["maxx"], r["maxy"])
                      for r in env_rows]
    return parts, file_boxes or None


def _list_fgb(path: str, filesystem=None) -> list:
    if filesystem is not None or FS.has_scheme(path):
        if FS.is_dir(path, filesystem):
            return FS.list_files(path, suffixes=(".fgb",),
                                 filesystem=filesystem)
        return [path]
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.fgb")))
    return sorted(glob.glob(path)) if any(c in path for c in "*?[") else [path]


def read_flatgeobuf(spark: SparkSession, path: str, columns=None,
                    chunksize: int | None = None, bbox=None,
                    filesystem=None, geometry: str = "geometry"):
    """Read FlatGeobuf file(s) -> GeoDataFrame with WKB geometry.

    ``path``: one ``.fgb``, a directory of them (the sink's layout), or
    a glob.  Schema comes exactly from the header's columns vector.
    With an index present and ``chunksize`` set, per-chunk byte ranges
    come from the index's leaf level (40 bytes/feature) — scanned
    EXECUTOR-side for multi-file reads (a ``mapInPandas`` fan-out over
    the file list, like ``read_parquet``'s distributed footer gather);
    with ``chunksize=None`` only the header and the 40-byte index root
    are read per file (no leaf scan at all).  Each part is a single
    contiguous byte-range read.

    ``bbox=(minx, miny, maxx, maxy)`` is an EXACT envelope-intersects
    filter (pyogrio/OGR parity): the index prunes non-intersecting
    chunks before any task launches (features are Hilbert-ordered, so
    window-local features are byte-local), then a per-feature envelope
    refinement inside the parse drops the chunk survivors outside the
    window.  Unindexed files skip the pruning but still refine, so the
    result is window-exact either way; features with null/empty
    geometry are excluded by ``bbox=`` (they have no envelope).
    Reference parity: io/file.py:49-149 (pyogrio path).
    """
    from ..core import GeoDataFrame

    files = _list_fgb(path, filesystem)
    if not files:
        raise FileNotFoundError(path)

    hdr = _read_header(files[0], filesystem)

    prop_fields = [StructField(n, _spark_type(ct)) for n, ct in hdr.columns]
    if columns:
        keep = set(columns)
        prop_fields = [f for f in prop_fields if f.name in keep]
    want_geom = not columns or geometry in set(columns)
    schema = StructType(prop_fields + ([StructField(geometry, BinaryType())]
                                       if want_geom else []))
    want = {f.name for f in prop_fields}
    crs = hdr.crs

    # part list: (file, start_byte, end_byte); per-file envelopes from
    # the index ROOT nodes feed spatial_partitions (the same per-file
    # summary read_parquet gathers from geo metadata — scan-free sjoin
    # bounds).  Multi-file derivation runs executor-side.
    parts, file_boxes = _derive_parts(spark, files, filesystem,
                                      chunksize, bbox)

    if not parts:
        df = spark.createDataFrame([], schema)
        return GeoDataFrame(df, geometry, crs=crs) if want_geom else df

    part_df = spark.createDataFrame(
        parts, "path: string, start: long, end: long"
    ).repartition(min(len(parts), 512))
    fnames = list(schema.fieldNames())

    def read_part(batches):
        hdr_cache: dict = {}
        for pdf in batches:
            for fp, s, e in zip(pdf["path"], pdf["start"], pdf["end"]):
                s, e = int(s), int(e)
                if fp not in hdr_cache:
                    hdr_cache[fp] = _read_header(fp, filesystem)
                h = hdr_cache[fp]
                with FS.open_input(fp, filesystem) as f:
                    f.seek(s)
                    raw = f.read(e - s)
                data = _parse_features(raw, 0, len(raw), h, want,
                                       geometry if want_geom else None,
                                       bbox=bbox)
                yield pd.DataFrame(data, columns=fnames)

    df = part_df.mapInPandas(read_part, schema=schema)
    if not want_geom:
        return df
    out = GeoDataFrame(df, geometry, crs=crs)
    # per-file envelopes are valid covers even under bbox chunk pruning
    # (a cover may over-approximate); they make downstream sjoin/grid
    # bounds scan-free exactly like GeoParquet's bbox summaries
    out.spatial_partitions = file_boxes or None
    return out


# ======================================================================
# writer
# ======================================================================
def _geom_table(fb: _FB, batch: W.GeometryBatch, i: int, lo: int, hi: int,
                uniform_type: int, use_z: bool) -> int | None:
    t = int(batch.types[i])
    if t == 0 or hi <= lo:
        return None
    po = batch.path_offsets
    hz = use_z and batch.zs is not None

    def coords(lo_p, hi_p):
        s, e = int(po[lo_p]), int(po[hi_p])
        xy = np.empty(2 * (e - s))
        xy[0::2] = batch.xs[s:e]
        xy[1::2] = batch.ys[s:e]
        z = batch.zs[s:e] if hz else None
        return xy, z

    def simple(gt, lo_p, hi_p, with_ends) -> int:
        xy, z = coords(lo_p, hi_p)
        fields = []
        if gt != uniform_type:
            fields.append((6, "u8", gt))
        if z is not None:
            zoff = fb.f64_vec(np.where(np.isnan(z), 0.0, z))
            fields.append((2, "ref", zoff))
        xyoff = fb.f64_vec(xy)
        fields.append((1, "ref", xyoff))
        if with_ends and hi_p - lo_p > 1:
            base = int(po[lo_p])
            ends = [(int(po[p + 1]) - base) for p in range(lo_p, hi_p)]
            fields.append((0, "ref", fb.u32_vec(ends)))
        return fb.table(sorted(fields, reverse=True))

    if t in (W.POINT, W.MULTIPOINT, W.LINESTRING):
        return simple(t, lo, hi, with_ends=False)
    if t in (W.MULTILINESTRING, W.POLYGON):
        return simple(t, lo, hi, with_ends=True)
    if t == W.MULTIPOLYGON:
        # group rings into polygons by path_part
        part_ids = batch.path_part[lo:hi]
        polys = []
        s = lo
        for p in range(lo + 1, hi + 1):
            if p == hi or int(batch.path_part[p]) != int(part_ids[s - lo]):
                polys.append((s, p))
                s = p
        offs = [simple(W.POLYGON, a, b, with_ends=True) for a, b in polys]
        pv = fb.ref_vec(offs)
        return fb.table([(7, "ref", pv), (6, "u8", t)]
                        if t != uniform_type else [(7, "ref", pv)])
    if t == W.GEOMETRYCOLLECTION:
        # feature.fbs models collections as nested Geometry parts, each
        # carrying its own type; rebuild members from the row's raw WKB
        # (the member splitter the setops GC dispatch already uses)
        from ..geometry.setops import _gc_members

        offs = []
        for m in _gc_members(bytes(batch.raw[i])):
            mb = W.parse_wkb([m])
            sub = _geom_table(fb, mb, 0, 0, len(mb.path_geom),
                              uniform_type=0, use_z=use_z)
            if sub is not None:
                offs.append(sub)
        pv = fb.ref_vec(offs)
        return fb.table([(7, "ref", pv), (6, "u8", t)]
                        if t != uniform_type else [(7, "ref", pv)])
    raise NotImplementedError(f"to_flatgeobuf: geometry type {t}")


def _props_blob(row, specs) -> bytes:
    out = bytearray()
    for ci, (name, ct) in enumerate(specs):
        v = row[name]
        if v is None or (isinstance(v, float) and v != v) or \
                (not isinstance(v, (bytes, str, list, np.ndarray))
                 and pd.isna(v)):
            continue
        out += struct.pack("<H", ci)
        if ct == _CT_BOOL:
            out += struct.pack("<B", 1 if v else 0)
        elif ct == _CT_LONG:
            out += struct.pack("<q", int(v))
        elif ct == _CT_DOUBLE:
            out += struct.pack("<d", float(v))
        elif ct == _CT_BINARY:
            b = bytes(v)
            out += struct.pack("<I", len(b)) + b
        else:
            b = str(v).encode("utf-8")
            out += struct.pack("<I", len(b)) + b
    return bytes(out)


def _build_header(specs, geometry_type: int, has_z: bool, count: int,
                  node_size: int, envelope, crs) -> bytes:
    fb = _FB()
    col_offs = []
    for name, ct in specs:
        noff = fb.string(name)
        col_offs.append(fb.table([(1, "u8", ct), (0, "ref", noff)]))
    cols_vec = fb.ref_vec(col_offs) if col_offs else None
    crs_off = None
    if crs and str(crs).upper().startswith("EPSG:"):
        org = fb.string("EPSG")
        crs_off = fb.table([(1, "i32", int(str(crs).split(":")[1])),
                            (0, "ref", org)])
    elif crs:
        wkt = fb.string(str(crs))
        crs_off = fb.table([(4, "ref", wkt)])
    env_off = fb.f64_vec(envelope) if envelope is not None else None
    name_off = fb.string("layer")
    fields = [(0, "ref", name_off)]
    if env_off:
        fields.append((1, "ref", env_off))
    if geometry_type:
        fields.append((2, "u8", geometry_type))
    if has_z:
        fields.append((3, "bool", 1))
    if cols_vec:
        fields.append((7, "ref", cols_vec))
    fields.append((8, "u64", count))
    fields.append((9, "u16", node_size))
    if crs_off:
        fields.append((10, "ref", crs_off))
    root = fb.table(sorted(fields, reverse=True))
    return fb.finish(root)


def _build_rtree(boxes: np.ndarray, feat_offsets: np.ndarray,
                 node_size: int) -> bytes:
    """Packed R-tree over Hilbert-ordered leaves: 40-byte nodes stored
    root-first, leaves last; an internal node's offset is the byte
    index of its first child within the index block (the published
    flatgeobuf layout)."""
    n = len(boxes)
    level_counts = [n]
    m = n
    while m != 1:
        m = (m + node_size - 1) // node_size
        level_counts.append(m)
    num_nodes = sum(level_counts)
    starts = []  # bottom-up level i -> first node index in final array
    acc = num_nodes
    for cnt in level_counts:
        acc -= cnt
        starts.append(acc)
    box = np.zeros((num_nodes, 4))
    off = np.zeros(num_nodes, dtype=np.uint64)
    box[starts[0]:starts[0] + n] = boxes
    off[starts[0]:starts[0] + n] = feat_offsets.astype(np.uint64)
    for lvl in range(1, len(level_counts)):
        cs, cn = starts[lvl - 1], level_counts[lvl - 1]
        ps = starts[lvl]
        for k in range(level_counts[lvl]):
            c0 = cs + k * node_size
            c1 = min(c0 + node_size, cs + cn)
            box[ps + k, 0] = box[c0:c1, 0].min()
            box[ps + k, 1] = box[c0:c1, 1].min()
            box[ps + k, 2] = box[c0:c1, 2].max()
            box[ps + k, 3] = box[c0:c1, 3].max()
            off[ps + k] = np.uint64(c0 * NODE_BYTES)
    out = bytearray()
    for i in range(num_nodes):
        out += struct.pack("<4dQ", *box[i], int(off[i]))
    return bytes(out)


def to_flatgeobuf(gdf_or_df, path: str, filesystem=None,
                  node_size: int = _DEFAULT_NODE_SIZE,
                  use_z: bool = True) -> None:
    """Write one ``part-*.fgb`` per partition into ``path``.

    Each file's features are sorted by Hilbert distance of their bbox
    centers over the partition extent and a packed R-tree index is
    written, so the files read back chunk-parallel AND bbox-prunable —
    the properties the engine's own ``read_flatgeobuf`` exploits.
    Null geometries are written as geometry-less features with a
    (0,0,0,0) leaf bbox: attributes round-trip on unfiltered reads,
    but a ``bbox=`` read excludes them (no envelope — the reader's
    exact refinement drops them) — filter nulls first when that
    matters.
    """
    from ..geometry import curves as C

    df = gdf_or_df.df if hasattr(gdf_or_df, "df") else gdf_or_df
    geometry = getattr(gdf_or_df, "geometry_column", "geometry")
    crs = getattr(gdf_or_df, "crs", None)
    FS.makedirs(path, filesystem)
    prop_cols = [c for c in df.columns if c != geometry]
    types = {f.name: f.dataType for f in df.schema.fields}
    specs = [(c, _column_type_for(types[c])) for c in prop_cols]

    def write_part(batches):
        import uuid

        from dask_geopandas_spark.sources import fs as _FS

        pdfs = list(batches)
        if pdfs and sum(len(p) for p in pdfs):
            pdf = pd.concat(pdfs, ignore_index=True)
            blobs = list(pdf[geometry]) if geometry in pdf \
                else [None] * len(pdf)
            batch = W.parse_wkb(blobs)
            first = np.searchsorted(batch.path_geom, np.arange(batch.n),
                                    "left")
            last = np.searchsorted(batch.path_geom, np.arange(batch.n),
                                   "right")
            # per-feature bbox from the coordinate slices
            boxes = np.zeros((batch.n, 4))
            for i in range(batch.n):
                s = int(batch.path_offsets[first[i]]) \
                    if first[i] < last[i] else 0
                e = int(batch.path_offsets[last[i]]) \
                    if first[i] < last[i] else 0
                if e > s:
                    boxes[i] = (np.nanmin(batch.xs[s:e]),
                                np.nanmin(batch.ys[s:e]),
                                np.nanmax(batch.xs[s:e]),
                                np.nanmax(batch.ys[s:e]))
            tb = (float(np.nanmin(boxes[:, 0])), float(np.nanmin(boxes[:, 1])),
                  float(np.nanmax(boxes[:, 2])), float(np.nanmax(boxes[:, 3])))
            order = np.argsort(C.hilbert_from_bounds(
                boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3],
                tb, level=16), kind="stable")

            has_z = bool(use_z and batch.zs is not None
                         and np.any(~np.isnan(batch.zs)))
            tset = {int(t) for t in batch.types if t}
            uniform = tset.pop() if len(tset) == 1 else 0

            feats, offs = [], []
            pos = 0
            rows = pdf.to_dict("records")
            for i in order:
                i = int(i)
                fb = _FB()
                fields = []
                props = _props_blob(rows[i], specs)
                if props:
                    fields.append((1, "ref", fb.bytes_vec(props)))
                g = _geom_table(fb, batch, i, int(first[i]), int(last[i]),
                                uniform, has_z)
                if g is not None:
                    fields.append((0, "ref", g))
                payload = fb.finish(fb.table(sorted(fields, reverse=True)))
                rec = struct.pack("<I", len(payload)) + payload
                feats.append(rec)
                offs.append(pos)
                pos += len(rec)

            hdr = _build_header(specs, uniform, has_z, batch.n, node_size,
                                np.asarray(tb), crs)
            index = _build_rtree(boxes[order], np.asarray(offs), node_size)
            out = MAGIC + struct.pack("<I", len(hdr)) + hdr + index \
                + b"".join(feats)
            stem = f"part-{uuid.uuid4().hex}.fgb"
            with _FS.open_output(_FS.join(path, stem), filesystem) as f:
                f.write(out)
        yield pd.DataFrame({"files": pd.Series([1], dtype="int64")})

    df.mapInPandas(write_part, schema="files long").collect()
