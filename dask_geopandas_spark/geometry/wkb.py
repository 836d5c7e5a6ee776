"""Pure-numpy WKB codec and columnar geometry batches.

The reference engine (dask-geopandas) delegates every geometry operation to
shapely/GEOS per partition (reference: expr.py:155-171).  GEOS is not
available in this environment, so this module provides the equivalent
substrate: parse a pandas Series of WKB ``bytes`` into a *columnar* batch
(flat coordinate buffers + ragged offsets, the same layout shapely 2.x uses
internally) on which `algorithms.py` runs vectorized numpy kernels.

Wire format (matching the reference's cross-process choice, backends.py:71-78):
ISO WKB, little-endian preferred; big-endian and EWKB Z-flags are accepted on
input.  Geometry types: 1 Point, 2 LineString, 3 Polygon, 4 MultiPoint,
5 MultiLineString, 6 MultiPolygon, 7 GeometryCollection; +1000 (ISO) or
0x80000000 (EWKB) marks Z.

Null semantics (reference §1.3): missing geometry = SQL NULL (None).  Empty
geometry = typed WKB with zero parts/coords (e.g. ``POINT EMPTY`` encodes as
a point with NaN coords, per GeoParquet convention).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Iterable

import numpy as np

# geometry type ids
POINT = 1
LINESTRING = 2
POLYGON = 3
MULTIPOINT = 4
MULTILINESTRING = 5
MULTIPOLYGON = 6
GEOMETRYCOLLECTION = 7

TYPE_NAMES = {
    0: None,
    POINT: "Point",
    LINESTRING: "LineString",
    POLYGON: "Polygon",
    MULTIPOINT: "MultiPoint",
    MULTILINESTRING: "MultiLineString",
    MULTIPOLYGON: "MultiPolygon",
    GEOMETRYCOLLECTION: "GeometryCollection",
}

# path kinds
PK_POINT = 0       # a single coordinate (Point or MultiPoint member)
PK_LINE = 1        # an open coordinate sequence (LineString / member)
PK_RING_OUTER = 2  # polygon outer ring (closed)
PK_RING_HOLE = 3   # polygon hole ring (closed)

_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000


@dataclass
class GeometryBatch:
    """Columnar decomposition of ``n`` geometries.

    Coordinates of all paths of all geometries are concatenated row-major in
    ``xs``/``ys`` (and ``zs`` when any input had Z).  ``path_offsets`` is the
    ragged boundary array into the coordinate buffers; each path carries the
    geometry index it belongs to, its kind, and (for polygon rings) the part
    index so holes attach to the right outer ring.
    """

    n: int
    # int8: 0 = null, otherwise base geometry type id 1..7
    types: np.ndarray
    has_z: np.ndarray           # bool per geometry
    xs: np.ndarray              # float64 (P,)
    ys: np.ndarray              # float64 (P,)
    zs: np.ndarray | None       # float64 (P,) or None if all-2D batch
    path_offsets: np.ndarray    # int64 (R+1,) into coord buffers
    path_geom: np.ndarray       # int64 (R,) geometry index per path
    path_kind: np.ndarray       # int8 (R,)
    path_part: np.ndarray       # int32 (R,) polygon-part index within geometry
    # per-geometry contiguous coordinate ranges (paths are emitted in order)
    geom_coord_starts: np.ndarray = field(default=None)  # int64 (n+1,)
    # raw input bytes (for structure-preserving coordinate rewrites)
    raw: list = field(default=None, repr=False)
    # per row: list of (byte_offset, n_coords, ndim) little-endian coord runs,
    # or None if the row needs canonical re-encoding (big-endian input)
    coord_runs: list = field(default=None, repr=False)

    # ------------------------------------------------------------------
    @property
    def n_paths(self) -> int:
        return len(self.path_geom)

    def path_lengths(self) -> np.ndarray:
        return np.diff(self.path_offsets)

    def coord_geom_index(self) -> np.ndarray:
        """Geometry index for every coordinate (vectorized repeat)."""
        return np.repeat(self.path_geom, self.path_lengths())

    def geom_coord_counts(self) -> np.ndarray:
        return np.diff(self.geom_coord_starts)

    def is_null(self) -> np.ndarray:
        return self.types == 0

    def is_empty(self) -> np.ndarray:
        """Empty = typed geometry with no finite coordinates."""
        counts = self.geom_coord_counts()
        empty = (counts == 0) & (self.types != 0)
        # POINT EMPTY is encoded as a NaN-coord point
        if len(self.xs):
            starts = self.geom_coord_starts[:-1]
            one = (counts == 1) & (self.types == POINT)
            idx = np.clip(starts, 0, max(len(self.xs) - 1, 0))
            nan_pt = one & np.isnan(self.xs[idx])
            empty |= nan_pt
        return empty


# ======================================================================
# Parsing
# ======================================================================

def _parse_header(buf: memoryview, pos: int):
    bo = buf[pos]
    fmt = "<" if bo == 1 else ">"
    (code,) = struct.unpack_from(fmt + "I", buf, pos + 1)
    srid = None
    has_z = False
    if code & (_EWKB_Z | _EWKB_M | _EWKB_SRID):  # EWKB flags
        if code & _EWKB_SRID:
            (srid,) = struct.unpack_from(fmt + "I", buf, pos + 5)
            pos += 4
        has_z = bool(code & _EWKB_Z)
        base = code & 0xFF
    else:
        base = code % 1000
        dims = code // 1000
        has_z = dims in (1, 3)  # 1000=Z, 3000=ZM
    pos += 5
    return fmt, base, has_z, pos


class _RowParser:
    """Parses one WKB blob into paths appended to shared builders."""

    __slots__ = ("mv", "coords", "paths", "runs", "le_only")

    def __init__(self, mv: memoryview):
        self.mv = mv
        self.coords: list[np.ndarray] = []
        self.paths: list[tuple[int, int, int]] = []  # (kind, part, ncoords)
        self.runs: list[tuple[int, int, int]] = []
        self.le_only = True

    def _read_coords(self, fmt: str, pos: int, n: int, ndim: int):
        nb = n * ndim * 8
        if fmt == "<":
            arr = np.frombuffer(self.mv, dtype="<f8", count=n * ndim, offset=pos)
        else:
            arr = np.frombuffer(self.mv, dtype=">f8", count=n * ndim, offset=pos).astype("f8")
            self.le_only = False
        self.runs.append((pos, n, ndim))
        return arr.reshape(n, ndim), pos + nb

    def parse(self, pos: int = 0, part: int = 0) -> tuple[int, int, bool]:
        fmt, base, has_z, pos = _parse_header(self.mv, pos)
        ndim = 3 if has_z else 2
        if base == POINT:
            arr, pos = self._read_coords(fmt, pos, 1, ndim)
            self.coords.append(arr)
            self.paths.append((PK_POINT, part, 1))
        elif base == LINESTRING:
            (n,) = struct.unpack_from(fmt + "I", self.mv, pos)
            pos += 4
            arr, pos = self._read_coords(fmt, pos, n, ndim)
            self.coords.append(arr)
            self.paths.append((PK_LINE, part, n))
        elif base == POLYGON:
            (nrings,) = struct.unpack_from(fmt + "I", self.mv, pos)
            pos += 4
            for r in range(nrings):
                (n,) = struct.unpack_from(fmt + "I", self.mv, pos)
                pos += 4
                arr, pos = self._read_coords(fmt, pos, n, ndim)
                self.coords.append(arr)
                self.paths.append(
                    (PK_RING_OUTER if r == 0 else PK_RING_HOLE, part, n)
                )
        elif base in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION):
            (nparts,) = struct.unpack_from(fmt + "I", self.mv, pos)
            pos += 4
            for p in range(nparts):
                pos, _, hz = self.parse(pos, part=part + p)
                has_z = has_z or hz
        else:
            raise ValueError(f"unsupported WKB geometry type code {base}")
        return pos, base, has_z


_POINT2D_HEAD = b"\x01\x01\x00\x00\x00"


def _parse_point_batch(vals: list) -> GeometryBatch:
    """Vectorized decode of an all-2D-point batch (21-byte LE WKB rows):
    one frombuffer over the concatenated bytes instead of a per-row parse.
    This is the hot path for point datasets — ~100x the generic parser."""
    n = len(vals)
    buf = np.frombuffer(b"".join(vals), dtype=np.uint8).reshape(n, 21)
    xs = np.ascontiguousarray(buf[:, 5:13]).view("<f8").ravel().astype(np.float64)
    ys = np.ascontiguousarray(buf[:, 13:21]).view("<f8").ravel().astype(np.float64)
    ar = np.arange(n + 1, dtype=np.int64)
    return GeometryBatch(
        n=n,
        types=np.full(n, POINT, dtype=np.int8),
        has_z=np.zeros(n, dtype=bool),
        xs=xs,
        ys=ys,
        zs=None,
        path_offsets=ar,
        path_geom=ar[:-1],
        path_kind=np.zeros(n, dtype=np.int8),
        path_part=np.zeros(n, dtype=np.int32),
        geom_coord_starts=ar,
        raw=vals,
        coord_runs=[[(5, 1, 2)]] * n,
    )


# LE 2D polygon, 1 ring, 5 points: 1 + 4 + 4 + 4 + 5·16 = 93 bytes
_RING5_HEAD = b"\x01\x03\x00\x00\x00\x01\x00\x00\x00\x05\x00\x00\x00"


def _parse_ring5_batch(vals: list) -> GeometryBatch:
    """Vectorized decode of an all-single-ring-5-point-polygon batch (the
    shape of every axis-aligned box / envelope / quad, 93-byte LE WKB):
    one frombuffer instead of a per-row parse — the hot path for the box
    side of grid spatial joins."""
    n = len(vals)
    buf = np.frombuffer(b"".join(vals), dtype=np.uint8).reshape(n, 93)
    coords = np.ascontiguousarray(buf[:, 13:93]).view("<f8").reshape(n, 5, 2)
    xs = np.ascontiguousarray(coords[:, :, 0]).ravel().astype(np.float64)
    ys = np.ascontiguousarray(coords[:, :, 1]).ravel().astype(np.float64)
    off = np.arange(n + 1, dtype=np.int64) * 5
    return GeometryBatch(
        n=n,
        types=np.full(n, POLYGON, dtype=np.int8),
        has_z=np.zeros(n, dtype=bool),
        xs=xs,
        ys=ys,
        zs=None,
        path_offsets=off,
        path_geom=np.arange(n, dtype=np.int64),
        path_kind=np.full(n, PK_RING_OUTER, dtype=np.int8),
        path_part=np.zeros(n, dtype=np.int32),
        geom_coord_starts=off,
        raw=vals,
        coord_runs=[[(13, 5, 2)]] * n,
    )


def parse_wkb(values: Iterable, keep_raw: bool = True) -> GeometryBatch:
    """Parse an iterable of WKB ``bytes`` / ``None`` into a GeometryBatch."""
    vals = list(values)
    n = len(vals)
    if n:
        v0 = vals[0]
        if (v0 is not None and not isinstance(v0, float) and len(v0) == 21
                and all(
                    v is not None and not isinstance(v, float)
                    and len(v) == 21 and bytes(v[:5]) == _POINT2D_HEAD
                    for v in vals
                )):
            return _parse_point_batch([bytes(v) for v in vals])
        if (v0 is not None and not isinstance(v0, float) and len(v0) == 93
                and all(
                    v is not None and not isinstance(v, float)
                    and len(v) == 93 and bytes(v[:13]) == _RING5_HEAD
                    for v in vals
                )):
            return _parse_ring5_batch([bytes(v) for v in vals])
    types = np.zeros(n, dtype=np.int8)
    has_z = np.zeros(n, dtype=bool)
    all_coords: list[np.ndarray] = []
    path_lens: list[int] = []
    path_geom: list[int] = []
    path_kind: list[int] = []
    path_part: list[int] = []
    geom_counts = np.zeros(n, dtype=np.int64)
    coord_runs: list = [None] * n
    any_z = False

    for i, v in enumerate(vals):
        if v is None or (isinstance(v, float) and np.isnan(v)):
            continue
        b = bytes(v)
        rp = _RowParser(memoryview(b))
        _, base, hz = rp.parse()
        types[i] = base
        has_z[i] = hz
        any_z = any_z or hz
        total = 0
        for arr, (kind, part, cnt) in zip(rp.coords, rp.paths):
            all_coords.append(arr)
            path_lens.append(cnt)
            path_geom.append(i)
            path_kind.append(kind)
            path_part.append(part)
            total += cnt
        geom_counts[i] = total
        if rp.le_only:
            coord_runs[i] = rp.runs
        vals[i] = b

    if all_coords:
        widths = [c.shape[1] for c in all_coords]
        if any_z and min(widths) == 2:
            all_coords = [
                np.hstack([c, np.full((len(c), 1), np.nan)]) if c.shape[1] == 2 else c
                for c in all_coords
            ]
        cat = np.concatenate(all_coords, axis=0) if all_coords else np.empty((0, 2))
    else:
        cat = np.empty((0, 3 if any_z else 2))
    xs = np.ascontiguousarray(cat[:, 0], dtype=np.float64)
    ys = np.ascontiguousarray(cat[:, 1], dtype=np.float64)
    zs = np.ascontiguousarray(cat[:, 2], dtype=np.float64) if (any_z and cat.shape[1] > 2) else None

    path_offsets = np.zeros(len(path_lens) + 1, dtype=np.int64)
    np.cumsum(path_lens, out=path_offsets[1:])
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(geom_counts, out=starts[1:])

    return GeometryBatch(
        n=n,
        types=types,
        has_z=has_z,
        xs=xs,
        ys=ys,
        zs=zs,
        path_offsets=path_offsets,
        path_geom=np.asarray(path_geom, dtype=np.int64),
        path_kind=np.asarray(path_kind, dtype=np.int8),
        path_part=np.asarray(path_part, dtype=np.int32),
        geom_coord_starts=starts,
        raw=vals if keep_raw else None,
        coord_runs=coord_runs,
    )


# ======================================================================
# Serialization
# ======================================================================

def boxes_to_wkb(minx, miny, maxx, maxy) -> list:
    """Vectorized construction of axis-aligned-box POLYGON WKB (93-byte
    rows, CCW ring closed on the first corner) — one numpy allocation for
    the whole batch, mirroring :func:`points_to_wkb`."""
    minx = np.asarray(minx, dtype=np.float64)
    miny = np.asarray(miny, dtype=np.float64)
    maxx = np.asarray(maxx, dtype=np.float64)
    maxy = np.asarray(maxy, dtype=np.float64)
    n = len(minx)
    buf = np.empty((n, 93), dtype=np.uint8)
    buf[:, 0:13] = np.frombuffer(
        b"\x01" + struct.pack("<I", POLYGON) + struct.pack("<I", 1)
        + struct.pack("<I", 5),
        dtype=np.uint8,
    )
    ring = np.empty((n, 5, 2), dtype=np.float64)
    ring[:, 0, 0] = minx; ring[:, 0, 1] = miny
    ring[:, 1, 0] = maxx; ring[:, 1, 1] = miny
    ring[:, 2, 0] = maxx; ring[:, 2, 1] = maxy
    ring[:, 3, 0] = minx; ring[:, 3, 1] = maxy
    ring[:, 4, 0] = minx; ring[:, 4, 1] = miny
    buf[:, 13:93] = ring.reshape(n, 10).view(np.uint8)
    data = buf.tobytes()
    return [data[i * 93:(i + 1) * 93] for i in range(n)]


def points_to_wkb(x: np.ndarray, y: np.ndarray, z: np.ndarray | None = None) -> list:
    """Vectorized construction of POINT WKB for whole arrays at once.

    Builds the full byte matrix in one numpy allocation; the only per-row
    work is slicing out ``bytes`` objects.  Returns a list (None where x or
    y is NaN-and-null is NOT inferred here: callers mask nulls themselves).
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = len(x)
    if z is None:
        buf = np.empty((n, 21), dtype=np.uint8)
        buf[:, 0] = 1
        buf[:, 1:5] = np.frombuffer(struct.pack("<I", POINT), dtype=np.uint8)
        buf[:, 5:13] = x.view(np.uint8).reshape(n, 8)
        buf[:, 13:21] = y.view(np.uint8).reshape(n, 8)
    else:
        z = np.asarray(z, dtype=np.float64)
        buf = np.empty((n, 29), dtype=np.uint8)
        buf[:, 0] = 1
        buf[:, 1:5] = np.frombuffer(struct.pack("<I", POINT + 1000), dtype=np.uint8)
        buf[:, 5:13] = x.view(np.uint8).reshape(n, 8)
        buf[:, 13:21] = y.view(np.uint8).reshape(n, 8)
        buf[:, 21:29] = z.view(np.uint8).reshape(n, 8)
    return [r.tobytes() for r in buf]


def _ring_bytes(arr: np.ndarray) -> bytes:
    return struct.pack("<I", len(arr)) + np.ascontiguousarray(arr, dtype="<f8").tobytes()


def serialize_geometry(kind: int, parts, has_z: bool = False) -> bytes:
    """Serialize one geometry from numpy parts.

    ``parts`` layout by kind:
      POINT            -> (1, ndim) array
      LINESTRING       -> (n, ndim) array
      POLYGON          -> list of ring arrays (outer first)
      MULTIPOINT       -> (n, ndim) array (one row per member)
      MULTILINESTRING  -> list of line arrays
      MULTIPOLYGON     -> list of list-of-ring arrays
      GEOMETRYCOLLECTION -> list of (kind, parts) tuples
    """
    code = kind + (1000 if has_z else 0)
    head = b"\x01" + struct.pack("<I", code)
    if kind == POINT:
        arr = np.asarray(parts, dtype="<f8").reshape(-1)
        if arr.size == 0:
            arr = np.full(3 if has_z else 2, np.nan)
        return head + arr.tobytes()
    if kind == LINESTRING:
        return head + _ring_bytes(np.atleast_2d(parts))
    if kind == POLYGON:
        body = struct.pack("<I", len(parts))
        for ring in parts:
            body += _ring_bytes(np.atleast_2d(ring))
        return head + body
    if kind == MULTIPOINT:
        arr = np.atleast_2d(parts)
        body = struct.pack("<I", len(arr))
        for row in arr:
            body += serialize_geometry(POINT, row, has_z)
        return head + body
    if kind == MULTILINESTRING:
        body = struct.pack("<I", len(parts))
        for line in parts:
            body += serialize_geometry(LINESTRING, line, has_z)
        return head + body
    if kind == MULTIPOLYGON:
        body = struct.pack("<I", len(parts))
        for rings in parts:
            body += serialize_geometry(POLYGON, rings, has_z)
        return head + body
    if kind == GEOMETRYCOLLECTION:
        body = struct.pack("<I", len(parts))
        for k, p in parts:
            body += serialize_geometry(k, p, has_z)
        return head + body
    raise ValueError(f"bad kind {kind}")


def rewrite_coords(batch: GeometryBatch, new_xs, new_ys, new_zs=None) -> list:
    """Structure-preserving coordinate rewrite.

    Copies each row's original WKB and patches the coordinate doubles in
    place (positions recorded at parse time).  This is how affine
    transforms / reprojection keep exact geometry structure without a full
    re-serialization.  Rows parsed from big-endian input fall back to
    canonical re-encode via `rebuild_row`.
    """
    out: list = [None] * batch.n
    new_xs = np.asarray(new_xs, dtype=np.float64)
    new_ys = np.asarray(new_ys, dtype=np.float64)
    starts = batch.geom_coord_starts
    for i in range(batch.n):
        if batch.types[i] == 0:
            continue
        c0, c1 = starts[i], starts[i + 1]
        runs = batch.coord_runs[i] if batch.coord_runs else None
        if runs is None:
            out[i] = rebuild_row(batch, i, new_xs, new_ys, new_zs)
            continue
        buf = bytearray(batch.raw[i])
        ci = c0
        for (off, ncoords, ndim) in runs:
            seg = np.empty((ncoords, ndim), dtype="<f8")
            seg[:, 0] = new_xs[ci:ci + ncoords]
            seg[:, 1] = new_ys[ci:ci + ncoords]
            if ndim >= 3:
                src = new_zs if new_zs is not None else (
                    batch.zs[ci:ci + ncoords] if batch.zs is not None else np.nan
                )
                seg[:, 2] = src if new_zs is None else new_zs[ci:ci + ncoords]
            buf[off:off + ncoords * ndim * 8] = seg.tobytes()
            ci += ncoords
        out[i] = bytes(buf)
    return out


def rebuild_row(batch: GeometryBatch, i: int, xs=None, ys=None, zs=None) -> bytes:
    """Canonical little-endian re-encode of row ``i`` from batch arrays."""
    xs = batch.xs if xs is None else xs
    ys = batch.ys if ys is None else ys
    hz = bool(batch.has_z[i]) and batch.zs is not None
    zcol = (batch.zs if zs is None else zs) if hz else None
    sel = np.flatnonzero(batch.path_geom == i)
    t = int(batch.types[i])

    def seg(p):
        s, e = batch.path_offsets[p], batch.path_offsets[p + 1]
        cols = [xs[s:e], ys[s:e]] + ([zcol[s:e]] if hz else [])
        return np.column_stack(cols)

    if t == POINT:
        return serialize_geometry(POINT, seg(sel[0]) if len(sel) else np.empty((0, 2)), hz)
    if t == LINESTRING:
        return serialize_geometry(LINESTRING, seg(sel[0]) if len(sel) else np.empty((0, 2)), hz)
    if t == POLYGON:
        return serialize_geometry(POLYGON, [seg(p) for p in sel], hz)
    if t == MULTIPOINT:
        pts = np.vstack([seg(p) for p in sel]) if len(sel) else np.empty((0, 2))
        return serialize_geometry(MULTIPOINT, pts, hz)
    if t == MULTILINESTRING:
        return serialize_geometry(MULTILINESTRING, [seg(p) for p in sel], hz)
    if t == MULTIPOLYGON:
        rings_by_part: dict[int, list] = {}
        for p in sel:
            rings_by_part.setdefault(int(batch.path_part[p]), []).append(seg(p))
        return serialize_geometry(MULTIPOLYGON, list(rings_by_part.values()), hz)
    if t == GEOMETRYCOLLECTION:
        members: list = []
        for p in sel:
            k = batch.path_kind[p]
            if k == PK_POINT:
                members.append((POINT, seg(p)))
            elif k == PK_LINE:
                members.append((LINESTRING, seg(p)))
            else:  # ring → polygon member (single-ring approximation)
                members.append((POLYGON, [seg(p)]))
        return serialize_geometry(GEOMETRYCOLLECTION, members, hz)
    raise ValueError(f"bad type {t}")
