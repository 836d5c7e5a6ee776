"""Vectorized pandas UDFs exposing the geometry kernel to Spark.

This is the Spark analog of the reference's per-partition delegation to
geopandas/shapely (reference: expr.py:155-171, 947-1013): every function
receives Arrow-batched pandas Series of WKB bytes, runs the numpy kernels
in `..geometry`, and returns Arrow batches.  All functions are
whole-column vectorized — no per-row Python in the hot path beyond WKB
structure parsing (which is O(bytes), the same cost shapely pays).

Scalar parameters (buffer distance, simplify tolerance, …) use factory
functions returning a configured UDF, because pandas UDFs only accept
Column arguments.
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..geometry import algorithms as A
from ..geometry import curves as C
from ..geometry import setops as SO
from ..geometry import wkb as W
from ..geometry import wkt as T

BBOX_SCHEMA = "minx double, miny double, maxx double, maxy double"
BBOX_TYPE = StructType([
    StructField("minx", DoubleType()),
    StructField("miny", DoubleType()),
    StructField("maxx", DoubleType()),
    StructField("maxy", DoubleType()),
])


def _b(g: pd.Series) -> W.GeometryBatch:
    return W.parse_wkb(list(g))


def _mask_null(batch: W.GeometryBatch, values: np.ndarray) -> pd.Series:
    out = pd.Series(values, dtype="float64")
    out[batch.is_null()] = None
    return out


# ----------------------------------------------------------------------
# constructors
# ----------------------------------------------------------------------

@pandas_udf(BinaryType())
def st_point(x: pd.Series, y: pd.Series) -> pd.Series:
    xs = x.to_numpy(dtype=np.float64, na_value=np.nan)
    ys = y.to_numpy(dtype=np.float64, na_value=np.nan)
    blobs = W.points_to_wkb(xs, ys)
    bad = np.isnan(xs) | np.isnan(ys)
    if bad.any():
        blobs = [None if m else b for b, m in zip(blobs, bad)]
    return pd.Series(blobs, dtype=object)


@pandas_udf(BinaryType())
def st_point_z(x: pd.Series, y: pd.Series, z: pd.Series) -> pd.Series:
    xs = x.to_numpy(dtype=np.float64, na_value=np.nan)
    ys = y.to_numpy(dtype=np.float64, na_value=np.nan)
    zs = z.to_numpy(dtype=np.float64, na_value=np.nan)
    blobs = W.points_to_wkb(xs, ys, zs)
    bad = np.isnan(xs) | np.isnan(ys)
    if bad.any():
        blobs = [None if m else b for b, m in zip(blobs, bad)]
    return pd.Series(blobs, dtype=object)


@pandas_udf(BinaryType())
def st_geomfromtext(wkt_col: pd.Series) -> pd.Series:
    return pd.Series([T.wkt_to_wkb(v) for v in wkt_col], dtype=object)


@pandas_udf(BinaryType())
def st_make_box(minx: pd.Series, miny: pd.Series,
                maxx: pd.Series, maxy: pd.Series) -> pd.Series:
    """Axis-aligned box polygon from corner columns — fully vectorized
    construction (no WKT round-trip)."""
    mnx = minx.to_numpy(dtype=np.float64, na_value=np.nan)
    mny = miny.to_numpy(dtype=np.float64, na_value=np.nan)
    mxx = maxx.to_numpy(dtype=np.float64, na_value=np.nan)
    mxy = maxy.to_numpy(dtype=np.float64, na_value=np.nan)
    blobs = W.boxes_to_wkb(mnx, mny, mxx, mxy)
    bad = np.isnan(mnx) | np.isnan(mny) | np.isnan(mxx) | np.isnan(mxy)
    if bad.any():
        blobs = [None if m else b for b, m in zip(blobs, bad)]
    return pd.Series(blobs, dtype=object)


@pandas_udf(StringType())
def st_astext(g: pd.Series) -> pd.Series:
    batch = _b(g)
    return pd.Series([T._row_wkt(batch, i) for i in range(batch.n)], dtype=object)


@pandas_udf(BinaryType())
def st_geomfromwkb_hex(hexcol: pd.Series) -> pd.Series:
    return pd.Series(
        [bytes.fromhex(v) if v is not None else None for v in hexcol], dtype=object
    )


# ----------------------------------------------------------------------
# properties
# ----------------------------------------------------------------------

@pandas_udf(DoubleType())
def st_area(g: pd.Series) -> pd.Series:
    batch = _b(g)
    return _mask_null(batch, A.area(batch))


@pandas_udf(DoubleType())
def st_length(g: pd.Series) -> pd.Series:
    batch = _b(g)
    return _mask_null(batch, A.length(batch))


@pandas_udf(BBOX_TYPE)
def st_bounds(g: pd.Series) -> pd.DataFrame:
    batch = _b(g)
    bb = A.bounds(batch)
    return pd.DataFrame(
        {"minx": bb[:, 0], "miny": bb[:, 1], "maxx": bb[:, 2], "maxy": bb[:, 3]}
    )


@pandas_udf(StringType())
def st_geometrytype(g: pd.Series) -> pd.Series:
    batch = _b(g)
    return pd.Series([W.TYPE_NAMES[int(t)] for t in batch.types], dtype=object)


@pandas_udf(DoubleType())
def st_x(g: pd.Series) -> pd.Series:
    batch = _b(g)
    out = np.full(batch.n, np.nan)
    pts = (batch.types == W.POINT) & ~batch.is_empty()
    out[pts] = batch.xs[batch.geom_coord_starts[:-1][pts]]
    return _mask_null(batch, out)


@pandas_udf(DoubleType())
def st_y(g: pd.Series) -> pd.Series:
    batch = _b(g)
    out = np.full(batch.n, np.nan)
    pts = (batch.types == W.POINT) & ~batch.is_empty()
    out[pts] = batch.ys[batch.geom_coord_starts[:-1][pts]]
    return _mask_null(batch, out)


@pandas_udf(DoubleType())
def st_z(g: pd.Series) -> pd.Series:
    batch = _b(g)
    out = np.full(batch.n, np.nan)
    if batch.zs is not None:
        pts = (batch.types == W.POINT) & ~batch.is_empty() & batch.has_z
        out[pts] = batch.zs[batch.geom_coord_starts[:-1][pts]]
    return _mask_null(batch, out)


@pandas_udf(BooleanType())
def st_isempty(g: pd.Series) -> pd.Series:
    batch = _b(g)
    out = pd.Series(batch.is_empty(), dtype="boolean")
    out[batch.is_null()] = pd.NA
    return out


@pandas_udf(BooleanType())
def st_hasz(g: pd.Series) -> pd.Series:
    batch = _b(g)
    out = pd.Series(batch.has_z, dtype="boolean")
    out[batch.is_null()] = pd.NA
    return out


@pandas_udf(BooleanType())
def st_isring(g: pd.Series) -> pd.Series:
    """Closed LineString test (reference is_ring, expr.py:947-960).
    Segmented numpy over the whole Arrow batch: one gather per side of
    the closure comparison, no per-path Python loop."""
    batch = _b(g)
    out = np.zeros(batch.n, dtype=bool)
    if batch.n_paths:
        po = batch.path_offsets
        s, e = po[:-1], po[1:]
        cand = np.flatnonzero(
            (batch.types[batch.path_geom] == W.LINESTRING) & (e - s >= 4))
        if len(cand):
            closed = (batch.xs[s[cand]] == batch.xs[e[cand] - 1]) & \
                     (batch.ys[s[cand]] == batch.ys[e[cand] - 1])
            out[batch.path_geom[cand[closed]]] = True
    res = pd.Series(out, dtype="boolean")
    res[batch.is_null()] = pd.NA
    return res


# rings with more segments than this take the per-ring fallback so the
# flat all-pairs buffer stays bounded (cap² pairs per ring)
_VALID_RING_CAP = 512
# ... and the flat pass over small rings is chunked so ONE allocation
# never exceeds this many pairs (~4M pairs ≈ 100-200 MB of transient
# index/coord/hit arrays), regardless of how many rings a batch holds
_VALID_PAIR_BUDGET = 4_000_000


def _flat_self_pairs(nseg: np.ndarray):
    """(i, j, group) index arrays enumerating every within-group segment
    pair for groups of ``nseg`` consecutive segments — the segmented
    replacement for a per-group n×n broadcast."""
    npairs = nseg * nseg
    tot = int(npairs.sum())
    group = np.repeat(np.arange(len(nseg)), npairs)
    starts = np.concatenate([[0], np.cumsum(npairs)[:-1]])
    k = np.arange(tot) - starts[group]
    n_of = nseg[group]
    return k // n_of, k % n_of, group


@pandas_udf(BooleanType())
def st_isvalid(g: pd.Series) -> pd.Series:
    """OGC polygon validity (reference: shapely/GEOS ``is_valid``).
    Points/lines are always valid (matching GEOS).  Checks, in order:

    1. every ring closed and with >= 4 points (incl. the closing one);
    2. no ring self-intersects (bowtie / spike detection) — vectorized
       over the whole Arrow batch: all within-ring segment pairs of
       every (small) ring through one flat ``seg_seg_intersect_flat``
       call, pair buffer chunk-bounded; rings above ``_VALID_RING_CAP``
       fall back to a per-ring broadcast test;
    3. multi-ring taxonomy (only rows with >= 2 rings pay for it):
       rings must not cross or share edge runs; holes must lie inside
       their shell and not nest inside each other; multipolygon shells
       must not nest/overlap (a part inside another part's HOLE is
       valid); and the interior must be connected — ring touch points
       form a multigraph whose cycles (e.g. a hole chaining shell-touch
       to shell-touch) disconnect the interior (union-find)."""
    batch = _b(g)
    out = np.ones(batch.n, dtype=bool)
    po = batch.path_offsets
    is_poly_path = (
        np.isin(batch.types[batch.path_geom], (W.POLYGON, W.MULTIPOLYGON))
        & np.isin(batch.path_kind, (W.PK_RING_OUTER, W.PK_RING_HOLE)))
    # degenerate rings (fewer than 4 points incl. closing) → invalid
    out[batch.path_geom[is_poly_path & (po[1:] - po[:-1] < 4)]] = False
    ring = np.flatnonzero(is_poly_path & (po[1:] - po[:-1] >= 4))
    if len(ring):
        s, e = po[ring], po[ring + 1]
        owner = batch.path_geom[ring]
        closed = (batch.xs[s] == batch.xs[e - 1]) & \
                 (batch.ys[s] == batch.ys[e - 1])
        out[owner[~closed]] = False  # unclosed ring → invalid

        # a ring needs >= 3 distinct vertices: segmented count of
        # non-degenerate edges (vectorized over all rings at once)
        live = ((batch.xs[:-1] != batch.xs[1:])
                | (batch.ys[:-1] != batch.ys[1:])).astype(np.int64)
        cliv = np.concatenate([[0], np.cumsum(live)])
        out[owner[(cliv[e - 1] - cliv[s]) < 3]] = False

        nseg = (e - s - 1)[closed]
        rs, owner_c = s[closed], owner[closed]
        small = nseg <= _VALID_RING_CAP
        if small.any():
            # Chunk the flat pass so TOTAL pairs per allocation is
            # bounded (not just per ring): a batch of thousands of
            # mid-size rings would otherwise concatenate Σ nseg² pairs
            # into one multi-GB index/coord/hit allocation.
            sm = np.flatnonzero(small)
            ccum = np.cumsum(nseg[sm].astype(np.int64) ** 2)
            start = 0
            while start < len(sm):
                base = int(ccum[start - 1]) if start else 0
                end = int(np.searchsorted(
                    ccum, base + _VALID_PAIR_BUDGET, side="right"))
                end = max(end, start + 1)
                idx = sm[start:end]
                start = end
                ns, st_, ow = nseg[idx], rs[idx], owner_c[idx]
                seg0 = np.concatenate([[0], np.cumsum(ns)[:-1]])
                ci = np.repeat(st_, ns) + (np.arange(int(ns.sum()))
                                           - np.repeat(seg0, ns))
                x1, y1 = batch.xs[ci], batch.ys[ci]
                x2, y2 = batch.xs[ci + 1], batch.ys[ci + 1]
                i, j, grp = _flat_self_pairs(ns)
                gi, gj = i + seg0[grp], j + seg0[grp]
                hits = A.seg_seg_intersect_flat(
                    x1[gi], y1[gi], x2[gi], y2[gi],
                    x1[gj], y1[gj], x2[gj], y2[gj])
                n_of = ns[grp]
                # adjacent segments legitimately touch at shared vertices
                adj = (np.abs(i - j) <= 1) | \
                      ((i == 0) & (j == n_of - 1)) | \
                      ((j == 0) & (i == n_of - 1))
                out[ow[grp[hits & ~adj]]] = False
        for k in np.flatnonzero(~small):  # oversized rings, bounded memory
            s0, n = int(rs[k]), int(nseg[k])
            x1 = batch.xs[s0:s0 + n]; y1 = batch.ys[s0:s0 + n]
            x2 = batch.xs[s0 + 1:s0 + n + 1]; y2 = batch.ys[s0 + 1:s0 + n + 1]
            hits = A.seg_seg_intersect(x1, y1, x2, y2, x1, y1, x2, y2)
            adj = np.abs(np.arange(n)[:, None] - np.arange(n)[None, :]) <= 1
            adj[0, n - 1] = adj[n - 1, 0] = True
            if (hits & ~adj).any():
                out[owner_c[k]] = False
    # multi-ring taxonomy for rows still valid with >= 2 rings
    ring_counts = np.bincount(batch.path_geom[is_poly_path],
                              minlength=batch.n)
    for gi in np.flatnonzero(out & (ring_counts >= 2)):
        if not _multi_ring_valid(batch, int(gi)):
            out[gi] = False
    res = pd.Series(out, dtype="boolean")
    res[batch.is_null()] = pd.NA
    return res


def _ring_segs(x: np.ndarray, y: np.ndarray):
    """(x1, y1, x2, y2) of a closed ring's non-degenerate edges."""
    x1, y1, x2, y2 = x[:-1], y[:-1], x[1:], y[1:]
    nz = (x1 != x2) | (y1 != y2)
    return x1[nz], y1[nz], x2[nz], y2[nz]


def _touch_points(xa, ya, sa, xb, yb, sb) -> set:
    """Distinct contact points between two non-crossing rings: vertices
    of one lying on the other's boundary (tangency between straight
    edges without crossing is always at a vertex or is a collinear
    overlap, which the caller rejects first)."""
    pts: set = set()
    for (px, py), segs in (((xa, ya), sb), ((xb, yb), sa)):
        if len(segs[0]) == 0 or len(px) <= 1:
            continue
        d = A._point_seg_dist(px[:-1], py[:-1],
                              *segs).min(axis=1)
        for k in np.flatnonzero(d == 0):
            pts.add((float(px[k]), float(py[k])))
    return pts


def _multi_ring_valid(batch: W.GeometryBatch, i: int) -> bool:
    """Pairwise ring taxonomy for one (multi)polygon — see st_isvalid."""
    # parts: [(shell_ring, [hole_rings...]), ...] with coordinate arrays
    parts: list = []
    for p in np.flatnonzero(batch.path_geom == i):
        if batch.path_kind[p] not in (W.PK_RING_OUTER, W.PK_RING_HOLE):
            continue
        s, e = batch.path_offsets[p], batch.path_offsets[p + 1]
        x, y = batch.xs[s:e], batch.ys[s:e]
        if batch.path_kind[p] == W.PK_RING_OUTER:
            parts.append((x, y, []))
        elif parts:
            parts[-1][2].append((x, y))

    # flatten with (part_idx, ring_idx) labels; ring 0 = shell
    rings = []
    for pi, (sx, sy, holes) in enumerate(parts):
        rings.append((pi, 0, sx, sy, _ring_segs(sx, sy)))
        for ri, (hx, hy) in enumerate(holes, start=1):
            rings.append((pi, ri, hx, hy, _ring_segs(hx, hy)))

    def strictly_inside(px, py, ring):
        _, _, x, y, segs = ring
        inside = A.point_in_rings(np.asarray([px]), np.asarray([py]),
                                  [(x, y)])[0]
        if not inside or len(segs[0]) == 0:
            return bool(inside)
        d = A._point_seg_dist(np.asarray([px]), np.asarray([py]),
                              *segs).min()
        return d > 0

    def some_strict_vertex(ra, rb):
        """A vertex of ring a strictly inside ring b (None if every
        vertex is on b's boundary)."""
        _, _, ax, ay, _ = ra
        for k in range(len(ax) - 1):
            if strictly_inside(ax[k], ay[k], rb):
                return True
        return False

    # pairwise: no crossings, no shared edge runs; collect touch points
    from collections import defaultdict

    touch: dict = defaultdict(set)
    for a in range(len(rings)):
        for b in range(a + 1, len(rings)):
            ra, rb = rings[a], rings[b]
            if SO._proper_crossing(ra[4], rb[4]):
                return False
            if SO._collinear_overlap(ra[4], rb[4]):
                return False
            pts = _touch_points(ra[2], ra[3], ra[4], rb[2], rb[3], rb[4])
            if pts:
                touch[(a, b)] = pts

    for a, (pa, ria, ax, ay, sega) in enumerate(rings):
        for b, (pb, rib, bx, by, segb) in enumerate(rings):
            if a == b:
                continue
            if pa == pb:
                if ria == 0 and rib > 0:
                    # hole must sit inside-or-on its shell
                    for k in range(len(bx) - 1):
                        inside = A.point_in_rings(
                            np.asarray([bx[k]]), np.asarray([by[k]]),
                            [(ax, ay)])[0]
                        on = A._point_seg_dist(
                            np.asarray([bx[k]]), np.asarray([by[k]]),
                            *sega).min() == 0
                        if not inside and not on:
                            return False
                elif 0 < ria < rib:
                    # sibling holes: interiors disjoint (touching ok)
                    if some_strict_vertex(rings[b], rings[a]) or \
                            some_strict_vertex(rings[a], rings[b]):
                        return False
            elif ria == 0 and rib == 0 and a < b:
                # different parts: shell strictly inside the other
                # part's FILLED region (even-odd over all its rings)
                # → nested/overlapping parts
                for (src, dst) in ((a, b), (b, a)):
                    _, _, sxx, syy, _ = rings[src]
                    dpi = rings[dst][0]
                    dst_rings = [(r[2], r[3]) for r in rings
                                 if r[0] == dpi]
                    for k in range(len(sxx) - 1):
                        inside = A.point_in_rings(
                            np.asarray([sxx[k]]), np.asarray([syy[k]]),
                            dst_rings)[0]
                        if inside and not any(
                                len(r[4][0]) and A._point_seg_dist(
                                    np.asarray([sxx[k]]),
                                    np.asarray([syy[k]]), *r[4]).min() == 0
                                for r in rings if r[0] == dpi):
                            return False

    # connected-interior: touch points form a multigraph over the rings
    # of each part; any cycle (incl. two distinct touches between the
    # same ring pair) pinches the interior apart
    for pi in range(len(parts)):
        idx = [k for k, r in enumerate(rings) if r[0] == pi]
        parent = {k: k for k in idx}

        def find(v):
            while parent[v] != v:
                parent[v] = parent[parent[v]]
                v = parent[v]
            return v

        for (a, b), pts in touch.items():
            if rings[a][0] != pi or rings[b][0] != pi:
                continue
            for _ in pts:
                ra, rb = find(a), find(b)
                if ra == rb:
                    return False  # cycle → disconnected interior
                parent[ra] = rb
    return True


@pandas_udf(BooleanType())
def st_issimple(g: pd.Series) -> pd.Series:
    """Self-intersection test for linestrings; other types: True."""
    batch = _b(g)
    out = np.ones(batch.n, dtype=bool)
    for i in range(batch.n):
        if batch.types[i] not in (W.LINESTRING, W.MULTILINESTRING):
            continue
        seg = A._segments(batch, i)
        if seg is None:
            continue
        x1, y1, x2, y2 = seg
        hits = A.seg_seg_intersect(x1, y1, x2, y2, x1, y1, x2, y2)
        n = len(x1)
        adj = np.abs(np.arange(n)[:, None] - np.arange(n)[None, :]) <= 1
        closed = (x1[0] == x2[-1]) and (y1[0] == y2[-1])
        if closed:
            adj[0, n - 1] = adj[n - 1, 0] = True
        if (hits & ~adj).any():
            out[i] = False
    res = pd.Series(out, dtype="boolean")
    res[batch.is_null()] = pd.NA
    return res


# ----------------------------------------------------------------------
# constructive ops
# ----------------------------------------------------------------------

@pandas_udf(BinaryType())
def st_centroid(g: pd.Series) -> pd.Series:
    batch = _b(g)
    cx, cy = A.centroid(batch)
    blobs = W.points_to_wkb(cx, cy)
    bad = batch.is_null()
    return pd.Series(
        [None if m else b for b, m in zip(blobs, bad)], dtype=object
    )


@pandas_udf(BinaryType())
def st_envelope(g: pd.Series) -> pd.Series:
    batch = _b(g)
    bb = A.bounds(batch)
    out = []
    for i in range(batch.n):
        if batch.types[i] == 0:
            out.append(None)
            continue
        mnx, mny, mxx, mxy = bb[i]
        if np.isnan(mnx):
            out.append(W.serialize_geometry(W.POLYGON, []))
        elif mnx == mxx and mny == mxy:
            out.append(W.serialize_geometry(W.POINT, np.array([mnx, mny])))
        else:
            ring = np.array([[mnx, mny], [mxx, mny], [mxx, mxy], [mnx, mxy], [mnx, mny]])
            out.append(W.serialize_geometry(W.POLYGON, [ring]))
    return pd.Series(out, dtype=object)


@pandas_udf(BinaryType())
def st_convexhull(g: pd.Series) -> pd.Series:
    batch = _b(g)
    out = []
    for i in range(batch.n):
        if batch.types[i] == 0:
            out.append(None)
            continue
        x, y = A._points(batch, i)
        if len(x) == 0:
            out.append(W.serialize_geometry(W.POLYGON, []))
            continue
        hx, hy = A.convex_hull_single(x, y)
        if len(hx) == 1:
            out.append(W.serialize_geometry(W.POINT, np.array([hx[0], hy[0]])))
        elif len(hx) == 2:
            out.append(W.serialize_geometry(W.LINESTRING, np.column_stack([hx, hy])))
        else:
            ring = np.column_stack([np.append(hx, hx[0]), np.append(hy, hy[0])])
            out.append(W.serialize_geometry(W.POLYGON, [ring]))
    return pd.Series(out, dtype=object)


@pandas_udf(BinaryType())
def st_boundary(g: pd.Series) -> pd.Series:
    """Polygon → MultiLineString of rings; LineString → MultiPoint of ends."""
    batch = _b(g)
    out = []
    for i in range(batch.n):
        t = batch.types[i]
        if t == 0:
            out.append(None)
            continue
        paths = list(A._geom_paths(batch, i))
        if t in (W.POLYGON, W.MULTIPOLYGON):
            lines = [np.column_stack([x, y]) for _, x, y in paths]
            out.append(W.serialize_geometry(W.MULTILINESTRING, lines))
        elif t in (W.LINESTRING, W.MULTILINESTRING):
            pts = []
            for _, x, y in paths:
                if len(x) and (x[0] != x[-1] or y[0] != y[-1]):
                    pts.append([x[0], y[0]])
                    pts.append([x[-1], y[-1]])
            out.append(W.serialize_geometry(W.MULTIPOINT, np.asarray(pts) if pts else np.empty((0, 2))))
        else:
            out.append(W.serialize_geometry(W.GEOMETRYCOLLECTION, []))
    return pd.Series(out, dtype=object)


@pandas_udf(BinaryType())
def st_exterior(g: pd.Series) -> pd.Series:
    """Outer ring as LineString (reference exterior, expr.py:963-972)."""
    batch = _b(g)
    out = []
    for i in range(batch.n):
        if batch.types[i] == 0:
            out.append(None)
            continue
        ring = None
        for kind, x, y in A._geom_paths(batch, i):
            if kind == W.PK_RING_OUTER:
                ring = np.column_stack([x, y])
                break
        out.append(W.serialize_geometry(W.LINESTRING, ring) if ring is not None else None)
    return pd.Series(out, dtype=object)


@pandas_udf(ArrayType(BinaryType()))
def st_interiors(g: pd.Series) -> pd.Series:
    batch = _b(g)
    out = []
    for i in range(batch.n):
        if batch.types[i] == 0:
            out.append(None)
            continue
        holes = [
            W.serialize_geometry(W.LINESTRING, np.column_stack([x, y]))
            for kind, x, y in A._geom_paths(batch, i)
            if kind == W.PK_RING_HOLE
        ]
        out.append(holes)
    return pd.Series(out, dtype=object)


@pandas_udf(BinaryType())
def st_representative_point(g: pd.Series) -> pd.Series:
    """A point guaranteed on the geometry: vertex for lines/points,
    interior probe for polygons (reference expr.py:301-305)."""
    batch = _b(g)
    out = []
    for i in range(batch.n):
        if batch.types[i] == 0:
            out.append(None)
            continue
        rings = A._poly_rings(batch, i)
        x, y = A._points(batch, i)
        if not len(x):
            out.append(W.serialize_geometry(W.POINT, np.empty(0)))
            continue
        if rings:
            # bisect horizontally through the bbox midline
            my = (y.min() + y.max()) / 2.0
            xs_grid = np.linspace(x.min(), x.max(), 32)
            inside = A.point_in_rings(xs_grid, np.full(32, my), rings)
            if inside.any():
                px = xs_grid[inside][len(xs_grid[inside]) // 2]
                out.append(W.serialize_geometry(W.POINT, np.array([px, my])))
                continue
        out.append(W.serialize_geometry(W.POINT, np.array([x[0], y[0]])))
    return pd.Series(out, dtype=object)


def _disc_poly(vx: float, vy: float, r: float, resolution: int) -> list:
    cx_, cy_ = A.buffer_point(vx, vy, r, resolution)
    return [np.column_stack([np.append(cx_, cx_[0]), np.append(cy_, cy_[0])])]


def _boundary_dilation(batch, i: int, r: float, resolution: int) -> list:
    """Minkowski dilation components of geometry i's boundary: one
    rectangle per segment + one disc per vertex (round joins/caps, GEOS
    quad_segs convention).  Returns a list of kernel operand polygons."""
    comps: list = []
    for kind, x, y in A._geom_paths(batch, i):
        if len(x) == 0:
            continue
        closed = kind in (W.PK_RING_OUTER, W.PK_RING_HOLE)
        if closed and len(x) > 1 and x[0] == x[-1] and y[0] == y[-1]:
            x, y = x[:-1], y[:-1]
        for vx, vy in zip(x, y):
            comps.append(_disc_poly(float(vx), float(vy), r, resolution))
        x2 = np.roll(x, -1) if closed else x[1:]
        y2 = np.roll(y, -1) if closed else y[1:]
        x1 = x if closed else x[:-1]
        y1 = y if closed else y[:-1]
        for k in range(len(x1)):
            dx, dy = x2[k] - x1[k], y2[k] - y1[k]
            ln = float(np.hypot(dx, dy))
            if ln == 0:
                continue
            nx, ny = -dy / ln * r, dx / ln * r
            rect = np.array([
                [x1[k] + nx, y1[k] + ny], [x2[k] + nx, y2[k] + ny],
                [x2[k] - nx, y2[k] - ny], [x1[k] - nx, y1[k] - ny],
                [x1[k] + nx, y1[k] + ny]])
            comps.append([rect])
    return comps


def _geom_poly_parts(batch, i: int) -> list:
    """Polygon parts of geometry i as kernel operands ([outer, holes...]
    closed rings per part)."""
    parts: list = []
    cur: list = []
    for kind, x, y in A._geom_paths(batch, i):
        if kind == W.PK_RING_OUTER:
            if cur:
                parts.append(cur)
            cur = []
        if kind in (W.PK_RING_OUTER, W.PK_RING_HOLE) and len(x) >= 3:
            if x[0] != x[-1] or y[0] != y[-1]:
                x = np.append(x, x[0]); y = np.append(y, y[0])
            cur.append(np.column_stack([x, y]))
    if cur:
        parts.append(cur)
    return parts


def _polys_wkb(polys: list) -> bytes:
    polys = [p for p in polys if p and len(p[0]) >= 4]
    if not polys:
        return W.serialize_geometry(W.POLYGON, [])
    if len(polys) == 1:
        return W.serialize_geometry(W.POLYGON, polys[0])
    return W.serialize_geometry(W.MULTIPOLYGON, polys)


def buffer_udf(resolution: int = 16):
    """Two-arg (geometry, distance) buffer pandas UDF — the SQL-surface
    form; `buffer` wraps it with a fixed distance for the method API."""

    @pandas_udf(BinaryType())
    def _buffer(g: pd.Series, d: pd.Series) -> pd.Series:
        from ..geometry import booleans as B

        batch = _b(g)
        dist = d.to_numpy(dtype=np.float64, na_value=np.nan)
        out = []
        for i in range(batch.n):
            if batch.types[i] == 0 or np.isnan(dist[i]):
                out.append(None)
                continue
            x, y = A._points(batch, i)
            if len(x) == 0:
                out.append(W.serialize_geometry(W.POLYGON, []))
                continue
            r = float(dist[i])
            t = int(batch.types[i])
            poly_t = t in (W.POLYGON, W.MULTIPOLYGON)
            if r == 0 and poly_t:
                out.append(batch.raw[i])
                continue
            if r <= 0 and not poly_t:
                out.append(W.serialize_geometry(W.POLYGON, []))
                continue
            if t == W.POINT:
                out.append(_polys_wkb([_disc_poly(x[0], y[0], r, resolution)]))
                continue
            if t == W.MULTIPOINT:
                comps = [_disc_poly(float(vx), float(vy), r, resolution)
                         for vx, vy in zip(x, y)]
                out.append(_polys_wkb(B.union_polygons(comps)))
                continue
            comps = _boundary_dilation(batch, i, abs(r), resolution)
            if poly_t:
                parts = _geom_poly_parts(batch, i)
                if r > 0:
                    out.append(_polys_wkb(B.union_polygons(parts + comps)))
                else:
                    # erosion: polygon minus its boundary dilation
                    dil = B.union_polygons(comps)
                    out.append(_polys_wkb(B.overlay(
                        [ring for p in parts for ring in p],
                        [ring for p in dil for ring in p], "difference")))
            else:
                out.append(_polys_wkb(B.union_polygons(comps)))
        return pd.Series(out, dtype=object)

    return _buffer


def buffer(distance, resolution: int = 16):
    """Factory: buffer UDF (reference expr.py:314-322 via GEOS).  Exact
    per-segment Minkowski rounds for every geometry type: points buffer
    to a 4*resolution-vertex circle (GEOS quad_segs convention);
    lines/polygons union per-segment rectangles with per-vertex discs
    through the boolean kernel (round joins and caps — concave inputs
    buffer correctly, unlike a convex-hull dilation).  Negative distance
    erodes polygons (subtracts the boundary dilation); lines/points
    collapse to empty."""
    from pyspark.sql import Column

    udf2 = buffer_udf(resolution)
    dist_col = distance if isinstance(distance, Column) else F.lit(float(distance))
    return lambda col: udf2(col, dist_col)


def simplify(tolerance: float):
    """Factory: Douglas-Peucker simplification (reference expr.py:324-328)."""

    @pandas_udf(BinaryType())
    def _simplify(g: pd.Series) -> pd.Series:
        batch = _b(g)
        keep = np.ones(len(batch.xs), dtype=bool)
        for p in range(batch.n_paths):
            s, e = batch.path_offsets[p], batch.path_offsets[p + 1]
            if e - s >= 3:
                keep[s:e] = A.douglas_peucker(batch.xs[s:e], batch.ys[s:e], tolerance)
        out = []
        for i in range(batch.n):
            if batch.types[i] == 0:
                out.append(None)
                continue
            out.append(_rebuild_filtered(batch, i, keep))
        return pd.Series(out, dtype=object)

    return _simplify


def _rebuild_filtered(batch: W.GeometryBatch, i: int, keep: np.ndarray) -> bytes:
    """Re-serialize row i keeping only coordinates where keep is True."""
    t = int(batch.types[i])
    sel = np.flatnonzero(batch.path_geom == i)

    def seg(p):
        s, e = batch.path_offsets[p], batch.path_offsets[p + 1]
        k = keep[s:e]
        return np.column_stack([batch.xs[s:e][k], batch.ys[s:e][k]])

    if t == W.POINT:
        return batch.raw[i]
    if t == W.LINESTRING:
        return W.serialize_geometry(W.LINESTRING, seg(sel[0]))
    if t == W.POLYGON:
        return W.serialize_geometry(W.POLYGON, [seg(p) for p in sel])
    if t == W.MULTIPOLYGON:
        by_part: dict[int, list] = {}
        for p in sel:
            by_part.setdefault(int(batch.path_part[p]), []).append(seg(p))
        return W.serialize_geometry(W.MULTIPOLYGON, list(by_part.values()))
    if t == W.MULTILINESTRING:
        return W.serialize_geometry(W.MULTILINESTRING, [seg(p) for p in sel])
    return batch.raw[i]


# ----------------------------------------------------------------------
# affine transforms — structure-preserving byte rewrite, fully vectorized
# ----------------------------------------------------------------------

def affine_transform(a, b, d, e, xoff, yoff):
    @pandas_udf(BinaryType())
    def _affine(g: pd.Series) -> pd.Series:
        batch = _b(g)
        nx, ny = A.affine(batch, a, b, d, e, xoff, yoff)
        return pd.Series(W.rewrite_coords(batch, nx, ny), dtype=object)

    return _affine


# the 6-parameter (a, b, d, e, xoff, yoff) composition for each named
# transform, shared by the WKB UDF path and the native point fast path
# (core._affine) so both compute bit-identical coordinates
def translate_params(xoff=0.0, yoff=0.0):
    return (1, 0, 0, 1, xoff, yoff)


def scale_params(xfact=1.0, yfact=1.0, origin=(0.0, 0.0)):
    ox, oy = origin
    return (xfact, 0, 0, yfact, ox - xfact * ox, oy - yfact * oy)


def rotate_params(angle_deg: float, origin=(0.0, 0.0), use_radians=False):
    t = angle_deg if use_radians else np.deg2rad(angle_deg)
    ca, sa = np.cos(t), np.sin(t)
    ox, oy = origin
    return (ca, -sa, sa, ca, ox - ca * ox + sa * oy, oy - sa * ox - ca * oy)


def skew_params(xs_deg=0.0, ys_deg=0.0, origin=(0.0, 0.0), use_radians=False):
    tx = xs_deg if use_radians else np.deg2rad(xs_deg)
    ty = ys_deg if use_radians else np.deg2rad(ys_deg)
    ox, oy = origin
    b_, d = np.tan(tx), np.tan(ty)
    return (1.0, b_, d, 1.0, -b_ * oy, -d * ox)


def translate(xoff=0.0, yoff=0.0):
    return affine_transform(*translate_params(xoff, yoff))


def scale(xfact=1.0, yfact=1.0, origin=(0.0, 0.0)):
    return affine_transform(*scale_params(xfact, yfact, origin))


def rotate(angle_deg: float, origin=(0.0, 0.0), use_radians=False):
    return affine_transform(*rotate_params(angle_deg, origin, use_radians))


def skew(xs_deg=0.0, ys_deg=0.0, origin=(0.0, 0.0), use_radians=False):
    return affine_transform(*skew_params(xs_deg, ys_deg, origin, use_radians))


def interpolate(distance: float, normalized: bool = False):
    @pandas_udf(BinaryType())
    def _interp(g: pd.Series) -> pd.Series:
        batch = _b(g)
        out = []
        for i in range(batch.n):
            if batch.types[i] == 0:
                out.append(None)
                continue
            x, y = A._points(batch, i)
            px, py = A.interpolate_on_line(x, y, distance, normalized)
            out.append(W.serialize_geometry(W.POINT, np.array([px, py])))
        return pd.Series(out, dtype=object)

    return _interp


def project(normalized: bool = False):
    @pandas_udf(DoubleType())
    def _project(g: pd.Series, other: pd.Series) -> pd.Series:
        batch = _b(g)
        obatch = _b(other)
        out = np.full(batch.n, np.nan)
        for i in range(batch.n):
            if batch.types[i] == 0 or obatch.types[i] == 0:
                continue
            x, y = A._points(batch, i)
            ox, oy = A._points(obatch, i)
            if len(ox):
                out[i] = A.project_on_line(x, y, ox[0], oy[0], normalized)
        return pd.Series(out)

    return _project


# ----------------------------------------------------------------------
# binary predicates / operators
# ----------------------------------------------------------------------

def _pairwise_bool(fn):
    @pandas_udf(BooleanType())
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        ba, bb = _b(a), _b(b)
        # nullable-boolean dtype: plain bool Series can't hold the NULL
        # results for NULL inputs (pandas 2.x deprecates the implicit
        # object upcast)
        out = pd.Series(fn(ba, bb), dtype="boolean")
        out[ba.is_null() | bb.is_null()] = pd.NA
        return out

    return _udf


st_intersects = _pairwise_bool(A.pairwise_intersects)
st_disjoint = _pairwise_bool(lambda a, b: ~A.pairwise_intersects(a, b))
st_contains = _pairwise_bool(A.pairwise_contains)
st_within = _pairwise_bool(lambda a, b: A.pairwise_contains(b, a))
st_covers = _pairwise_bool(A.pairwise_contains)       # touch-tolerant variant
st_coveredby = _pairwise_bool(lambda a, b: A.pairwise_contains(b, a))
st_touches = _pairwise_bool(SO.pairwise_touches)
st_crosses = _pairwise_bool(SO.pairwise_crosses)
st_overlaps = _pairwise_bool(SO.pairwise_overlaps)


def st_equals_exact(tolerance: float):
    """Factory: approximate structural equality within tolerance
    (reference: expr.py:307-312)."""
    return _pairwise_bool(
        lambda a, b: SO.pairwise_equals_exact(a, b, tolerance))


@pandas_udf(StringType())
def st_relate(a: pd.Series, b: pd.Series) -> pd.Series:
    """DE-9IM matrix string (reference: expr.py:1001-1013 'relate')."""
    return pd.Series(SO.pairwise_relate(_b(a), _b(b)), dtype=object)


def _pairwise_geom_udf(fn):
    @pandas_udf(BinaryType())
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series(fn(_b(a), _b(b)), dtype=object)

    return _udf


st_intersection = _pairwise_geom_udf(SO.pairwise_intersection)
st_union_pair = _pairwise_geom_udf(SO.pairwise_union)
st_difference = _pairwise_geom_udf(SO.pairwise_difference)
st_symdifference = _pairwise_geom_udf(SO.pairwise_symmetric_difference)


@pandas_udf(BooleanType())
def st_equals(a: pd.Series, b: pd.Series) -> pd.Series:
    """Geometric equality via symmetric containment of coordinate sets.
    Exact for identical-structure inputs; conservative otherwise."""
    ba, bb = _b(a), _b(b)
    out = np.zeros(ba.n, dtype=bool)
    for i in range(ba.n):
        if ba.types[i] == 0 or bb.types[i] == 0:
            continue
        ax, ay = A._points(ba, i)
        bx, by = A._points(bb, i)
        pa = np.unique(np.column_stack([ax, ay]), axis=0)
        pb = np.unique(np.column_stack([bx, by]), axis=0)
        out[i] = pa.shape == pb.shape and bool(np.allclose(pa, pb))
    res = pd.Series(out, dtype="boolean")
    res[ba.is_null() | bb.is_null()] = pd.NA
    return res


@pandas_udf(DoubleType())
def st_distance(a: pd.Series, b: pd.Series) -> pd.Series:
    ba, bb = _b(a), _b(b)
    out = pd.Series(A.pairwise_distance(ba, bb))
    out[ba.is_null() | bb.is_null()] = None
    return out


@pandas_udf(BinaryType())
def st_intersection_bbox(a: pd.Series, b: pd.Series) -> pd.Series:
    """Envelope-intersection (exact when both inputs are axis-aligned
    boxes; used by clip's prefilter path)."""
    ba, bb = _b(a), _b(b)
    ra, rb = A.bounds(ba), A.bounds(bb)
    mnx = np.maximum(ra[:, 0], rb[:, 0])
    mny = np.maximum(ra[:, 1], rb[:, 1])
    mxx = np.minimum(ra[:, 2], rb[:, 2])
    mxy = np.minimum(ra[:, 3], rb[:, 3])
    out = []
    for i in range(ba.n):
        if ba.types[i] == 0 or bb.types[i] == 0:
            out.append(None)
        elif mnx[i] > mxx[i] or mny[i] > mxy[i]:
            out.append(W.serialize_geometry(W.POLYGON, []))
        else:
            ring = np.array([
                [mnx[i], mny[i]], [mxx[i], mny[i]], [mxx[i], mxy[i]],
                [mnx[i], mxy[i]], [mnx[i], mny[i]],
            ])
            out.append(W.serialize_geometry(W.POLYGON, [ring]))
    return pd.Series(out, dtype=object)


# ----------------------------------------------------------------------
# curve encoders (factories: need global total_bounds like the reference,
# expr.py:404-539)
# ----------------------------------------------------------------------

def _check_encodable(batch: W.GeometryBatch, op: str):
    if batch.is_null().any() or batch.is_empty().any():
        raise ValueError(
            f"{op} cannot be computed on missing or empty geometries "
            "(reference contract, hilbert_distance.py:32-36)"
        )


def hilbert_distance(total_bounds, level: int = 16):
    @pandas_udf(LongType())
    def _hilbert(g: pd.Series) -> pd.Series:
        batch = _b(g)
        _check_encodable(batch, "hilbert_distance")
        bb = A.bounds(batch)
        d = C.hilbert_from_bounds(bb[:, 0], bb[:, 1], bb[:, 2], bb[:, 3],
                                  total_bounds, level)
        return pd.Series(d.astype(np.int64))

    return _hilbert


def morton_distance(total_bounds, level: int = 16):
    @pandas_udf(LongType())
    def _morton(g: pd.Series) -> pd.Series:
        batch = _b(g)
        _check_encodable(batch, "morton_distance")
        bb = A.bounds(batch)
        d = C.morton_from_bounds(bb[:, 0], bb[:, 1], bb[:, 2], bb[:, 3],
                                 total_bounds, level)
        return pd.Series(d.astype(np.int64))

    return _morton


def hilbert_distance_bounds(total_bounds, level: int = 16):
    """`hilbert_distance` over four NATIVE bbox columns instead of a
    geometry blob: envelope-exact layers (points_from_xy /
    boxes_from_bounds / stored bbox structs) already hold their bounds
    as doubles, so encoding them through WKB (one Python stage to
    BUILD the blob, another to parse it back) is pure overhead — this
    variant is the same `hilbert_from_bounds` numpy over the columns
    directly, one Arrow stage, no WKB anywhere."""
    @pandas_udf(LongType())
    def _hilbert(minx: pd.Series, miny: pd.Series, maxx: pd.Series,
                 maxy: pd.Series) -> pd.Series:
        d = C.hilbert_from_bounds(
            minx.to_numpy(np.float64), miny.to_numpy(np.float64),
            maxx.to_numpy(np.float64), maxy.to_numpy(np.float64),
            total_bounds, level)
        return pd.Series(d.astype(np.int64))

    return _hilbert


def morton_distance_bounds(total_bounds, level: int = 16):
    """`morton_distance` over four native bbox columns — see
    `hilbert_distance_bounds`."""
    @pandas_udf(LongType())
    def _morton(minx: pd.Series, miny: pd.Series, maxx: pd.Series,
                maxy: pd.Series) -> pd.Series:
        d = C.morton_from_bounds(
            minx.to_numpy(np.float64), miny.to_numpy(np.float64),
            maxx.to_numpy(np.float64), maxy.to_numpy(np.float64),
            total_bounds, level)
        return pd.Series(d.astype(np.int64))

    return _morton


def curve_bucket_sets_bounds(total_bounds, boundaries,
                             by: str = "hilbert", level: int = 16,
                             coarse: int | None = None,
                             dilate: float = 0.0):
    """`curve_bucket_sets` over four native bbox columns — see
    `hilbert_distance_bounds` for why (the replication pass of a
    100-TB layout shuffle should not round-trip every row through
    WKB)."""
    if by not in ("hilbert", "morton"):
        raise ValueError(
            f"curve_bucket_sets needs by='hilbert'|'morton', got {by!r}")
    lc = min(level, 8) if coarse is None else int(coarse)
    bs = [int(b) for b in boundaries]
    d = float(dilate)

    @pandas_udf(ArrayType(IntegerType()))
    def _sets(minx: pd.Series, miny: pd.Series, maxx: pd.Series,
              maxy: pd.Series) -> pd.Series:
        return pd.Series(C.bucket_sets_from_bounds(
            minx.to_numpy(np.float64) - d, miny.to_numpy(np.float64) - d,
            maxx.to_numpy(np.float64) + d, maxy.to_numpy(np.float64) + d,
            total_bounds, bs, by, level, lc))

    # asNondeterministic: the function IS pure, but downstream joins on
    # the exploded bucket id derive `size(sets) > 0` filters that
    # Catalyst would otherwise push below upstream exchanges by alias
    # substitution — re-running this whole Arrow stage a second time.
    # Marking it nondeterministic pins it to exactly one evaluation.
    return _sets.asNondeterministic()


def curve_bucket_sets(total_bounds, boundaries, by: str = "hilbert",
                      level: int = 16, coarse: int | None = None,
                      dilate: float = 0.0):
    """Array of every `spatial_shuffle(boundaries=)` bucket a
    geometry's bbox can meet (the replication set of the co-bucketed
    spatial join — see curves.bucket_sets_from_bounds for the
    superset guarantee).  ``coarse`` is the block level of the
    interval decomposition: finer → tighter sets but more blocks per
    wide bbox; the default min(level, 8) keeps block intervals of
    4^(level-8) keys, far below any sane boundary spacing.
    ``dilate`` expands every bbox by that margin first, so a
    co-bucketed ``dwithin`` join up to the margin is exact (a pair
    within distance d has overlapping dilated-vs-plain bboxes, which
    always share a bucket)."""
    if by not in ("hilbert", "morton"):
        raise ValueError(
            f"curve_bucket_sets needs by='hilbert'|'morton', got {by!r}")
    lc = min(level, 8) if coarse is None else int(coarse)
    bs = [int(b) for b in boundaries]
    d = float(dilate)

    @pandas_udf(ArrayType(IntegerType()))
    def _sets(g: pd.Series) -> pd.Series:
        batch = _b(g)
        _check_encodable(batch, "curve_bucket_sets")
        bb = A.bounds(batch)
        return pd.Series(C.bucket_sets_from_bounds(
            bb[:, 0] - d, bb[:, 1] - d, bb[:, 2] + d, bb[:, 3] + d,
            total_bounds, bs, by, level, lc))

    # see curve_bucket_sets_bounds: one-evaluation pin
    return _sets.asNondeterministic()


def geohash(as_string: bool = True, precision: int = 12):
    ret = "string" if as_string else "long"

    @pandas_udf(ret)
    def _geohash(g: pd.Series) -> pd.Series:
        batch = _b(g)
        _check_encodable(batch, "geohash")
        bb = A.bounds(batch)
        midx = (bb[:, 0] + bb[:, 2]) / 2.0
        midy = (bb[:, 1] + bb[:, 3]) / 2.0
        if as_string:
            return pd.Series(C.geohash_strings(midx, midy, precision))
        return pd.Series(C.geohash_uint64(midx, midy, precision).astype(np.int64))

    return _geohash


# ----------------------------------------------------------------------
# SQL registration (for parity with engines exposing ST_* in SQL)
# ----------------------------------------------------------------------

_SQL_FUNCS = {
    "st_point": st_point,
    "st_make_box": st_make_box,
    "st_geomfromtext": st_geomfromtext,
    "st_astext": st_astext,
    "st_area": st_area,
    "st_length": st_length,
    "st_centroid": st_centroid,
    "st_envelope": st_envelope,
    "st_convexhull": st_convexhull,
    "st_boundary": st_boundary,
    "st_x": st_x,
    "st_y": st_y,
    "st_geometrytype": st_geometrytype,
    "st_isempty": st_isempty,
    "st_isvalid": st_isvalid,
    "st_intersects": st_intersects,
    "st_contains": st_contains,
    "st_within": st_within,
    "st_disjoint": st_disjoint,
    "st_equals": st_equals,
    "st_distance": st_distance,
    "st_touches": st_touches,
    "st_crosses": st_crosses,
    "st_overlaps": st_overlaps,
    "st_relate": st_relate,
    "st_intersection": st_intersection,
    "st_union": st_union_pair,
    "st_difference": st_difference,
    "st_symdifference": st_symdifference,
}


@pandas_udf(ArrayType(DoubleType()))
def st_extent_agg(g: pd.Series) -> list:
    """Grouped AGGREGATE: nan-safe [minx, miny, maxx, maxy] of a
    geometry group (the SQL-surface form of total_bounds)."""
    batch = _b(g)
    if len(batch.xs) == 0:
        return [None, None, None, None]
    with np.errstate(all="ignore"):
        vals = [np.nanmin(batch.xs), np.nanmin(batch.ys),
                np.nanmax(batch.xs), np.nanmax(batch.ys)]
    return [None if v != v else float(v) for v in vals]


@pandas_udf(BinaryType())
def st_simplify_sql(g: pd.Series, tol: pd.Series) -> pd.Series:
    """Two-arg SQL form of simplify: per-row tolerance (a literal in
    practice — rows group by distinct tolerance and reuse the batch
    Douglas-Peucker)."""
    batch = _b(g)
    tv = tol.to_numpy(dtype=np.float64, na_value=np.nan)
    keep = np.ones(len(batch.xs), dtype=bool)
    for p in range(batch.n_paths):
        i = int(batch.path_geom[p])
        t = tv[i]
        if t != t:
            continue
        s, e = batch.path_offsets[p], batch.path_offsets[p + 1]
        if e - s >= 3:
            keep[s:e] = A.douglas_peucker(batch.xs[s:e], batch.ys[s:e],
                                          float(t))
    out = []
    for i in range(batch.n):
        if batch.types[i] == 0:
            out.append(None)
            continue
        out.append(_rebuild_filtered(batch, i, keep))
    return pd.Series(out, dtype=object)


def register_sql_functions(spark) -> None:
    """Register the scalar ST_* surface plus the geometry AGGREGATES
    (``st_union_agg`` — the dissolve combine step — and
    ``st_extent_agg``), so `spark.sql` queries can group-aggregate
    geometry directly.  Note the Spark limitation: pandas aggregate
    UDFs cannot mix with JVM aggregates (count/sum/...) in one
    GROUP BY — split into two aggregations joined on the key, exactly
    as `dissolve` does internally."""
    from ..operators.dissolve import geom_union_agg

    for name, fn in _SQL_FUNCS.items():
        spark.udf.register(name, fn)
    spark.udf.register("st_union_agg", geom_union_agg)
    spark.udf.register("st_extent_agg", st_extent_agg)
    # parameterized scalar fns (distance/tolerance as the 2nd SQL arg)
    spark.udf.register("st_buffer", buffer_udf(16))
    spark.udf.register("st_simplify", st_simplify_sql)
