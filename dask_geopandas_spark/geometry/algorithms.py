"""Vectorized geometry kernels over `GeometryBatch`.

Each function mirrors a geopandas/shapely operation the reference binds per
partition (reference: expr.py:947-1013, 301-385).  Implementation is pure
numpy: segmented reductions (`reduceat`) over the flat coordinate buffers,
so cost is O(total coordinates) per Arrow batch regardless of row count.
"""

from __future__ import annotations

import numpy as np

from . import wkb as W


# ----------------------------------------------------------------------
# segmented helpers
# ----------------------------------------------------------------------

def _seg_reduce(op, values: np.ndarray, starts: np.ndarray, counts: np.ndarray,
                empty_val=np.nan) -> np.ndarray:
    """Per-segment reduction that tolerates empty segments.

    ``np.ufunc.reduceat`` mishandles zero-length segments (returns the next
    element), so reduce only non-empty segments and scatter.
    """
    n = len(counts)
    out = np.full(n, empty_val, dtype=np.float64)
    nz = counts > 0
    if not nz.any():
        return out
    s = starts[:-1][nz] if len(starts) == n + 1 else starts[nz]
    out[nz] = op.reduceat(values, s)
    # reduceat bug: a segment whose start == len(values) raises; starts are
    # valid here because nz segments always begin before the end.
    return out


def _next_index(path_offsets: np.ndarray) -> np.ndarray:
    """For each coordinate, the index of the next coordinate *within its
    path*, wrapping the last coordinate of each path to the path start."""
    P = path_offsets[-1]
    nxt = np.arange(1, P + 1, dtype=np.int64)
    ends = path_offsets[1:] - 1
    starts = path_offsets[:-1]
    valid = path_offsets[1:] > path_offsets[:-1]
    nxt[ends[valid]] = starts[valid]
    return nxt


# ----------------------------------------------------------------------
# bounds / area / length / centroid
# ----------------------------------------------------------------------

def bounds(batch: W.GeometryBatch) -> np.ndarray:
    """(n,4) [minx,miny,maxx,maxy]; NaN rows for null/empty (reference
    nan-handles all-empty partitions, expr.py:52-68)."""
    starts, counts = batch.geom_coord_starts, batch.geom_coord_counts()
    out = np.empty((batch.n, 4))
    out[:, 0] = _seg_reduce(np.minimum, batch.xs, starts, counts)
    out[:, 1] = _seg_reduce(np.minimum, batch.ys, starts, counts)
    out[:, 2] = _seg_reduce(np.maximum, batch.xs, starts, counts)
    out[:, 3] = _seg_reduce(np.maximum, batch.ys, starts, counts)
    return out


def _ring_cross_terms(batch: W.GeometryBatch) -> np.ndarray:
    """Shoelace cross product per coordinate, next-wrapped within path.

    Coordinates are translated to each path's first vertex first: shoelace
    area is translation-invariant, and the small relative offsets keep the
    cross products well-conditioned for large absolute coordinates
    (web-mercator meters put raw x*y terms near 1e14, where float64
    cancellation costs ~1e-2 m² per term)."""
    nxt = _next_index(batch.path_offsets)
    if len(batch.xs) == 0:
        return np.zeros(0)
    starts = np.minimum(batch.path_offsets[:-1], len(batch.xs) - 1)
    lens = batch.path_lengths()
    x0 = np.repeat(batch.xs[starts], lens)
    y0 = np.repeat(batch.ys[starts], lens)
    x, y = batch.xs - x0, batch.ys - y0
    return x * y[nxt] - x[nxt] * y


def signed_ring_areas(batch: W.GeometryBatch) -> np.ndarray:
    """Signed shoelace area per *path* (meaningful for ring paths)."""
    cross = _ring_cross_terms(batch)
    lens = batch.path_lengths()
    return 0.5 * _seg_reduce(np.add, cross, batch.path_offsets, lens, empty_val=0.0)


def area(batch: W.GeometryBatch) -> np.ndarray:
    """Polygon area: |outer| - sum |holes| per geometry; 0 for points/lines."""
    out = np.zeros(batch.n)
    ring_mask = (batch.path_kind == W.PK_RING_OUTER) | (batch.path_kind == W.PK_RING_HOLE)
    if not ring_mask.any():
        out[batch.is_null()] = np.nan
        return out
    ra = np.abs(signed_ring_areas(batch))
    sign = np.where(batch.path_kind == W.PK_RING_OUTER, 1.0, -1.0)
    contrib = np.where(ring_mask, ra * sign, 0.0)
    np.add.at(out, batch.path_geom, contrib)
    out[batch.is_null()] = np.nan
    return out


def length(batch: W.GeometryBatch) -> np.ndarray:
    """Perimeter for polygons, length for lines, 0 for points."""
    out = np.zeros(batch.n)
    if batch.n_paths == 0:
        out[batch.is_null()] = np.nan
        return out
    x, y = batch.xs, batch.ys
    nxt = _next_index(batch.path_offsets)
    seg = np.hypot(x[nxt] - x, y[nxt] - y)
    # drop wrap segment for open paths (lines); keep for rings (closed: the
    # wrap segment is zero-length when last==first, else it legitimately
    # closes the ring)
    lens = batch.path_lengths()
    ends = batch.path_offsets[1:] - 1
    open_path = (batch.path_kind == W.PK_LINE) | (batch.path_kind == W.PK_POINT)
    valid = lens > 0
    kill = ends[valid & open_path[: len(ends)]] if len(ends) else np.empty(0, dtype=np.int64)
    kill = ends[(lens > 0) & open_path]
    seg[kill] = 0.0
    per_path = _seg_reduce(np.add, seg, batch.path_offsets, lens, empty_val=0.0)
    np.add.at(out, batch.path_geom, per_path)
    out[batch.is_null()] = np.nan
    return out


def centroid(batch: W.GeometryBatch) -> tuple[np.ndarray, np.ndarray]:
    """Centroid of highest dimension present per geometry (GEOS semantics).

    Polygons: area-weighted with hole subtraction; lines: length-weighted
    midpoint integral; points: mean of members.
    """
    cx = np.full(batch.n, np.nan)
    cy = np.full(batch.n, np.nan)
    if batch.n_paths == 0 or len(batch.xs) == 0:
        return cx, cy
    nxt = _next_index(batch.path_offsets)
    lens = batch.path_lengths()
    pk = batch.path_kind
    # Translate to each geometry's first vertex: every centroid integral
    # below is translation-equivariant, and small relative coordinates
    # avoid the float64 cancellation that raw web-mercator-scale x*y
    # cross terms suffer.  The offset is added back at the end.
    g0 = np.clip(batch.geom_coord_starts[:-1], 0, len(batch.xs) - 1)
    gx0, gy0 = batch.xs[g0], batch.ys[g0]
    cg = np.repeat(batch.path_geom, lens)
    x = batch.xs - gx0[cg]
    y = batch.ys - gy0[cg]

    # --- polygon contribution
    cross = x * y[nxt] - x[nxt] * y
    mx = (x + x[nxt]) * cross
    my = (y + y[nxt]) * cross
    ring_sa = 0.5 * _seg_reduce(np.add, cross, batch.path_offsets, lens, 0.0)
    ring_mx = _seg_reduce(np.add, mx, batch.path_offsets, lens, 0.0) / 6.0
    ring_my = _seg_reduce(np.add, my, batch.path_offsets, lens, 0.0) / 6.0
    is_ring = (pk == W.PK_RING_OUTER) | (pk == W.PK_RING_HOLE)
    # orient: outer +, hole -  (flip whatever the stored winding is)
    want = np.where(pk == W.PK_RING_OUTER, 1.0, -1.0)
    flip = np.where(ring_sa != 0, want * np.sign(ring_sa), 1.0)
    A = np.zeros(batch.n)
    MX = np.zeros(batch.n)
    MY = np.zeros(batch.n)
    np.add.at(A, batch.path_geom, np.where(is_ring, ring_sa * flip, 0.0))
    np.add.at(MX, batch.path_geom, np.where(is_ring, ring_mx * flip, 0.0))
    np.add.at(MY, batch.path_geom, np.where(is_ring, ring_my * flip, 0.0))
    has_area = np.zeros(batch.n, dtype=bool)
    np.logical_or.at(has_area, batch.path_geom, is_ring)
    poly_ok = has_area & (A != 0)
    cx[poly_ok] = MX[poly_ok] / A[poly_ok]
    cy[poly_ok] = MY[poly_ok] / A[poly_ok]

    # --- line contribution (only where no area)
    seg_len = np.hypot(x[nxt] - x, y[nxt] - y)
    ends = batch.path_offsets[1:] - 1
    open_mask = (pk == W.PK_LINE)
    kill = ends[(lens > 0) & ~((pk == W.PK_RING_OUTER) | (pk == W.PK_RING_HOLE))]
    seg_len2 = seg_len.copy()
    seg_len2[kill] = 0.0
    wx = seg_len2 * (x + x[nxt]) / 2.0
    wy = seg_len2 * (y + y[nxt]) / 2.0
    is_line = open_mask
    L = np.zeros(batch.n)
    LX = np.zeros(batch.n)
    LY = np.zeros(batch.n)
    pl = _seg_reduce(np.add, seg_len2, batch.path_offsets, lens, 0.0)
    px = _seg_reduce(np.add, wx, batch.path_offsets, lens, 0.0)
    py = _seg_reduce(np.add, wy, batch.path_offsets, lens, 0.0)
    np.add.at(L, batch.path_geom, np.where(is_line, pl, 0.0))
    np.add.at(LX, batch.path_geom, np.where(is_line, px, 0.0))
    np.add.at(LY, batch.path_geom, np.where(is_line, py, 0.0))
    line_ok = ~poly_ok & (L > 0)
    cx[line_ok] = LX[line_ok] / L[line_ok]
    cy[line_ok] = LY[line_ok] / L[line_ok]

    # --- point contribution (mean) where nothing else
    rest = ~poly_ok & ~line_ok
    if rest.any():
        starts, counts = batch.geom_coord_starts, batch.geom_coord_counts()
        sx = _seg_reduce(np.add, x, starts, counts)
        sy = _seg_reduce(np.add, y, starts, counts)
        ok = rest & (counts > 0)
        cx[ok] = sx[ok] / counts[ok]
        cy[ok] = sy[ok] / counts[ok]
    return cx + gx0, cy + gy0


# ----------------------------------------------------------------------
# coordinate transforms (fully vectorized across the batch)
# ----------------------------------------------------------------------

def affine(batch: W.GeometryBatch, a, b, d, e, xoff, yoff):
    """x' = a*x + b*y + xoff ; y' = d*x + e*y + yoff (shapely 2D convention,
    reference expr.py:339-343)."""
    nx = a * batch.xs + b * batch.ys + xoff
    ny = d * batch.xs + e * batch.ys + yoff
    return nx, ny


def rotate_params(angle_deg: float):
    t = np.deg2rad(angle_deg)
    return np.cos(t), -np.sin(t), np.sin(t), np.cos(t)


# ----------------------------------------------------------------------
# predicates & distance
# ----------------------------------------------------------------------

def _geom_paths(batch: W.GeometryBatch, i: int):
    sel = np.flatnonzero(batch.path_geom == i)
    for p in sel:
        s, e = batch.path_offsets[p], batch.path_offsets[p + 1]
        yield int(batch.path_kind[p]), batch.xs[s:e], batch.ys[s:e]


def _segments(batch: W.GeometryBatch, i: int):
    """All line/ring segments of geometry i as (x1,y1,x2,y2) arrays."""
    xs1 = []
    for kind, x, y in _geom_paths(batch, i):
        if kind == W.PK_POINT or len(x) < 2:
            continue
        if kind in (W.PK_RING_OUTER, W.PK_RING_HOLE) and (x[0] != x[-1] or y[0] != y[-1]):
            x = np.append(x, x[0]); y = np.append(y, y[0])
        xs1.append((x[:-1], y[:-1], x[1:], y[1:]))
    if not xs1:
        return None
    return (np.concatenate([s[0] for s in xs1]), np.concatenate([s[1] for s in xs1]),
            np.concatenate([s[2] for s in xs1]), np.concatenate([s[3] for s in xs1]))


def _points(batch: W.GeometryBatch, i: int):
    s, e = batch.geom_coord_starts[i], batch.geom_coord_starts[i + 1]
    return batch.xs[s:e], batch.ys[s:e]


def point_in_rings(px, py, rings) -> np.ndarray:
    """Even-odd ray casting of points against a list of (x, y) rings.
    Boundary points count as inside (within tolerance of crossing rules)."""
    px = np.atleast_1d(np.asarray(px, dtype=float))
    py = np.atleast_1d(np.asarray(py, dtype=float))
    inside = np.zeros(len(px), dtype=bool)
    for x, y in rings:
        if len(x) < 3:
            continue
        if x[0] != x[-1] or y[0] != y[-1]:
            x = np.append(x, x[0]); y = np.append(y, y[0])
        x1, y1, x2, y2 = x[:-1], x[1:], y[:-1], y[1:]
        x1, x2, y1, y2 = x[:-1], x[1:], y[:-1], y[1:]
        # crossing test vectorized over (points, segments)
        yy1 = y1[None, :]; yy2 = y2[None, :]
        xx1 = x1[None, :]; xx2 = x2[None, :]
        P_y = py[:, None]; P_x = px[:, None]
        cond = (yy1 > P_y) != (yy2 > P_y)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = xx1 + (P_y - yy1) / (yy2 - yy1) * (xx2 - xx1)
        crosses = cond & (P_x < xint)
        inside ^= (crosses.sum(axis=1) % 2).astype(bool)
    return inside


def _poly_rings(batch: W.GeometryBatch, i: int, outer_only=False):
    rings = []
    for kind, x, y in _geom_paths(batch, i):
        if kind == W.PK_RING_OUTER or (not outer_only and kind == W.PK_RING_HOLE):
            rings.append((x, y))
    return rings


def seg_seg_intersect_flat(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2) -> np.ndarray:
    """Elementwise proper-or-touching segment intersection test over
    aligned 1-D arrays — the flat-pairs counterpart of
    `seg_seg_intersect` for segmented (ragged-batch) kernels."""
    def orient(ox, oy, px_, py_, qx, qy):
        return (px_ - ox) * (qy - oy) - (py_ - oy) * (qx - ox)

    d1 = orient(bx1, by1, bx2, by2, ax1, ay1)
    d2 = orient(bx1, by1, bx2, by2, ax2, ay2)
    d3 = orient(ax1, ay1, ax2, ay2, bx1, by1)
    d4 = orient(ax1, ay1, ax2, ay2, bx2, by2)
    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0))

    def on_seg(ox, oy, px_, py_, qx, qy, d):
        return (d == 0) & (np.minimum(ox, px_) <= qx) & (qx <= np.maximum(ox, px_)) & \
               (np.minimum(oy, py_) <= qy) & (qy <= np.maximum(oy, py_))
    touch = (on_seg(bx1, by1, bx2, by2, ax1, ay1, d1) |
             on_seg(bx1, by1, bx2, by2, ax2, ay2, d2) |
             on_seg(ax1, ay1, ax2, ay2, bx1, by1, d3) |
             on_seg(ax1, ay1, ax2, ay2, bx2, by2, d4))
    return proper | touch


def seg_seg_intersect(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2) -> np.ndarray:
    """Pairwise (broadcast) proper-or-touching segment intersection test.
    a segments along axis 0, b segments along axis 1."""
    def orient(ox, oy, px_, py_, qx, qy):
        return (px_ - ox) * (qy - oy) - (py_ - oy) * (qx - ox)

    ax1 = ax1[:, None]; ay1 = ay1[:, None]; ax2 = ax2[:, None]; ay2 = ay2[:, None]
    bx1 = bx1[None, :]; by1 = by1[None, :]; bx2 = bx2[None, :]; by2 = by2[None, :]
    d1 = orient(bx1, by1, bx2, by2, ax1, ay1)
    d2 = orient(bx1, by1, bx2, by2, ax2, ay2)
    d3 = orient(ax1, ay1, ax2, ay2, bx1, by1)
    d4 = orient(ax1, ay1, ax2, ay2, bx2, by2)
    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0))
    def on_seg(ox, oy, px_, py_, qx, qy, d):
        return (d == 0) & (np.minimum(ox, px_) <= qx) & (qx <= np.maximum(ox, px_)) & \
               (np.minimum(oy, py_) <= qy) & (qy <= np.maximum(oy, py_))
    touch = (on_seg(bx1, by1, bx2, by2, ax1, ay1, d1) |
             on_seg(bx1, by1, bx2, by2, ax2, ay2, d2) |
             on_seg(ax1, ay1, ax2, ay2, bx1, by1, d3) |
             on_seg(ax1, ay1, ax2, ay2, bx2, by2, d4))
    return proper | touch


def _point_seg_dist(px, py, x1, y1, x2, y2) -> np.ndarray:
    """Min distance from each point (axis0) to each segment (axis1)."""
    px = px[:, None]; py = py[:, None]
    x1 = x1[None, :]; y1 = y1[None, :]; x2 = x2[None, :]; y2 = y2[None, :]
    dx = x2 - x1; dy = y2 - y1
    ll = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.clip(((px - x1) * dx + (py - y1) * dy) / np.where(ll == 0, 1, ll), 0, 1)
    cx = x1 + t * dx; cy = y1 + t * dy
    return np.hypot(px - cx, py - cy)


def _single_point_mask(batch: W.GeometryBatch) -> np.ndarray:
    return (batch.types == W.POINT) & (batch.geom_coord_counts() == 1)


def _axis_box_mask(batch: W.GeometryBatch) -> np.ndarray:
    """Rows that are single-ring 5-coordinate axis-aligned rectangles
    (every coordinate on a bbox corner, full-perimeter ring)."""
    mask = (batch.types == W.POLYGON) & (batch.geom_coord_counts() == 5)
    if not mask.any():
        return mask
    b = bounds(batch)
    gi = batch.coord_geom_index()
    bb = b[gi]
    on_corner = (((batch.xs == bb[:, 0]) | (batch.xs == bb[:, 2])) &
                 ((batch.ys == bb[:, 1]) | (batch.ys == bb[:, 3])))
    ok = np.ones(batch.n, dtype=bool)
    np.logical_and.at(ok, gi, on_corner)
    w = b[:, 2] - b[:, 0]; h = b[:, 3] - b[:, 1]
    ar = np.abs(area(batch))
    with np.errstate(invalid="ignore"):
        ok &= (w > 0) & (h > 0) & (ar == w * h)
    return mask & ok


def _grouped_point_in_poly(pts: W.GeometryBatch, polys: W.GeometryBatch,
                           rows: np.ndarray) -> np.ndarray:
    """Vectorized point-in-polygon for row-aligned (point_i, poly_i) pairs.

    Spatial-join refinement batches repeat the same container polygon for
    many candidate points, so group rows by the container's WKB bytes and
    ray-cast all of a group's points against its rings in one vectorized
    call — O(unique polygons) ring setups instead of O(rows)."""
    out = np.zeros(pts.n, dtype=bool)
    if len(rows) == 0:
        return out
    px_all = pts.xs[pts.geom_coord_starts[:-1]]
    py_all = pts.ys[pts.geom_coord_starts[:-1]]
    groups: dict[bytes, list] = {}
    for i in rows:
        groups.setdefault(polys.raw[i], []).append(i)
    for blob, idxs in groups.items():
        idxs = np.asarray(idxs)
        rings = _poly_rings(polys, idxs[0])
        if not rings:
            continue
        out[idxs] = point_in_rings(px_all[idxs], py_all[idxs], rings)
    return out


def pairwise_intersects(batch_a: W.GeometryBatch, batch_b: W.GeometryBatch) -> np.ndarray:
    """Row-aligned intersects(a_i, b_i).  Exact for point/line/polygon
    combinations via: vertex-in-polygon, segment crossing, bbox shortcut."""
    n = batch_a.n
    out = np.zeros(n, dtype=bool)
    ba = bounds(batch_a); bb = bounds(batch_b)
    maybe = ~((ba[:, 2] < bb[:, 0]) | (ba[:, 0] > bb[:, 2]) |
              (ba[:, 3] < bb[:, 1]) | (ba[:, 1] > bb[:, 3]))
    maybe &= ~batch_a.is_null() & ~batch_b.is_null()
    # vectorized fast path: point vs polygon (either orientation)
    poly = (W.POLYGON, W.MULTIPOLYGON)
    fast_ab = maybe & _single_point_mask(batch_a) & np.isin(batch_b.types, poly)
    fast_ba = maybe & _single_point_mask(batch_b) & np.isin(batch_a.types, poly)
    if fast_ab.any():
        out |= _grouped_point_in_poly(batch_a, batch_b, np.flatnonzero(fast_ab))
    if fast_ba.any():
        out |= _grouped_point_in_poly(batch_b, batch_a, np.flatnonzero(fast_ba))
    rest = maybe & ~fast_ab & ~fast_ba
    for i in np.flatnonzero(rest):
        out[i] = _geom_geom_intersects(batch_a, i, batch_b, i)
    return out


def _geom_geom_intersects(A: W.GeometryBatch, i: int, B: W.GeometryBatch, j: int) -> bool:
    pa = _points(A, i); pb = _points(B, j)
    # any vertex of a inside b's polygons, or vice versa
    rb = _poly_rings(B, j)
    if rb and len(pa[0]) and point_in_rings(pa[0], pa[1], rb).any():
        return True
    ra = _poly_rings(A, i)
    if ra and len(pb[0]) and point_in_rings(pb[0], pb[1], ra).any():
        return True
    sa = _segments(A, i); sb = _segments(B, j)
    if sa is not None and sb is not None:
        if seg_seg_intersect(*sa, *sb).any():
            return True
    # point-on-segment / coincident points
    if sa is None and sb is None:
        # both are point sets
        ax, ay = pa; bx, by = pb
        return bool((np.abs(ax[:, None] - bx[None, :]) == 0).any() and
                    (np.abs(ay[:, None] - by[None, :]) == 0).any() and
                    ((ax[:, None] == bx[None, :]) & (ay[:, None] == by[None, :])).any())
    if sb is not None and len(pa[0]):
        if (_point_seg_dist(pa[0], pa[1], *sb) == 0).any():
            return True
    if sa is not None and len(pb[0]):
        if (_point_seg_dist(pb[0], pb[1], *sa) == 0).any():
            return True
    return False


def pairwise_contains(A: W.GeometryBatch, B: W.GeometryBatch) -> np.ndarray:
    """contains(a_i, b_i): every point of b inside a, boundaries allowed
    except b cannot be fully on a's boundary.  Supports polygon containers
    exactly for point/line/polygon contents; point containers for points."""
    n = A.n
    out = np.zeros(n, dtype=bool)
    ba = bounds(A); bb = bounds(B)
    maybe = ((bb[:, 0] >= ba[:, 0]) & (bb[:, 1] >= ba[:, 1]) &
             (bb[:, 2] <= ba[:, 2]) & (bb[:, 3] <= ba[:, 3]))
    maybe &= ~A.is_null() & ~B.is_null()
    # vectorized fast path 1: axis-aligned rectangle contains point —
    # pure bounds comparison, no ray cast (the bbox prefilter `maybe`
    # already IS the containment test for this shape pair)
    rect = maybe & _axis_box_mask(A) & _single_point_mask(B)
    out |= rect
    maybe &= ~rect
    # vectorized fast path 2: general polygon contains single point
    fast = maybe & _single_point_mask(B) & np.isin(A.types, (W.POLYGON, W.MULTIPOLYGON))
    if fast.any():
        out |= _grouped_point_in_poly(B, A, np.flatnonzero(fast))
    maybe &= ~fast
    for i in np.flatnonzero(maybe):
        ra = _poly_rings(A, i)
        bx, by = _points(B, i)
        if not len(bx):
            continue
        if ra:
            inside = point_in_rings(bx, by, ra)
            if not inside.all():
                # covers-tolerant: vertices exactly on the boundary count
                # (ray-cast is ambiguous there); GEOS 'contains' would
                # exclude an all-boundary b, 'covers' includes it
                sa_ = _segments(A, i)
                if sa_ is None:
                    continue
                off = np.flatnonzero(~inside)
                d = _point_seg_dist(bx[off], by[off], *sa_).min(axis=1)
                if (d > 0).any():
                    continue
            # no boundary crossing of b's segments with a's rings
            sb = _segments(B, i)
            sa = _segments(A, i)
            if sb is not None and sa is not None and seg_seg_intersect(*sa, *sb).any():
                # touching boundary still allows containment if all vertices in;
                # approximate GEOS by allowing touch (covers-like).  Proper
                # crossing with outside part was excluded by the all-inside test.
                pass
            out[i] = True
        else:
            ax, ay = _points(A, i)
            if len(ax) and np.all(
                (bx[:, None] == ax[None, :]).any(axis=1) &
                (by[:, None] == ay[None, :]).any(axis=1)
            ):
                out[i] = True
    return out


def _rect_point_distance(rects: W.GeometryBatch, pts: W.GeometryBatch,
                         rows: np.ndarray) -> np.ndarray:
    """Vectorized distance from single points to axis-aligned rectangles
    (0 inside): clamp the point into the rect and measure."""
    b = bounds(rects)[rows]
    ps = pts.geom_coord_starts[:-1][rows]
    px = pts.xs[ps]; py = pts.ys[ps]
    dx = np.maximum(np.maximum(b[:, 0] - px, px - b[:, 2]), 0.0)
    dy = np.maximum(np.maximum(b[:, 1] - py, py - b[:, 3]), 0.0)
    return np.hypot(dx, dy)


def pairwise_distance(A: W.GeometryBatch, B: W.GeometryBatch) -> np.ndarray:
    """Row-aligned min distance; 0 when intersecting."""
    n = A.n
    out = np.full(n, np.nan)
    # fast path 1: both pure 2D points
    a_pt = (A.types == W.POINT) & ~A.is_empty()
    b_pt = (B.types == W.POINT) & ~B.is_empty()
    both = a_pt & b_pt
    if both.any():
        sa = A.geom_coord_starts[:-1][both]
        sb = B.geom_coord_starts[:-1][both]
        out[both] = np.hypot(A.xs[sa] - B.xs[sb], A.ys[sa] - B.ys[sb])
    # fast path 2: point vs axis-aligned rectangle (either orientation) —
    # clamp-and-measure, no segment soup
    a_rect = _axis_box_mask(A); b_rect = _axis_box_mask(B)
    pr = ~both & a_pt & _single_point_mask(A) & b_rect
    if pr.any():
        out[pr] = _rect_point_distance(B, A, np.flatnonzero(pr))
    rp = ~both & ~pr & b_pt & _single_point_mask(B) & a_rect
    if rp.any():
        out[rp] = _rect_point_distance(A, B, np.flatnonzero(rp))
    rest = (~both & ~pr & ~rp
            & ~A.is_null() & ~B.is_null() & ~A.is_empty() & ~B.is_empty())
    for i in np.flatnonzero(rest):
        out[i] = _geom_geom_distance(A, i, B, i)
    return out


def _geom_geom_distance(A: W.GeometryBatch, i: int, B: W.GeometryBatch, j: int) -> float:
    if _geom_geom_intersects(A, i, B, j):
        return 0.0
    pa = _points(A, i); pb = _points(B, j)
    sa = _segments(A, i); sb = _segments(B, j)
    best = np.inf
    if len(pa[0]) and len(pb[0]):
        d = np.hypot(pa[0][:, None] - pb[0][None, :], pa[1][:, None] - pb[1][None, :])
        best = min(best, d.min())
    if sb is not None and len(pa[0]):
        best = min(best, _point_seg_dist(pa[0], pa[1], *sb).min())
    if sa is not None and len(pb[0]):
        best = min(best, _point_seg_dist(pb[0], pb[1], *sa).min())
    return float(best)


# ----------------------------------------------------------------------
# constructive
# ----------------------------------------------------------------------

def convex_hull_single(x: np.ndarray, y: np.ndarray):
    """Andrew's monotone chain; returns (hx, hy) CCW without repeated end."""
    pts = np.unique(np.column_stack([x, y]), axis=0)
    if len(pts) <= 2:
        return pts[:, 0], pts[:, 1]
    def half(p):
        out = []
        for px, py in p:
            while len(out) >= 2 and (
                (out[-1][0] - out[-2][0]) * (py - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (px - out[-2][0]) <= 0
            ):
                out.pop()
            out.append((px, py))
        return out
    lower = half(pts)
    upper = half(pts[::-1])
    hull = lower[:-1] + upper[:-1]
    h = np.asarray(hull)
    return h[:, 0], h[:, 1]


def douglas_peucker(x: np.ndarray, y: np.ndarray, tol: float):
    """Iterative Douglas-Peucker keep-mask (reference simplify,
    expr.py:324-328 delegates to GEOS; this is the classic algorithm)."""
    n = len(x)
    if n < 3:
        return np.ones(n, dtype=bool)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        s, e = stack.pop()
        if e <= s + 1:
            continue
        seg_x = x[s:e + 1]; seg_y = y[s:e + 1]
        d = _point_seg_dist(seg_x[1:-1], seg_y[1:-1],
                            np.array([x[s]]), np.array([y[s]]),
                            np.array([x[e]]), np.array([y[e]]))[:, 0]
        if len(d) == 0:
            continue
        imax = int(np.argmax(d))
        if d[imax] > tol:
            mid = s + 1 + imax
            keep[mid] = True
            stack.append((s, mid))
            stack.append((mid, e))
    return keep


def buffer_point(px: float, py: float, dist: float, resolution: int = 16):
    """Circle polygon approximation (quad_segs semantics like GEOS)."""
    k = max(int(resolution) * 4, 4)
    t = np.linspace(0, 2 * np.pi, k, endpoint=False)
    return px + dist * np.cos(t), py + dist * np.sin(t)


def interpolate_on_line(x: np.ndarray, y: np.ndarray, dist: float, normalized: bool):
    seg = np.hypot(np.diff(x), np.diff(y))
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    total = cum[-1]
    d = dist * total if normalized else np.clip(dist, 0, total)
    d = min(max(d, 0.0), total)
    i = int(np.searchsorted(cum, d, side="right") - 1)
    i = min(i, len(seg) - 1) if len(seg) else 0
    if len(seg) == 0 or seg[i] == 0:
        return float(x[i]), float(y[i])
    t = (d - cum[i]) / seg[i]
    return float(x[i] + t * (x[i + 1] - x[i])), float(y[i] + t * (y[i + 1] - y[i]))


def project_on_line(x: np.ndarray, y: np.ndarray, px: float, py: float,
                    normalized: bool) -> float:
    """Linear referencing: distance along line of the nearest point
    (reference `project`, expr.py:1001-1013, tests/test_core.py:253-269)."""
    if len(x) < 2:
        return 0.0
    x1, y1, x2, y2 = x[:-1], y[:-1], x[1:], y[1:]
    dx = x2 - x1; dy = y2 - y1
    ll = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.clip(((px - x1) * dx + (py - y1) * dy) / np.where(ll == 0, 1, ll), 0, 1)
    cx = x1 + t * dx; cy = y1 + t * dy
    d = np.hypot(px - cx, py - cy)
    i = int(np.argmin(d))
    seg = np.sqrt(ll)
    cum = np.concatenate([[0.0], np.cumsum(seg)])
    res = cum[i] + t[i] * seg[i]
    if normalized:
        tot = cum[-1]
        return float(res / tot) if tot else 0.0
    return float(res)
