"""clip: intersect a collection with a constant mask (reference
clip.py:12-47 — partitions pruned against the mask bounds, then
per-partition geopandas.clip).

Spark-first shape: a *native* bbox prefilter (prunes row-groups via
Parquet stats when bbox is materialized) + a vectorized pandas UDF doing
the exact geometric clip.  Convex masks use half-plane kernels
(Sutherland–Hodgman / Cyrus–Beck); concave masks and holed subjects go
through the exact boolean kernel (geometry/booleans.py) — point layers
additionally get a pure-JVM even-odd ray-cast path with no Python stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType
from pyspark.sql.functions import pandas_udf

from ..geometry import algorithms as A
from ..geometry import clipping as CL
from ..geometry import wkb as W
from ..geometry import wkt as T


def _point_in_convex_closed(px: np.ndarray, py: np.ndarray,
                            mx: np.ndarray, my: np.ndarray) -> np.ndarray:
    """Closed-boundary point-in-convex-ring: inside or ON any edge.
    Same cross-product arithmetic as the native half-plane path in
    ``clip`` (and as GEOS clip, which keeps boundary points) — the two
    paths must agree on boundary points, which ray-casting does not
    guarantee."""
    area2 = float(np.sum(mx * np.roll(my, -1) - np.roll(mx, -1) * my))
    sign = 1.0 if area2 >= 0 else -1.0
    keep = np.ones(len(px), dtype=bool)
    n = len(mx)
    for i in range(n):
        x1, y1 = float(mx[i]), float(my[i])
        x2, y2 = float(mx[(i + 1) % n]), float(my[(i + 1) % n])
        if x1 == x2 and y1 == y2:
            continue
        cross = ((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)) * sign
        keep &= cross >= 0
    return keep


def _point_in_ring_closed(px: np.ndarray, py: np.ndarray,
                          mx: np.ndarray, my: np.ndarray) -> np.ndarray:
    """Closed-boundary point-in-(possibly concave)-ring: even-odd ray
    cast plus an explicit on-edge pass (ray casting alone is unreliable
    exactly on the boundary)."""
    inside = A.point_in_rings(px, py, [(mx, my)])
    onedge = np.zeros(len(px), dtype=bool)
    for x1, y1, x2, y2 in _ring_edges(mx, my):
        cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        onedge |= ((cross == 0)
                   & (px >= min(x1, x2)) & (px <= max(x1, x2))
                   & (py >= min(y1, y2)) & (py <= max(y1, y2)))
    return inside | onedge


def _mask_ring(mask) -> tuple[np.ndarray, np.ndarray, bool]:
    """(ring_x, ring_y, is_convex).  Any simple polygon ring works as a
    mask for every layer type: point layers get a pure-JVM even-odd ray
    cast, line/polygon layers route concave masks through the boolean
    kernel and keep the cheaper half-plane kernels when the ring is
    convex.  Holes in the mask polygon are not supported (outer ring
    only — matching the single-ring native SQL path)."""
    if isinstance(mask, str):
        mask = T.wkt_to_wkb(mask)
    if isinstance(mask, (tuple, list)) and len(mask) == 4:
        x0, y0, x1, y1 = mask
        return (np.array([x0, x1, x1, x0], float),
                np.array([y0, y0, y1, y1], float), True)
    batch = W.parse_wkb([bytes(mask)])
    rings = A._poly_rings(batch, 0, outer_only=True)
    if not rings:
        raise ValueError("clip mask must be a polygon or (minx,miny,maxx,maxy)")
    x, y = rings[0]
    return x, y, bool(CL.is_convex_ring(x, y))


def _ring_edges(mx, my):
    """Non-degenerate (x1, y1, x2, y2) edge tuples of a closed ring."""
    n = len(mx)
    out = []
    for i in range(n):
        x1, y1 = float(mx[i]), float(my[i])
        x2, y2 = float(mx[(i + 1) % n]), float(my[(i + 1) % n])
        if x1 != x2 or y1 != y2:
            out.append((x1, y1, x2, y2))
    return out


def point_in_ring_cond(xc, yc, mx, my):
    """Native Column predicate: point (xc, yc) inside-or-on a constant
    (possibly concave) ring — even-odd ray cast to +x, OR on-edge.
    Pure JVM arithmetic over the constant edges: a concave clip of a
    point layer runs with zero Python stages at any scale.

    KEEP IN LOCKSTEP with `point_in_ring_sql` below: the DuckDB oracle
    evaluates that text, and both must perform the identical IEEE
    operations in the identical order (edge deltas are pre-computed
    Python floats embedded as literals in both)."""
    parity = None
    onedge = None
    for x1, y1, x2, y2 in _ring_edges(mx, my):
        cross = (F.lit(x2 - x1) * (yc - F.lit(y1))
                 - F.lit(y2 - y1) * (xc - F.lit(x1)))
        oe = ((cross == F.lit(0.0))
              & (xc >= F.lit(min(x1, x2))) & (xc <= F.lit(max(x1, x2)))
              & (yc >= F.lit(min(y1, y2))) & (yc <= F.lit(max(y1, y2))))
        onedge = oe if onedge is None else (onedge | oe)
        if y1 != y2:
            crosses = (
                ((F.lit(y1) > yc) != (F.lit(y2) > yc))
                & (xc < F.lit(x1) + (yc - F.lit(y1)) * F.lit(x2 - x1)
                   / F.lit(y2 - y1)))
            term = F.when(crosses, F.lit(1)).otherwise(F.lit(0))
            parity = term if parity is None else (parity + term)
    inside = (parity % F.lit(2)) == F.lit(1) if parity is not None else F.lit(False)
    return inside | onedge if onedge is not None else inside


def point_in_ring_sql(px: str, py: str, mx, my) -> str:
    """SQL text equivalent of `point_in_ring_cond` (valid in Spark SQL
    and DuckDB), for oracle replication.  Same formulas, same operation
    order, same pre-computed literals — agreement is pinned by
    tests/test_geodataframe.py::test_point_in_ring_cond_matches_sql."""
    crossing, onedge = [], []
    for x1, y1, x2, y2 in _ring_edges(mx, my):
        cross = (f"({(x2 - x1)!r} * ({py} - {y1!r}) - "
                 f"{(y2 - y1)!r} * ({px} - {x1!r}))")
        onedge.append(
            f"({cross} = 0.0 AND {px} >= {min(x1, x2)!r} AND "
            f"{px} <= {max(x1, x2)!r} AND {py} >= {min(y1, y2)!r} AND "
            f"{py} <= {max(y1, y2)!r})")
        if y1 != y2:
            crossing.append(
                f"(CASE WHEN (({y1!r} > {py}) != ({y2!r} > {py})) AND "
                f"({px} < {x1!r} + ({py} - {y1!r}) * {(x2 - x1)!r} / "
                f"{(y2 - y1)!r}) THEN 1 ELSE 0 END)")
    parity = " + ".join(crossing) if crossing else "0"
    oe = " OR ".join(onedge) if onedge else "FALSE"
    return f"(((({parity}) % 2) = 1) OR {oe})"


def clip(gdf, mask, keep_geom_type: bool = False):
    from ..core import GeoDataFrame

    mx, my, convex = _mask_ring(mask)
    bounds = (float(mx.min()), float(my.min()), float(mx.max()), float(my.max()))

    is_xy = getattr(gdf, "_xy", None) and not gdf._xy[3]
    # stored all-Point datasets qualify only with the materialized bbox
    # struct (the storage convention) — without it the coords would need
    # a UDF anyway, so the generic prefilter+kernel path is no worse
    is_stored_point = (getattr(gdf, "_point", False)
                       and gdf.bbox_column in gdf.columns)
    if is_xy or is_stored_point:
        # Point layer (x/y source columns, or a stored all-Point
        # GeoParquet dataset whose bbox minx/miny ARE the coordinates):
        # clipping never cuts a point, so clip == row filter.  A
        # constant convex mask is the intersection of its edge
        # half-planes — a pure-JVM conjunction of inequalities (closed
        # boundary, matching the kernel's closed rect semantics).  No
        # Python stage at any scale.
        if is_xy:
            xc, yc = gdf._xy[0], gdf._xy[1]
        else:
            gdf = gdf.with_bbox()
            xc = F.col(f"{gdf.bbox_column}.minx")
            yc = F.col(f"{gdf.bbox_column}.miny")
        if not convex:
            # concave mask, point layer: clip == point-in-polygon row
            # filter — even-odd ray cast over the constant edges, still
            # pure JVM (see point_in_ring_cond)
            cond = point_in_ring_cond(xc, yc, mx, my)
        else:
            cond = None
            n = len(mx)
            # ring orientation: signed area > 0 ⇒ CCW ⇒ inside is left
            # of each edge (cross product >= 0)
            area2 = float(np.sum(mx * np.roll(my, -1) - np.roll(mx, -1) * my))
            sign = 1.0 if area2 >= 0 else -1.0
            for i in range(n):
                x1, y1 = float(mx[i]), float(my[i])
                x2, y2 = float(mx[(i + 1) % n]), float(my[(i + 1) % n])
                if x1 == x2 and y1 == y2:
                    continue  # closing vertex repeated
                cross = (F.lit(x2 - x1) * (yc - F.lit(y1))
                         - F.lit(y2 - y1) * (xc - F.lit(x1))) * F.lit(sign)
                c = cross >= 0
                cond = c if cond is None else (cond & c)
        out = GeoDataFrame(gdf.df.filter(cond), gdf.geometry_column,
                           crs_map=getattr(gdf, "_crs", {}))
        out._xy = gdf._xy
        out._point = getattr(gdf, "_point", False)
        return out.with_bbox()

    if gdf.has_native_bbox:
        # native prefilter (pure JVM; pushes toward the scan / parquet
        # stats) — cuts rows before any Python runs
        g = gdf.with_bbox()
        b = g.bbox_column
        pre = g.df.filter(
            (F.col(f"{b}.minx") <= bounds[2]) & (F.col(f"{b}.maxx") >= bounds[0])
            & (F.col(f"{b}.miny") <= bounds[3]) & (F.col(f"{b}.maxy") >= bounds[1])
        )
    else:
        # bbox would come from a UDF evaluated in the same Python stage as
        # the exact clip — a prefilter there is dead weight, skip it
        g = gdf
        b = None
        pre = g.df

    geom = g.geometry_column

    _point_test = _point_in_convex_closed if convex else _point_in_ring_closed

    @pandas_udf(BinaryType())
    def _clip(col: pd.Series) -> pd.Series:
        batch = W.parse_wkb(list(col))
        out: list = [None] * batch.n
        # vectorized fast path: single points keep/drop in one ray-cast
        single = (batch.types == W.POINT) & (batch.geom_coord_counts() == 1)
        if single.any():
            idx = np.flatnonzero(single)
            starts = batch.geom_coord_starts[:-1][idx]
            keep = _point_test(batch.xs[starts], batch.ys[starts], mx, my)
            for i, k in zip(idx, keep):
                out[i] = batch.raw[i] if k else None
        for i in np.flatnonzero(~single & (batch.types != 0)):
            out[i] = _clip_one(batch, int(i), int(batch.types[i]), mx, my,
                               convex)
        return pd.Series(out, dtype=object)

    from ..core import no_pushdown

    clipped = pre.withColumn(geom, _clip(F.col(geom)))
    # drop rows clipped to nothing, then refresh bbox.  no_pushdown: this
    # filter references the clip UDF — pushed below a rebalance exchange
    # it would drag the whole Python stage onto an unsplittable scan
    clipped = clipped.filter(no_pushdown(F.col(geom).isNotNull()))
    if b is not None:
        clipped = clipped.drop(b)
    out = GeoDataFrame(clipped, geom, crs_map=getattr(gdf, "_crs", {}))
    return out.with_bbox()


def _clip_one(batch: W.GeometryBatch, i: int, t: int, mx, my,
              convex: bool = True):
    if t in (W.POINT, W.MULTIPOINT):
        x, y = A._points(batch, i)
        test = _point_in_convex_closed if convex else _point_in_ring_closed
        keep = test(x, y, mx, my)
        if not keep.any():
            return None
        pts = np.column_stack([x[keep], y[keep]])
        if len(pts) == 1:
            return W.serialize_geometry(W.POINT, pts[0])
        return W.serialize_geometry(W.MULTIPOINT, pts)
    if t in (W.LINESTRING, W.MULTILINESTRING):
        if convex:
            pieces = []
            for kind, x, y in A._geom_paths(batch, i):
                pieces.extend(CL.clip_line_to_convex(x, y, mx, my))
            pieces = [np.column_stack(p) for p in pieces if len(p[0]) >= 2]
        else:
            # concave mask: exact split-and-classify line clipping
            # (geometry/booleans.py, reference clip.py:12-47 via GEOS)
            from ..geometry import booleans as B

            lines = [np.column_stack([x, y])
                     for kind, x, y in A._geom_paths(batch, i)
                     if kind == W.PK_LINE and len(x) >= 2]
            pieces = [p for p in B.clip_lines_to_rings(
                lines, [np.column_stack([mx, my])]) if len(p) >= 2]
        if not pieces:
            return None
        if len(pieces) == 1:
            return W.serialize_geometry(W.LINESTRING, pieces[0])
        return W.serialize_geometry(W.MULTILINESTRING, pieces)
    if t in (W.POLYGON, W.MULTIPOLYGON):
        has_holes = any(batch.path_kind[p] == W.PK_RING_HOLE
                        for p in np.flatnonzero(batch.path_geom == i))
        if convex and not has_holes:
            polys = []
            for kind, x, y in A._geom_paths(batch, i):
                if kind != W.PK_RING_OUTER:
                    continue
                rx, ry = CL.sutherland_hodgman(x, y, mx, my)
                if len(rx) >= 3:
                    ring = np.column_stack([np.append(rx, rx[0]),
                                            np.append(ry, ry[0])])
                    polys.append([ring])
        else:
            # concave mask or holed subject: exact boolean kernel overlay
            from ..geometry import booleans as B
            from ..geometry import setops as S

            polys = B.overlay(S.geom_rings(batch, i),
                              [np.column_stack([mx, my])], "intersection")
        if not polys:
            return None
        if len(polys) == 1:
            return W.serialize_geometry(W.POLYGON, polys[0])
        return W.serialize_geometry(W.MULTIPOLYGON, polys)
    return batch.raw[i]
