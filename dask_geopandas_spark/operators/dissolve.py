"""dissolve / union_all: grouped geometry union (reference expr.py:652-703,
33-41; two-phase dd.Aggregation("merge_geometries") → here a grouped-agg
pandas UDF inside a native groupBy, so Spark's hash aggregation handles
distribution and the scalar aggs stay JVM-native).

Union semantics (GEOS parity via the pure-numpy boolean kernel): point
sets deduplicate, line parts collect, and POLYGON parts whose bounding
boxes overlap are merged through ``geometry.booleans.union_polygons``
(true interior-merging union — overlapping areas counted once, shared
edges dissolved, holes preserved).  Bbox-disjoint polygon clusters skip
the arrangement pass and collect directly (identical result).  Mixed
geometry types collect into a GEOMETRYCOLLECTION.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType
from pyspark.sql.functions import pandas_udf

from ..geometry import booleans as B
from ..geometry import wkb as W


def merge_geometries(blobs) -> bytes | None:
    """Combine WKB blobs into one multi-geometry (associative, so valid as
    both the partial and final combine step)."""
    blobs = [b for b in blobs if b is not None]
    if not blobs:
        return None
    batch = W.parse_wkb(blobs)
    kinds = set(int(t) for t in batch.types if t != 0)
    base = {W.MULTIPOINT: W.POINT, W.MULTILINESTRING: W.LINESTRING,
            W.MULTIPOLYGON: W.POLYGON}
    flat = {base.get(k, k) for k in kinds}
    hz = bool(batch.has_z.any()) and batch.zs is not None

    def seg(p):
        s, e = batch.path_offsets[p], batch.path_offsets[p + 1]
        cols = [batch.xs[s:e], batch.ys[s:e]] + ([batch.zs[s:e]] if hz else [])
        return np.column_stack(cols)

    if flat == {W.POINT}:
        pts = np.column_stack([batch.xs, batch.ys] + ([batch.zs] if hz else []))
        if len(pts) == 1:
            return W.serialize_geometry(W.POINT, pts[0], hz)
        # drop exact duplicates: union is a set
        pts = np.unique(pts, axis=0)
        return W.serialize_geometry(W.MULTIPOINT, pts, hz)
    if flat == {W.LINESTRING}:
        lines = [seg(p) for p in range(batch.n_paths)]
        if len(lines) == 1:
            return W.serialize_geometry(W.LINESTRING, lines[0], hz)
        return W.serialize_geometry(W.MULTILINESTRING, lines, hz)
    if flat == {W.POLYGON}:
        polys: list[list] = []
        key = None
        for p in range(batch.n_paths):
            k = (int(batch.path_geom[p]), int(batch.path_part[p]))
            if batch.path_kind[p] == W.PK_RING_OUTER or key != k:
                if batch.path_kind[p] == W.PK_RING_OUTER:
                    polys.append([])
                    key = k
            polys[-1].append(seg(p))
        polys = _merge_polygon_parts(polys, hz)
        if len(polys) == 1:
            return W.serialize_geometry(W.POLYGON, polys[0], hz)
        return W.serialize_geometry(W.MULTIPOLYGON, polys, hz)
    # mixed types → collection of flattened members
    members = []
    for p in range(batch.n_paths):
        k = batch.path_kind[p]
        if k == W.PK_POINT:
            members.append((W.POINT, seg(p)))
        elif k == W.PK_LINE:
            members.append((W.LINESTRING, seg(p)))
        elif k == W.PK_RING_OUTER:
            members.append((W.POLYGON, [seg(p)]))
        else:
            members[-1] = (W.POLYGON, members[-1][1] + [seg(p)])
    return W.serialize_geometry(W.GEOMETRYCOLLECTION, members, hz)


def _merge_polygon_parts(polys: list, hz: bool) -> list:
    """True interior-merging union of polygon parts.  Parts are clustered
    by bbox overlap/touch (union-find over a chunked pairwise check); the
    boolean kernel runs only on clusters with >1 member, so the common
    spatially-disjoint dissolve pays nothing beyond the bbox sweep.
    Z inputs collect without merging (the kernel is 2D)."""
    n = len(polys)
    if hz or n <= 1:
        return polys
    bounds = np.empty((n, 4))
    for i, p in enumerate(polys):
        xs = np.concatenate([np.asarray(r)[:, 0] for r in p])
        ys = np.concatenate([np.asarray(r)[:, 1] for r in p])
        bounds[i] = (xs.min(), ys.min(), xs.max(), ys.max())

    parent = list(range(n))

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    rows = max(1, 4_000_000 // n)
    for s in range(0, n, rows):
        e = min(s + rows, n)
        ov = ((bounds[s:e, None, 0] <= bounds[None, :, 2])
              & (bounds[s:e, None, 2] >= bounds[None, :, 0])
              & (bounds[s:e, None, 1] <= bounds[None, :, 3])
              & (bounds[s:e, None, 3] >= bounds[None, :, 1]))
        ii, jj = np.nonzero(ov)
        for a, b in zip(ii + s, jj):
            if a < b:
                ra, rb = find(int(a)), find(int(b))
                if ra != rb:
                    parent[ra] = rb
    clusters: dict[int, list] = {}
    for i in range(n):
        clusters.setdefault(find(i), []).append(i)
    out: list = []
    for members in clusters.values():
        if len(members) == 1:
            out.append(polys[members[0]])
        else:
            out.extend(B.union_polygons([polys[m] for m in members]))
    return out


@pandas_udf(BinaryType())
def geom_union_agg(g: pd.Series) -> bytes:
    return merge_geometries(list(g))


_AGG_MAP = {
    "first": F.first,
    "last": F.last,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "mean": F.mean,
    "count": F.count,
}


def dissolve(df: DataFrame, geometry: str, by=None, aggfunc="first") -> DataFrame:
    """GROUP BY ``by``; geometry united, other columns via ``aggfunc``
    (str applied to all, or dict col→func — reference expr.py:652-703).
    ``by=None`` → single global group (reference behavior).

    Spark forbids mixing grouped-agg pandas UDFs with JVM aggregates in
    one agg(), so the geometry union and the scalar aggregates run as two
    hash aggregations over the same shuffle key, joined back on the key —
    both sides co-partitioned, so the join adds no extra shuffle of the
    big data."""
    others = [c for c in df.columns if c != geometry and c != by and
              (not isinstance(by, list) or c not in by)]
    if isinstance(aggfunc, dict):
        scalar_aggs = [_AGG_MAP[fn](c).alias(c) for c, fn in aggfunc.items() if c in others]
    else:
        f = _AGG_MAP[aggfunc]
        scalar_aggs = [f(c).alias(c) for c in others]
    geom_agg = geom_union_agg(F.col(geometry)).alias(geometry)
    if by is None:
        gdf = df.agg(geom_agg)
        if not scalar_aggs:
            return gdf
        return gdf.crossJoin(df.agg(*scalar_aggs))
    keys = by if isinstance(by, list) else [by]
    gdf = _partial_union(df, geometry, keys).groupBy(*keys).agg(geom_agg)
    if not scalar_aggs:
        return gdf
    sdf = df.groupBy(*keys).agg(*scalar_aggs)
    return gdf.join(sdf, on=keys)


def _partial_union(df: DataFrame, geometry: str, keys: list) -> DataFrame:
    """Map-side combine for the geometry union: pandas grouped-agg UDFs
    get no partial aggregation from Spark, so without this every geometry
    row shuffles to its key's reducer.  Unioning per (Arrow batch × key)
    first shuffles one partial per batch-key instead — the tree shape the
    reference builds with ApplyConcatApply (expr.py:33-41, 692-694).
    merge_geometries is associative, so partial-of-partials is exact."""
    import pandas as pd

    slim = df.select(*keys, geometry)
    schema = slim.schema

    def combine(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            grouped = pdf.groupby(keys, sort=False, dropna=False)[geometry] \
                .apply(lambda s: merge_geometries(list(s))).reset_index()
            yield grouped[[*keys, geometry]]

    return slim.mapInPandas(combine, schema=schema)


def union_all(df: DataFrame, geometry: str) -> bytes | None:
    """Full-column union.  Two-phase tree shape (reference expr.py:33-41):
    per-partition partial union via applyInPandas on the partition id, then
    a final driver-side merge of the (tiny) partials."""
    from pyspark.sql.functions import spark_partition_id

    partials = (
        df.select(geometry)
        .withColumn("_pid", spark_partition_id())
        .groupBy("_pid")
        .agg(geom_union_agg(F.col(geometry)).alias("g"))
        .collect()
    )
    return merge_geometries([r["g"] for r in partials])
