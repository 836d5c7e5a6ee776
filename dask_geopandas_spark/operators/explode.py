"""explode: multi-part geometries → one row per part (reference
expr.py:387-389, 822-830; tests/test_core.py:357-468).

Spark has no row index, so semantics are order-insensitive row sets
(SURVEY §7 "Index semantics"); implemented as `mapInPandas` so all other
columns replicate without a shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..geometry import wkb as W


def _split_parts_batch(batch: "W.GeometryBatch", blobs: list):
    """One ``parse_wkb`` per Arrow batch (not per row): returns
    (parts_per_row int64 array, per-row part payloads).  Single-part and
    null rows pass their original WKB bytes through untouched; multi
    rows emit one part per path run straight from the columnar
    ``path_offsets`` decomposition.  Paths are emitted in geometry
    order, so each geometry's paths are one contiguous slice found with
    two searchsorted calls — no per-row re-parsing anywhere."""
    counts = np.ones(batch.n, dtype=np.int64)
    per_geom: list = list(blobs)
    if batch.n == 0:
        return counts, per_geom

    multi = np.flatnonzero(np.isin(
        batch.types, (W.MULTIPOINT, W.MULTILINESTRING, W.MULTIPOLYGON,
                      W.GEOMETRYCOLLECTION)))
    if not len(multi):
        return counts, per_geom

    po = batch.path_offsets
    first = np.searchsorted(batch.path_geom, multi, side="left")
    last = np.searchsorted(batch.path_geom, multi, side="right")

    def seg(p, hz):
        s, e = int(po[p]), int(po[p + 1])
        cols = [batch.xs[s:e], batch.ys[s:e]]
        if hz:
            cols.append(batch.zs[s:e])
        return np.column_stack(cols)

    for i, lo, hi in zip(multi, first, last):
        t = int(batch.types[i])
        hz = bool(batch.has_z[i]) and batch.zs is not None
        ps = range(lo, hi)
        if t == W.MULTIPOINT:
            lst = [W.serialize_geometry(W.POINT, seg(p, hz), hz) for p in ps]
        elif t == W.MULTILINESTRING:
            lst = [W.serialize_geometry(W.LINESTRING, seg(p, hz), hz) for p in ps]
        elif t == W.MULTIPOLYGON:
            by_part: dict[int, list] = {}
            for p in ps:
                by_part.setdefault(int(batch.path_part[p]), []).append(seg(p, hz))
            lst = [W.serialize_geometry(W.POLYGON, rings, hz)
                   for rings in by_part.values()]
        else:  # GEOMETRYCOLLECTION
            lst = []
            for p in ps:
                k = batch.path_kind[p]
                if k == W.PK_POINT:
                    lst.append(W.serialize_geometry(W.POINT, seg(p, hz), hz))
                elif k == W.PK_LINE:
                    lst.append(W.serialize_geometry(W.LINESTRING, seg(p, hz), hz))
                else:
                    lst.append(W.serialize_geometry(W.POLYGON, [seg(p, hz)], hz))
        per_geom[i] = lst
        counts[i] = len(lst)
    return counts, per_geom


def explode_geometry(df: DataFrame, geometry: str,
                     index_parts: bool = False) -> DataFrame:
    """``index_parts=True`` adds a ``part_index`` long column numbering
    each part within its source row (the reference's multi-index second
    level, expr.py:822-830 — Spark has no index, so it is a column)."""
    from pyspark.sql.types import LongType, StructField, StructType

    schema = df.schema
    if index_parts:
        schema = StructType(schema.fields + [StructField("part_index", LongType())])

    def gen(batches):
        for pdf in batches:
            blobs = list(pdf[geometry])
            counts, per_geom = _split_parts_batch(W.parse_wkb(blobs), blobs)
            idx = np.repeat(np.arange(len(pdf)), counts)
            out = pdf.iloc[idx].reset_index(drop=True)
            out[geometry] = [p for v in per_geom
                             for p in (v if isinstance(v, list) else [v])]
            if index_parts:
                out["part_index"] = np.concatenate(
                    [np.arange(c) for c in counts]) if len(pdf) else \
                    np.array([], dtype=np.int64)
            yield out

    return df.mapInPandas(gen, schema=schema)
