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


def _split_parts(blob: bytes | None) -> list:
    if blob is None:
        return [None]
    batch = W.parse_wkb([blob])
    t = int(batch.types[0])
    if t in (W.POINT, W.LINESTRING, W.POLYGON) or t == 0:
        return [blob]

    def seg(p):
        s, e = batch.path_offsets[p], batch.path_offsets[p + 1]
        cols = [batch.xs[s:e], batch.ys[s:e]]
        if batch.zs is not None and batch.has_z[0]:
            cols.append(batch.zs[s:e])
        return np.column_stack(cols)

    hz = bool(batch.has_z[0]) and batch.zs is not None
    sel = np.flatnonzero(batch.path_geom == 0)
    if t == W.MULTIPOINT:
        return [W.serialize_geometry(W.POINT, seg(p), hz) for p in sel]
    if t == W.MULTILINESTRING:
        return [W.serialize_geometry(W.LINESTRING, seg(p), hz) for p in sel]
    if t == W.MULTIPOLYGON:
        by_part: dict[int, list] = {}
        for p in sel:
            by_part.setdefault(int(batch.path_part[p]), []).append(seg(p))
        return [W.serialize_geometry(W.POLYGON, rings, hz) for rings in by_part.values()]
    if t == W.GEOMETRYCOLLECTION:
        out = []
        for p in sel:
            k = batch.path_kind[p]
            if k == W.PK_POINT:
                out.append(W.serialize_geometry(W.POINT, seg(p), hz))
            elif k == W.PK_LINE:
                out.append(W.serialize_geometry(W.LINESTRING, seg(p), hz))
            else:
                out.append(W.serialize_geometry(W.POLYGON, [seg(p)], hz))
        return out
    return [blob]


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
            reps = pdf[geometry].map(lambda b: _split_parts(b))
            counts = reps.map(len)
            idx = np.repeat(np.arange(len(pdf)), counts)
            out = pdf.iloc[idx].reset_index(drop=True)
            out[geometry] = [p for parts in reps for p in parts]
            if index_parts:
                out["part_index"] = np.concatenate(
                    [np.arange(c) for c in counts]) if len(pdf) else \
                    np.array([], dtype=np.int64)
            yield out

    return df.mapInPandas(gen, schema=schema)
