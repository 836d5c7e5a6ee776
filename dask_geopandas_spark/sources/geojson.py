"""GeoJSON source & sink — pure Python, no GDAL.

The reference reads GeoJSON through ``read_file``/pyogrio (reference
io/file.py:49-149); GDAL is absent in this environment, but GeoJSON is
just JSON, so this module serves the most common ``read_file`` format
natively: executors parse their files with the stdlib ``json`` module
and encode geometries straight to WKB with the repo's kernel.

Reader (`read_geojson`): fragment model like the feather source — one
task per file, so a directory of files parallelizes across the cluster;
handles both classic FeatureCollection documents and newline-delimited
GeoJSONSeq (one Feature per line).  Property schema is inferred from a
driver-side sample of the first file.

Writer (`to_geojson`): one GeoJSONSeq file per Spark partition — the
line-oriented flavor (appendable, re-readable one-task-per-file) that
scales, rather than a single giant FeatureCollection document.

CRS: RFC 7946 fixes GeoJSON to WGS84, so frames default to EPSG:4326.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, BooleanType, DoubleType, LongType,
                               StringType, StructField, StructType)

from . import fs as FS
from ..geometry import wkb as W

_GJ_KIND = {
    "Point": W.POINT,
    "LineString": W.LINESTRING,
    "Polygon": W.POLYGON,
    "MultiPoint": W.MULTIPOINT,
    "MultiLineString": W.MULTILINESTRING,
    "MultiPolygon": W.MULTIPOLYGON,
}
_KIND_GJ = {v: k for k, v in _GJ_KIND.items()}


def _gj_parts(geom: dict):
    """GeoJSON geometry dict → (kind, parts, has_z) for
    `W.serialize_geometry`."""
    t = geom["type"]
    if t == "GeometryCollection":
        subs = [_gj_parts(g) for g in geom.get("geometries", [])]
        hz = any(s[2] for s in subs)
        return W.GEOMETRYCOLLECTION, [(k, p) for k, p, _ in subs], hz
    c = geom["coordinates"]
    if t == "Point":
        arr = np.asarray(c, dtype=float)
        return W.POINT, arr, arr.size >= 3
    if t in ("LineString", "MultiPoint"):
        arr = np.atleast_2d(np.asarray(c, dtype=float))
        return _GJ_KIND[t], arr, arr.shape[1] >= 3 if arr.size else False
    if t in ("Polygon", "MultiLineString"):
        rings = [np.atleast_2d(np.asarray(r, dtype=float)) for r in c]
        hz = any(r.shape[1] >= 3 for r in rings if r.size)
        return _GJ_KIND[t], rings, hz
    if t == "MultiPolygon":
        polys = [[np.atleast_2d(np.asarray(r, dtype=float)) for r in p]
                 for p in c]
        hz = any(r.shape[1] >= 3 for p in polys for r in p if r.size)
        return W.MULTIPOLYGON, polys, hz
    raise ValueError(f"unsupported GeoJSON geometry type {t!r}")


def geojson_geometry_to_wkb(geom: dict | None) -> bytes | None:
    if geom is None:
        return None
    kind, parts, hz = _gj_parts(geom)
    return W.serialize_geometry(kind, parts, hz)


def _features_of(text: str) -> list:
    """Features from a GeoJSON document: FeatureCollection, single
    Feature/geometry, or newline-delimited GeoJSONSeq."""
    text = text.strip()
    try:
        data = json.loads(text)
    except json.JSONDecodeError:
        return [json.loads(line) for line in text.splitlines() if line.strip()]
    if isinstance(data, dict):
        t = data.get("type")
        if t == "FeatureCollection":
            return data.get("features", [])
        if t == "Feature":
            return [data]
        if t in _GJ_KIND or t == "GeometryCollection":
            return [{"type": "Feature", "properties": {}, "geometry": data}]
    raise ValueError("not a GeoJSON document")


def _prop_field(name: str, values: list) -> StructField:
    typed = [v for v in values if v is not None]
    if typed and all(isinstance(v, bool) for v in typed):
        return StructField(name, BooleanType())
    if typed and all(isinstance(v, int) and not isinstance(v, bool)
                     for v in typed):
        return StructField(name, LongType())
    if typed and all(isinstance(v, (int, float)) and not isinstance(v, bool)
                     for v in typed):
        return StructField(name, DoubleType())
    return StructField(name, StringType())


def _prop_value(v, dt):
    if v is None:
        return None
    if isinstance(dt, StringType) and not isinstance(v, str):
        return json.dumps(v)  # nested objects/arrays ride as JSON text
    if isinstance(dt, DoubleType):
        return float(v)
    return v


def read_geojson(spark: SparkSession, path: str, columns=None,
                 geometry: str = "geometry", crs: str = "EPSG:4326",
                 filesystem=None, sample_features: int = 200):
    """Read GeoJSON file(s) → GeoDataFrame.  ``path`` may be a file,
    directory, or (local) glob; suffixes .geojson/.json/.geojsonl/
    .ndjson list from directories.  One read task per file.

    Property schema is inferred from the first ``sample_features``
    features of each of the first 8 files (int/float conflicts widen to
    double; unseen-by-the-sample properties are dropped — raise
    ``sample_features`` for sparse schemas)."""
    from ..core import GeoDataFrame

    sfx = (".geojson", ".json", ".geojsonl", ".ndjson")
    if filesystem is not None or FS.has_scheme(path):
        files = FS.list_files(path, suffixes=sfx, filesystem=filesystem) \
            if FS.is_dir(path, filesystem) else [path]
    elif os.path.isdir(path):
        files = sorted(f for s in sfx
                       for f in glob.glob(os.path.join(path, f"*{s}")))
    else:
        files = sorted(glob.glob(path)) if any(c in path for c in "*?[") else [path]
    if not files:
        raise FileNotFoundError(path)

    # Schema from a driver-side sample: the first `sample_features`
    # features of each of the first 8 files (not just file 0 — a
    # property appearing only in a later file would otherwise be
    # silently dropped, and an int-in-file-1 / float-in-file-2 conflict
    # would surface as an executor cast error; `_prop_field` widens
    # mixed int/float to double).  Properties first seen past the
    # sampled files/features are still not discovered — that is the
    # documented `sample_features` contract (mirrors the reference's
    # meta-from-first-rows behavior).
    sample: list = []
    for fp in files[:8]:
        with FS.open_input(fp, filesystem) as f:
            sample.extend(_features_of(f.read().decode("utf-8"))[:sample_features])
    names: list = []
    for ft in sample:
        for k in (ft.get("properties") or {}):
            if k not in names:
                names.append(k)
    fields = [
        _prop_field(n, [(ft.get("properties") or {}).get(n) for ft in sample])
        for n in names
    ]
    if columns:
        fields = [f for f in fields if f.name in set(columns)]
        names = [f.name for f in fields]
    want_geom = not columns or geometry in set(columns)
    schema = StructType(fields + ([StructField(geometry, BinaryType())]
                                  if want_geom else []))
    dts = {f.name: f.dataType for f in fields}

    frag_df = spark.createDataFrame([(f,) for f in files], "frag_path: string")
    frag_df = frag_df.repartition(min(len(files), 256))

    def read_frag(batches):
        from dask_geopandas_spark.sources import fs as _FS
        from dask_geopandas_spark.sources.geojson import (_features_of,
                                                          _prop_value,
                                                          geojson_geometry_to_wkb)

        for pdf in batches:
            for p in pdf["frag_path"]:
                with _FS.open_input(p, filesystem) as f:
                    feats = _features_of(f.read().decode("utf-8"))
                data = {n: [_prop_value((ft.get("properties") or {}).get(n),
                                        dts[n]) for ft in feats]
                        for n in names}
                if want_geom:
                    data[geometry] = [geojson_geometry_to_wkb(ft.get("geometry"))
                                      for ft in feats]
                yield pd.DataFrame(data, columns=list(schema.fieldNames()))

    df = frag_df.mapInPandas(read_frag, schema=schema)
    if want_geom:
        return GeoDataFrame(df, geometry, crs=crs)
    return df


def _coords(batch: W.GeometryBatch, p: int, hz: bool) -> list:
    s, e = int(batch.path_offsets[p]), int(batch.path_offsets[p + 1])
    cols = [batch.xs[s:e], batch.ys[s:e]]
    if hz and batch.zs is not None:
        cols.append(batch.zs[s:e])
    return np.column_stack(cols).tolist()


def _wkb_to_gj(batch: W.GeometryBatch, i: int, lo: int, hi: int):
    """Geometry i (paths lo..hi) → GeoJSON geometry dict."""
    t = int(batch.types[i])
    hz = bool(batch.has_z[i]) and batch.zs is not None
    ps = range(lo, hi)
    if t == W.POINT:
        c = _coords(batch, lo, hz) if hi > lo else []
        return {"type": "Point", "coordinates": c[0] if c else []}
    if t == W.LINESTRING:
        return {"type": "LineString",
                "coordinates": _coords(batch, lo, hz) if hi > lo else []}
    if t == W.MULTIPOINT:
        return {"type": "MultiPoint",
                "coordinates": [_coords(batch, p, hz)[0] for p in ps]}
    if t == W.MULTILINESTRING:
        return {"type": "MultiLineString",
                "coordinates": [_coords(batch, p, hz) for p in ps]}
    if t == W.POLYGON:
        return {"type": "Polygon",
                "coordinates": [_coords(batch, p, hz) for p in ps]}
    if t == W.MULTIPOLYGON:
        parts: dict = {}
        for p in ps:
            parts.setdefault(int(batch.path_part[p]), []).append(
                _coords(batch, p, hz))
        return {"type": "MultiPolygon", "coordinates": list(parts.values())}
    raise NotImplementedError(
        "to_geojson supports the six concrete geometry types "
        "(GeometryCollection rows are rare in files; read side handles them)")


def to_geojson(gdf_or_df, path: str, filesystem=None) -> None:
    """Write one GeoJSONSeq file (one Feature per line) per partition."""
    df = gdf_or_df.df if hasattr(gdf_or_df, "df") else gdf_or_df
    geometry = getattr(gdf_or_df, "geometry_column", "geometry")
    FS.makedirs(path, filesystem)
    prop_cols = [c for c in df.columns if c != geometry]

    def write_part(batches):
        import uuid

        from dask_geopandas_spark.sources import fs as _FS
        from dask_geopandas_spark.sources.geojson import _wkb_to_gj

        pdfs = list(batches)
        if pdfs:
            pdf = pd.concat(pdfs, ignore_index=True)
            blobs = list(pdf[geometry]) if geometry in pdf else [None] * len(pdf)
            batch = W.parse_wkb(blobs)
            first = np.searchsorted(batch.path_geom, np.arange(batch.n), "left")
            last = np.searchsorted(batch.path_geom, np.arange(batch.n), "right")
            dest = _FS.join(path, f"part-{uuid.uuid4().hex}.geojsonl")
            with _FS.open_output(dest, filesystem) as f:
                for i in range(batch.n):
                    props = {}
                    for c in prop_cols:
                        v = pdf[c].iloc[i]
                        if hasattr(v, "item"):
                            v = v.item()
                        if isinstance(v, float) and v != v:  # NaN → null
                            v = None
                        props[c] = v
                    geom = (None if batch.types[i] == 0 else
                            _wkb_to_gj(batch, i, int(first[i]), int(last[i])))
                    f.write((json.dumps({"type": "Feature",
                                         "properties": props,
                                         "geometry": geom},
                                        allow_nan=False) + "\n").encode())
        yield pd.DataFrame({"files": pd.Series([1], dtype="int64")})

    df.mapInPandas(write_part, schema="files long").collect()
