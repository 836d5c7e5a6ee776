"""GPX & KML vector sources/sinks — pure stdlib XML, no GDAL.

The reference reads both formats through ``read_file``/pyogrio
(reference io/file.py:49-149 — OGR's GPX and LIBKML drivers).  Both
are published open formats (Topografix GPX 1.1; OGC KML 2.2), served
here natively: ``xml.etree.ElementTree`` on the way in, string
building on the way out — no third-party dependency.

XML is not splittable, so the distributed unit is the FILE: readers
fan a ``mapInPandas`` pass over the file list (one task per file, the
driver opens nothing but the schema probe), and sinks write one
``part-*.gpx``/``part-*.kml`` per Spark partition — the many-files
layout every other sink in this package uses, which is what makes a
lake of them scan-parallel at 100 TB.  Floats serialize via shortest
round-trip ``repr`` (the shapefile sink's F-field trick), so
coordinates and numeric attributes survive write→read bit-exact.

Layer model (OGR parity):

* GPX exposes ``waypoints`` (points with name/ele/time), ``tracks``
  (one MultiLineString per ``<trk>``, segments = members), and
  ``routes`` (one LineString per ``<rte>``); CRS is EPSG:4326 by
  spec.
* KML exposes Placemarks — ``<name>``, ``<description>``, and
  ``<ExtendedData>`` attributes (read back as strings: KML is
  untyped), with Point/LineString/Polygon/MultiGeometry geometries.
  Placemarks nest anywhere under Document/Folder trees; the reader
  walks the whole tree.
"""

from __future__ import annotations

import glob
import os
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.types import (BinaryType, DoubleType, StringType,
                               StructField, StructType)

from . import fs as FS
from ..geometry import wkb as W
from ..geometry.wkt import _fmt

_GPX_NS = "http://www.topografix.com/GPX/1/1"
_KML_NS = "http://www.opengis.net/kml/2.2"


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _list_xml(path: str, suffixes: tuple, filesystem=None) -> list:
    if filesystem is not None or FS.has_scheme(path):
        if FS.is_dir(path, filesystem):
            return FS.list_files(path, suffixes=suffixes,
                                 filesystem=filesystem)
        return [path]
    if os.path.isdir(path):
        return sorted(f for s in suffixes
                      for f in glob.glob(os.path.join(path, f"*{s}")))
    return sorted(glob.glob(path)) if any(c in path for c in "*?[") else [path]


def _read_bytes(fp: str, filesystem=None) -> bytes:
    with FS.open_input(fp, filesystem) as f:
        return f.read()


def _select_columns(gdf, columns, geometry):
    """pyogrio-style ``columns=`` pruning: keep the listed attribute
    columns; the geometry column stays unless explicitly excluded by a
    list that names other columns only (then a plain DataFrame comes
    back, matching the engine's other readers)."""
    if columns is None:
        return gdf
    keep = list(columns)
    if geometry in keep:
        from ..core import GeoDataFrame

        return GeoDataFrame(gdf.df.select(*keep), geometry, crs=gdf.crs)
    if not keep:
        raise ValueError("columns must name at least one column")
    return gdf.df.select(*keep)


def _read_kml_bytes(fp: str, filesystem=None) -> bytes:
    """KML file bytes; a ``.kmz`` is a zip whose first ``.kml`` member
    (conventionally ``doc.kml``) is the document — stdlib zipfile, no
    GDAL (OGR's LIBKML driver reads .kmz the same way)."""
    raw = _read_bytes(fp, filesystem)
    if fp.lower().endswith(".kmz"):
        import io
        import zipfile

        with zipfile.ZipFile(io.BytesIO(raw)) as z:
            names = [n for n in z.namelist() if n.lower().endswith(".kml")]
            if not names:
                raise ValueError(f"no .kml member inside {fp}")
            names.sort(key=lambda n: (n.lower() != "doc.kml", n))
            return z.read(names[0])
    return raw


# ======================================================================
# GPX reader
# ======================================================================
def _gpx_rows(data: bytes, layer: str) -> list:
    """Parse one GPX document into rows of the requested layer."""
    root = ET.fromstring(data)
    rows = []
    if layer == "waypoints":
        for el in root.iter():
            if _local(el.tag) != "wpt":
                continue
            name = ele = tstamp = None
            for ch in el:
                lt = _local(ch.tag)
                if lt == "name":
                    name = ch.text
                elif lt == "ele" and ch.text is not None:
                    ele = float(ch.text)
                elif lt == "time":
                    tstamp = ch.text
            pt = np.array([float(el.attrib["lon"]), float(el.attrib["lat"])])
            rows.append((name, ele, tstamp,
                         W.serialize_geometry(W.POINT, pt)))
    elif layer == "tracks":
        for el in root.iter():
            if _local(el.tag) != "trk":
                continue
            name = None
            segs = []
            for ch in el:
                lt = _local(ch.tag)
                if lt == "name":
                    name = ch.text
                elif lt == "trkseg":
                    pts = [(float(p.attrib["lon"]), float(p.attrib["lat"]))
                           for p in ch if _local(p.tag) == "trkpt"]
                    if pts:
                        segs.append(np.asarray(pts, dtype=float))
            if segs:
                rows.append((name, W.serialize_geometry(
                    W.MULTILINESTRING, segs)))
    elif layer == "routes":
        for el in root.iter():
            if _local(el.tag) != "rte":
                continue
            name = None
            pts = []
            for ch in el:
                lt = _local(ch.tag)
                if lt == "name":
                    name = ch.text
                elif lt == "rtept":
                    pts.append((float(ch.attrib["lon"]),
                                float(ch.attrib["lat"])))
            if pts:
                rows.append((name, W.serialize_geometry(
                    W.LINESTRING, np.asarray(pts, dtype=float))))
    else:
        raise ValueError(
            f"layer must be waypoints|tracks|routes, got {layer!r}")
    return rows


def read_gpx(spark: SparkSession, path: str, layer: str = "waypoints",
             columns=None, filesystem=None, geometry: str = "geometry"):
    """Read GPX file(s) -> GeoDataFrame (layer model above; CRS is
    always EPSG:4326 per the GPX spec).  ``path``: one ``.gpx``, a
    directory of them (the sink's layout), or a glob; one read task
    per file.  Reference parity: io/file.py:49-149 (OGR GPX driver's
    waypoints/tracks/routes layers)."""
    from ..core import GeoDataFrame

    if layer not in ("waypoints", "tracks", "routes"):
        raise ValueError(
            f"layer must be waypoints|tracks|routes, got {layer!r}")
    files = _list_xml(path, (".gpx",), filesystem)
    if not files:
        raise FileNotFoundError(path)
    if layer == "waypoints":
        fields = [StructField("name", StringType()),
                  StructField("ele", DoubleType()),
                  StructField("time", StringType())]
    else:
        fields = [StructField("name", StringType())]
    schema = StructType(fields + [StructField(geometry, BinaryType())])
    cols = [f.name for f in schema.fields]

    part_df = spark.createDataFrame(
        [(f,) for f in files], "path: string"
    ).repartition(min(len(files), 512))

    def read_part(batches):
        for pdf in batches:
            for fp in pdf["path"]:
                rows = _gpx_rows(_read_bytes(fp, filesystem), layer)
                yield pd.DataFrame(rows, columns=cols)

    out = GeoDataFrame(part_df.mapInPandas(read_part, schema=schema),
                       geometry, crs="EPSG:4326")
    return _select_columns(out, columns, geometry)


# ======================================================================
# GPX writer
# ======================================================================
def to_gpx(gdf_or_df, path: str, name_col: str | None = None,
           ele_col: str | None = None, time_col: str | None = None,
           filesystem=None) -> None:
    """Write one ``part-*.gpx`` per partition into ``path``.

    POINT rows become ``<wpt>`` (with ``<ele>``/``<time>`` from the
    named columns), LINESTRING rows a single-segment ``<trk>``, and
    MULTILINESTRING rows a multi-segment ``<trk>`` — the shapes GPX
    models; other geometry types raise.  ``name_col`` feeds ``<name>``
    on every element."""
    df = gdf_or_df.df if hasattr(gdf_or_df, "df") else gdf_or_df
    geometry = getattr(gdf_or_df, "geometry_column", "geometry")
    FS.makedirs(path, filesystem)

    def write_part(batches):
        import uuid

        from dask_geopandas_spark.sources import fs as _FS

        pdfs = [p for p in batches if len(p)]
        if pdfs:
            pdf = pd.concat(pdfs, ignore_index=True)
            batch = W.parse_wkb(list(pdf[geometry]))
            first = np.searchsorted(batch.path_geom, np.arange(batch.n),
                                    "left")
            last = np.searchsorted(batch.path_geom, np.arange(batch.n),
                                   "right")
            out = ['<?xml version="1.0" encoding="UTF-8"?>',
                   f'<gpx version="1.1" creator="dask_geopandas_spark" '
                   f'xmlns="{_GPX_NS}">']

            def txt(col, i):
                if col is None or col not in pdf:
                    return None
                v = pdf[col].iloc[i]
                return None if v is None or (isinstance(v, float)
                                             and v != v) else v

            for i in range(batch.n):
                t = int(batch.types[i])
                if t == 0:
                    continue  # GPX has no geometry-less feature
                name = txt(name_col, i)
                nm = (f"<name>{escape(str(name))}</name>"
                      if name is not None else "")
                if t == W.POINT:
                    s = int(batch.path_offsets[first[i]])
                    ele = txt(ele_col, i)
                    tv = txt(time_col, i)
                    body = nm
                    if ele is not None:
                        body += f"<ele>{_fmt(float(ele))}</ele>"
                    if tv is not None:
                        body += f"<time>{escape(str(tv))}</time>"
                    out.append(
                        f'<wpt lat="{_fmt(float(batch.ys[s]))}" '
                        f'lon="{_fmt(float(batch.xs[s]))}">{body}</wpt>')
                elif t in (W.LINESTRING, W.MULTILINESTRING):
                    segs = []
                    for p in range(int(first[i]), int(last[i])):
                        s = int(batch.path_offsets[p])
                        e = int(batch.path_offsets[p + 1])
                        pts = "".join(
                            f'<trkpt lat="{_fmt(float(batch.ys[k]))}" '
                            f'lon="{_fmt(float(batch.xs[k]))}"/>'
                            for k in range(s, e))
                        segs.append(f"<trkseg>{pts}</trkseg>")
                    out.append(f"<trk>{nm}{''.join(segs)}</trk>")
                else:
                    raise NotImplementedError(
                        f"to_gpx: geometry type {t} has no GPX shape "
                        "(points, lines, and multilines only)")
            out.append("</gpx>")
            stem = f"part-{uuid.uuid4().hex}.gpx"
            with _FS.open_output(_FS.join(path, stem), filesystem) as f:
                f.write("\n".join(out).encode("utf-8"))
        yield pd.DataFrame({"files": pd.Series([1], dtype="int64")})

    df.mapInPandas(write_part, schema="files long").collect()


# ======================================================================
# KML reader
# ======================================================================
def _kml_coords(el) -> np.ndarray:
    """<coordinates> text -> (k, 2|3) array (lon,lat[,alt] tuples)."""
    text = ""
    for ch in el.iter():
        if _local(ch.tag) == "coordinates" and ch.text:
            text = ch.text
            break
    pts = []
    ndim = 2
    for tok in text.split():
        parts = tok.split(",")
        lon, lat = float(parts[0]), float(parts[1])
        if len(parts) > 2 and parts[2] != "":
            pts.append((lon, lat, float(parts[2])))
            ndim = 3
        else:
            pts.append((lon, lat))
    if not pts:
        return np.empty((0, 2))
    if ndim == 3:  # pad any 2-tuples with 0 altitude (KML convention)
        pts = [(p + (0.0,))[:3] for p in pts]
    return np.asarray(pts, dtype=float)


def _kml_geom(el) -> bytes | None:
    """One KML geometry element -> WKB."""
    t = _local(el.tag)
    if t == "Point":
        c = _kml_coords(el)
        if not len(c):
            return None
        return W.serialize_geometry(W.POINT, c[0], c.shape[1] == 3)
    if t == "LineString" or t == "LinearRing":
        c = _kml_coords(el)
        return W.serialize_geometry(W.LINESTRING, c, c.shape[1] == 3)
    if t == "Polygon":
        rings = []
        hz = False
        for b in el:
            lb = _local(b.tag)
            if lb in ("outerBoundaryIs", "innerBoundaryIs"):
                c = _kml_coords(b)
                if len(c):
                    hz = hz or c.shape[1] == 3
                    (rings.insert(0, c) if lb == "outerBoundaryIs"
                     else rings.append(c))
        if not rings:
            return None
        if hz:
            rings = [np.column_stack([r, np.zeros(len(r))])
                     if r.shape[1] == 2 else r for r in rings]
        return W.serialize_geometry(W.POLYGON, rings, hz)
    if t == "MultiGeometry":
        members = [m for m in (_kml_geom(ch) for ch in el) if m is not None]
        if not members:
            return None
        codes = [int.from_bytes(m[1:5], "little") % 1000 for m in members]
        if all(c == W.POINT for c in codes):
            b = W.parse_wkb(members)
            return W.serialize_geometry(
                W.MULTIPOINT, np.column_stack([b.xs, b.ys]))
        if all(c == W.LINESTRING for c in codes):
            b = W.parse_wkb(members)
            parts = [np.column_stack([b.xs[s:e], b.ys[s:e]])
                     for s, e in zip(b.path_offsets[:-1],
                                     b.path_offsets[1:])]
            return W.serialize_geometry(W.MULTILINESTRING, parts)
        if all(c == W.POLYGON for c in codes):
            polys = []
            for m in members:
                b = W.parse_wkb([m])
                rings = [np.column_stack([b.xs[s:e], b.ys[s:e]])
                         for s, e in zip(b.path_offsets[:-1],
                                         b.path_offsets[1:])]
                polys.append(rings)
            return W.serialize_geometry(W.MULTIPOLYGON, polys)
        body = b"".join(members)
        return (b"\x01" + (W.GEOMETRYCOLLECTION).to_bytes(4, "little")
                + len(members).to_bytes(4, "little") + body)
    return None


_KML_GEOM_TAGS = {"Point", "LineString", "Polygon", "MultiGeometry"}


def _kml_placemarks(data: bytes) -> list:
    """-> [(name, description, {extended key: value}, wkb|None)]."""
    root = ET.fromstring(data)
    out = []
    for pm in root.iter():
        if _local(pm.tag) != "Placemark":
            continue
        name = desc = None
        ext = {}
        geom = None
        for ch in pm:
            lt = _local(ch.tag)
            if lt == "name":
                name = ch.text
            elif lt == "description":
                desc = ch.text
            elif lt == "ExtendedData":
                for d in ch:
                    if _local(d.tag) != "Data":
                        continue
                    key = d.attrib.get("name")
                    val = None
                    for v in d:
                        if _local(v.tag) == "value":
                            val = v.text
                    if key:
                        ext[key] = val
            elif lt in _KML_GEOM_TAGS:
                geom = _kml_geom(ch)
        out.append((name, desc, ext, geom))
    return out


def read_kml(spark: SparkSession, path: str, columns=None,
             filesystem=None, geometry: str = "geometry"):
    """Read KML file(s) -> GeoDataFrame.  Columns: ``name``,
    ``description`` (when the first file carries any), one string
    column per ``<ExtendedData>`` key of the first file (KML is
    untyped — cast downstream), and WKB ``geometry``; CRS is
    EPSG:4326 by spec.  ``.kmz`` archives (zipped KML) are read via
    stdlib zipfile — a directory may mix ``.kml`` and ``.kmz``.
    Placemarks anywhere in Document/Folder trees are found.  One read task per file; the driver parses only a
    bounded schema-probe prefix of the file list (first 8 files —
    attribute keys absent from all of them are dropped, the
    spark.read.json sampling contract).  Reference parity:
    io/file.py:49-149 (OGR LIBKML driver)."""
    from ..core import GeoDataFrame

    files = _list_xml(path, (".kml", ".kmz"), filesystem)
    if not files:
        raise FileNotFoundError(path)
    keys: list = []
    has_desc = False
    for fp in files[:8]:
        for _, d, ext, _g in _kml_placemarks(
                _read_kml_bytes(fp, filesystem)):
            has_desc = has_desc or d is not None
            for k in ext:
                if k not in keys:
                    keys.append(k)
    fields = [StructField("name", StringType())]
    if has_desc:
        fields.append(StructField("description", StringType()))
    fields += [StructField(k, StringType()) for k in keys]
    schema = StructType(fields + [StructField(geometry, BinaryType())])
    cols = [f.name for f in schema.fields]

    part_df = spark.createDataFrame(
        [(f,) for f in files], "path: string"
    ).repartition(min(len(files), 512))

    def read_part(batches):
        for pdf in batches:
            for fp in pdf["path"]:
                rows = []
                for name, d, ext, g in _kml_placemarks(
                        _read_kml_bytes(fp, filesystem)):
                    row = [name] + ([d] if has_desc else []) \
                        + [ext.get(k) for k in keys] + [g]
                    rows.append(tuple(row))
                yield pd.DataFrame(rows, columns=cols)

    out = GeoDataFrame(part_df.mapInPandas(read_part, schema=schema),
                        geometry, crs="EPSG:4326")
    return _select_columns(out, columns, geometry)


# ======================================================================
# KML writer
# ======================================================================
def _kml_ring(xs, ys, zs=None) -> str:
    if zs is not None:
        return " ".join(
            f"{_fmt(float(x))},{_fmt(float(y))},{_fmt(float(z))}"
            for x, y, z in zip(xs, ys, zs))
    return " ".join(f"{_fmt(float(x))},{_fmt(float(y))}"
                    for x, y in zip(xs, ys))


def _kml_geom_xml(batch: W.GeometryBatch, i: int, lo: int, hi: int) -> str:
    t = int(batch.types[i])
    po = batch.path_offsets
    use_z = bool(batch.has_z[i]) and batch.zs is not None

    def path(p):
        s, e = int(po[p]), int(po[p + 1])
        return (batch.xs[s:e], batch.ys[s:e],
                batch.zs[s:e] if use_z else None)

    if t == W.POINT:
        xs, ys, zs = path(lo)
        return (f"<Point><coordinates>{_kml_ring(xs, ys, zs)}"
                "</coordinates></Point>")
    if t == W.LINESTRING:
        xs, ys, zs = path(lo)
        return (f"<LineString><coordinates>{_kml_ring(xs, ys, zs)}"
                "</coordinates></LineString>")
    if t == W.POLYGON:
        parts = []
        for p in range(lo, hi):
            xs, ys, zs = path(p)
            tag = "outerBoundaryIs" if p == lo else "innerBoundaryIs"
            parts.append(
                f"<{tag}><LinearRing><coordinates>{_kml_ring(xs, ys, zs)}"
                f"</coordinates></LinearRing></{tag}>")
        return f"<Polygon>{''.join(parts)}</Polygon>"
    if t == W.MULTIPOINT:
        pts = []
        for p in range(lo, hi):
            xs, ys, zs = path(p)
            for k in range(len(xs)):
                one = _kml_ring(xs[k:k + 1], ys[k:k + 1],
                                zs[k:k + 1] if zs is not None else None)
                pts.append(f"<Point><coordinates>{one}"
                           "</coordinates></Point>")
        return f"<MultiGeometry>{''.join(pts)}</MultiGeometry>"
    if t == W.MULTILINESTRING:
        ls = []
        for p in range(lo, hi):
            xs, ys, zs = path(p)
            ls.append(f"<LineString><coordinates>{_kml_ring(xs, ys, zs)}"
                      "</coordinates></LineString>")
        return f"<MultiGeometry>{''.join(ls)}</MultiGeometry>"
    if t == W.MULTIPOLYGON:
        polys = []
        cur = []
        cur_part = None
        for p in range(lo, hi):
            part = int(batch.path_part[p])
            if cur and part != cur_part:
                polys.append(cur)
                cur = []
            cur_part = part
            cur.append(p)
        if cur:
            polys.append(cur)
        out = []
        for ring_ids in polys:
            parts = []
            for j, p in enumerate(ring_ids):
                xs, ys, zs = path(p)
                tag = "outerBoundaryIs" if j == 0 else "innerBoundaryIs"
                parts.append(
                    f"<{tag}><LinearRing><coordinates>"
                    f"{_kml_ring(xs, ys, zs)}"
                    f"</coordinates></LinearRing></{tag}>")
            out.append(f"<Polygon>{''.join(parts)}</Polygon>")
        return f"<MultiGeometry>{''.join(out)}</MultiGeometry>"
    raise NotImplementedError(f"to_kml: geometry type {t}")


def to_kml(gdf_or_df, path: str, name_col: str | None = None,
           filesystem=None) -> None:
    """Write one ``part-*.kml`` per partition into ``path``.

    ``name_col`` feeds ``<name>``; every other non-geometry column
    becomes an ``<ExtendedData><Data name=...>`` entry (numeric values
    via shortest round-trip repr so a cast on the way back is exact).
    Null geometries write as geometry-less Placemarks."""
    df = gdf_or_df.df if hasattr(gdf_or_df, "df") else gdf_or_df
    geometry = getattr(gdf_or_df, "geometry_column", "geometry")
    FS.makedirs(path, filesystem)
    attr_cols = [c for c in df.columns if c not in (geometry, name_col)]

    def write_part(batches):
        import uuid

        from dask_geopandas_spark.sources import fs as _FS

        pdfs = [p for p in batches if len(p)]
        if pdfs:
            pdf = pd.concat(pdfs, ignore_index=True)
            batch = W.parse_wkb(list(pdf[geometry]))
            first = np.searchsorted(batch.path_geom, np.arange(batch.n),
                                    "left")
            last = np.searchsorted(batch.path_geom, np.arange(batch.n),
                                   "right")
            out = ['<?xml version="1.0" encoding="UTF-8"?>',
                   f'<kml xmlns="{_KML_NS}"><Document>']
            for i in range(batch.n):
                body = []
                if name_col and name_col in pdf:
                    v = pdf[name_col].iloc[i]
                    if v is not None and not (isinstance(v, float)
                                              and v != v):
                        body.append(f"<name>{escape(str(v))}</name>")
                if attr_cols:
                    data = []
                    for c in attr_cols:
                        v = pdf[c].iloc[i]
                        if v is None or (isinstance(v, float) and v != v):
                            continue
                        if isinstance(v, float):
                            sv = _fmt(v)
                        elif isinstance(v, (int, np.integer)):
                            sv = str(int(v))
                        else:
                            sv = escape(str(v))
                        # quoteattr (not escape): column names may
                        # contain double quotes, which escape() leaves
                        # alone — inside an attribute that's malformed
                        # XML the reader can't parse back
                        data.append(f"<Data name={quoteattr(c)}>"
                                    f"<value>{sv}</value></Data>")
                    if data:
                        body.append(
                            f"<ExtendedData>{''.join(data)}</ExtendedData>")
                if int(batch.types[i]) != 0:
                    body.append(_kml_geom_xml(batch, i, int(first[i]),
                                              int(last[i])))
                out.append(f"<Placemark>{''.join(body)}</Placemark>")
            out.append("</Document></kml>")
            stem = f"part-{uuid.uuid4().hex}.kml"
            with _FS.open_output(_FS.join(path, stem), filesystem) as f:
                f.write("\n".join(out).encode("utf-8"))
        yield pd.DataFrame({"files": pd.Series([1], dtype="int64")})

    df.mapInPandas(write_part, schema="files long").collect()
