"""GML source & sink — pure stdlib XML, no GDAL.

The reference reads GML through ``read_file``/pyogrio (reference
io/file.py:49-149 — OGR's GML driver).  GML is the OGC's published
XML encoding (GML 3.2 Simple Features; the GML 2.1 ``coordinates``
form is also accepted on read), served here natively with the same
ElementTree machinery as the GPX/KML module.

Feature model: children of ``featureMember`` / ``member`` /
``featureMembers`` elements are features; each feature's child
elements are properties — a property whose subtree contains a GML
geometry element becomes the WKB ``geometry`` column, every other
property with text becomes a STRING column (GML attribute types live
in an external XSD this reader deliberately does not fetch — cast
downstream, the KML/untyped contract).

Axis order: a geometry whose ``srsName`` uses the authority-compliant
``urn:ogc:def:crs:EPSG::4326`` form stores coordinates LAT-LON per
the EPSG axis definition and is swapped to lon/lat on read; the
legacy ``EPSG:4326`` form is taken as lon/lat as-is (OGR's
``GML_INVERT_AXIS_ORDER_IF_LAT_LONG`` behavior).  ``srsDimension=3``
adds Z.

XML is unsplittable, so the distributed unit is the FILE — one read
task per file, one ``part-*.gml`` per partition out; floats serialize
as shortest round-trip repr (bit-exact through the text trip).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.types import (BinaryType, StringType, StructField,
                               StructType)

from . import fs as FS
from ..geometry import wkb as W
from ..geometry.wkt import _fmt
from .xmlvector import _list_xml, _local, _read_bytes

_GML_NS = "http://www.opengis.net/gml/3.2"
# ASCII subset of XML NCName: what a to_gml column/feature name may be
_XML_NAME = re.compile(r"[A-Za-z_][A-Za-z0-9._\-]*")
_MEMBER_TAGS = {"featureMember", "member", "featureMembers"}
_GEOM_TAGS = {"Point", "LineString", "Curve", "Polygon", "Surface",
              "MultiPoint", "MultiCurve", "MultiLineString",
              "MultiSurface", "MultiPolygon", "MultiGeometry"}


# Geographic 2D/3D CRS outside the EPSG 4xxx block whose authority
# axis order is lat/lon (the modern national datums INSPIRE-era GML
# actually ships): JGD2011 and GDA2020.
_GEOGRAPHIC_LATLON_EPSG = {6318, 6668, 7844}
# projected CRSes inside the otherwise-geographic EPSG 4xxx block:
# keep stored axis order (World Equidistant Cylindrical sphere/WGS84)
_PROJECTED_4XXX_EPSG = {4087, 4088, 4978}


def _lat_lon_srs(el) -> bool:
    """True when ``srsName`` mandates authority axis order (lat/lon):
    a ``urn:ogc:def:crs:EPSG::<code>`` form naming a GEOGRAPHIC CRS.
    EPSG defines every geographic 2D/3D CRS with latitude first, so
    the 4000-4999 geographic block swaps (4326 WGS84, 4258 ETRS89,
    4269 NAD83, 4283 GDA94, ...), excepting the PROJECTED/geocentric
    codes embedded in it (``_PROJECTED_4XXX_EPSG``: 4087/4088 World
    Equidistant Cylindrical, 4978 geocentric WGS84), plus the
    post-4xxx geographic datums in ``_GEOGRAPHIC_LATLON_EPSG``
    (6318 NAD83(2011), 6668 JGD2011, 7844 GDA2020).
    Unlisted modern geographic codes outside 4xxx keep stored order
    (extend the allowlist as needed).  Projected codes in urn form
    keep their stored order, and legacy ``EPSG:4326`` /
    ``urn:...:CRS84`` are lon/lat as-is — OGR's lat-long inversion
    behavior."""
    srs = el.attrib.get("srsName", "")
    if not (srs.startswith("urn:") and "EPSG" in srs):
        return False
    code = srs.rsplit(":", 1)[-1]
    if not code.isdigit():
        return False
    c = int(code)
    if c in _PROJECTED_4XXX_EPSG:
        return False
    return 4000 <= c <= 4999 or c in _GEOGRAPHIC_LATLON_EPSG


def _srs_epsg(el) -> str | None:
    srs = el.attrib.get("srsName", "")
    if not srs:
        return None
    code = srs.rsplit(":", 1)[-1] or srs.rsplit("::", 1)[-1]
    return f"EPSG:{code}" if code.isdigit() else srs


def _num_text(el) -> list:
    return [float(t) for t in (el.text or "").split()]


def _gml_coords(el, swap: bool) -> np.ndarray:
    """Coordinates of one ring/line/point container: ``pos``/
    ``posList`` (whitespace floats, ``srsDimension`` aware) or the
    GML2 ``coordinates`` form ("x,y x,y ...")."""
    for ch in el.iter():
        lt = _local(ch.tag)
        if lt in ("posList", "pos"):
            dim = int(ch.attrib.get("srsDimension",
                                    el.attrib.get("srsDimension", 2)))
            vals = _num_text(ch)
            arr = np.asarray(vals, dtype=float).reshape(-1, dim)
            if swap:
                arr = arr[:, [1, 0] + list(range(2, dim))]
            return arr
        if lt == "coordinates":
            pts = [[float(v) for v in tok.split(",")]
                   for tok in (ch.text or "").split()]
            arr = np.asarray(pts, dtype=float)
            return arr  # GML2 coordinates are always x,y order
    return np.empty((0, 2))


def _curve_coords(el, swap: bool) -> np.ndarray:
    """A GML Curve's LineStringSegments concatenated into one line
    (consecutive segments sharing an endpoint drop the duplicate)."""
    segs = [_gml_coords(sg, swap) for sg in el.iter()
            if _local(sg.tag) == "LineStringSegment"]
    segs = [s for s in segs if len(s)]
    if not segs:
        return np.empty((0, 2))
    return np.vstack([segs[0]] + [s[1:] if len(s) > 1
                                  and np.allclose(s[0], p[-1]) else s
                                  for p, s in zip(segs, segs[1:])])


def _surface_rings(el, swap: bool) -> list:
    """A GML Surface's rings: every PolygonPatch's rings flattened
    into one exterior-first list (the single-Surface read contract)."""
    return [r for pm in el.iter() if _local(pm.tag) == "PolygonPatch"
            for r in _polygon_rings(pm, swap)]


def _ring_of(el, swap: bool) -> np.ndarray | None:
    for ch in el.iter():
        if _local(ch.tag) == "LinearRing":
            return _gml_coords(ch, swap)
    return None


def _polygon_rings(el, swap: bool) -> list:
    rings = []
    for b in el:
        lb = _local(b.tag)
        if lb in ("exterior", "outerBoundaryIs"):
            r = _ring_of(b, swap)
            if r is not None and len(r):
                rings.insert(0, r)
        elif lb in ("interior", "innerBoundaryIs"):
            r = _ring_of(b, swap)
            if r is not None and len(r):
                rings.append(r)
    return rings


def _gml_geom(el) -> bytes | None:
    """One GML geometry element -> WKB."""
    t = _local(el.tag)
    swap = _lat_lon_srs(el)

    def hz(a):
        return a.shape[1] == 3

    if t == "Point":
        c = _gml_coords(el, swap)
        if not len(c):
            return None
        return W.serialize_geometry(W.POINT, c[0], hz(c))
    if t in ("LineString", "Curve"):
        c = _curve_coords(el, swap) if t == "Curve" \
            else _gml_coords(el, swap)
        if not len(c):
            return None
        return W.serialize_geometry(W.LINESTRING, c, hz(c))
    if t in ("Polygon", "Surface"):
        rings = (_polygon_rings(el, swap) if t == "Polygon"
                 else _surface_rings(el, swap))
        if not rings:
            return None
        return W.serialize_geometry(W.POLYGON, rings, hz(rings[0]))
    if t == "MultiPoint":
        pts = [c[0] for c in (_gml_coords(m, swap) for m in el.iter()
                              if _local(m.tag) == "Point") if len(c)]
        if not pts:
            return None
        return W.serialize_geometry(W.MULTIPOINT, np.asarray(pts))
    if t in ("MultiCurve", "MultiLineString"):
        # members may be plain LineStrings OR GML 3.2 Curves (the
        # usual INSPIRE encoding) — Curves reuse the single-geometry
        # branch's segment concatenation
        lines = []
        for m in el.iter():
            lm = _local(m.tag)
            if lm == "LineString":
                lines.append(_gml_coords(m, swap))
            elif lm == "Curve":
                lines.append(_curve_coords(m, swap))
        lines = [ln for ln in lines if len(ln)]
        if not lines:
            return None
        return W.serialize_geometry(W.MULTILINESTRING, lines)
    if t in ("MultiSurface", "MultiPolygon"):
        # members may be plain Polygons OR GML 3.2 Surfaces
        # (PolygonPatch members), mirroring the single-Surface branch
        polys = []
        for m in el.iter():
            lm = _local(m.tag)
            if lm == "Polygon":
                polys.append(_polygon_rings(m, swap))
            elif lm == "Surface":
                polys.append(_surface_rings(m, swap))
        polys = [p for p in polys if p]
        if not polys:
            return None
        return W.serialize_geometry(W.MULTIPOLYGON, polys)
    if t == "MultiGeometry":
        members = []
        for gm in el:  # direct geometryMember(s) children only
            if _local(gm.tag) not in ("geometryMember", "geometryMembers"):
                continue
            for m in gm:
                if _local(m.tag) in _GEOM_TAGS:
                    g = _gml_geom(m)
                    if g is not None:
                        members.append(g)
        if not members:
            return None
        body = b"".join(members)
        return (b"\x01" + (W.GEOMETRYCOLLECTION).to_bytes(4, "little")
                + len(members).to_bytes(4, "little") + body)
    return None


def _gml_features(data: bytes) -> tuple[list, str | None]:
    """-> ([({prop: text}, wkb|None)], crs).  Features are the child
    elements of featureMember/member containers; crs from the first
    geometry's srsName."""
    root = ET.fromstring(data)
    out = []
    crs = None
    for mem in root.iter():
        if _local(mem.tag) not in _MEMBER_TAGS:
            continue
        for feat in mem:
            props = {}
            geom = None
            for ch in feat:
                lt = _local(ch.tag)
                gel = None
                if lt in _GEOM_TAGS:
                    gel = ch
                else:
                    for sub in ch:
                        if _local(sub.tag) in _GEOM_TAGS:
                            gel = sub
                            break
                if gel is not None:
                    if geom is None:
                        geom = _gml_geom(gel)
                        if crs is None:
                            crs = _srs_epsg(gel)
                elif ch.text is not None and ch.text.strip() != "":
                    props[lt] = ch.text
            out.append((props, geom))
    return out, crs


def read_gml(spark: SparkSession, path: str, columns=None,
             filesystem=None, geometry: str = "geometry"):
    """Read GML file(s) -> GeoDataFrame.  One string column per
    property key seen in the schema-probe prefix (first 8 files — GML
    is XSD-typed but the XSD is not fetched; cast downstream), WKB
    ``geometry``, CRS from the first geometry's ``srsName``.  One read
    task per file.  Reference parity: io/file.py:49-149 (OGR GML
    driver)."""
    from ..core import GeoDataFrame

    files = _list_xml(path, (".gml",), filesystem)
    if not files:
        raise FileNotFoundError(path)
    keys: list = []
    crs = None
    for fp in files[:8]:
        feats, fcrs = _gml_features(_read_bytes(fp, filesystem))
        crs = crs or fcrs
        for props, _g in feats:
            for k in props:
                if k not in keys:
                    keys.append(k)
    schema = StructType([StructField(k, StringType()) for k in keys]
                        + [StructField(geometry, BinaryType())])
    cols = [f.name for f in schema.fields]

    part_df = spark.createDataFrame(
        [(f,) for f in files], "path: string"
    ).repartition(min(len(files), 512))

    def read_part(batches):
        for pdf in batches:
            for fp in pdf["path"]:
                feats, _ = _gml_features(_read_bytes(fp, filesystem))
                rows = [tuple([p.get(k) for k in keys] + [g])
                        for p, g in feats]
                yield pd.DataFrame(rows, columns=cols)

    from .xmlvector import _select_columns

    out = GeoDataFrame(part_df.mapInPandas(read_part, schema=schema),
                       geometry, crs=crs)
    return _select_columns(out, columns, geometry)


# ======================================================================
# writer (GML 3.2 Simple Features, legacy lon/lat srsName)
# ======================================================================
def _pos_list(xs, ys, zs=None) -> str:
    if zs is not None:
        return " ".join(
            f"{_fmt(float(x))} {_fmt(float(y))} {_fmt(float(z))}"
            for x, y, z in zip(xs, ys, zs))
    return " ".join(f"{_fmt(float(x))} {_fmt(float(y))}"
                    for x, y in zip(xs, ys))


def _gml_geom_xml(batch: W.GeometryBatch, i: int, lo: int, hi: int,
                  srs: str) -> str:
    t = int(batch.types[i])
    po = batch.path_offsets
    sa = f' srsName="{srs}"' if srs else ""
    use_z = bool(batch.has_z[i]) and batch.zs is not None
    dim = ' srsDimension="3"' if use_z else ""

    def path(p):
        s, e = int(po[p]), int(po[p + 1])
        return (batch.xs[s:e], batch.ys[s:e],
                batch.zs[s:e] if use_z else None)

    def ring(p, tag):
        xs, ys, zs = path(p)
        return (f"<gml:{tag}><gml:LinearRing><gml:posList{dim}>"
                f"{_pos_list(xs, ys, zs)}</gml:posList></gml:LinearRing>"
                f"</gml:{tag}>")

    def polygon(ring_ids, with_srs):
        parts = [ring(p, "exterior" if j == 0 else "interior")
                 for j, p in enumerate(ring_ids)]
        return (f"<gml:Polygon{sa if with_srs else ''}>"
                f"{''.join(parts)}</gml:Polygon>")

    if t == W.POINT:
        xs, ys, zs = path(lo)
        return (f"<gml:Point{sa}><gml:pos{dim}>"
                f"{_pos_list(xs, ys, zs)}</gml:pos></gml:Point>")
    if t == W.LINESTRING:
        xs, ys, zs = path(lo)
        return (f"<gml:LineString{sa}><gml:posList{dim}>"
                f"{_pos_list(xs, ys, zs)}</gml:posList></gml:LineString>")
    if t == W.POLYGON:
        return polygon(range(lo, hi), True)
    if t == W.MULTIPOINT:
        pts = []
        for p in range(lo, hi):
            xs, ys, zs = path(p)
            for k in range(len(xs)):
                one = _pos_list(xs[k:k + 1], ys[k:k + 1],
                                zs[k:k + 1] if zs is not None else None)
                pts.append(f"<gml:pointMember><gml:Point><gml:pos{dim}>"
                           f"{one}</gml:pos></gml:Point></gml:pointMember>")
        return f"<gml:MultiPoint{sa}>{''.join(pts)}</gml:MultiPoint>"
    if t == W.MULTILINESTRING:
        ls = []
        for p in range(lo, hi):
            xs, ys, zs = path(p)
            ls.append(f"<gml:curveMember><gml:LineString><gml:posList{dim}>"
                      f"{_pos_list(xs, ys, zs)}</gml:posList></gml:LineString>"
                      "</gml:curveMember>")
        return f"<gml:MultiCurve{sa}>{''.join(ls)}</gml:MultiCurve>"
    if t == W.MULTIPOLYGON:
        groups = []
        cur = []
        cur_part = None
        for p in range(lo, hi):
            part = int(batch.path_part[p])
            if cur and part != cur_part:
                groups.append(cur)
                cur = []
            cur_part = part
            cur.append(p)
        if cur:
            groups.append(cur)
        sm = "".join(f"<gml:surfaceMember>{polygon(g, False)}"
                     "</gml:surfaceMember>" for g in groups)
        return f"<gml:MultiSurface{sa}>{sm}</gml:MultiSurface>"
    if t == W.GEOMETRYCOLLECTION:
        # members re-serialized from the row's raw WKB (the fgb sink's
        # GC splitter); GML models this as MultiGeometry
        from ..geometry.setops import _gc_members

        ms = []
        for m in _gc_members(bytes(batch.raw[i])):
            mb = W.parse_wkb([m])
            ms.append("<gml:geometryMember>"
                      + _gml_geom_xml(mb, 0, 0, mb.n_paths, "")
                      + "</gml:geometryMember>")
        return f"<gml:MultiGeometry{sa}>{''.join(ms)}</gml:MultiGeometry>"
    raise NotImplementedError(f"to_gml: geometry type {t}")


def to_gml(gdf_or_df, path: str, feature_name: str = "feature",
           filesystem=None) -> None:
    """Write one ``part-*.gml`` per partition into ``path`` (GML 3.2
    FeatureCollection; legacy ``EPSG:code`` srsName = lon/lat axis
    order, matching this module's reader default).  Every non-geometry
    column becomes a property element (numeric values via shortest
    round-trip repr — a cast on the way back is exact); null
    geometries write as geometry-less features."""
    df = gdf_or_df.df if hasattr(gdf_or_df, "df") else gdf_or_df
    geometry = getattr(gdf_or_df, "geometry_column", "geometry")
    crs = getattr(gdf_or_df, "crs", None)
    srs = str(crs) if crs and str(crs).upper().startswith("EPSG:") else ""
    attr_cols = [c for c in df.columns if c != geometry]
    # column names become XML element tag names — a quote, space, or
    # any XML-special character would emit a file no parser accepts,
    # so reject non-NCName columns up front (driver-side, not in the
    # middle of a 1000-task write)
    bad = [c for c in attr_cols + [feature_name]
           if not _XML_NAME.fullmatch(c)]
    if bad:
        raise ValueError(
            f"to_gml: column/feature names must be valid XML NCNames "
            f"([A-Za-z_][A-Za-z0-9._-]*); rename {bad!r}")
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
                   f'<gml:FeatureCollection xmlns:gml="{_GML_NS}" '
                   'xmlns:dgs="urn:x-dgs:feature">']
            for i in range(batch.n):
                body = []
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
                    body.append(f"<dgs:{c}>{sv}</dgs:{c}>")
                if int(batch.types[i]) != 0:
                    body.append(
                        "<dgs:geom>"
                        + _gml_geom_xml(batch, i, int(first[i]),
                                        int(last[i]), srs)
                        + "</dgs:geom>")
                out.append(
                    f'<gml:featureMember><dgs:{feature_name} '
                    f'gml:id="f{i}">{"".join(body)}</dgs:{feature_name}>'
                    "</gml:featureMember>")
            out.append("</gml:FeatureCollection>")
            stem = f"part-{uuid.uuid4().hex}.gml"
            with _FS.open_output(_FS.join(path, stem), filesystem) as f:
                f.write("\n".join(out).encode("utf-8"))
        yield pd.DataFrame({"files": pd.Series([1], dtype="int64")})

    df.mapInPandas(write_part, schema="files long").collect()
