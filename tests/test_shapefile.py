"""Pure-Python shapefile source/sink tests (no GDAL).

Reference reads shapefiles via read_file/pyogrio (io/file.py:49-149);
this suite pins the repo's stdlib reader/writer: roundtrip of every
geometry family, dbf typing, Z coords, ring orientation, chunked
(partitioned) reads, column pruning, null geometries, and read_file
routing.
"""

import struct

import numpy as np
import pandas as pd
import pytest

import dask_geopandas_spark as dgs
from dask_geopandas_spark.geometry import wkb as W
from dask_geopandas_spark.geometry import wkt as T
from dask_geopandas_spark.sources.shapefile import (read_shapefile,
                                                    to_shapefile)


def _wkt_frame(spark, wkts, extra=None):
    rows = []
    for i, w in enumerate(wkts):
        row = {"id": i, "geometry": None if w is None else T.wkt_to_wkb(w)}
        for k, vals in (extra or {}).items():
            row[k] = vals[i]
        rows.append(row)
    pdf = pd.DataFrame(rows)
    df = spark.createDataFrame(pdf)
    return dgs.GeoDataFrame(df, "geometry", crs="EPSG:4326")


def _roundtrip(spark, tmp_path, wkts, extra=None, name="shp"):
    g = _wkt_frame(spark, wkts, extra)
    path = str(tmp_path / name)
    to_shapefile(g, path)
    return read_shapefile(spark, path)


class TestShapefileRoundtrip:
    def test_points(self, spark, tmp_path):
        back = _roundtrip(spark, tmp_path, [
            "POINT (1 2)", "POINT (-3.5 4.25)", "POINT (180 -90)"])
        rows = {r["id"]: r["geometry"] for r in back.df.collect()}
        b = W.parse_wkb([rows[0]])
        assert b.types[0] == W.POINT
        assert (b.xs[0], b.ys[0]) == (1.0, 2.0)
        assert back.crs == "EPSG:4326"

    def test_lines_and_multilines(self, spark, tmp_path):
        back = _roundtrip(spark, tmp_path, [
            "LINESTRING (0 0, 1 1, 2 0)",
            "MULTILINESTRING ((0 0, 1 0), (0 1, 1 1, 2 1))"])
        rows = {r["id"]: r["geometry"] for r in back.df.collect()}
        b0 = W.parse_wkb([rows[0]])
        assert b0.types[0] == W.LINESTRING and len(b0.xs) == 3
        b1 = W.parse_wkb([rows[1]])
        assert b1.types[0] == W.MULTILINESTRING and b1.n_paths == 2

    def test_polygon_with_hole(self, spark, tmp_path):
        back = _roundtrip(spark, tmp_path, [
            "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0),"
            " (2 2, 4 2, 4 4, 2 4, 2 2))"])
        blob = back.df.collect()[0]["geometry"]
        b = W.parse_wkb([blob])
        assert b.types[0] == W.POLYGON and b.n_paths == 2
        # area must survive (orientation flips are area-preserving)
        from dask_geopandas_spark.geometry import algorithms as A
        assert abs(float(A.area(b)[0]) - 96.0) < 1e-9

    def test_multipolygon(self, spark, tmp_path):
        back = _roundtrip(spark, tmp_path, [
            "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)),"
            " ((5 5, 7 5, 7 7, 5 7, 5 5), (5.5 5.5, 6 5.5, 6 6, 5.5 6, 5.5 5.5)))"])
        blob = back.df.collect()[0]["geometry"]
        b = W.parse_wkb([blob])
        assert b.types[0] == W.MULTIPOLYGON and b.n_paths == 3
        from dask_geopandas_spark.geometry import algorithms as A
        # |1x1| + |2x2 - 0.5x0.5 hole| = 1 + 3.75
        assert abs(float(A.area(b)[0]) - 4.75) < 1e-9

    def test_multipoint_and_null(self, spark, tmp_path):
        back = _roundtrip(spark, tmp_path,
                          ["MULTIPOINT (1 1, 2 2)", None])
        rows = {r["id"]: r["geometry"] for r in back.df.collect()}
        assert W.parse_wkb([rows[0]]).types[0] == W.MULTIPOINT
        assert rows[1] is None

    def test_z_roundtrip(self, spark, tmp_path):
        back = _roundtrip(spark, tmp_path, ["POINT Z (1 2 3)",
                                            "LINESTRING Z (0 0 1, 1 1 2)"])
        rows = {r["id"]: r["geometry"] for r in back.df.collect()}
        b = W.parse_wkb([rows[0]])
        assert bool(b.has_z[0]) and b.zs is not None and b.zs[0] == 3.0
        b1 = W.parse_wkb([rows[1]])
        assert bool(b1.has_z[0]) and list(b1.zs) == [1.0, 2.0]

    def test_attributes_exact(self, spark, tmp_path):
        extra = {"name": ["alpha", "beta-βeta", "c"],
                 "score": [1.5, -2.25e-8, 3.141592653589793],
                 "n": [7, -42, 2**40],
                 "flag": [True, False, None]}
        back = _roundtrip(spark, tmp_path,
                          ["POINT (0 0)", "POINT (1 1)", "POINT (2 2)"],
                          extra=extra)
        rows = sorted(back.df.collect(), key=lambda r: r["id"])
        assert [r["name"] for r in rows] == extra["name"]
        assert [r["score"] for r in rows] == extra["score"]  # repr-exact
        assert [r["n"] for r in rows] == extra["n"]
        assert [r["flag"] for r in rows] == extra["flag"]

    def test_chunked_read_and_pruning(self, spark, tmp_path):
        n = 57
        pdf = pd.DataFrame({"id": np.arange(n, dtype="int64"),
                            "x": np.linspace(-10, 10, n),
                            "y": np.linspace(5, 6, n)})
        g = dgs.points_from_xy(spark.createDataFrame(pdf).coalesce(1), "x", "y")
        path = str(tmp_path / "chunks")
        to_shapefile(g, path)
        back = read_shapefile(spark, path, chunksize=10)
        assert back.df.rdd.getNumPartitions() >= 1
        assert back.count() == n
        assert sorted(r["id"] for r in back.df.select("id").collect()) == \
            list(range(n))
        pruned = read_shapefile(spark, path, columns=["id"])
        assert pruned.columns == ["id"]

    def test_read_file_routes_shp(self, spark, tmp_path):
        g = _wkt_frame(spark, ["POINT (3 4)"])
        path = str(tmp_path / "route")
        to_shapefile(g, path)
        import glob as _g
        shp = _g.glob(path + "/*.shp")[0]
        back = dgs.read_file(spark, shp)
        assert back.count() == 1

    def test_multi_partition_write(self, spark, tmp_path):
        pdf = pd.DataFrame({"id": np.arange(30, dtype="int64"),
                            "x": np.arange(30, dtype="f8"),
                            "y": np.zeros(30)})
        g = dgs.points_from_xy(spark.createDataFrame(pdf).repartition(4),
                               "x", "y")
        path = str(tmp_path / "multi")
        to_shapefile(g, path)
        import glob as _g
        assert len(_g.glob(path + "/*.shp")) >= 2
        back = read_shapefile(spark, path)
        assert back.count() == 30


class TestShapefileFormat:
    def test_header_layout(self, spark, tmp_path):
        g = _wkt_frame(spark, ["POINT (2 3)"])
        path = str(tmp_path / "hdr")
        to_shapefile(g, path)
        import glob as _g
        shp = _g.glob(path + "/*.shp")[0]
        raw = open(shp, "rb").read()
        assert struct.unpack(">i", raw[:4])[0] == 9994
        assert struct.unpack(">i", raw[24:28])[0] * 2 == len(raw)
        version, stype = struct.unpack("<ii", raw[28:36])
        assert version == 1000 and stype == 1
        minx, miny, maxx, maxy = struct.unpack("<4d", raw[36:68])
        assert (minx, miny, maxx, maxy) == (2.0, 3.0, 2.0, 3.0)

    def test_ring_orientation_on_disk(self, spark, tmp_path):
        g = _wkt_frame(spark, [
            "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"])
        path = str(tmp_path / "orient")
        to_shapefile(g, path)
        import glob as _g
        from dask_geopandas_spark.sources.shapefile import (_read_shx,
                                                            _ring_is_cw)
        shp = _g.glob(path + "/*.shp")[0]
        idx = _read_shx(shp)
        raw = open(shp, "rb").read()
        off, ln = int(idx[0, 0]), int(idx[0, 1])
        content = raw[off + 8:off + 8 + ln]
        nparts, npts = struct.unpack("<ii", content[36:44])
        parts = np.frombuffer(content, dtype="<i4", count=nparts, offset=44)
        pts = np.frombuffer(content, dtype="<f8", count=2 * npts,
                            offset=44 + 4 * nparts).reshape(-1, 2)
        rings = [pts[parts[i]:(parts[i + 1] if i + 1 < nparts else npts)]
                 for i in range(nparts)]
        assert _ring_is_cw(rings[0])       # outer written clockwise
        assert not _ring_is_cw(rings[1])   # hole counter-clockwise

    def test_foreign_orientation_read(self, spark, tmp_path):
        """A file whose rings ignore the spec still organizes correctly
        (all-CCW soup -> first ring hosts the rest)."""
        from dask_geopandas_spark.sources.shapefile import _organize_rings
        outer = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype="f8")
        hole = np.array([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]], dtype="f8")
        polys = _organize_rings([outer, hole])  # both CCW
        assert len(polys) == 1 and len(polys[0]) == 2

    def test_two_outers_with_holes(self, spark, tmp_path):
        from dask_geopandas_spark.sources.shapefile import _organize_rings
        o1 = np.array([[0, 0], [0, 4], [4, 4], [4, 0], [0, 0]], dtype="f8")
        o2 = np.array([[10, 0], [10, 4], [14, 4], [14, 0], [10, 0]], dtype="f8")
        h2 = np.array([[11, 1], [12, 1], [12, 2], [11, 2], [11, 1]], dtype="f8")
        polys = _organize_rings([o1, o2, h2])
        assert len(polys) == 2
        hosts = [len(p) for p in polys]
        assert sorted(hosts) == [1, 2]
        # the hole landed in the polygon that contains it
        host = [p for p in polys if len(p) == 2][0]
        assert host[0][:, 0].min() == 10.0

    def test_dbf_null_numerics(self, spark, tmp_path):
        pdf = pd.DataFrame({"id": [0, 1],
                            "v": [1.25, None],
                            "x": [0.0, 1.0], "y": [0.0, 1.0]})
        g = dgs.points_from_xy(spark.createDataFrame(pdf), "x", "y")
        path = str(tmp_path / "nulls")
        to_shapefile(g, path)
        back = read_shapefile(spark, path)
        rows = sorted(back.df.collect(), key=lambda r: r["id"])
        assert rows[0]["v"] == 1.25 and rows[1]["v"] is None


class TestShapefilePropertyRoundtrip:
    def test_random_mixed_layer_roundtrips(self, spark, tmp_path):
        """Property-style roundtrip: a randomized mixed layer of points,
        lines, and (multi)polygons with holes survives write+read with
        exact coordinates (compare via canonical WKT)."""
        rng = np.random.RandomState(42)
        from dask_geopandas_spark.geometry import wkt as T

        wkts = []
        for i in range(40):
            kind = i % 4
            if kind == 0:
                x, y = rng.uniform(-100, 100, 2).round(6)
                wkts.append(f"POINT ({x} {y})")
            elif kind == 1:
                n = rng.randint(2, 6)
                pts = ", ".join(
                    f"{a} {b}" for a, b in rng.uniform(-50, 50, (n, 2)).round(6))
                wkts.append(f"LINESTRING ({pts})")
            elif kind == 2:
                cx, cy = rng.uniform(-40, 40, 2).round(3)
                w, h = rng.uniform(1, 10, 2).round(3)
                wkts.append(
                    f"POLYGON (({cx} {cy}, {cx+w} {cy}, {cx+w} {cy+h}, "
                    f"{cx} {cy+h}, {cx} {cy}))")
            else:
                cx, cy = rng.uniform(-40, 40, 2).round(3)
                wkts.append(
                    f"POLYGON (({cx} {cy}, {cx+10} {cy}, {cx+10} {cy+10}, "
                    f"{cx} {cy+10}, {cx} {cy}), "
                    f"({cx+2} {cy+2}, {cx+4} {cy+2}, {cx+4} {cy+4}, "
                    f"{cx+2} {cy+4}, {cx+2} {cy+2}))")
        g = _wkt_frame(spark, wkts)
        path = str(tmp_path / "prop")
        to_shapefile(g, path)
        back = read_shapefile(spark, path)
        got = {r["id"]: r["geometry"] for r in back.df.collect()}
        from dask_geopandas_spark.geometry import algorithms as A
        for i, w in enumerate(wkts):
            orig = W.parse_wkb([T.wkt_to_wkb(w)])
            rt = W.parse_wkb([got[i]])
            # type preserved, coordinate multiset identical, area/length
            # preserved (ring orientation may flip, order-insensitive)
            assert int(rt.types[0]) == int(orig.types[0]), w
            a = np.sort(np.column_stack([orig.xs, orig.ys]), axis=0)
            b = np.sort(np.column_stack([rt.xs, rt.ys]), axis=0)
            np.testing.assert_allclose(a, b, atol=0)
            np.testing.assert_allclose(A.area(rt), A.area(orig), atol=1e-9)
            np.testing.assert_allclose(A.length(rt), A.length(orig), atol=1e-9)
