"""Pure-Python GeoPackage source/sink tests (stdlib sqlite3, no GDAL).

Reference reads .gpkg via read_file/pyogrio (io/file.py:49-149); this
suite pins the repo's reader/writer: GPB header codec, roundtrip of
geometry + attribute types, rowid-range chunked reads, layer registry
correctness, column pruning, and read_file routing.
"""

import sqlite3
import struct

import numpy as np
import pandas as pd
import pytest

import dask_geopandas_spark as dgs
from dask_geopandas_spark.geometry import wkb as W
from dask_geopandas_spark.geometry import wkt as T
from dask_geopandas_spark.sources.geopackage import (gpb_to_wkb,
                                                     read_geopackage,
                                                     to_geopackage,
                                                     wkb_to_gpb)


def _wkt_frame(spark, wkts, extra=None):
    rows = []
    for i, w in enumerate(wkts):
        row = {"id": i, "geometry": None if w is None else T.wkt_to_wkb(w)}
        for k, vals in (extra or {}).items():
            row[k] = vals[i]
        rows.append(row)
    df = spark.createDataFrame(pd.DataFrame(rows))
    return dgs.GeoDataFrame(df, "geometry", crs="EPSG:4326")


class TestGPBCodec:
    def test_roundtrip_no_envelope(self):
        wkb = T.wkt_to_wkb("POINT (1 2)")
        gpb = wkb_to_gpb(wkb, 4326)
        assert gpb[:2] == b"GP" and gpb[3] == 0x01
        assert struct.unpack("<i", gpb[4:8])[0] == 4326
        assert gpb_to_wkb(gpb) == wkb

    def test_strip_envelope(self):
        wkb = T.wkt_to_wkb("POINT (1 2)")
        # flags: little-endian + XY envelope (indicator 1)
        gpb = b"GP\x00\x03" + struct.pack("<i", 0) + struct.pack("<4d", 1, 1, 2, 2) + wkb
        assert gpb_to_wkb(gpb) == wkb

    def test_empty_flag(self):
        gpb = b"GP\x00\x11" + struct.pack("<i", 0) + b"junk"
        assert gpb_to_wkb(gpb) is None

    def test_none(self):
        assert gpb_to_wkb(None) is None and wkb_to_gpb(None, 0) is None


class TestGeoPackageRoundtrip:
    def test_geometries_and_attrs(self, spark, tmp_path):
        extra = {"name": ["alpha", "béta", None],
                 "score": [1.5, -2.25e-8, None],
                 "n": [7, -42, 2**40]}
        g = _wkt_frame(spark, ["POINT (1 2)",
                               "LINESTRING (0 0, 1 1, 2 0)",
                               "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0),"
                               " (1 1, 2 1, 2 2, 1 2, 1 1))"], extra)
        path = str(tmp_path / "gpkg")
        to_geopackage(g, path)
        back = read_geopackage(spark, path)
        assert back.crs == "EPSG:4326"
        rows = sorted(back.df.collect(), key=lambda r: r["id"])
        assert [r["name"] for r in rows] == extra["name"]
        assert [r["score"] for r in rows] == extra["score"]
        assert [r["n"] for r in rows] == extra["n"]
        b = W.parse_wkb([rows[2]["geometry"]])
        assert b.types[0] == W.POLYGON and b.n_paths == 2
        from dask_geopandas_spark.geometry import algorithms as A
        assert abs(float(A.area(b)[0]) - 15.0) < 1e-9

    def test_null_geometry(self, spark, tmp_path):
        g = _wkt_frame(spark, ["POINT (5 5)", None])
        path = str(tmp_path / "gnull")
        to_geopackage(g, path)
        rows = {r["id"]: r["geometry"]
                for r in read_geopackage(spark, path).df.collect()}
        assert rows[1] is None and rows[0] is not None

    def test_chunked_read_and_pruning(self, spark, tmp_path):
        n = 73
        pdf = pd.DataFrame({"id": np.arange(n, dtype="int64"),
                            "x": np.linspace(-10, 10, n),
                            "y": np.linspace(5, 6, n)})
        g = dgs.points_from_xy(spark.createDataFrame(pdf).coalesce(1), "x", "y")
        path = str(tmp_path / "chunks")
        to_geopackage(g, path)
        back = read_geopackage(spark, path, chunksize=10)
        assert back.count() == n
        assert sorted(r["id"] for r in back.df.select("id").collect()) == \
            list(range(n))
        pruned = read_geopackage(spark, path, columns=["id"])
        assert pruned.columns == ["id"]

    def test_multi_partition_write(self, spark, tmp_path):
        pdf = pd.DataFrame({"id": np.arange(40, dtype="int64"),
                            "x": np.arange(40, dtype="f8"),
                            "y": np.zeros(40)})
        g = dgs.points_from_xy(spark.createDataFrame(pdf).repartition(4),
                               "x", "y")
        path = str(tmp_path / "multi")
        to_geopackage(g, path)
        import glob as _g
        assert len(_g.glob(path + "/*.gpkg")) >= 2
        assert read_geopackage(spark, path).count() == 40

    def test_read_file_routes_gpkg(self, spark, tmp_path):
        g = _wkt_frame(spark, ["POINT (3 4)"])
        path = str(tmp_path / "route")
        to_geopackage(g, path)
        import glob as _g
        f = _g.glob(path + "/*.gpkg")[0]
        assert dgs.read_file(spark, f).count() == 1


class TestGeoPackageValidity:
    def test_registry_tables(self, spark, tmp_path):
        """Written parts are standards-valid: application_id, registry
        rows, contents bounds."""
        g = _wkt_frame(spark, ["POINT (10 20)", "POINT (30 -5)"])
        g = dgs.GeoDataFrame(g.df.coalesce(1), "geometry", crs="EPSG:4326")
        path = str(tmp_path / "valid")
        to_geopackage(g, path, layer="pts")
        import glob as _g
        f = _g.glob(path + "/*.gpkg")[0]
        con = sqlite3.connect(f)
        app_id = con.execute("PRAGMA application_id").fetchone()[0]
        assert app_id == 0x47504B47  # 'GPKG'
        row = con.execute(
            "SELECT table_name, data_type, min_x, min_y, max_x, max_y, srs_id "
            "FROM gpkg_contents").fetchone()
        assert row[0] == "pts" and row[1] == "features"
        assert (row[2], row[3], row[4], row[5]) == (10.0, -5.0, 30.0, 20.0)
        assert row[6] == 4326
        gc = con.execute("SELECT table_name, column_name, srs_id "
                         "FROM gpkg_geometry_columns").fetchone()
        assert gc == ("pts", "geometry", 4326)
        # feature blobs start with the GP magic
        blob = con.execute('SELECT geometry FROM "pts" LIMIT 1').fetchone()[0]
        assert bytes(blob[:2]) == b"GP"
        con.close()

    def test_named_layer_selection(self, spark, tmp_path):
        g = _wkt_frame(spark, ["POINT (0 0)"])
        path = str(tmp_path / "layers")
        to_geopackage(g, path, layer="roads")
        assert read_geopackage(spark, path, layer="roads").count() == 1
        with pytest.raises(ValueError, match="no feature layer"):
            read_geopackage(spark, path, layer="nope").count()
