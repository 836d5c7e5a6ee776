"""Integration tests on the reference's OWN real-world fixtures —
the Natural Earth shapefiles its test suite reads via geopandas
(reference tests/conftest + tests/test_core.py use
naturalearth_lowres / naturalearth_cities).  Real multipolygons,
holes (Lesotho inside South Africa), 243 point cities, mixed dbf
attribute types — everything synthetic fixtures can miss.

The files are read straight from the read-only reference checkout;
nothing is copied."""

import os

import pytest
from pyspark.sql import functions as F

import dask_geopandas_spark as dgs
from dask_geopandas_spark.functions import core as FX

_DATA = "/root/reference/dask_geopandas/tests/data"
LOWRES = f"{_DATA}/naturalearth_lowres/naturalearth_lowres.shp"
CITIES = f"{_DATA}/naturalearth_cities/naturalearth_cities.shp"

pytestmark = pytest.mark.skipif(
    not os.path.exists(LOWRES), reason="reference fixtures not present")


@pytest.fixture(scope="module")
def world(spark):
    return dgs.read_shapefile(spark, LOWRES)


@pytest.fixture(scope="module")
def cities(spark):
    return dgs.read_shapefile(spark, CITIES)


class TestRealWorldRead:
    def test_counts_schema_crs(self, world, cities):
        assert world.df.count() == 177
        assert cities.df.count() == 243
        assert set(world.df.columns) == {"pop_est", "continent", "name",
                                         "iso_a3", "gdp_md_est", "geometry"}
        assert world.crs == "EPSG:4326" and cities.crs == "EPSG:4326"

    def test_geometry_families_and_bounds(self, world):
        types = {r["t"]: r["count"] for r in
                 world.df.groupBy(FX.st_geometrytype(
                     F.col("geometry")).alias("t")).count().collect()}
        assert set(types) == {"Polygon", "MultiPolygon"}
        assert sum(types.values()) == 177
        b = world.total_bounds()
        assert -181 < b[0] < -179 and 83 < b[3] < 84  # world extent

    def test_holes_survive(self, world):
        """South Africa surrounds Lesotho: its polygon must carry an
        interior ring through the dbf/shp parse."""
        row = world.df.filter(F.col("name") == "South Africa").select(
            F.size(FX.st_interiors(F.col("geometry"))).alias("n")
        ).collect()[0]
        assert row["n"] >= 1

    def test_attribute_values(self, world):
        row = {r["name"]: r for r in world.df.select(
            "name", "pop_est", "iso_a3").collect()}
        assert row["Brazil"]["iso_a3"] == "BRA"
        assert row["Brazil"]["pop_est"] > 2e8


class TestRealWorldOps:
    def test_cities_within_countries_sjoin(self, spark, world, cities):
        """Point-in-polygon sjoin on real country shapes: every city
        matches at most a few countries (border towns), the vast
        majority exactly one, and spot-checked capitals land right."""
        j = cities.sjoin(world, predicate="within", strategy="broadcast")
        pairs = j.df.select(F.col("name_left").alias("city"),
                            F.col("name_right").alias("country")).collect()
        by_city = {}
        for r in pairs:
            by_city.setdefault(r["city"], set()).add(r["country"])
        # ocean/microstate cities may miss; coverage must still be high
        assert len(by_city) >= 200
        assert by_city["Rome"] == {"Italy"}
        assert by_city["Canberra"] == {"Australia"}
        assert by_city["Ottawa"] == {"Canada"}
        # Lesotho's hole: Maseru must match Lesotho, NOT South Africa
        assert by_city["Maseru"] == {"Lesotho"}

    def test_dissolve_by_continent(self, world):
        d = world.dissolve(by="continent", aggfunc={"pop_est": "sum"})
        rows = {r["continent"]: r for r in d.df.collect()}
        assert len(rows) == 8  # 6 continents + Antarctica + Seven seas
        assert rows["Asia"]["pop_est"] > 4e9
        # dissolved continent areas exceed any single member's area
        areas = d.df.select(
            "continent",
            FX.st_area(F.col(d.geometry_column)).alias("a")).collect()
        assert all(r["a"] > 0 for r in areas)

    def test_flatgeobuf_roundtrip_real_polygons(self, spark, world,
                                                tmp_path):
        """Real multipolygons-with-holes through the FlatGeobuf
        sink/reader: per-country areas must match the shapefile read
        exactly (coordinates ride as raw doubles both ways)."""
        path = str(tmp_path / "world_fgb")
        slim = dgs.GeoDataFrame(
            world.df.select("name", "geometry"), "geometry",
            crs="EPSG:4326")
        dgs.to_flatgeobuf(slim, path)
        back = dgs.read_flatgeobuf(spark, path)
        a1 = {r["name"]: r["a"] for r in world.df.select(
            "name", FX.st_area(F.col("geometry")).alias("a")).collect()}
        a2 = {r["name"]: r["a"] for r in back.df.select(
            "name", FX.st_area(F.col("geometry")).alias("a")).collect()}
        assert a1 == a2
        assert back.spatial_partitions

    def test_bbox_windowed_fgb_read(self, spark, world, tmp_path):
        """bbox= chunk pruning on the real dataset returns every
        country intersecting the window after exact cx refinement."""
        path = str(tmp_path / "world_fgb2")
        dgs.to_flatgeobuf(dgs.GeoDataFrame(
            world.df.select("name", "geometry"), "geometry",
            crs="EPSG:4326"), path)
        win = (-10.0, 35.0, 30.0, 60.0)  # Europe-ish
        got = dgs.read_flatgeobuf(spark, path, chunksize=16, bbox=win) \
            .cx(xmin=win[0], ymin=win[1], xmax=win[2], ymax=win[3])
        names = {r["name"] for r in got.df.select("name").collect()}
        assert {"France", "Germany", "Italy", "Spain",
                "Poland"} <= names
        assert "Australia" not in names


class TestFormatMatrix:
    """One dataset, every source/sink: a reference user switching
    formats must see identical geometry.  Per-country areas (and row
    counts) must be EXACT across geoparquet, feather, geojson,
    geopackage, flatgeobuf, and shapefile round-trips of the real
    country polygons — every sink stores coordinates as raw doubles or
    repr-round-trip text."""

    def _areas(self, g, name_col="name"):
        return {r[name_col]: r["a"] for r in g.df.select(
            F.col(name_col),
            FX.st_area(F.col(g.geometry_column)).alias("a")).collect()}

    def test_every_format_preserves_real_geometry(self, spark, world,
                                                  tmp_path):
        slim = dgs.GeoDataFrame(
            world.df.select("name", "geometry"), "geometry",
            crs="EPSG:4326")
        want = self._areas(slim)

        from dask_geopandas_spark.sources.feather import (read_feather,
                                                          to_feather)
        from dask_geopandas_spark.sources.geojson import (read_geojson,
                                                          to_geojson)
        from dask_geopandas_spark.sources.geoparquet import (read_parquet,
                                                             to_parquet)

        cases = [
            ("gpq", to_parquet, read_parquet),
            ("fthr", to_feather, read_feather),
            ("gj", to_geojson, read_geojson),
            ("gpkg", dgs.to_geopackage, dgs.read_geopackage),
            ("fgb", dgs.to_flatgeobuf, dgs.read_flatgeobuf),
            ("shp", dgs.to_shapefile, dgs.read_shapefile),
        ]
        for tag, write, read in cases:
            path = str(tmp_path / tag)
            write(slim, path)
            back = read(spark, path)
            got = self._areas(back)
            assert got == want, f"{tag}: area drift"
            assert back.crs == "EPSG:4326", tag
