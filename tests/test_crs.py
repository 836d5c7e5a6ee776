"""UTM / transverse-mercator reprojection tests (reference expr.py:255-257
accepts any pyproj CRS; the engine implements the UTM family closed-form
with the Krüger series — these pin it against independent math)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import dask_geopandas_spark as dgs
from dask_geopandas_spark.core import (_R, _UTM_K0, _WGS84_F, _tm_forward_np,
                                       _tm_inverse_np)


class TestUtmKernel:
    def test_meridian_arc_anchor(self):
        """Northing on the central meridian must equal k0 × the meridian
        arc — computed here by an INDEPENDENT numerical integration of
        the ellipsoid's meridian curvature radius (no shared code with
        the projection)."""
        e2 = _WGS84_F * (2 - _WGS84_F)
        for lat in (10.0, 45.0, 80.0):
            t = np.linspace(0, np.deg2rad(lat), 400001)
            arc = np.trapz(_R * (1 - e2) / (1 - e2 * np.sin(t) ** 2) ** 1.5, t)
            E, N = _tm_forward_np(np.array([9.0]), np.array([lat]), 32, False)
            assert E[0] == pytest.approx(500000.0, abs=1e-6)
            assert N[0] == pytest.approx(_UTM_K0 * arc, abs=1e-3)

    def test_roundtrip_across_zone(self):
        rng = np.random.RandomState(0)
        lon = 9 + rng.uniform(-12, 12, 500)
        lat = rng.uniform(-80, 80, 500)
        E, N = _tm_forward_np(lon, lat, 32, False)
        lon2, lat2 = _tm_inverse_np(E, N, 32, False)
        assert np.abs(lon2 - lon).max() < 1e-8
        assert np.abs(lat2 - lat).max() < 1e-8

    def test_south_false_northing(self):
        E, N = _tm_forward_np(np.array([9.0]), np.array([-30.0]), 32, True)
        En, Nn = _tm_forward_np(np.array([9.0]), np.array([-30.0]), 32, False)
        assert N[0] == pytest.approx(Nn[0] + 10000000.0, abs=1e-9)

    def test_scale_factor_at_central_meridian(self):
        """dE/dlon at the equator on the meridian ≈ k0 × a (the defining
        0.9996 grid scale)."""
        d = 1e-6
        E1, _ = _tm_forward_np(np.array([9.0 - d]), np.array([0.0]), 32, False)
        E2, _ = _tm_forward_np(np.array([9.0 + d]), np.array([0.0]), 32, False)
        scale = (E2[0] - E1[0]) / (np.deg2rad(2 * d) * _R)
        assert scale == pytest.approx(_UTM_K0, rel=1e-6)


class TestToCrsUtm:
    def test_symbolic_native_matches_numpy(self, spark):
        pdf = pd.DataFrame({"id": np.arange(20, dtype="int64"),
                            "lon": np.linspace(3, 27, 20),
                            "lat": np.linspace(-60, 60, 20)})
        g = dgs.points_from_xy(spark.createDataFrame(pdf), "lon", "lat",
                               crs="EPSG:4326")
        u = g.to_crs("EPSG:32633")
        assert u.crs == "EPSG:32633"
        got = (u.df.withColumn("E", u.x).withColumn("N", u.y)
               .select("id", "E", "N").toPandas().sort_values("id"))
        E, N = _tm_forward_np(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(),
                              33, False)
        np.testing.assert_allclose(got["E"].to_numpy(), E, atol=1e-6)
        np.testing.assert_allclose(got["N"].to_numpy(), N, atol=1e-6)
        # native path: x/y consumers prune the (Python) WKB column away
        # entirely — the reprojection math itself is pure column algebra
        sel = (u.df.withColumn("E", u.x).withColumn("N", u.y)
               .select("id", "E", "N"))
        plan = sel._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    def test_wkb_udf_path_matches_symbolic(self, spark):
        """A frame whose geometry came from WKB (no symbolic hint) takes
        the Arrow-batched rewrite UDF — same numbers."""
        pdf = pd.DataFrame({"id": [0, 1, 2],
                            "lon": [5.0, 15.0, 25.0],
                            "lat": [-45.0, 0.0, 45.0]})
        g = dgs.points_from_xy(spark.createDataFrame(pdf), "lon", "lat",
                               crs="EPSG:4326")
        # round-trip through WKB to drop the symbolic hint
        flat = dgs.GeoDataFrame(g.df, "geometry", crs="EPSG:4326")
        u = flat.to_crs("EPSG:32633")
        got = {r["id"]: (r["E"], r["N"]) for r in
               u.df.withColumn("E", u.x).withColumn("N", u.y)
               .select("id", "E", "N").collect()}
        E, N = _tm_forward_np(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(),
                              33, False)
        for i in range(3):
            assert got[i][0] == pytest.approx(E[i], abs=1e-6)
            assert got[i][1] == pytest.approx(N[i], abs=1e-6)

    def test_utm_inverse_to_4326(self, spark):
        pdf = pd.DataFrame({"id": [0, 1], "E": [500000.0, 300000.0],
                            "N": [4982950.4, 6000000.0]})
        g = dgs.points_from_xy(spark.createDataFrame(pdf), "E", "N",
                               crs="EPSG:32633")
        b = g.to_crs("EPSG:4326")
        assert b.crs == "EPSG:4326"
        got = {r["id"]: (r["lon"], r["lat"]) for r in
               b.df.withColumn("lon", b.x).withColumn("lat", b.y)
               .select("id", "lon", "lat").collect()}
        lon, lat = _tm_inverse_np(pdf["E"].to_numpy(), pdf["N"].to_numpy(),
                                  33, False)
        for i in range(2):
            assert got[i][0] == pytest.approx(lon[i], abs=1e-9)
            assert got[i][1] == pytest.approx(lat[i], abs=1e-9)

    def test_estimate_utm_crs(self, spark):
        pdf = pd.DataFrame({"lon": [14.0, 16.0], "lat": [40.0, 50.0]})
        g = dgs.points_from_xy(spark.createDataFrame(pdf), "lon", "lat",
                               crs="EPSG:4326")
        assert g.estimate_utm_crs() == "EPSG:32633"
        # -61° sits inside zone 20 ([-66,-60)); southern hemisphere
        pdf2 = pd.DataFrame({"lon": [-61.0], "lat": [-20.0]})
        g2 = dgs.points_from_xy(spark.createDataFrame(pdf2), "lon", "lat",
                                crs="EPSG:4326")
        assert g2.estimate_utm_crs() == "EPSG:32720"

    def test_unsupported_pair_still_raises(self, spark):
        pdf = pd.DataFrame({"lon": [0.0], "lat": [0.0]})
        g = dgs.points_from_xy(spark.createDataFrame(pdf), "lon", "lat",
                               crs="EPSG:4326")
        with pytest.raises(NotImplementedError):
            g.to_crs("EPSG:31370")
