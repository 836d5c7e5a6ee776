"""Distributed overlay tests (operators/overlay.py — beyond-reference;
geopandas.overlay parity on polygon layers).  All cases use integer
boxes so expected areas are exact closed forms."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import dask_geopandas_spark as dgs
from dask_geopandas_spark.functions import core as FX
from dask_geopandas_spark.operators.overlay import overlay


def _boxes(spark, rows, pre=""):
    """rows: list of (id, minx, miny, maxx, maxy); ``pre`` prefixes the
    column names so the two layers don't collide (collisions suffix like
    sjoin's, pinned in test_suffix_collision)."""
    cols = [f"{pre}bid", f"{pre}x0", f"{pre}y0", f"{pre}x1", f"{pre}y1"]
    pdf = pd.DataFrame(rows, columns=cols)
    df = spark.createDataFrame(pdf)
    for c in cols[1:]:
        df = df.withColumn(c, F.col(c).cast("double"))
    return dgs.boxes_from_bounds(df, *cols[1:], crs="EPSG:4326")


def _areas(g):
    out = g.df.withColumn("_a", FX.st_area(F.col(g.geometry_column)))
    return out


class TestOverlayIntersection:
    def test_pairwise_pieces(self, spark):
        left = _boxes(spark, [(1, 0, 0, 10, 10), (2, 20, 0, 30, 10)])
        right = _boxes(spark, [(100, 5, 5, 25, 15)], pre="r")
        res = overlay(left, right, how="intersection")
        rows = _areas(res).select("bid", "rbid", "_a").collect()
        got = {(r["bid"], r["rbid"]): r["_a"] for r in rows}
        assert got == {(1, 100): pytest.approx(25.0),
                       (2, 100): pytest.approx(25.0)}

    def test_disjoint_yields_nothing(self, spark):
        left = _boxes(spark, [(1, 0, 0, 1, 1)])
        right = _boxes(spark, [(2, 5, 5, 6, 6)], pre="r")
        assert overlay(left, right, how="intersection").count() == 0


class TestOverlayDifference:
    def test_hole_punch(self, spark):
        """10x10 minus a strictly interior 2x2 -> holed polygon, area 96."""
        left = _boxes(spark, [(1, 0, 0, 10, 10)])
        right = _boxes(spark, [(9, 4, 4, 6, 6)], pre="r")
        res = overlay(left, right, how="difference")
        rows = _areas(res).select("bid", "_a").collect()
        assert len(rows) == 1
        assert rows[0]["_a"] == pytest.approx(96.0)
        # right-side attributes are absent on the difference leg
        assert "rbid" not in [c for c in res.df.columns] or \
            res.df.filter(F.col("rbid").isNotNull()).count() == 0

    def test_union_of_overlappers_not_double_subtracted(self, spark):
        """Two OVERLAPPING right boxes must subtract as their union:
        10x10 minus ([2,6]x[0,10] union [4,8]x[0,10]) = area 40, not 20."""
        left = _boxes(spark, [(1, 0, 0, 10, 10)])
        right = _boxes(spark, [(7, 2, 0, 6, 10), (8, 4, 0, 8, 10)], pre="r")
        res = overlay(left, right, how="difference")
        rows = _areas(res).select("_a").collect()
        assert sum(r["_a"] for r in rows) == pytest.approx(40.0)

    def test_untouched_rows_pass_through(self, spark):
        left = _boxes(spark, [(1, 0, 0, 2, 2), (2, 50, 50, 60, 60)])
        right = _boxes(spark, [(9, 1, 1, 3, 3)], pre="r")
        res = overlay(left, right, how="difference")
        got = {r["bid"]: r["_a"] for r in _areas(res).select("bid", "_a").collect()}
        assert got[1] == pytest.approx(3.0)    # 4 - 1 overlap
        assert got[2] == pytest.approx(100.0)  # untouched, exact passthrough

    def test_swallowed_row_disappears(self, spark):
        left = _boxes(spark, [(1, 2, 2, 4, 4)])
        right = _boxes(spark, [(9, 0, 0, 10, 10)], pre="r")
        assert overlay(left, right, how="difference").count() == 0


class TestOverlayCompound:
    def test_union_pieces(self, spark):
        """[0,4]² and [2,6]² union overlay: 3 pieces with areas 4,12,12."""
        left = _boxes(spark, [(1, 0, 0, 4, 4)])
        right = _boxes(spark, [(2, 2, 2, 6, 6)], pre="r")
        res = overlay(left, right, how="union")
        rows = _areas(res).select("bid", "rbid", "_a").collect()
        pieces = {(r["bid"], r["rbid"]): r["_a"] for r in rows}
        assert pieces[(1, 2)] == pytest.approx(4.0)      # intersection
        assert pieces[(1, None)] == pytest.approx(12.0)  # left diff
        assert pieces[(None, 2)] == pytest.approx(12.0)  # right diff
        total = sum(pieces.values())
        assert total == pytest.approx(28.0)              # area of union cover

    def test_symmetric_difference(self, spark):
        left = _boxes(spark, [(1, 0, 0, 4, 4)])
        right = _boxes(spark, [(2, 2, 2, 6, 6)], pre="r")
        res = overlay(left, right, how="symmetric_difference")
        rows = _areas(res).select("_a").collect()
        assert sorted(round(r["_a"], 9) for r in rows) == [12.0, 12.0]

    def test_identity(self, spark):
        left = _boxes(spark, [(1, 0, 0, 4, 4)])
        right = _boxes(spark, [(2, 2, 2, 6, 6)], pre="r")
        res = overlay(left, right, how="identity")
        total = sum(r["_a"] for r in _areas(res).select("_a").collect())
        assert total == pytest.approx(16.0)  # covers exactly the left layer

    def test_geometry_name_and_crs_preserved(self, spark):
        """Both layers named 'geometry' (the common case): the output
        keeps the LEFT layer's geometry name (geopandas.overlay parity,
        not 'geometry_left') and res.crs resolves to the left CRS."""
        l = _boxes(spark, [(1, 0, 0, 4, 4)])
        r = _boxes(spark, [(2, 2, 2, 6, 6)])
        assert l.geometry_column == r.geometry_column == "geometry"
        res = overlay(l, r, how="intersection", strategy="broadcast")
        assert res.geometry_column == "geometry"
        assert "geometry_left" not in res.df.columns
        assert res.crs == l.crs

    def test_bad_how_raises(self, spark):
        left = _boxes(spark, [(1, 0, 0, 1, 1)])
        with pytest.raises(ValueError, match="how must be"):
            overlay(left, left, how="nope")


class TestOverlayGrid:
    def test_grid_strategy_matches_broadcast(self, spark):
        rng = np.random.RandomState(3)
        lrows = [(i, x, y, x + 3, y + 3) for i, (x, y) in
                 enumerate(zip(rng.uniform(0, 40, 25), rng.uniform(0, 40, 25)))]
        rrows = [(100 + i, x, y, x + 4, y + 4) for i, (x, y) in
                 enumerate(zip(rng.uniform(0, 40, 10), rng.uniform(0, 40, 10)))]
        left, right = _boxes(spark, lrows), _boxes(spark, rrows, pre="r")
        tb = (0.0, 0.0, 45.0, 45.0)
        a = overlay(left, right, how="intersection", strategy="broadcast")
        b = overlay(left, right, how="intersection", strategy="grid",
                    total_bounds=tb)
        ka = sorted((r["bid"], r["rbid"], round(r["_a"], 6))
                    for r in _areas(a).select("bid", "rbid", "_a").collect())
        kb = sorted((r["bid"], r["rbid"], round(r["_a"], 6))
                    for r in _areas(b).select("bid", "rbid", "_a").collect())
        assert ka == kb and len(ka) > 0


class TestOverlayKernelPath:
    def test_concave_intersection_via_kernel(self, spark):
        """Frames without the envelope-exact hint (WKT-built) route
        through the boolean-kernel UDF; an L-shape x rectangle
        intersection has exact area by decomposition."""
        from dask_geopandas_spark.geometry import wkt as T

        l_wkt = "POLYGON ((0 0, 6 0, 6 2, 2 2, 2 6, 0 6, 0 0))"  # L, area 20
        r_wkt = "POLYGON ((1 1, 5 1, 5 5, 1 5, 1 1))"            # 4x4 square
        ldf = spark.createDataFrame(
            pd.DataFrame({"lid": [1], "geometry": [T.wkt_to_wkb(l_wkt)]}))
        rdf = spark.createDataFrame(
            pd.DataFrame({"rid": [2], "geometry": [T.wkt_to_wkb(r_wkt)]}))
        left = dgs.GeoDataFrame(ldf, "geometry", crs="EPSG:4326")
        right = dgs.GeoDataFrame(rdf, "geometry", crs="EPSG:4326")
        assert not getattr(left, "envelope_exact", False)
        res = overlay(left, right, how="intersection", strategy="broadcast")
        rows = _areas(res).select("lid", "rid", "_a").collect()
        # L ∩ square = [1,5]x[1,2] ∪ [1,2]x[2,5] -> 4 + 3 = 7
        assert len(rows) == 1
        assert rows[0]["_a"] == pytest.approx(7.0)

    def test_fast_path_equals_kernel_path(self, spark):
        """Envelope-exact frames (fast path) and the same data without
        the hint (kernel path) produce identical pieces."""
        rng = np.random.RandomState(4)
        lrows = [(i, x, y, x + 3, y + 3) for i, (x, y) in
                 enumerate(zip(rng.uniform(0, 30, 15), rng.uniform(0, 30, 15)))]
        rrows = [(100 + i, x, y, x + 4, y + 4) for i, (x, y) in
                 enumerate(zip(rng.uniform(0, 30, 8), rng.uniform(0, 30, 8)))]
        lf, rf = _boxes(spark, lrows), _boxes(spark, rrows, pre="r")
        fast = overlay(lf, rf, how="intersection", strategy="broadcast")
        # strip the hint: rebuild plain frames over the same WKB
        lplain = dgs.GeoDataFrame(lf.df, "geometry", crs="EPSG:4326")
        rplain = dgs.GeoDataFrame(rf.df, "geometry", crs="EPSG:4326")
        slow = overlay(lplain, rplain, how="intersection",
                       strategy="broadcast")
        kf = sorted((r["bid"], r["rbid"], round(r["_a"], 9))
                    for r in _areas(fast).select("bid", "rbid", "_a").collect())
        ks = sorted((r["bid"], r["rbid"], round(r["_a"], 9))
                    for r in _areas(slow).select("bid", "rbid", "_a").collect())
        assert kf == ks and len(kf) > 0


class TestOverlayLinesAndPoints:
    def test_line_layer_intersection_lengths(self, spark):
        """Roads × admin boxes: intersection pieces are the clipped
        line segments, with exact lengths."""
        from dask_geopandas_spark.geometry import wkt as T

        lines = [(0, "LINESTRING (0 5, 20 5)"),     # horizontal through both
                 (1, "LINESTRING (5 -10, 5 30)"),   # vertical through box A
                 (2, "LINESTRING (100 0, 101 0)")]  # outside
        ldf = spark.createDataFrame(
            pd.DataFrame({"lid": [i for i, _ in lines],
                          "geometry": [T.wkt_to_wkb(w) for _, w in lines]}))
        left = dgs.GeoDataFrame(ldf, "geometry", crs="EPSG:4326")
        right = _boxes(spark, [(10, 0, 0, 10, 10), (11, 12, 0, 18, 10)],
                       pre="r")
        res = overlay(left, right, how="intersection", strategy="broadcast")
        out = res.df.withColumn(
            "_len", FX.st_length(F.col(res.geometry_column)))
        got = {(r["lid"], r["rbid"]): r["_len"]
               for r in out.select("lid", "rbid", "_len").collect()}
        assert got == {(0, 10): pytest.approx(10.0),
                       (0, 11): pytest.approx(6.0),
                       (1, 10): pytest.approx(10.0)}

    def test_line_layer_difference(self, spark):
        from dask_geopandas_spark.geometry import wkt as T

        ldf = spark.createDataFrame(pd.DataFrame({
            "lid": [0], "geometry": [T.wkt_to_wkb("LINESTRING (0 5, 30 5)")]}))
        left = dgs.GeoDataFrame(ldf, "geometry", crs="EPSG:4326")
        # two OVERLAPPING boxes: subtrahend must union first
        right = _boxes(spark, [(1, 5, 0, 15, 10), (2, 10, 0, 20, 10)],
                       pre="r")
        res = overlay(left, right, how="difference", strategy="broadcast")
        out = res.df.withColumn(
            "_len", FX.st_length(F.col(res.geometry_column)))
        lens = sorted(round(r["_len"], 9) for r in out.select("_len").collect())
        assert lens == [pytest.approx(15.0)]  # [0,5] + [20,30] in one row

    def test_point_layer_difference(self, spark):
        pdf = pd.DataFrame({"pid": [0, 1, 2],
                            "x": [1.0, 5.0, 50.0], "y": [1.0, 5.0, 50.0]})
        left = dgs.points_from_xy(spark.createDataFrame(pdf), "x", "y")
        right = _boxes(spark, [(9, 0, 0, 10, 10)], pre="r")
        res = overlay(left, right, how="difference", strategy="broadcast")
        assert sorted(r["pid"] for r in res.df.select("pid").collect()) == [2]


class TestKeepGeomType:
    def test_line_line_crossings_dropped_by_default(self, spark):
        """line×line intersection reduces to crossing POINTS — dropped
        under keep_geom_type=True (the geopandas default), kept with
        keep_geom_type=False."""
        from dask_geopandas_spark.geometry import wkt as T

        ldf = spark.createDataFrame(pd.DataFrame({
            "lid": [0], "geometry": [T.wkt_to_wkb("LINESTRING (0 0, 10 10)")]}))
        rdf = spark.createDataFrame(pd.DataFrame({
            "rid": [1], "geometry": [T.wkt_to_wkb("LINESTRING (0 10, 10 0)")]}))
        left = dgs.GeoDataFrame(ldf, "geometry", crs="EPSG:4326")
        right = dgs.GeoDataFrame(rdf, "geometry", crs="EPSG:4326")
        kept = overlay(left, right, how="intersection", strategy="broadcast")
        assert kept.count() == 0
        raw = overlay(left, right, how="intersection", strategy="broadcast",
                      keep_geom_type=False)
        rows = raw.df.collect()
        assert len(rows) == 1
        from dask_geopandas_spark.geometry import wkb as W
        b = W.parse_wkb([rows[0][raw.geometry_column]])
        assert int(b.types[0]) in (W.POINT, W.MULTIPOINT)

    def test_same_dim_pieces_unaffected(self, spark):
        """Polygon×polygon pieces keep flowing under the default."""
        left = _boxes(spark, [(1, 0, 0, 4, 4)])
        right = _boxes(spark, [(2, 2, 2, 6, 6)], pre="r")
        lplain = dgs.GeoDataFrame(left.df, "geometry", crs="EPSG:4326")
        rplain = dgs.GeoDataFrame(right.df, "geometry", crs="EPSG:4326")
        res = overlay(lplain, rplain, how="intersection",
                      strategy="broadcast")
        assert res.count() == 1


class TestOverlayCobucket:
    """r8 (verdict r7 #3): overlay consumes spatial_shuffle(
    boundaries=) co-partitioning — layout-once-join-many for the
    candidate stage, the same path sjoin gained in r7.  Replicas are
    deduped by the min-common-bucket rule for the piece leg and by
    content-hash aggregation + base-frame de-replication for the
    difference legs."""

    TB = (-180.0, -90.0, 180.0, 90.0)
    BOUNDS = [(4 ** 12) // 8 * i for i in range(1, 8)]

    def _frames(self, spark, n_l=60, n_r=40):
        left = _boxes(spark, [
            (i, float((i * 71) % 340 - 175), float((i * 29) % 160 - 85),
             float((i * 71) % 340 - 175) + 14.0,
             float((i * 29) % 160 - 85) + 11.0) for i in range(n_l)])
        right = _boxes(spark, [
            (j, float((j * 37) % 330 - 170), float((j * 53) % 150 - 80),
             float((j * 37) % 330 - 170) + 9.0,
             float((j * 53) % 150 - 80) + 13.0) for j in range(n_r)],
            pre="r")
        return left, right

    def _shuffled(self, g):
        return g.spatial_shuffle(by="hilbert", level=12,
                                 total_bounds=self.TB,
                                 boundaries=self.BOUNDS,
                                 replicate=True)

    def _summary(self, res, how):
        rows = _areas(res).df.collect() if hasattr(_areas(res), "df") \
            else _areas(res).collect()
        out = []
        for r in rows:
            d = r.asDict()
            out.append((d.get("bid"), d.get("rbid"),
                        round(d["_a"], 6)))
        return sorted(out, key=lambda t: (str(t[0]), str(t[1]), t[2]))

    def test_matches_plain_all_hows(self, spark):
        left, right = self._frames(spark)
        ls, rs = self._shuffled(left), self._shuffled(right)
        for how in ("intersection", "difference",
                    "symmetric_difference", "union", "identity"):
            got = self._summary(overlay(ls, rs, how=how), how)
            want = self._summary(
                overlay(left, right, how=how, strategy="broadcast"),
                how)
            assert got == want and len(got) > 0, how
            # bucket helper columns never leak into the result
            res = overlay(ls, rs, how=how)
            assert not [c for c in res.df.columns
                        if "_spatial_bucket" in c], how

    def test_auto_detects_cobucket(self, spark):
        left, right = self._frames(spark, n_l=20, n_r=12)
        ls, rs = self._shuffled(left), self._shuffled(right)
        auto = self._summary(overlay(ls, rs, how="intersection"), "i")
        cob = self._summary(
            overlay(ls, rs, how="intersection", strategy="cobucket"),
            "i")
        assert auto == cob and len(auto) > 0

    def test_no_exchange_at_candidate_join(self, spark):
        """THE 100-TB pin: the candidate equi-join reuses both sides'
        layout-time hash partitioning — the intersection leg's only
        Exchanges are the two spatial_shuffle repartitions."""
        import re

        left, right = self._frames(spark, n_l=30, n_r=20)
        ls, rs = self._shuffled(left), self._shuffled(right)
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            res = overlay(ls, rs, how="intersection",
                          strategy="cobucket")
            plan = res.df._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
        assert len(re.findall(r"Exchange", plan)) == 2, plan
        assert re.findall(r"Exchange hashpartitioning\(_spatial_bucket",
                          plan), plan

    def test_stored_crossrun_overlay(self, spark, tmp_path):
        """r9 (verdict r8 #7): BOTH sides persisted as replicated
        spatial layouts and read back in a fresh lineage — overlay's
        candidate join reuses the stored bucketing: the intersection
        leg pays exactly one re-hash Exchange per side after the scan
        (no grid explode, no bounds job, no layout work), and the
        result equals the same-session co-bucketed overlay."""
        import re

        from dask_geopandas_spark.sources import (
            read_spatial_bucketed, write_spatial_bucketed)

        left, right = self._frames(spark, n_l=30, n_r=20)
        kw = dict(by="hilbert", level=12, boundaries=self.BOUNDS,
                  total_bounds=self.TB, replicate=True)
        write_spatial_bucketed(left, str(tmp_path / "l"), **kw)
        write_spatial_bucketed(right, str(tmp_path / "r"), **kw)
        ls = read_spatial_bucketed(spark, str(tmp_path / "l"))
        rs = read_spatial_bucketed(spark, str(tmp_path / "r"))
        got = self._summary(
            overlay(ls, rs, how="intersection", strategy="cobucket"),
            "i")
        want = self._summary(
            overlay(self._shuffled(left), self._shuffled(right),
                    how="intersection", strategy="cobucket"), "i")
        assert got == want and len(got) > 0
        # tiny parquet inputs would get broadcast (also fine — zero
        # shuffle); disable it to pin the shape a 100-TB layout takes:
        # one re-hash Exchange per side, nothing else
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            res = overlay(ls, rs, how="intersection",
                          strategy="cobucket")
            plan = res.df._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        assert len(re.findall(r"Exchange", plan)) == 2, plan
        assert re.findall(r"Exchange hashpartitioning\(_spatial_bucket",
                          plan), plan

    def test_replicated_requires_cobucket(self, spark):
        left, right = self._frames(spark, n_l=10, n_r=6)
        ls, rs = self._shuffled(left), self._shuffled(right)
        with pytest.raises(ValueError, match="replicate"):
            overlay(ls, rs, how="intersection", strategy="grid")

    def test_incompatible_layouts_raise(self, spark):
        left, right = self._frames(spark, n_l=10, n_r=6)
        ls = self._shuffled(left)
        other = right.spatial_shuffle(
            by="hilbert", level=12, total_bounds=self.TB,
            boundaries=[(4 ** 12) // 4 * i for i in range(1, 4)],
            replicate=True)
        with pytest.raises(ValueError, match="bucketed with different"):
            overlay(ls, other, how="intersection", strategy="cobucket")


def test_overlay_cobucket_point_left_difference(spark):
    """Mixed completeness: a single-copy POINT left layout (never
    straddles) × replicated boxes — the difference leg keeps points
    outside every box, identical to the broadcast plan."""
    import dask_geopandas_spark as dgs

    TB = (-180.0, -90.0, 180.0, 90.0)
    BOUNDS = [(4 ** 12) // 8 * i for i in range(1, 8)]
    pdf = spark.createDataFrame(
        [(i, float((i * 37) % 340 - 170) + 0.5,
          float((i * 53) % 160 - 80) + 0.5) for i in range(300)],
        "pid long, x double, y double")
    pts = dgs.points_from_xy(pdf, "x", "y", crs="EPSG:4326")
    right = _boxes(spark, [
        (j, float((j * 71) % 320 - 165), float((j * 29) % 140 - 75),
         float((j * 71) % 320 - 165) + 25.0,
         float((j * 29) % 140 - 75) + 20.0) for j in range(15)],
        pre="r")
    ps = pts.spatial_shuffle(by="hilbert", level=12, total_bounds=TB,
                             boundaries=BOUNDS)
    rs = right.spatial_shuffle(by="hilbert", level=12, total_bounds=TB,
                               boundaries=BOUNDS, replicate=True)
    got = sorted(r["pid"] for r in overlay(
        ps, rs, how="difference", strategy="cobucket")
        .df.select("pid").collect())
    want = sorted(r["pid"] for r in overlay(
        pts, right, how="difference", strategy="broadcast")
        .df.select("pid").collect())
    assert got == want and 0 < len(got) < 300
