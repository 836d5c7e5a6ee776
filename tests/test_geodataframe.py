"""GeoDataFrame API integration tests (dual-run parity strategy per
SURVEY §5: engine result vs a pure-pandas/numpy recomputation)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import dask_geopandas_spark as dgs
from dask_geopandas_spark.geometry import wkt as T


@pytest.fixture(scope="module")
def pts(spark):
    pdf = pd.DataFrame({
        "id": range(100),
        "x": np.linspace(-170, 170, 100),
        "y": np.sin(np.linspace(0, 8, 100)) * 80,
        "v": np.arange(100, dtype="float64"),
    })
    return dgs.points_from_xy(spark.createDataFrame(pdf), "x", "y", crs="EPSG:4326"), pdf


@pytest.fixture(scope="module")
def polys(spark):
    rows = []
    for i in range(40):
        cx, cy = (i % 8) * 10.0, (i // 8) * 10.0
        w = 3.0 + (i % 3)
        rows.append((i, f"POLYGON (({cx} {cy}, {cx + w} {cy}, {cx + w} {cy + w}, {cx} {cy + w}, {cx} {cy}))",
                     "g" + str(i % 4)))
    pdf = pd.DataFrame(rows, columns=["pid", "wkt", "grp"])
    return dgs.from_wkt(spark.createDataFrame(pdf), "wkt", crs="EPSG:4326"), pdf


class TestBasics:
    def test_points_xy_roundtrip(self, pts):
        gdf, pdf = pts
        rows = gdf.select("id", gdf.x.alias("gx"), gdf.y.alias("gy")).orderBy("id").collect()
        np.testing.assert_allclose([r["gx"] for r in rows], pdf.x)
        np.testing.assert_allclose([r["gy"] for r in rows], pdf.y)

    def test_geom_type(self, pts, polys):
        gdf, _ = pts
        assert gdf.select(gdf.geom_type).distinct().collect()[0][0] == "Point"
        pgdf, _ = polys
        assert pgdf.select(pgdf.geom_type).distinct().collect()[0][0] == "Polygon"

    def test_area_and_length(self, polys):
        gdf, pdf = polys
        rows = gdf.select("pid", gdf.area.alias("a"), gdf.length.alias("l")).orderBy("pid").collect()
        w = 3.0 + (pdf.pid % 3)
        np.testing.assert_allclose([r["a"] for r in rows], w * w)
        np.testing.assert_allclose([r["l"] for r in rows], 4 * w)

    def test_total_bounds(self, pts):
        gdf, pdf = pts
        tb = gdf.total_bounds()
        np.testing.assert_allclose(tb, (pdf.x.min(), pdf.y.min(), pdf.x.max(), pdf.y.max()))

    def test_cx_filter(self, pts):
        gdf, pdf = pts
        got = gdf.cx(xmin=0, xmax=100, ymin=-50, ymax=50).count()
        want = ((pdf.x >= 0) & (pdf.x <= 100) & (pdf.y >= -50) & (pdf.y <= 50)).sum()
        assert got == want

    def test_type_degradation(self, pts):
        gdf, _ = pts
        plain = gdf[["id", "v"]]
        assert not isinstance(plain, dgs.GeoDataFrame)
        still = gdf[["id", "geometry"]]
        assert isinstance(still, dgs.GeoDataFrame)

    def test_buffer_area(self, pts):
        gdf, _ = pts
        res = gdf.limit(5).buffer(2.0, resolution=16)
        rows = res.select(res.area.alias("a")).collect()
        # circle approximation area < pi*r^2, within 1%
        for r in rows:
            assert abs(r["a"] - np.pi * 4) / (np.pi * 4) < 0.01

    def test_buffer_line_and_polygon_exact(self, spark):
        """True Minkowski buffer (not convex dilation): the L-shaped
        line's buffer area follows the closed form
        2d(a+b) - d^2 + 2.5*q*d^2*sin(pi/(2q)); a concave polygon erodes
        exactly under a negative distance."""
        import math

        df = spark.createDataFrame(pd.DataFrame({
            "id": [0, 1],
            "wkt": ["LINESTRING (0 0, 4 0, 4 5)",
                    "POLYGON ((0 0, 6 0, 6 2, 2 2, 2 6, 0 6, 0 0))"],
        }))
        g = dgs.from_wkt(df, "wkt")
        buf = g.buffer(1.0, resolution=8)
        rows = {r["id"]: r["a"] for r in
                buf.select("id", buf.area.alias("a")).collect()}
        s = math.sin(math.pi / 16)
        assert rows[0] == pytest.approx(2 * 9 - 1 + 20 * s, abs=1e-9)
        # concave polygon (area 20, perimeter 24): dilation adds P*d, a
        # quarter fan at each of the 5 convex corners (q wedges of
        # (d^2/2)sin(pi/2q) each), minus the d^2 rect overlap at the
        # single reflex corner (whose disc is fully covered).
        assert rows[1] == pytest.approx(20 + 24 + 5 * 8 * 0.5 * s - 1,
                                        abs=1e-9)
        ero = g.buffer(-0.5, resolution=8)
        er = {r["id"]: r["a"] for r in
              ero.select("id", ero.area.alias("a")).collect()}
        assert er[0] == 0.0  # line collapses
        # L eroded by 0.5: the two offset arms (5x1 each, overlapping in
        # 1x1) plus the reflex-corner pocket — the 0.5x0.5 square at the
        # inner corner minus the quarter round (polygonal fan, q wedges
        # of (d^2/2)sin(pi/2q))
        assert er[1] == pytest.approx(
            5 + 5 - 1 + 0.25 - 8 * (0.25 / 2) * s, abs=1e-9)

    def test_translate_centroid(self, polys):
        gdf, pdf = polys
        moved = gdf.translate(100.0, -5.0)
        a = gdf.centroid().select("pid", gdf.x.alias("cx"), gdf.y.alias("cy")).orderBy("pid").collect()
        b = moved.centroid().select("pid", moved.x.alias("cx"), moved.y.alias("cy")).orderBy("pid").collect()
        np.testing.assert_allclose([r["cx"] + 100 for r in a], [r["cx"] for r in b])
        np.testing.assert_allclose([r["cy"] - 5 for r in a], [r["cy"] for r in b])

    def test_to_crs_roundtrip(self, pts):
        gdf, pdf = pts
        rt = gdf.to_crs("EPSG:3857").to_crs("EPSG:4326")
        rows = rt.select("id", rt.x.alias("gx"), rt.y.alias("gy")).orderBy("id").collect()
        np.testing.assert_allclose([r["gx"] for r in rows], pdf.x, atol=1e-9)
        np.testing.assert_allclose([r["gy"] for r in rows], pdf.y, atol=1e-9)


class TestShuffleAndCurves:
    def test_hilbert_range(self, pts):
        gdf, _ = pts
        col = gdf.hilbert_distance(level=10)
        vals = [r[0] for r in gdf.select(col).collect()]
        assert len(set(vals)) > 50
        assert all(0 <= v < 4**10 for v in vals)

    def test_spatial_shuffle_preserves_rows(self, pts):
        gdf, pdf = pts
        out = gdf.spatial_shuffle(by="hilbert", level=10, npartitions=4)
        assert sorted(r["id"] for r in out.select("id").collect()) == list(pdf.id)

    def test_geohash_string(self, pts):
        gdf, _ = pts
        vals = [r[0] for r in gdf.select(gdf.geohash(precision=6)).collect()]
        assert all(len(v) == 6 for v in vals)


class TestOperators:
    def test_dissolve_sum(self, polys):
        gdf, pdf = polys
        out = gdf.dissolve(by="grp", aggfunc={"pid": "sum"})
        rows = {r["grp"]: r["pid"] for r in out.df.select("grp", "pid").collect()}
        want = pdf.groupby("grp").pid.sum().to_dict()
        assert rows == want

    def test_dissolve_geometry_is_multi(self, polys):
        gdf, _ = polys
        out = gdf.dissolve(by="grp")
        t = out.select(out.geom_type).distinct().collect()
        assert {r[0] for r in t} == {"MultiPolygon"}

    def test_union_all_area(self, polys):
        gdf, pdf = polys
        blob = gdf.union_all()
        from dask_geopandas_spark.geometry import algorithms as A
        from dask_geopandas_spark.geometry import wkb as W

        batch = W.parse_wkb([blob])
        w = 3.0 + (pdf.pid % 3)
        assert A.area(batch)[0] == pytest.approx(float((w * w).sum()))

    def test_explode(self, spark):
        pdf = pd.DataFrame({
            "id": [0, 1],
            "wkt": ["MULTIPOINT ((0 0), (1 1), (2 2))", "POINT (5 5)"],
        })
        gdf = dgs.from_wkt(spark.createDataFrame(pdf), "wkt")
        out = gdf.explode()
        assert out.count() == 4
        assert {r[0] for r in out.select(out.geom_type).distinct().collect()} == {"Point"}

    def test_sjoin_points_in_polys_broadcast(self, spark, pts, polys):
        gdf, pdf = pts
        pgdf, ppdf = polys
        out = gdf.sjoin(pgdf, predicate="within", strategy="broadcast")
        got = sorted((r["id"], r["pid"]) for r in out.df.select("id", "pid").collect())
        want = _expected_pairs(pdf, ppdf)
        assert got == want

    def test_sjoin_grid_matches_broadcast(self, spark, pts, polys):
        gdf, pdf = pts
        pgdf, ppdf = polys
        out = gdf.sjoin(pgdf, predicate="within", strategy="grid", grid_level=4)
        got = sorted((r["id"], r["pid"]) for r in out.df.select("id", "pid").collect())
        assert got == _expected_pairs(pdf, ppdf)

    def test_clip_box(self, pts):
        gdf, pdf = pts
        out = gdf.clip((0.0, -90.0, 90.0, 90.0))
        want = ((pdf.x >= 0) & (pdf.x <= 90)).sum()
        assert out.count() == want


def _expected_pairs(pdf, ppdf):
    pairs = []
    for _, p in pdf.iterrows():
        for _, q in ppdf.iterrows():
            # polygons are axis-aligned squares at (cx,cy) with width w
            import re

            nums = [float(v) for v in re.findall(r"-?\d+\.?\d*", q.wkt)]
            xs = nums[0::2]
            ys = nums[1::2]
            if min(xs) <= p.x <= max(xs) and min(ys) <= p.y <= max(ys):
                pairs.append((int(p.id), int(q.pid)))
    return sorted(pairs)


class TestGeoParquet:
    def test_roundtrip(self, spark, polys, tmp_path):
        gdf, pdf = polys
        path = str(tmp_path / "geo.parquet")
        gdf.to_parquet(path)
        back = dgs.read_parquet(spark, path)
        assert isinstance(back, dgs.GeoDataFrame)
        assert back.crs == "EPSG:4326"
        assert back.count() == len(pdf)
        a1 = {r["pid"]: r["a"] for r in back.select("pid", back.area.alias("a")).collect()}
        w = 3.0 + (pdf.pid % 3)
        for pid, aa in a1.items():
            assert aa == pytest.approx(float(w[pid] * w[pid]))


def test_concat(spark):
    import dask_geopandas_spark as dgs
    from pyspark.sql import functions as F

    a = dgs.points_from_xy(
        spark.createDataFrame([(1.0, 2.0)], "x double, y double"), "x", "y")
    b = dgs.points_from_xy(
        spark.createDataFrame([(3.0, 4.0)], "x double, y double"), "x", "y")
    empty = dgs.GeoDataFrame(a.df.filter(F.lit(False)), "geometry")
    out = dgs.concat([a, b, empty])
    assert out.count() == 2
    assert out.geometry_column == "geometry"


def test_map_partitions_and_apply(spark):
    import dask_geopandas_spark as dgs
    from pyspark.sql import functions as F
    from pyspark.sql.types import IntegerType

    g = dgs.points_from_xy(
        spark.createDataFrame([(1.0, 2.0), (3.0, 4.0)], "x double, y double"),
        "x", "y")
    # map_partitions keeping geometry -> GeoDataFrame
    out = g.map_partitions(lambda pdf: pdf.assign(x=pdf.x + 1))
    assert isinstance(out, dgs.GeoDataFrame)
    assert sorted(r.x for r in out.df.collect()) == [2.0, 4.0]
    # elementwise apply: WKB byte length
    n = g.df.select(g.apply_geometry(len, IntegerType()).alias("n")).collect()
    assert all(r.n == 21 for r in n)


def test_from_geopandas_gated(spark):
    import pytest
    import dask_geopandas_spark as dgs

    with pytest.raises(ImportError, match="geopandas"):
        dgs.from_geopandas(spark, None)


def test_bbox_invalidated_by_transform(spark):
    """A stale bbox sibling must not survive a geometry transform: cx
    after buffer/centroid would otherwise filter on wrong bounds
    (reference preserve_spatial_partitions, expr.py:963-972)."""
    import dask_geopandas_spark as dgs

    g = dgs.points_from_xy(
        spark.createDataFrame([(0.0, 0.0), (10.0, 10.0)], "x double, y double"),
        "x", "y").with_bbox()
    assert g.bbox_column in g.df.columns
    buffered = g.buffer(3.0)
    assert buffered.bbox_column not in buffered.df.columns
    # cx window around (10,10) grown by the buffer: the point at origin's
    # buffered disc does NOT reach it, the (10,10) disc does
    out = buffered.cx(xmin=8.0, ymin=8.0, xmax=12.0, ymax=12.0)
    assert out.count() == 1
    # translate also invalidates (bounds move)
    moved = g.translate(100.0, 0.0).cx(xmin=95.0, ymin=-1.0, xmax=115.0, ymax=11.0)
    assert moved.count() == 2


def test_cx_exact_refinement_for_lines(spark):
    """A diagonal line whose bbox clips the window corner but whose
    geometry misses it must be excluded (reference .cx does exact
    intersects after partition pruning, expr.py:1042-1077)."""
    import numpy as np
    import dask_geopandas_spark as dgs
    from dask_geopandas_spark.geometry import wkb as W

    # anti-diagonal x+y=4: bbox [0,0,4,4] overlaps the window corner
    # [3,4]x[3,4], but every segment point with x in [3,4] has y in [0,1]
    near_miss = W.serialize_geometry(
        W.LINESTRING, np.array([[0.0, 4.0], [4.0, 0.0]]))
    crossing = W.serialize_geometry(
        W.LINESTRING, np.array([[0.0, 0.0], [10.0, 10.0]]))
    df = spark.createDataFrame([(1, near_miss), (2, crossing)],
                               "id int, geometry binary")
    g = dgs.GeoDataFrame(df, "geometry")
    out = g.cx(xmin=3.0, ymin=3.0, xmax=4.0, ymax=4.0)
    ids = sorted(r.id for r in out.df.select("id").collect())
    assert ids == [2]
    # half-plane (single bound) stays bbox-only and keeps both
    out2 = g.cx(xmax=7.0)
    assert out2.count() == 2


def test_sjoin_nearest_k2(spark):
    """k>1 nearest join returns the k closest right rows per left row in
    distance order."""
    import dask_geopandas_spark as dgs
    from dask_geopandas_spark.operators.sjoin import sjoin_nearest

    pts = dgs.points_from_xy(
        spark.createDataFrame([(0.0, 0.0)], "x double, y double"), "x", "y")
    targets = dgs.points_from_xy(
        spark.createDataFrame(
            [(1, 1.0, 0.0), (2, 3.0, 0.0), (3, 10.0, 0.0)],
            "tid int, x double, y double"), "x", "y")
    out = sjoin_nearest(pts, targets, k=2)
    rows = sorted((r.tid, r.dist) for r in out.df.select("tid", "dist").collect())
    assert rows == [(1, 1.0), (2, 3.0)]
    # max_distance prunes
    out1 = sjoin_nearest(pts, targets, k=3, max_distance=5.0)
    assert out1.count() == 2


def test_sjoin_nearest_grid_matches_broadcast(spark):
    """The distributed bounded-radius path (dilated-bbox grid join) must
    agree with the broadcast path for k=1 and k=2."""
    import numpy as np

    import dask_geopandas_spark as dgs
    from dask_geopandas_spark.operators.sjoin import sjoin_nearest

    rng = np.random.default_rng(13)
    pts = dgs.points_from_xy(spark.createDataFrame(pd.DataFrame({
        "id": range(120),
        "x": rng.uniform(0, 50, 120).round(3),
        "y": rng.uniform(0, 50, 120).round(3)})), "x", "y")
    targets = dgs.points_from_xy(spark.createDataFrame(pd.DataFrame({
        "tid": range(30),
        "x": rng.uniform(0, 50, 30).round(3),
        "y": rng.uniform(0, 50, 30).round(3)})), "x", "y")

    for k in (1, 2):
        grid = sjoin_nearest(pts, targets, k=k, max_distance=8.0,
                             strategy="grid", grid_level=4,
                             total_bounds=(0, 0, 50, 50))
        bcast = sjoin_nearest(pts, targets, k=k, max_distance=8.0)
        key = lambda g: sorted(
            (r["id"], r["tid"], round(r["dist"], 9))
            for r in g.df.select("id", "tid", "dist").collect())
        assert key(grid) == key(bcast) and len(key(grid)) > 0

    with pytest.raises(ValueError, match="max_distance"):
        sjoin_nearest(pts, targets, strategy="grid")


def test_sjoin_left_and_anti(spark):
    """Left join keeps unmatched lefts with NULL right columns; anti
    returns only unmatched lefts; inner + anti partition the left rows."""
    import dask_geopandas_spark as dgs

    pts = dgs.points_from_xy(
        spark.createDataFrame(
            [(1, 0.5, 0.5), (2, 5.0, 5.0), (3, 0.6, 0.4)],
            "id int, x double, y double"), "x", "y")
    boxes = dgs.from_wkt(
        spark.createDataFrame(
            [(10, "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")], "bid int, wkt string"),
        "wkt")
    inner = pts.sjoin(boxes, predicate="within", strategy="broadcast")
    assert sorted(r.id for r in inner.df.select("id").collect()) == [1, 3]
    left = pts.sjoin(boxes, how="left", predicate="within", strategy="broadcast")
    rows = {r.id: r.bid for r in left.df.select("id", "bid").collect()}
    assert rows == {1: 10, 2: None, 3: 10}
    anti = pts.sjoin(boxes, how="anti", predicate="within", strategy="broadcast")
    assert [r.id for r in anti.df.select("id").collect()] == [2]


def test_explode_index_parts_and_dissolve_split_out(spark):
    import dask_geopandas_spark as dgs
    import pandas as pd

    pdf = pd.DataFrame({
        "id": [0, 1],
        "wkt": ["MULTIPOINT ((0 0), (1 1), (2 2))", "POINT (5 5)"],
    })
    gdf = dgs.from_wkt(spark.createDataFrame(pdf), "wkt")
    out = gdf.explode(index_parts=True)
    rows = sorted((r.id, r.part_index) for r in
                  out.df.select("id", "part_index").collect())
    assert rows == [(0, 0), (0, 1), (0, 2), (1, 0)]
    # dissolve split_out controls output partitioning only
    d = gdf.dissolve(by="id", split_out=2)
    assert d.df.rdd.getNumPartitions() == 2
    assert d.count() == 2


def test_spatial_shuffle_range_disjoint(spark, pts):
    """repartitionByRange on the curve key yields per-partition key
    ranges that do not overlap (the invariant q_spatial_shuffle's
    rows-only driver check cannot pin)."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import spark_partition_id

    gdf, _ = pts
    tb = (-180.0, -90.0, 180.0, 90.0)
    out = gdf.spatial_shuffle(by="hilbert", level=10, npartitions=4,
                              total_bounds=tb)
    h = out.hilbert_distance(total_bounds=tb, level=10)
    rows = (out.df.withColumn("_h", h)
            .withColumn("_pid", spark_partition_id())
            .groupBy("_pid")
            .agg(F.min("_h").alias("lo"), F.max("_h").alias("hi"))
            .collect())
    ranges = sorted((r.lo, r.hi) for r in rows)
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping partition ranges {ranges}"


def test_calculate_spatial_partitions_and_fillna(spark, pts):
    import dask_geopandas_spark as dgs
    from dask_geopandas_spark.geometry import wkb as W
    import numpy as np
    from pyspark.sql import functions as F

    gdf, pdf = pts
    parts = list(gdf.calculate_spatial_partitions().values())
    assert parts and all(len(b) == 4 for b in parts)
    minx = min(b[0] for b in parts)
    maxx = max(b[2] for b in parts)
    assert minx == pytest.approx(pdf.x.min())
    assert maxx == pytest.approx(pdf.x.max())

    # fillna replaces NULL geometry with the given WKB
    filler = W.serialize_geometry(W.POINT, np.array([0.0, 0.0]))
    df = spark.createDataFrame([(1, None), (2, filler)], "id int, geometry binary")
    g = dgs.GeoDataFrame(df, "geometry")
    assert g.df.filter(g.isna()).count() == 1
    filled = g.fillna(filler)
    assert filled.df.filter(filled.isna()).count() == 0


def test_to_parquet_spatial_sort(spark, pts, tmp_path):
    import dask_geopandas_spark as dgs

    gdf, pdf = pts
    path = str(tmp_path / "sorted_geo")
    gdf.to_parquet(path, spatial_sort=True)
    back = dgs.read_parquet(spark, path)
    assert back.count() == len(pdf)
    # per-file bboxes gathered and cover the data
    assert back.spatial_partitions
    assert min(b[0] for b in back.spatial_partitions) == pytest.approx(pdf.x.min())


class TestAccessorSurface:
    def test_bounds_struct(self, polys):
        gdf, pdf = polys
        rows = (gdf.select("pid", gdf.bounds.alias("b"))
                .orderBy("pid").collect())
        # square at (cx,cy) with side w
        for r in rows:
            i = r["pid"]
            cx, cy = (i % 8) * 10.0, (i // 8) * 10.0
            w = 3.0 + (i % 3)
            assert r["b"]["minx"] == cx and r["b"]["maxx"] == cx + w
            assert r["b"]["miny"] == cy and r["b"]["maxy"] == cy + w

    def test_interiors_empty_for_solid_polys(self, polys):
        gdf, _ = polys
        rows = gdf.select(gdf.interiors.alias("rings")).collect()
        assert all(len(r["rings"]) == 0 for r in rows)

    def test_to_feather_roundtrip(self, spark, polys, tmp_path):
        gdf, pdf = polys
        out = str(tmp_path / "polys_feather")
        gdf.to_feather(out)
        back = dgs.read_feather(spark, out)
        assert back.df.count() == len(pdf)
        assert back.geometry_column == gdf.geometry_column


class TestEnvelopeExactHints:
    """boxes_from_bounds / points_from_xy carry envelope-equality hints;
    sjoin then refines with native closed-bounds arithmetic.  These tests
    pin that fast path to the generic WKB-UDF refinement."""

    def _frames(self, spark):
        import numpy as np

        rng = np.random.default_rng(7)
        pts_pdf = pd.DataFrame({
            "id": range(200),
            "x": rng.uniform(0, 100, 200).round(3),
            "y": rng.uniform(0, 100, 200).round(3),
        })
        box_pdf = pd.DataFrame({
            "bid": range(12),
            "minx": [10.0 * (i % 4) for i in range(12)],
            "miny": [15.0 * (i // 4) for i in range(12)],
        })
        box_pdf["maxx"] = box_pdf.minx + 18.0
        box_pdf["maxy"] = box_pdf.miny + 22.0
        pts = dgs.points_from_xy(spark.createDataFrame(pts_pdf), "x", "y")
        boxes = dgs.boxes_from_bounds(spark.createDataFrame(box_pdf))
        return pts, boxes

    def _strip_hints(self, g):
        # a bare wrapper loses the shape hints -> generic UDF refinement
        return dgs.GeoDataFrame(g.df, g.geometry_column)

    @pytest.mark.parametrize("predicate", ["within", "intersects"])
    def test_native_matches_udf_refinement(self, spark, predicate):
        pts, boxes = self._frames(spark)
        assert pts.envelope_exact and boxes.envelope_exact
        fast = pts.sjoin(boxes, predicate=predicate, strategy="broadcast")
        slow = self._strip_hints(pts).sjoin(
            self._strip_hints(boxes), predicate=predicate, strategy="broadcast")
        key = lambda out: sorted(
            (r["id"], r["bid"]) for r in out.df.select("id", "bid").collect())
        assert key(fast) == key(slow)
        assert len(key(fast)) > 0

    def test_rect_contains_box(self, spark):
        pts, boxes = self._frames(spark)
        # rectangle CONTAINS point: left side rect-hinted
        fast = boxes.sjoin(pts, predicate="contains", strategy="broadcast")
        slow = self._strip_hints(boxes).sjoin(
            self._strip_hints(pts), predicate="contains", strategy="broadcast")
        key = lambda out: sorted(
            (r["bid"], r["id"]) for r in out.df.select("bid", "id").collect())
        assert key(fast) == key(slow)

    def test_no_python_stage_in_native_plan(self, spark):
        pts, boxes = self._frames(spark)
        out = pts.sjoin(boxes, predicate="within", strategy="broadcast")
        # the geometry output column itself still comes from st_point; a
        # consumer that doesn't read it (count/groupBy) prunes every
        # Python stage out of the plan
        plan = (out.df.select("id", "bid")
                ._jdf.queryExecution().executedPlan().toString())
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    def test_hint_dropped_after_transform(self, spark):
        pts, _ = self._frames(spark)
        assert not pts.buffer(1.0).envelope_exact
        assert pts.envelope().envelope_exact


def test_sjoin_touches_crosses_overlaps(spark):
    """The 3 remaining reference predicates (sjoin.py:26-30) flow through
    the sjoin refinement: touching boxes, a crossing line, overlapping
    boxes — each against a unit-ish box at the origin."""
    left = dgs.from_wkt(
        spark.createDataFrame(
            [(1, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"),
             (2, "LINESTRING (-1 0.5, 5 0.5)")],
            "lid int, wkt string"), "wkt")
    right = dgs.from_wkt(
        spark.createDataFrame(
            [(10, "POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))"),   # touches box 1
             (20, "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"),   # overlaps box 1
             (30, "POLYGON ((10 10, 11 10, 11 11, 10 11, 10 10))")],
            "rid int, wkt string"), "wkt")

    def pairs(predicate):
        out = left.sjoin(right, predicate=predicate, strategy="broadcast")
        return sorted((r.lid, r.rid) for r in out.df.select("lid", "rid").collect())

    assert pairs("touches") == [(1, 10)]
    # the line passes through box 10's interior and exits the far side
    assert pairs("crosses") == [(2, 10)]
    assert pairs("overlaps") == [(1, 20)]


def test_clip_native_point_path_matches_kernel(spark):
    """Point layers clip via native half-plane filters; stripping the xy
    hint forces the kernel UDF path — results must agree, including a
    non-box convex mask (triangle)."""
    import numpy as np

    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({
        "id": range(300),
        "x": rng.uniform(-10, 10, 300).round(4),
        "y": rng.uniform(-10, 10, 300).round(4),
    })
    pts = dgs.points_from_xy(spark.createDataFrame(pdf), "x", "y")
    bare = dgs.GeoDataFrame(pts.df, "geometry")  # no hints -> UDF path
    tri = "POLYGON ((-8 -8, 8 -8, 0 9, -8 -8))"
    for mask in [(-5.0, -5.0, 5.0, 5.0), tri]:
        fast = sorted(r.id for r in pts.clip(mask).df.select("id").collect())
        slow = sorted(r.id for r in bare.clip(mask).df.select("id").collect())
        assert fast == slow and len(fast) > 0
    # native path emits no Python stage
    plan = (pts.clip(tri).df.select("id")
            ._jdf.queryExecution().executedPlan().toString())
    assert "ArrowEvalPython" not in plan


def test_clip_concave_mask_points(spark):
    """Concave masks are supported for point layers (even-odd ray cast):
    native symbolic path and kernel UDF path agree, the notch is
    excluded, and line layers fail loudly."""
    import numpy as np

    L = "POLYGON ((0 0, 20 0, 20 10, 5 10, 5 25, 0 25, 0 0))"
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame({
        "id": range(400),
        "x": rng.uniform(-2, 22, 400).round(3),
        "y": rng.uniform(-2, 27, 400).round(3),
    })
    pts = dgs.points_from_xy(spark.createDataFrame(pdf), "x", "y")
    bare = dgs.GeoDataFrame(pts.df, "geometry")  # no hints -> UDF path
    fast = sorted(r.id for r in pts.clip(L).df.select("id").collect())
    slow = sorted(r.id for r in bare.clip(L).df.select("id").collect())
    assert fast == slow and len(fast) > 0
    # ground truth: inside the L = left column or bottom bar
    inside = pdf[((pdf.x >= 0) & (pdf.x <= 5) & (pdf.y >= 0) & (pdf.y <= 25)) |
                 ((pdf.x >= 0) & (pdf.x <= 20) & (pdf.y >= 0) & (pdf.y <= 10))]
    assert fast == sorted(inside.id)
    # native path emits no Python stage
    plan = (pts.clip(L).df.select("id")
            ._jdf.queryExecution().executedPlan().toString())
    assert "ArrowEvalPython" not in plan
    # lines + concave mask: exact kernel clipping.  The first line is
    # fully inside the bottom arm; the second runs along y=15 where the
    # mask's x-extent is [0, 5] only; the third is fully outside.
    line_df = spark.createDataFrame(
        pd.DataFrame({"id": [0, 1, 2],
                      "wkt": ["LINESTRING (1 1, 9 9)",
                              "LINESTRING (-3 15, 30 15)",
                              "LINESTRING (30 30, 40 30)"]}))
    lines = dgs.from_wkt(line_df, "wkt")
    out = lines.clip(L)
    rows = {r["id"]: r["ln"] for r in
            out.df.select("id", out.length.alias("ln")).collect()}
    assert set(rows) == {0, 1}
    assert rows[0] == pytest.approx(8 * np.sqrt(2))
    assert rows[1] == pytest.approx(5.0)
    # polygons + concave mask: kernel overlay.  Box [2,8]x[8,12] overlaps
    # the bottom arm (y<=10 for x>5) and the left arm (x<=5): area
    # = 6x2 + 3x2 = 18 ... decompose: whole box in x[2,8],y[8,12];
    # mask covers y<10 for x in [2,8] (12) plus x<5 for y in [10,12] (6).
    poly_df = spark.createDataFrame(
        pd.DataFrame({"id": [0], "wkt":
                      ["POLYGON ((2 8, 8 8, 8 12, 2 12, 2 8))"]}))
    polys = dgs.from_wkt(poly_df, "wkt")
    pout = polys.clip(L)
    from dask_geopandas_spark.functions import core as FX
    from pyspark.sql import functions as F

    a = pout.df.select(
        FX.st_area(F.col(pout.geometry_column)).alias("a")).collect()
    assert len(a) == 1 and a[0]["a"] == pytest.approx(18.0)


def test_point_in_ring_cond_matches_sql(spark):
    """point_in_ring_cond (Column algebra) and point_in_ring_sql (text
    for the DuckDB oracle) must decide identically — including points
    exactly on edges and vertices."""
    import duckdb
    import numpy as np

    from dask_geopandas_spark.operators.clip import (_mask_ring,
                                                     point_in_ring_cond,
                                                     point_in_ring_sql)
    from pyspark.sql import functions as F

    mx, my, convex = _mask_ring(
        "POLYGON ((0 0, 20 0, 20 10, 5 10, 5 25, 0 25, 0 0))")
    assert not convex
    xs = np.concatenate([np.linspace(-1, 21, 45),
                         [0.0, 5.0, 20.0, 2.5, 5.0]])
    ys = np.concatenate([np.linspace(-1, 26, 45),
                         [0.0, 10.0, 10.0, 0.0, 17.0]])
    pdf = pd.DataFrame({"px": np.repeat(xs, len(ys)),
                        "py": np.tile(ys, len(xs))})
    got_spark = (
        spark.createDataFrame(pdf)
        .withColumn("inside", point_in_ring_cond(F.col("px"), F.col("py"),
                                                 mx, my))
        .toPandas().sort_values(["px", "py"]).inside.tolist())
    con = duckdb.connect()
    con.register("pts", pdf)
    got_duck = con.sql(
        f"SELECT {point_in_ring_sql('px', 'py', mx, my)} AS inside "
        "FROM pts ORDER BY px, py").df().inside.tolist()
    assert got_spark == got_duck


class TestShapeHintInvalidation:
    """Shape hints (_xy / _corner_cols) are a performance fast path; they
    must be DROPPED whenever a projection could desynchronize them from
    the geometry, and results must stay correct via the WKB-UDF path."""

    def _pts(self, spark):
        pdf = pd.DataFrame({
            "id": range(20),
            "x": [float(i) for i in range(20)],
            "y": [float(2 * i) for i in range(20)],
        })
        return dgs.points_from_xy(spark.createDataFrame(pdf), "x", "y"), pdf

    def test_plain_string_select_keeps_hints(self, spark):
        g, _ = self._pts(spark)
        sel = g.select("id", "x", "y", g.geometry_column)
        assert sel.has_native_bbox and sel.envelope_exact

    def test_select_with_expr_clears_hints(self, spark):
        import pyspark.sql.functions as F

        g, pdf = self._pts(spark)
        # lit aliased onto the hint source column: the stale hint would
        # report minx=999 for every row
        sel = g.select(F.lit(999.0).alias("x"), "y", g.geometry_column)
        assert not sel.has_native_bbox
        got = sorted(
            r["mx"] for r in sel.with_bbox().df.select(
                F.col(sel.with_bbox().bbox_column + ".minx").alias("mx")
            ).collect())
        assert got == pytest.approx(sorted(pdf.x))

    def test_withcolumn_on_geometry_clears_hints(self, spark):
        import pyspark.sql.functions as F

        from dask_geopandas_spark.functions import core as FX

        g, _ = self._pts(spark)
        g2 = g.withColumn(g.geometry_column, FX.st_point(F.lit(1.0), F.lit(2.0)))
        assert not g2.has_native_bbox and not g2.envelope_exact
        assert g2.total_bounds() == pytest.approx((1.0, 2.0, 1.0, 2.0))

    def test_withcolumn_on_source_clears_xy(self, spark):
        import pyspark.sql.functions as F

        g, pdf = self._pts(spark)
        # geometry was built from the ORIGINAL x in an earlier projection;
        # overwriting x afterwards must not re-point the bbox at it
        g2 = g.withColumn("x", F.lit(0.0))
        assert not g2.has_native_bbox
        b = g2.with_bbox()
        got = sorted(r["mx"] for r in b.df.select(
            F.col(b.bbox_column + ".minx").alias("mx")).collect())
        assert got == pytest.approx(sorted(pdf.x))

    def test_withcolumn_on_corner_col_clears_hint(self, spark):
        import pyspark.sql.functions as F

        pdf = pd.DataFrame({
            "bid": range(5),
            "minx": [0.0, 1, 2, 3, 4], "miny": [0.0] * 5,
            "maxx": [10.0, 11, 12, 13, 14], "maxy": [5.0] * 5,
        })
        g = dgs.boxes_from_bounds(spark.createDataFrame(pdf))
        assert g.has_native_bbox
        g2 = g.withColumn("minx", F.lit(-99.0))
        assert not g2.has_native_bbox
        b = g2.with_bbox()
        got = sorted(r["mx"] for r in b.df.select(
            F.col(b.bbox_column + ".minx").alias("mx")).collect())
        assert got == pytest.approx(sorted(pdf.minx))

    def test_affine_chain_past_depth_cap_stays_correct(self, spark):
        g, pdf = self._pts(spark)
        n = dgs.GeoDataFrame._XY_MAX_DEPTH + 4
        for _ in range(n):
            g = g.translate(1.0, 1.0)
        xs = sorted(r["xv"] for r in g.df.select(g.x.alias("xv")).collect())
        assert xs == pytest.approx(sorted(pdf.x + float(n)))

    def test_z_hint_is_not_native_bbox(self, spark):
        pdf = pd.DataFrame({
            "x": [1.0, 2.0], "y": [3.0, 4.0], "z": [5.0, None]})
        g = dgs.points_from_xy(spark.createDataFrame(pdf), "x", "y", z="z")
        assert not g.has_native_bbox

    def test_total_bounds_skips_null_partitions(self, spark):
        g, pdf = self._pts(spark)
        g.spatial_partitions = [(0.0, 0.0, 19.0, 38.0),
                                (None, None, None, None)]
        assert g.total_bounds() == pytest.approx((0.0, 0.0, 19.0, 38.0))


class TestEmptyInputs:
    """Zero-row and all-NULL-geometry inputs flow through the distributed
    operators without errors (reference handles empty partitions,
    tests/test_core.py:995-1008)."""

    def _empty(self, spark):
        edf = spark.createDataFrame([], "id long, x double, y double")
        return dgs.points_from_xy(edf, "x", "y", crs="EPSG:4326")

    def _full(self, spark):
        pdf = pd.DataFrame({"id": [0, 1, 2],
                            "x": [0.0, 1.0, 2.0], "y": [0.0, 1.0, 2.0]})
        return dgs.points_from_xy(spark.createDataFrame(pdf), "x", "y",
                                  crs="EPSG:4326")

    def test_empty_through_operators(self, spark):
        empty, full = self._empty(spark), self._full(spark)
        assert empty.sjoin(full, strategy="broadcast").df.count() == 0
        assert empty.sjoin(full, strategy="grid").df.count() == 0
        assert full.sjoin(empty, strategy="grid").df.count() == 0
        assert empty.clip((-1.0, -1.0, 1.0, 1.0)).df.count() == 0
        assert empty.cx(xmin=0, xmax=1, ymin=0, ymax=1).df.count() == 0
        assert empty.spatial_shuffle(by="hilbert").df.count() == 0
        assert empty.total_bounds() == (None, None, None, None)

    def test_all_null_geometry(self, spark):
        import pyspark.sql.functions as F

        from dask_geopandas_spark.operators.dissolve import union_all

        nullg = self._full(spark).withColumn(
            "geometry", F.lit(None).cast("binary"))
        assert nullg.sjoin(self._full(spark), strategy="grid").df.count() == 0
        assert union_all(nullg.df, "geometry") is None
        assert nullg.total_bounds() == (None, None, None, None)

    def test_empty_dedup_pipelines(self, spark):
        from dask_geopandas_spark.operators import dedup as DD

        docs = spark.createDataFrame([], "doc_id long, text string")
        assert DD.minhash_signatures(docs).count() == 0
        assert DD.lsh_candidate_pairs(docs).count() == 0
        assert DD.lsh_dedup(docs).count() == 0
        assert DD.exact_dedup(docs).count() == 0


def test_sjoin_dwithin_broadcast(spark):
    """predicate='dwithin' keeps all pairs within the search distance
    (beyond-reference; geopandas >= 0.12 sjoin parity)."""
    import dask_geopandas_spark as dgs

    left = dgs.points_from_xy(
        spark.createDataFrame([(0, 0.0, 0.0), (1, 10.0, 0.0)],
                              "lid int, x double, y double"), "x", "y")
    right = dgs.points_from_xy(
        spark.createDataFrame(
            [(100, 1.0, 0.0), (101, 2.5, 0.0), (102, 10.0, 2.0),
             (103, 50.0, 50.0)],
            "rid int, x double, y double"), "x", "y")
    out = left.sjoin(right, predicate="dwithin", distance=2.0,
                     strategy="broadcast")
    pairs = sorted((r["lid"], r["rid"]) for r in
                   out.df.select("lid", "rid").collect())
    assert pairs == [(0, 100), (1, 102)]
    # native join for symbolic point layers: once the (Python-built) WKB
    # geometry is pruned away, no Python stage remains in the plan
    plan = (out.df.select("lid", "rid")
            ._jdf.queryExecution().executedPlan().toString())
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # boundary inclusion: distance exactly d qualifies
    out_eq = left.sjoin(right, predicate="dwithin", distance=1.0,
                        strategy="broadcast")
    assert (0, 100) in {(r["lid"], r["rid"]) for r in
                        out_eq.df.select("lid", "rid").collect()}


def test_sjoin_dwithin_grid_matches_broadcast(spark):
    import numpy as np

    import dask_geopandas_spark as dgs

    rng = np.random.RandomState(11)
    import pandas as pd
    lpdf = pd.DataFrame({"lid": np.arange(60), "x": rng.uniform(0, 30, 60),
                         "y": rng.uniform(0, 30, 60)})
    rpdf = pd.DataFrame({"rid": np.arange(40), "x": rng.uniform(0, 30, 40),
                         "y": rng.uniform(0, 30, 40)})
    left = dgs.points_from_xy(spark.createDataFrame(lpdf), "x", "y")
    right = dgs.points_from_xy(spark.createDataFrame(rpdf), "x", "y")
    kw = dict(predicate="dwithin", distance=3.0)
    a = left.sjoin(right, strategy="broadcast", **kw)
    b = left.sjoin(right, strategy="grid", total_bounds=(0, 0, 31, 31), **kw)
    ka = sorted((r["lid"], r["rid"]) for r in a.df.select("lid", "rid").collect())
    kb = sorted((r["lid"], r["rid"]) for r in b.df.select("lid", "rid").collect())
    assert ka == kb and len(ka) > 0
    # independent check against plain numpy distances
    dx = lpdf["x"].to_numpy()[:, None] - rpdf["x"].to_numpy()[None, :]
    dy = lpdf["y"].to_numpy()[:, None] - rpdf["y"].to_numpy()[None, :]
    want = sorted((int(i), int(j)) for i, j in
                  zip(*np.nonzero(dx * dx + dy * dy <= 9.0)))
    assert ka == want


def test_sjoin_dwithin_left_anti_no_helper_column(spark):
    """how='left'/'anti' with predicate='dwithin' must not leak the
    internal dilated-bbox helper column into the output schema."""
    import dask_geopandas_spark as dgs

    left = dgs.points_from_xy(
        spark.createDataFrame([(0, 0.0, 0.0), (1, 10.0, 0.0)],
                              "lid int, x double, y double"), "x", "y")
    right = dgs.points_from_xy(
        spark.createDataFrame([(100, 1.0, 0.0)],
                              "rid int, x double, y double"), "x", "y")
    for how in ("left", "anti"):
        out = left.sjoin(right, predicate="dwithin", distance=2.0,
                         strategy="broadcast", how=how)
        assert not [c for c in out.df.columns if c.startswith("_dw")], \
            (how, out.df.columns)
    lj = left.sjoin(right, predicate="dwithin", distance=2.0,
                    strategy="broadcast", how="left")
    got = {r["lid"]: r["rid"] for r in lj.df.select("lid", "rid").collect()}
    assert got == {0: 100, 1: None}


def test_sjoin_dwithin_validation(spark):
    import dask_geopandas_spark as dgs

    pts = dgs.points_from_xy(
        spark.createDataFrame([(0.0, 0.0)], "x double, y double"), "x", "y")
    import pytest as _pt
    with _pt.raises(ValueError, match="distance"):
        pts.sjoin(pts, predicate="dwithin")


def test_spatial_shuffle_explicit_boundaries(spark, pts):
    """r6: explicit-boundary mode — bucket assignment matches the
    searchsorted formula, every bucket lands wholly inside ONE
    partition, two frames shuffled with the SAME boundaries are
    co-partitioned (same bucket → same partition index), and bad
    boundaries fail fast.  The properties the sampled
    repartitionByRange path cannot give."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import spark_partition_id

    gdf, pdf = pts
    tb = (-180.0, -90.0, 180.0, 90.0)
    bnds = [i * (4 ** 10) // 4 for i in range(1, 4)]
    out = gdf.spatial_shuffle(by="hilbert", level=10, total_bounds=tb,
                              boundaries=bnds)
    h = out.hilbert_distance(total_bounds=tb, level=10)
    rows = (out.df.withColumn("_h", h)
            .withColumn("_pid", spark_partition_id())
            .select("_spatial_bucket", "_h", "_pid").collect())
    assert len(rows) == len(pdf)
    import bisect

    for r in rows:  # assignment == searchsorted
        assert r["_spatial_bucket"] == bisect.bisect_right(bnds, r["_h"])
    by_bucket = {}
    for r in rows:  # bucket atomicity
        by_bucket.setdefault(r["_spatial_bucket"], set()).add(r["_pid"])
    assert all(len(p) == 1 for p in by_bucket.values())
    # co-partitioning: a second frame, same boundaries → same mapping
    out2 = gdf.cx(xmin=-90, ymin=-45, xmax=90, ymax=45).spatial_shuffle(
        by="hilbert", level=10, total_bounds=tb, boundaries=bnds)
    m2 = {r["_spatial_bucket"]: r["_pid"] for r in
          out2.df.withColumn("_pid", spark_partition_id())
          .select("_spatial_bucket", "_pid").distinct().collect()}
    m1 = {b: next(iter(p)) for b, p in by_bucket.items()}
    for b in set(m1) & set(m2):
        assert m1[b] == m2[b]
    import pytest as _pytest
    with _pytest.raises(ValueError, match="boundaries"):
        gdf.spatial_shuffle(boundaries=[5, 5], total_bounds=tb)
    with _pytest.raises(ValueError, match="boundaries"):
        gdf.spatial_shuffle(boundaries=[], total_bounds=tb)


class TestCobucketSjoin:
    """r7 (verdict r6 #2): sjoin consumes spatial_shuffle(boundaries=)
    co-partitioning — the promised shuffle-free spatial join."""

    TB = (-180.0, -90.0, 180.0, 90.0)
    BOUNDS = [(4 ** 12) // 8 * i for i in range(1, 8)]

    def _frames(self, spark, n_pts=800, n_boxes=150):
        import dask_geopandas_spark as dgs

        pdf = spark.createDataFrame(
            [(i, float((i * 37) % 360 - 180) + 0.25,
              float((i * 53) % 180 - 90) + 0.25) for i in range(n_pts)],
            "pid long, x double, y double")
        pts = dgs.points_from_xy(pdf, "x", "y", crs="EPSG:4326")
        bdf = (spark.createDataFrame(
            [(j, float((j * 71) % 340 - 175),
              float((j * 29) % 160 - 85)) for j in range(n_boxes)],
            "bid long, bx double, by double")
            .withColumn("bx1", F.col("bx") + F.lit(12.0))
            .withColumn("by1", F.col("by") + F.lit(9.0)))
        boxes = dgs.boxes_from_bounds(bdf, "bx", "by", "bx1", "by1",
                                      crs="EPSG:4326")
        return pts, boxes

    def _shuffled(self, pts, boxes, **kw):
        ps = pts.spatial_shuffle(by="hilbert", level=12,
                                 total_bounds=self.TB,
                                 boundaries=self.BOUNDS, **kw)
        bs = boxes.spatial_shuffle(by="hilbert", level=12,
                                   total_bounds=self.TB,
                                   boundaries=self.BOUNDS,
                                   replicate=True, **kw)
        return ps, bs

    def test_matches_grid_point_box(self, spark):
        pts, boxes = self._frames(spark)
        ps, bs = self._shuffled(pts, boxes)
        got = sorted((r["pid"], r["bid"]) for r in
                     ps.sjoin(bs, predicate="within",
                              strategy="cobucket")
                     .df.select("pid", "bid").collect())
        want = sorted((r["pid"], r["bid"]) for r in
                      pts.sjoin(boxes, predicate="within",
                                strategy="grid", grid_level=6)
                      .df.select("pid", "bid").collect())
        assert got == want and len(got) > 100
        # helper columns never leak into the result
        out = ps.sjoin(bs, predicate="within", strategy="cobucket")
        assert not [c for c in out.df.columns if "_spatial_bucket" in c]

    def test_matches_grid_box_box_both_replicated(self, spark):
        """Straddling geometries on BOTH sides: replicas meet once per
        shared bucket and the min-common-bucket filter keeps exactly
        one — no dropDuplicates shuffle."""
        pts, boxes = self._frames(spark)
        _, b1 = self._shuffled(pts, boxes)
        _, b2 = self._shuffled(pts, boxes)
        got = sorted((r["bid_l"], r["bid_r"]) for r in
                     b1.sjoin(b2, predicate="intersects",
                              strategy="cobucket", lsuffix="_l",
                              rsuffix="_r")
                     .df.select("bid_l", "bid_r").collect())
        want = sorted((r["bid_l"], r["bid_r"]) for r in
                      boxes.sjoin(boxes, predicate="intersects",
                                  strategy="grid", grid_level=6,
                                  lsuffix="_l", rsuffix="_r")
                      .df.select("bid_l", "bid_r").collect())
        assert got == want and len(got) > len(set(b for b, _ in got))

    def test_left_anti_match_grid_single_copy_left(self, spark):
        """how='left'/'anti' under cobucket (r7): sound for a
        SINGLE-COPY left frame — each left row exists once and a
        candidate pair meets in exactly one bucket, so the
        content-hash rejoin is exact.  Pins cobucket == grid for both
        modes, NULL-extension on unmatched left rows, and that no
        bucket helper column leaks through the rejoin."""
        pts, boxes = self._frames(spark, n_pts=400, n_boxes=40)
        ps, bs = self._shuffled(pts, boxes)

        def keyset(g, cols):
            return sorted(tuple(r[c] for c in cols)
                          for r in g.df.select(*cols).collect())

        for how in ("left", "anti"):
            got_g = ps.sjoin(bs, predicate="within", how=how,
                             strategy="cobucket")
            want_g = pts.sjoin(boxes, predicate="within", how=how,
                               strategy="grid", grid_level=6)
            cols = ["pid"] if how == "anti" else ["pid", "bid"]
            got, want = keyset(got_g, cols), keyset(want_g, cols)
            assert got == want and len(got) > 0, how
            assert not [c for c in got_g.df.columns
                        if "_spatial_bucket" in c], how
        # left keeps unmatched rows with NULL right columns
        left = ps.sjoin(bs, predicate="within", how="left",
                        strategy="cobucket")
        n_null = left.df.filter(F.col("bid").isNull()).count()
        n_anti = ps.sjoin(bs, predicate="within", how="anti",
                          strategy="cobucket").df.count()
        assert n_null == n_anti > 0
        # auto on compatible frames routes left/anti to cobucket too
        auto = ps.sjoin(bs, predicate="within", how="anti")
        assert keyset(auto, ["pid"]) == keyset(
            ps.sjoin(bs, predicate="within", how="anti",
                     strategy="cobucket"), ["pid"])

    def test_no_exchange_at_join(self, spark):
        """THE 100-TB pin: the join reuses both sides' layout-time
        hash partitioning — the executed plan's only Exchanges are the
        two spatial_shuffle repartitions, none between them and the
        join."""
        import re

        pts, boxes = self._frames(spark, n_pts=50, n_boxes=20)
        ps, bs = self._shuffled(pts, boxes)
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            out = ps.sjoin(bs, predicate="within", strategy="cobucket")
            plan = out.df._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
        assert len(re.findall(r"Exchange", plan)) == 2, plan
        assert re.findall(r"Exchange hashpartitioning\(_spatial_bucket",
                          plan), plan

    def test_auto_detects_and_falls_back(self, spark):
        pts, boxes = self._frames(spark, n_pts=100, n_boxes=30)
        ps, bs = self._shuffled(pts, boxes)
        # auto on compatible frames -> cobucket result
        auto = ps.sjoin(bs, predicate="within")
        cob = ps.sjoin(bs, predicate="within", strategy="cobucket")
        assert sorted(map(tuple, auto.df.collect())) == \
               sorted(map(tuple, cob.df.collect()))
        # incompatible boundaries -> explicit raises, auto falls back
        other = pts.spatial_shuffle(
            by="hilbert", level=12, total_bounds=self.TB,
            boundaries=[(4 ** 12) // 4 * i for i in range(1, 4)])
        with pytest.raises(ValueError, match="different"):
            other.sjoin(bs, strategy="cobucket")
        # un-bucketed frames -> explicit raises
        with pytest.raises(ValueError, match="no spatial_shuffle"):
            pts.sjoin(boxes, strategy="cobucket")
        # non-replicated non-point side -> not complete
        plain = boxes.spatial_shuffle(by="hilbert", level=12,
                                      total_bounds=self.TB,
                                      boundaries=self.BOUNDS)
        ps2, _ = self._shuffled(pts, boxes)
        with pytest.raises(ValueError, match="replicate=True"):
            ps2.sjoin(plain, strategy="cobucket")

    def test_replicated_frame_guards(self, spark):
        pts, boxes = self._frames(spark, n_pts=100, n_boxes=30)
        ps, bs = self._shuffled(pts, boxes)
        # replicated frames refuse every non-cobucket plan (duplicated
        # rows would double-count pairs)
        with pytest.raises(ValueError, match="replicate"):
            ps.sjoin(bs, strategy="grid")
        with pytest.raises(ValueError, match="replicate"):
            ps.sjoin(bs, strategy="broadcast")
        # and the cobucket-unsupported modes raise with guidance:
        # left/anti demand a SINGLE-COPY left (bs is replicated)
        with pytest.raises(ValueError, match="SINGLE-COPY"):
            bs.sjoin(ps, how="left", strategy="cobucket")
        with pytest.raises(ValueError, match="SINGLE-COPY"):
            bs.sjoin(ps, how="anti", strategy="cobucket")
        with pytest.raises(ValueError, match="dwithin"):
            ps.sjoin(bs, predicate="dwithin", distance=1.0,
                     strategy="cobucket")
        # geohash has no quadrant hierarchy -> replicate refuses
        with pytest.raises(ValueError, match="hilbert"):
            boxes.spatial_shuffle(by="geohash", level=12,
                                  total_bounds=self.TB,
                                  boundaries=self.BOUNDS,
                                  replicate=True)

    def test_point_frame_replicate_stays_single(self, spark):
        """replicate=True on a point-hint frame is metadata-only: no
        _spatial_buckets array, no row growth — points never straddle
        a boundary."""
        pts, _ = self._frames(spark, n_pts=100, n_boxes=5)
        out = pts.spatial_shuffle(by="hilbert", level=12,
                                  total_bounds=self.TB,
                                  boundaries=self.BOUNDS,
                                  replicate=True)
        assert "_spatial_buckets" not in out.df.columns
        assert out.df.count() == 100
        m = out.df.schema["_spatial_bucket"].metadata
        assert m["dgs_cobucket_single"] and m["dgs_cobucket_complete"]
        assert not m["dgs_cobucket_replicated"]

    def test_reshuffle_drops_stale_replica_arrays(self, spark):
        """Re-shuffling a replicate=True frame with DIFFERENT
        boundaries must not leave the old _spatial_buckets arrays
        behind (the co-bucketed join's dedup would trust them and
        drop pairs)."""
        _, boxes = self._frames(spark, n_pts=10, n_boxes=40)
        b1 = boxes.spatial_shuffle(by="hilbert", level=12,
                                   total_bounds=self.TB,
                                   boundaries=self.BOUNDS,
                                   replicate=True)
        other = [(4 ** 12) // 4 * i for i in range(1, 4)]
        # re-shuffle WITHOUT replicate: arrays must vanish
        b2 = b1.spatial_shuffle(by="hilbert", level=12,
                                total_bounds=self.TB, boundaries=other)
        assert "_spatial_buckets" not in b2.df.columns
        # re-shuffle WITH replicate: arrays must be the new ones
        b3 = b1.spatial_shuffle(by="hilbert", level=12,
                                total_bounds=self.TB, boundaries=other,
                                replicate=True)
        row = b3.df.select("_spatial_bucket", "_spatial_buckets") \
            .collect()
        assert all(r["_spatial_bucket"] in r["_spatial_buckets"]
                   for r in row)
        assert all(max(r["_spatial_buckets"]) <= len(other)
                   for r in row)

    def test_dwithin_via_shuffle_time_dilation(self, spark):
        """r7: dilate= at shuffle time buys a co-bucketed dwithin join
        up to the margin — exact vs the broadcast path; distances past
        the dilation raise with guidance; dilate without replicate
        raises; a dilated point frame is no longer single-copy."""
        import dask_geopandas_spark as dgs

        pts, _ = self._frames(spark, n_pts=400, n_boxes=5)
        sdf = spark.createDataFrame(
            [(j, float((j * 71) % 340 - 172) + 0.5,
              float((j * 29) % 160 - 82) + 0.5) for j in range(200)],
            "sid long, sx double, sy double")
        sup = dgs.points_from_xy(sdf, "sx", "sy", crs="EPSG:4326")
        pl = pts.spatial_shuffle(by="hilbert", level=12,
                                 total_bounds=self.TB,
                                 boundaries=self.BOUNDS,
                                 replicate=True, dilate=8.0)
        sr = sup.spatial_shuffle(by="hilbert", level=12,
                                 total_bounds=self.TB,
                                 boundaries=self.BOUNDS)
        got = sorted((r["pid"], r["sid"]) for r in
                     pl.sjoin(sr, predicate="dwithin", distance=8.0,
                              strategy="cobucket")
                     .df.select("pid", "sid").collect())
        want = sorted((r["pid"], r["sid"]) for r in
                      pts.sjoin(sup, predicate="dwithin", distance=8.0,
                                strategy="broadcast")
                      .df.select("pid", "sid").collect())
        assert got == want and len(got) > 50
        # a dilated point frame replicates (no longer single)
        m = pl.df.schema["_spatial_bucket"].metadata
        assert m["dgs_cobucket_replicated"] and not m["dgs_cobucket_single"]
        assert m["dgs_cobucket_dilate"] == 8.0
        assert "_spatial_buckets" in pl.df.columns
        # distance past the dilation refuses
        with pytest.raises(ValueError, match="dilation"):
            pl.sjoin(sr, predicate="dwithin", distance=9.0,
                     strategy="cobucket")
        # dilate needs replicate; negative dilate refuses
        with pytest.raises(ValueError, match="replicate"):
            pts.spatial_shuffle(boundaries=self.BOUNDS,
                                total_bounds=self.TB, dilate=1.0)
        with pytest.raises(ValueError, match=">= 0"):
            pts.spatial_shuffle(boundaries=self.BOUNDS,
                                total_bounds=self.TB, replicate=True,
                                dilate=-1.0)

    def test_nearest_cobucket(self, spark):
        """r7: bounded-radius sjoin_nearest over co-bucketed layouts —
        left single-copy points, right dilated replication — equals
        the grid path for k=1 and k>1; guards refuse an undersized
        dilation, a replicated left, and replicated frames on other
        strategies."""
        import dask_geopandas_spark as dgs
        from dask_geopandas_spark.operators.sjoin import sjoin_nearest

        pts, boxes = self._frames(spark, n_pts=400, n_boxes=60)
        pl = pts.spatial_shuffle(by="hilbert", level=12,
                                 total_bounds=self.TB,
                                 boundaries=self.BOUNDS)
        br = boxes.spatial_shuffle(by="hilbert", level=12,
                                   total_bounds=self.TB,
                                   boundaries=self.BOUNDS,
                                   replicate=True, dilate=25.0)
        for kk in (1, 3):
            got = sorted((r["pid"], round(r["dist"], 6)) for r in
                         sjoin_nearest(pl, br, k=kk, max_distance=25.0,
                                       strategy="cobucket")
                         .df.select("pid", "dist").collect())
            want = sorted((r["pid"], round(r["dist"], 6)) for r in
                          sjoin_nearest(pts, boxes, k=kk,
                                        max_distance=25.0,
                                        strategy="grid", grid_level=5)
                          .df.select("pid", "dist").collect())
            assert got == want and len(got) > 100
        with pytest.raises(ValueError, match="dilation"):
            sjoin_nearest(pl, br, max_distance=30.0,
                          strategy="cobucket")
        with pytest.raises(ValueError, match="single-copy"):
            sjoin_nearest(br, pl, max_distance=10.0,
                          strategy="cobucket")
        with pytest.raises(ValueError, match="replica"):
            sjoin_nearest(pts, br, max_distance=10.0, strategy="grid")
        with pytest.raises(ValueError, match="max_distance"):
            sjoin_nearest(pl, br, strategy="cobucket")
