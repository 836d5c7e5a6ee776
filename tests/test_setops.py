"""Kernel tests for set-theoretic ops and the remaining DE-9IM predicates
(reference semantics: expr.py:983-1013 binary predicate/operator binding,
tests/test_core.py:272-329 sweeps)."""

import numpy as np
import pytest

from dask_geopandas_spark.geometry import algorithms as A
from dask_geopandas_spark.geometry import setops as S
from dask_geopandas_spark.geometry import wkb as W


def box(x0, y0, x1, y1):
    ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)
    return W.serialize_geometry(W.POLYGON, [ring])


def pt(x, y):
    return W.serialize_geometry(W.POINT, np.array([x, y], float))


def line(*coords):
    return W.serialize_geometry(W.LINESTRING, np.array(coords, float))


P = W.parse_wkb


# ----------------------------------------------------------------------
# predicates
# ----------------------------------------------------------------------

@pytest.mark.parametrize("a,b,want", [
    (box(0, 0, 1, 1), box(1, 0, 2, 1), True),    # shared edge
    (box(0, 0, 1, 1), box(1, 1, 2, 2), True),    # shared corner
    (box(0, 0, 2, 2), box(1, 1, 3, 3), False),   # interior overlap
    (box(0, 0, 1, 1), box(2, 2, 3, 3), False),   # disjoint
    (pt(1, 0.5), box(1, 0, 2, 1), True),         # point on boundary
    (pt(1.5, 0.5), box(1, 0, 2, 1), False),      # point inside
    (pt(0, 0), line((0, 0), (1, 1)), True),      # point at line endpoint
    (pt(0.5, 0.5), line((0, 0), (1, 1)), False), # point on line interior
    (line((0, 0), (1, 1)), line((1, 1), (2, 0)), True),  # endpoint meet
])
def test_touches(a, b, want):
    assert S.pairwise_touches(P([a]), P([b]))[0] == want


@pytest.mark.parametrize("a,b,want", [
    (line((0, 0), (2, 2)), line((0, 2), (2, 0)), True),   # X crossing
    (line((0, 0), (1, 0)), line((0.5, 0), (2, 0)), False),  # collinear overlap
    (line((0, 0), (3, 3)), box(1, 1, 2, 2), True),        # line through box
    (line((1.2, 1.2), (1.8, 1.8)), box(1, 1, 2, 2), False),  # line inside box
    (box(0, 0, 2, 2), box(1, 1, 3, 3), False),            # polys never cross
])
def test_crosses(a, b, want):
    assert S.pairwise_crosses(P([a]), P([b]))[0] == want


@pytest.mark.parametrize("a,b,want", [
    (box(0, 0, 2, 2), box(1, 1, 3, 3), True),    # partial overlap
    (box(0, 0, 1, 1), box(0, 0, 1, 1), False),   # equal
    (box(0, 0, 4, 4), box(1, 1, 2, 2), False),   # containment
    (box(0, 0, 1, 1), box(1, 0, 2, 1), False),   # touch only
    (line((0, 0), (2, 0)), line((1, 0), (3, 0)), True),  # collinear partial
    (line((0, 0), (2, 2)), line((0, 2), (2, 0)), False), # point crossing
])
def test_overlaps(a, b, want):
    assert S.pairwise_overlaps(P([a]), P([b]))[0] == want


def test_equals_exact():
    a = P([box(0, 0, 1, 1), box(0, 0, 1, 1), pt(1, 2)])
    b = P([box(0, 0, 1, 1), box(0, 0, 1.05, 1), pt(1, 2.000001)])
    assert list(S.pairwise_equals_exact(a, b, 1e-9)) == [True, False, False]
    assert list(S.pairwise_equals_exact(a, b, 0.1)) == [True, True, True]


@pytest.mark.parametrize("a,b,want", [
    (pt(0.5, 0.5), box(0, 0, 1, 1), "0FFFFF212"),   # point in polygon
    (pt(1, 0.5), box(0, 0, 1, 1), "F0FFFF212"),     # point on boundary
    (pt(5, 5), box(0, 0, 1, 1), "FF0FFF212"),       # disjoint
    (box(0, 0, 1, 1), box(0, 0, 1, 1), "2FFF1FFF2"),  # equal
    (box(0, 0, 4, 4), box(1, 1, 2, 2), "212FF1FF2"),  # contains
    (box(1, 1, 2, 2), box(0, 0, 4, 4), "2FF1FF212"),  # within
    (box(0, 0, 1, 1), box(1, 0, 2, 1), "FF2F11212"),  # edge touch
    (box(0, 0, 2, 2), box(1, 1, 3, 3), "212101212"),  # overlap
])
def test_relate(a, b, want):
    assert S.pairwise_relate(P([a]), P([b]))[0] == want


# ----------------------------------------------------------------------
# set-theoretic constructors
# ----------------------------------------------------------------------

def test_intersection_boxes():
    a = P([box(0, 0, 2, 2), box(0, 0, 1, 1)])
    b = P([box(1, 1, 3, 3), box(5, 5, 6, 6)])
    res = P(S.pairwise_intersection(a, b))
    assert A.area(res) == pytest.approx([1.0, 0.0])


def test_intersection_point_and_line():
    a = P([pt(0.5, 0.5), pt(5, 5), line((0, 0), (4, 4))])
    b = P([box(0, 0, 1, 1), box(0, 0, 1, 1), box(1, 1, 3, 3)])
    res = P(S.pairwise_intersection(a, b))
    assert res.types[0] == W.POINT
    assert res.is_empty()[1] or res.types[1] == W.GEOMETRYCOLLECTION
    # line clipped to the box: from (1,1) to (3,3), length 2*sqrt(2)
    assert A.length(res)[2] == pytest.approx(2 * np.sqrt(2))


def test_union_collects_parts():
    a = P([box(0, 0, 1, 1), pt(0, 0), box(0, 0, 1, 1)])
    b = P([box(2, 2, 3, 3), pt(1, 1), box(0, 0, 1, 1)])
    res = P(S.pairwise_union(a, b))
    assert res.types[0] == W.MULTIPOLYGON
    assert A.area(res)[0] == pytest.approx(2.0)
    assert res.types[1] == W.MULTIPOINT
    # identical operands deduplicate
    assert res.types[2] == W.POLYGON
    assert A.area(res)[2] == pytest.approx(1.0)


def test_difference():
    a = P([box(0, 0, 2, 2), box(0, 0, 1, 1), box(0, 0, 4, 4),
           pt(0.5, 0.5), line((0, 0), (4, 0))])
    b = P([box(5, 5, 6, 6), box(0, 0, 2, 2), box(1, 1, 2, 2),
           box(0, 0, 1, 1), box(1, -1, 2, 1)])
    res = P(S.pairwise_difference(a, b))
    areas = A.area(res)
    assert areas[0] == pytest.approx(4.0)    # disjoint: unchanged
    assert areas[1] == pytest.approx(0.0)    # b covers a: empty
    assert areas[2] == pytest.approx(15.0)   # hole inserted
    assert res.is_empty()[3] or res.types[3] == W.GEOMETRYCOLLECTION
    # line minus box: [0,1] and [2,4] remain, total length 3
    assert A.length(res)[4] == pytest.approx(3.0)


def test_symmetric_difference():
    a = P([box(0, 0, 1, 1)])
    b = P([box(2, 0, 3, 1)])
    res = P(S.pairwise_symmetric_difference(a, b))
    assert A.area(res)[0] == pytest.approx(2.0)


def test_null_propagation():
    a = P([None, box(0, 0, 1, 1)])
    b = P([box(0, 0, 1, 1), None])
    assert S.pairwise_touches(a, b).tolist() == [False, False]
    inter = S.pairwise_intersection(a, b)
    assert inter[0] is None and inter[1] is None
    # union with one null returns the other operand
    u = S.pairwise_union(a, b)
    assert u[0] is not None and u[1] is not None


class TestCollinearOverlapRuns:
    """line×line collinear overlaps reconstruct as LineString runs
    (closing the last documented kernel divergence); crossings stay
    points; difference removes the runs."""

    def _pair(self, spark, a, b):
        import pandas as pd

        from dask_geopandas_spark.geometry import wkt as T

        df = spark.createDataFrame(pd.DataFrame(
            {"ga": [T.wkt_to_wkb(a)], "gb": [T.wkt_to_wkb(b)]}))
        return df

    def test_overlap_run_length(self, spark):
        from pyspark.sql import functions as F

        from dask_geopandas_spark.functions import core as FX

        df = self._pair(spark, "LINESTRING (0 0, 4 0)",
                        "LINESTRING (1 0, 6 0)")
        row = df.select(
            FX.st_length(FX.st_intersection(F.col("ga"), F.col("gb")))
            .alias("il"),
            FX.st_length(FX.st_difference(F.col("ga"), F.col("gb")))
            .alias("dl"),
            FX.st_astext(FX.st_intersection(F.col("ga"), F.col("gb")))
            .alias("iw")).collect()[0]
        assert row["il"] == 3.0 and row["dl"] == 1.0
        assert row["iw"] == "LINESTRING (1 0, 4 0)"

    def test_touch_is_point_and_mixed_is_collection(self, spark):
        from pyspark.sql import functions as F

        from dask_geopandas_spark.functions import core as FX

        t = self._pair(spark, "LINESTRING (0 0, 4 0)",
                       "LINESTRING (4 0, 8 0)")
        assert t.select(FX.st_astext(FX.st_intersection(
            F.col("ga"), F.col("gb"))).alias("w")).collect()[0]["w"] == \
            "POINT (4 0)"
        m = self._pair(spark, "LINESTRING (0 0, 4 0, 4 4)",
                       "MULTILINESTRING ((1 0, 3 0), (0 3, 8 3))")
        w = m.select(FX.st_astext(FX.st_intersection(
            F.col("ga"), F.col("gb"))).alias("w")).collect()[0]["w"]
        assert w.startswith("GEOMETRYCOLLECTION") and "LINESTRING" in w \
            and "POINT" in w

    def test_difference_splits_at_removed_run(self, spark):
        from pyspark.sql import functions as F

        from dask_geopandas_spark.functions import core as FX

        df = self._pair(spark, "LINESTRING (0 0, 4 0)",
                        "LINESTRING (1 0, 3 0)")
        w = df.select(FX.st_astext(FX.st_difference(
            F.col("ga"), F.col("gb"))).alias("w")).collect()[0]["w"]
        assert w == "MULTILINESTRING ((0 0, 1 0), (3 0, 4 0))"


# ----------------------------------------------------------------------
# GeometryCollection operands (reference inherits GC operand support
# from GEOS OverlayNG; tests/test_core.py:11 exercises GC columns)
# ----------------------------------------------------------------------
class TestGeometryCollectionOperands:
    def _gc(self):
        from dask_geopandas_spark.geometry import wkt as T

        return T.wkt_to_wkb(
            "GEOMETRYCOLLECTION (POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0)), "
            "LINESTRING (0 10, 10 10), POINT (2 2))")

    def test_gc_intersection_with_polygon(self):
        gc, sq = P([self._gc()]), P([box(1, 1, 6, 3)])
        out = S.intersection_one(gc, 0, sq, 0)
        b = P([out])
        # polygon part clips to [1,4]x[1,3] (area 6); line part is
        # disjoint; the point (2,2) lies inside -> collection(poly, pt)
        assert float(A.area(b)[0]) == pytest.approx(6.0)
        assert int(b.types[0]) == W.GEOMETRYCOLLECTION

    def test_gc_difference_both_sides(self):
        gc, sq = P([self._gc()]), P([box(1, 1, 6, 3)])
        left = S.difference_one(gc, 0, sq, 0)
        # polygon loses the 6-area overlap; line and nothing else change
        assert float(A.area(P([left]))[0]) == pytest.approx(10.0)
        right = S.difference_one(sq, 0, gc, 0)
        # rect(10) minus the GC's polygon member overlap (6) -> 4
        assert float(A.area(P([right]))[0]) == pytest.approx(4.0)

    def test_gc_union_and_symdiff(self):
        gc, sq = P([self._gc()]), P([box(1, 1, 6, 3)])
        u = S.union_one(gc, 0, sq, 0)
        bu = P([u])
        # 16 + 10 - 6 overlap; line + point members survive as a GC
        assert float(A.area(bu)[0]) == pytest.approx(20.0)
        assert int(bu.types[0]) == W.GEOMETRYCOLLECTION
        sd = S.symmetric_difference_one(gc, 0, sq, 0)
        assert float(A.area(P([sd]))[0]) == pytest.approx(14.0)

    def test_gc_x_gc(self):
        from dask_geopandas_spark.geometry import wkt as T

        gc = P([self._gc()])
        gc2 = P([T.wkt_to_wkb(
            "GEOMETRYCOLLECTION (POLYGON ((3 3, 8 3, 8 8, 3 8, 3 3)), "
            "POINT (0 10))")])
        inter = S.intersection_one(gc, 0, gc2, 0)
        assert float(A.area(P([inter]))[0]) == pytest.approx(1.0)
        u = S.union_one(gc, 0, gc2, 0)
        assert float(A.area(P([u]))[0]) == pytest.approx(40.0)

    def test_gc_empty_and_disjoint(self):
        from dask_geopandas_spark.geometry import wkt as T

        gc = P([self._gc()])
        far = P([box(100, 100, 101, 101)])
        inter = S.intersection_one(gc, 0, far, 0)
        assert P([inter]).is_empty()[0]
        # nested GC member flattens through union (WKT parser doesn't
        # emit nested collections, so assemble the WKB by hand)
        import struct as _st

        inner = (b"\x01" + _st.pack("<I", W.GEOMETRYCOLLECTION)
                 + _st.pack("<I", 1) + pt(1, 1))
        nested = P([b"\x01" + _st.pack("<I", W.GEOMETRYCOLLECTION)
                    + _st.pack("<I", 2) + inner + pt(2, 2)])
        u = S.union_one(nested, 0, far, 0)
        bu = P([u])
        assert int(bu.types[0]) == W.GEOMETRYCOLLECTION

    def test_gc_through_frame_level_udf_path(self, spark):
        """GC operands must survive the Arrow-batched elementwise UDF
        route (st_intersection over a DataFrame column), not just
        direct kernel calls."""
        import pandas as pd

        import dask_geopandas_spark as dgs
        from dask_geopandas_spark.functions import core as FX
        from dask_geopandas_spark.geometry import wkt as T
        from pyspark.sql import functions as F

        pdf = pd.DataFrame({
            "i": [0],
            "a": [self._gc()],
            "b": [T.wkt_to_wkb("POLYGON ((1 1, 6 1, 6 3, 1 3, 1 1))")],
        })
        df = spark.createDataFrame(pdf)
        out = df.select(
            FX.st_area(FX.st_intersection(F.col("a"), F.col("b")))
            .alias("ia"),
            FX.st_area(FX.st_union_pair(F.col("a"), F.col("b"))).alias("ua"),
            FX.st_area(FX.st_difference(F.col("a"), F.col("b")))
            .alias("da")).collect()[0]
        assert out["ia"] == pytest.approx(6.0)
        assert out["ua"] == pytest.approx(20.0)
        assert out["da"] == pytest.approx(10.0)
