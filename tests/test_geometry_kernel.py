"""Kernel tests: WKB/WKT codecs, vectorized algorithms, curve encoders.

Mirrors the reference's golden-value strategy (SURVEY §5 pattern 2):
hilbert values from tests/test_hilbert_distance.py:18-35, geohash from the
classic public test vector.
"""

import numpy as np
import pytest

from dask_geopandas_spark.geometry import wkb as W
from dask_geopandas_spark.geometry import wkt as T
from dask_geopandas_spark.geometry import algorithms as A
from dask_geopandas_spark.geometry import curves as C


def wkb(text):
    return T.wkt_to_wkb(text)


UNIT_SQ = "POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))"


class TestCodec:
    def test_point_roundtrip(self):
        b = wkb("POINT (1.5 -2.25)")
        assert T.wkb_to_wkt(b) == "POINT (1.5 -2.25)"

    def test_point_z(self):
        assert T.wkb_to_wkt(wkb("POINT Z (1 2 3)")) == "POINT (1 2 3)"

    def test_linestring(self):
        s = "LINESTRING (0 0, 1 1, 2 0)"
        assert T.wkb_to_wkt(wkb(s)) == s

    def test_polygon_hole(self):
        s = "POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))"
        assert T.wkb_to_wkt(wkb(s)) == s

    def test_multipoint(self):
        assert T.wkb_to_wkt(wkb("MULTIPOINT ((1 2), (3 4))")) == "MULTIPOINT ((1 2), (3 4))"
        assert T.wkb_to_wkt(wkb("MULTIPOINT (1 2, 3 4)")) == "MULTIPOINT ((1 2), (3 4))"

    def test_multipolygon(self):
        s = "MULTIPOLYGON (((0 0, 0 1, 1 1, 0 0)), ((5 5, 5 6, 6 6, 5 5)))"
        assert T.wkb_to_wkt(wkb(s)) == s

    def test_collection(self):
        s = "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))"
        assert T.wkb_to_wkt(wkb(s)) == s

    def test_null_and_empty(self):
        batch = W.parse_wkb([None, wkb("POINT EMPTY"), wkb("POINT (0 0)")])
        assert list(batch.is_null()) == [True, False, False]
        assert list(batch.is_empty()) == [False, True, False]

    def test_points_to_wkb_vectorized(self):
        out = W.points_to_wkb(np.array([1.0, 2.0]), np.array([3.0, 4.0]))
        assert T.wkb_to_wkt(out[0]) == "POINT (1 3)"
        assert T.wkb_to_wkt(out[1]) == "POINT (2 4)"

    def test_big_endian_input(self):
        import struct
        be = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 7.0, 8.0)
        batch = W.parse_wkb([be])
        assert batch.xs[0] == 7.0 and batch.ys[0] == 8.0


class TestAlgorithms:
    def test_bounds(self):
        b = W.parse_wkb([wkb("LINESTRING (0 5, 2 -1)"), wkb("POINT (3 3)"), None])
        res = A.bounds(b)
        assert res[0].tolist() == [0, -1, 2, 5]
        assert res[1].tolist() == [3, 3, 3, 3]
        assert np.isnan(res[2]).all()

    def test_area_square_and_hole(self):
        b = W.parse_wkb([
            wkb(UNIT_SQ),
            wkb("POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))"),
            wkb("POINT (1 1)"),
        ])
        res = A.area(b)
        assert res[0] == pytest.approx(1.0)
        assert res[1] == pytest.approx(100.0 - 4.0)
        assert res[2] == 0.0

    def test_multipolygon_area(self):
        b = W.parse_wkb([wkb("MULTIPOLYGON (((0 0, 0 1, 1 1, 1 0, 0 0)), ((5 5, 5 7, 7 7, 7 5, 5 5)))")])
        assert A.area(b)[0] == pytest.approx(1.0 + 4.0)

    def test_length(self):
        b = W.parse_wkb([wkb("LINESTRING (0 0, 3 4)"), wkb(UNIT_SQ), wkb("POINT (1 1)")])
        res = A.length(b)
        assert res[0] == pytest.approx(5.0)
        assert res[1] == pytest.approx(4.0)  # perimeter
        assert res[2] == 0.0

    def test_centroid(self):
        b = W.parse_wkb([wkb(UNIT_SQ), wkb("LINESTRING (0 0, 2 0)"), wkb("MULTIPOINT ((0 0), (2 2))")])
        cx, cy = A.centroid(b)
        assert (cx[0], cy[0]) == (pytest.approx(0.5), pytest.approx(0.5))
        assert (cx[1], cy[1]) == (pytest.approx(1.0), pytest.approx(0.0))
        assert (cx[2], cy[2]) == (pytest.approx(1.0), pytest.approx(1.0))

    def test_centroid_hole(self):
        b = W.parse_wkb([wkb("POLYGON ((0 0, 0 6, 6 6, 6 0, 0 0), (0 0, 0 3, 3 3, 3 0, 0 0))")])
        cx, cy = A.centroid(b)
        # 36-area square minus 9-area corner square: centroid pulled away from corner
        assert cx[0] == pytest.approx((36 * 3 - 9 * 1.5) / 27)

    def test_intersects_point_poly(self):
        a = W.parse_wkb([wkb("POINT (0.5 0.5)"), wkb("POINT (5 5)")])
        b = W.parse_wkb([wkb(UNIT_SQ), wkb(UNIT_SQ)])
        assert A.pairwise_intersects(a, b).tolist() == [True, False]

    def test_intersects_line_line(self):
        a = W.parse_wkb([wkb("LINESTRING (0 0, 2 2)"), wkb("LINESTRING (0 0, 1 0)")])
        b = W.parse_wkb([wkb("LINESTRING (0 2, 2 0)"), wkb("LINESTRING (0 1, 1 1)")])
        assert A.pairwise_intersects(a, b).tolist() == [True, False]

    def test_poly_poly_overlap(self):
        a = W.parse_wkb([wkb(UNIT_SQ)])
        b = W.parse_wkb([wkb("POLYGON ((0.5 0.5, 0.5 2, 2 2, 2 0.5, 0.5 0.5))")])
        assert A.pairwise_intersects(a, b).tolist() == [True]

    def test_poly_contains_poly_fully_inside(self):
        outer = W.parse_wkb([wkb("POLYGON ((0 0, 0 10, 10 10, 10 0, 0 0))")])
        inner = W.parse_wkb([wkb("POLYGON ((2 2, 2 3, 3 3, 3 2, 2 2))")])
        assert A.pairwise_intersects(outer, inner).tolist() == [True]
        assert A.pairwise_contains(outer, inner).tolist() == [True]
        assert A.pairwise_contains(inner, outer).tolist() == [False]

    def test_distance(self):
        a = W.parse_wkb([wkb("POINT (0 0)"), wkb("POINT (0 0)"), wkb(UNIT_SQ)])
        b = W.parse_wkb([wkb("POINT (3 4)"), wkb("LINESTRING (0 5, 10 5)"), wkb("POLYGON ((3 0, 3 1, 4 1, 4 0, 3 0))")])
        d = A.pairwise_distance(a, b)
        assert d[0] == pytest.approx(5.0)
        assert d[1] == pytest.approx(5.0)
        assert d[2] == pytest.approx(2.0)

    def test_convex_hull(self):
        hx, hy = A.convex_hull_single(
            np.array([0.0, 1, 0, 1, 0.5]), np.array([0.0, 0, 1, 1, 0.5])
        )
        assert len(hx) == 4

    def test_douglas_peucker(self):
        x = np.array([0.0, 1, 2, 3, 4])
        y = np.array([0.0, 0.01, 0, -0.01, 0])
        keep = A.douglas_peucker(x, y, 0.1)
        assert keep.tolist() == [True, False, False, False, True]

    def test_interpolate_project(self):
        x = np.array([0.0, 10.0]); y = np.array([0.0, 0.0])
        assert A.interpolate_on_line(x, y, 4.0, False) == (4.0, 0.0)
        assert A.interpolate_on_line(x, y, 0.5, True) == (5.0, 0.0)
        assert A.project_on_line(x, y, 3.0, 5.0, False) == pytest.approx(3.0)
        assert A.project_on_line(x, y, 3.0, 5.0, True) == pytest.approx(0.3)


class TestCurves:
    # golden values from the reference tests (tests/test_hilbert_distance.py:18-35)
    GEOMS = ["POINT (0 0)", "POINT (1 1)", "POINT (1 0)", UNIT_SQ]
    TB = (0.0, 0.0, 1.0, 1.0)

    def _mids(self):
        b = A.bounds(W.parse_wkb([wkb(g) for g in self.GEOMS]))
        return b[:, 0], b[:, 1], b[:, 2], b[:, 3]

    @pytest.mark.parametrize("level,expected", [
        (2, [0, 10, 15, 2]),
        (3, [0, 42, 63, 10]),
        (16, [0, 2863311530, 4294967295, 715827882]),
    ])
    def test_hilbert_golden(self, level, expected):
        minx, miny, maxx, maxy = self._mids()
        d = C.hilbert_from_bounds(minx, miny, maxx, maxy, self.TB, level)
        assert d.tolist() == expected

    def test_morton_identity(self):
        # interleave identity: morton(x, 0) spreads bits of x to even positions
        x = np.array([0b1011], dtype=np.uint32)
        assert C.morton_d(x, np.zeros(1, dtype=np.uint32))[0] == 0b1000101
        assert C.morton_d(np.zeros(1, dtype=np.uint32), x)[0] == 0b10001010

    def test_geohash_known_vector(self):
        # classic example: Jutland peninsula
        s = C.geohash_strings(np.array([10.40744]), np.array([57.64911]), 11)
        assert s[0] == "u4pruydqqvj"

    def test_geohash_precision_range(self):
        with pytest.raises(ValueError):
            C.geohash_uint64(np.array([0.0]), np.array([0.0]), 13)


class TestBucketSets:
    """r7: the co-bucketed sjoin's replication sets (curves.
    bucket_sets_from_bounds) — the quadrant-hierarchy property both
    curves rest on, the superset guarantee, and the point
    short-circuit."""

    def test_curve_hierarchy_exhaustive(self):
        """Every level-6 cell's key lies inside its level-3 block's
        contiguous interval — for BOTH curves, all 4096 cells."""
        import numpy as np

        from dask_geopandas_spark.geometry import curves as C

        level, coarse = 6, 3
        delta = level - coarse
        n = 1 << level
        xs, ys = np.meshgrid(np.arange(n), np.arange(n))
        xs, ys = xs.ravel().astype(np.uint64), ys.ravel().astype(np.uint64)
        for by in ("hilbert", "morton"):
            if by == "hilbert":
                keys = C.hilbert_d(xs, ys, level).astype(np.int64)
                pref = C.hilbert_d(xs >> np.uint64(delta),
                                   ys >> np.uint64(delta),
                                   coarse).astype(np.int64)
            else:
                keys = C.morton_d(xs, ys).astype(np.int64)
                pref = C.morton_d(xs >> np.uint64(delta),
                                  ys >> np.uint64(delta)).astype(np.int64)
            span = 1 << (2 * delta)
            assert ((keys >= pref * span)
                    & (keys < (pref + 1) * span)).all(), by

    def test_superset_of_covered_cells(self):
        """Random bboxes: the bucket set contains the bucket of EVERY
        fine cell the bbox covers (so two overlapping bboxes always
        share a bucket — the join misses no pair)."""
        import numpy as np

        from dask_geopandas_spark.geometry import curves as C

        level, coarse = 6, 3
        rng = np.random.RandomState(7)
        tb = (0.0, 0.0, 1.0, 1.0)
        bounds = sorted(rng.choice(np.arange(1, 4 ** level), 7,
                                   replace=False).tolist())
        for by in ("hilbert", "morton"):
            for _ in range(100):
                x0, y0 = rng.uniform(0, 1, 2)
                w, h = rng.uniform(0, 0.3, 2)
                x1, y1 = min(x0 + w, 1.0), min(y0 + h, 1.0)
                got = set(C.bucket_sets_from_bounds(
                    [x0], [y0], [x1], [y1], tb, bounds, by, level,
                    coarse)[0])
                cx0 = C.discretize_mid(np.array([x0]), 0, 1, level)[0]
                cx1 = C.discretize_mid(np.array([x1]), 0, 1, level)[0]
                cy0 = C.discretize_mid(np.array([y0]), 0, 1, level)[0]
                cy1 = C.discretize_mid(np.array([y1]), 0, 1, level)[0]
                gx, gy = np.meshgrid(np.arange(cx0, cx1 + 1),
                                     np.arange(cy0, cy1 + 1))
                gx = gx.ravel().astype(np.uint64)
                gy = gy.ravel().astype(np.uint64)
                ks = (C.hilbert_d(gx, gy, level) if by == "hilbert"
                      else C.morton_d(gx, gy)).astype(np.int64)
                want = set(np.searchsorted(np.array(bounds), ks,
                                           side="right").tolist())
                assert want <= got

    def test_point_short_circuit_exact(self):
        import numpy as np

        from dask_geopandas_spark.geometry import curves as C

        level = 8
        tb = (0.0, 0.0, 1.0, 1.0)
        bounds = [100, 5000, 30000]
        got = C.bucket_sets_from_bounds([0.3], [0.7], [0.3], [0.7],
                                        tb, bounds, "hilbert", level, 4)
        k = C.hilbert_d(
            C.discretize_mid(np.array([0.3]), 0, 1, level)
            .astype(np.uint64),
            C.discretize_mid(np.array([0.7]), 0, 1, level)
            .astype(np.uint64), level).astype(np.int64)
        assert got[0] == [int(np.searchsorted(np.array(bounds), k,
                                              side="right")[0])]

    def test_validation(self):
        import pytest as _pt

        from dask_geopandas_spark.geometry import curves as C

        with _pt.raises(ValueError, match="hilbert or morton"):
            C.bucket_sets_from_bounds([0], [0], [1], [1],
                                      (0, 0, 1, 1), [1], "geohash")
        with _pt.raises(ValueError, match="coarse"):
            C.bucket_sets_from_bounds([0], [0], [1], [1],
                                      (0, 0, 1, 1), [1], "hilbert",
                                      8, 9)

    def test_superset_property_hypothesis(self):
        """Randomized sweep across levels, coarse levels, boundary
        sets, and bbox shapes: the bucket set always contains every
        covered fine cell's bucket, for both curves."""
        import numpy as np
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from dask_geopandas_spark.geometry import curves as C

        @settings(max_examples=60, deadline=None)
        @given(
            st.integers(min_value=3, max_value=8),        # level
            st.integers(min_value=1, max_value=4),        # coarse gap
            st.lists(st.integers(min_value=1, max_value=4 ** 8 - 1),
                     min_size=1, max_size=9, unique=True),
            st.floats(min_value=0.0, max_value=0.95),
            st.floats(min_value=0.0, max_value=0.95),
            st.floats(min_value=0.0, max_value=0.4),
            st.floats(min_value=0.0, max_value=0.4),
            st.sampled_from(["hilbert", "morton"]),
        )
        def check(level, gap, raw_bounds, x0, y0, w, h, by):
            coarse = max(1, level - gap)
            bounds = sorted(b for b in raw_bounds if b < 4 ** level)
            if not bounds:
                return
            tb = (0.0, 0.0, 1.0, 1.0)
            x1, y1 = min(x0 + w, 1.0), min(y0 + h, 1.0)
            got = set(C.bucket_sets_from_bounds(
                [x0], [y0], [x1], [y1], tb, bounds, by, level,
                coarse)[0])
            cx0 = C.discretize_mid(np.array([x0]), 0, 1, level)[0]
            cx1 = C.discretize_mid(np.array([x1]), 0, 1, level)[0]
            cy0 = C.discretize_mid(np.array([y0]), 0, 1, level)[0]
            cy1 = C.discretize_mid(np.array([y1]), 0, 1, level)[0]
            gx, gy = np.meshgrid(np.arange(cx0, cx1 + 1),
                                 np.arange(cy0, cy1 + 1))
            gx = gx.ravel().astype(np.uint64)
            gy = gy.ravel().astype(np.uint64)
            ks = (C.hilbert_d(gx, gy, level) if by == "hilbert"
                  else C.morton_d(gx, gy)).astype(np.int64)
            want = set(np.searchsorted(np.array(bounds), ks,
                                       side="right").tolist())
            assert want <= got

        check()
