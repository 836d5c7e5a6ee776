"""Unit tests for the pure-numpy polygon boolean kernel
(geometry/booleans.py) — the GEOS-overlay replacement.  Oracle for
axis-aligned cases: exact coordinate-compression union area."""

import numpy as np
import pytest

from dask_geopandas_spark.geometry import booleans as B


def box(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], float)


def area(polys):
    return sum(B.ring_signed_area(r) for p in polys for r in p)


def rect_union_area(rects):
    """Exact union area of axis-aligned rects by coordinate compression."""
    xs = np.unique(np.concatenate([[r[0], r[2]] for r in rects]))
    ys = np.unique(np.concatenate([[r[1], r[3]] for r in rects]))
    tot = 0.0
    for i in range(len(xs) - 1):
        for j in range(len(ys) - 1):
            cx, cy = (xs[i] + xs[i + 1]) / 2, (ys[j] + ys[j + 1]) / 2
            if any(r[0] <= cx <= r[2] and r[1] <= cy <= r[3] for r in rects):
                tot += (xs[i + 1] - xs[i]) * (ys[j + 1] - ys[j])
    return tot


class TestBinaryOverlay:
    def test_union_overlapping(self):
        u = B.overlay([box(0, 0, 2, 2)], [box(1, 1, 3, 3)], "union")
        assert len(u) == 1 and area(u) == 7.0

    def test_union_disjoint_multipolygon(self):
        u = B.overlay([box(0, 0, 1, 1)], [box(5, 5, 6, 6)], "union")
        assert len(u) == 2 and area(u) == 2.0

    def test_union_corner_touch_stays_two_shells(self):
        """OGC validity: corner-touching squares must NOT fuse into one
        bowtie ring — the pinch-vertex successor rule separates them."""
        u = B.overlay([box(0, 0, 1, 1)], [box(1, 1, 2, 2)], "union")
        assert len(u) == 2 and area(u) == 2.0

    @pytest.mark.parametrize("b2", [
        (1, 0, 2, 1),   # shared vertical edge
        (0, 1, 1, 2),   # shared horizontal edge
    ])
    def test_union_shared_edge_merges(self, b2):
        u = B.overlay([box(0, 0, 1, 1)], [box(*b2)], "union")
        assert len(u) == 1 and len(u[0]) == 1 and area(u) == 2.0

    def test_union_contained(self):
        u = B.overlay([box(0, 0, 4, 4)], [box(1, 1, 2, 2)], "union")
        assert len(u) == 1 and area(u) == 16.0

    def test_intersection(self):
        i = B.overlay([box(0, 0, 2, 2)], [box(1, 1, 3, 3)], "intersection")
        assert len(i) == 1 and area(i) == 1.0

    def test_intersection_disjoint_empty(self):
        assert B.overlay([box(0, 0, 1, 1)], [box(3, 3, 4, 4)],
                         "intersection") == []

    def test_intersection_edge_touch_empty(self):
        """Touching along an edge has empty interior — no area output."""
        assert B.overlay([box(0, 0, 1, 1)], [box(1, 0, 2, 1)],
                         "intersection") == []

    def test_difference_creates_hole(self):
        d = B.overlay([box(0, 0, 4, 4)], [box(1, 1, 2, 2)], "difference")
        assert len(d) == 1 and len(d[0]) == 2 and area(d) == 15.0
        shell, hole = d[0]
        assert B.ring_signed_area(shell) > 0 > B.ring_signed_area(hole)

    def test_difference_splits_parts(self):
        d = B.overlay([box(0, 0, 3, 1)], [box(1, -1, 2, 2)], "difference")
        assert len(d) == 2 and area(d) == 2.0

    def test_difference_covered_empty(self):
        assert B.overlay([box(1, 1, 2, 2)], [box(0, 0, 3, 3)],
                         "difference") == []

    def test_xor(self):
        x = B.overlay([box(0, 0, 2, 2)], [box(1, 1, 3, 3)], "xor")
        assert len(x) == 2 and area(x) == 6.0

    def test_identical_operands(self):
        a = [box(0, 0, 2, 2)]
        assert area(B.overlay(a, a, "union")) == 4.0
        assert area(B.overlay(a, a, "intersection")) == 4.0
        assert B.overlay(a, a, "difference") == []
        assert B.overlay(a, a, "xor") == []

    def test_empty_operand(self):
        a = [box(0, 0, 2, 2)]
        assert area(B.overlay(a, [], "union")) == 4.0
        assert B.overlay(a, [], "intersection") == []
        assert area(B.overlay(a, [], "difference")) == 4.0
        assert B.overlay([], a, "difference") == []

    def test_concave_l_shape_intersection(self):
        L = np.array([[0, 0], [3, 0], [3, 1], [1, 1], [1, 3], [0, 3], [0, 0]],
                     float)
        i = B.overlay([L], [box(0.5, 0.5, 2.5, 2.5)], "intersection")
        assert area(i) == pytest.approx(1.75, abs=1e-9)

    def test_operand_with_hole(self):
        holed = B.overlay([box(0, 0, 4, 4)], [box(1, 1, 3, 3)], "difference")
        rings = [r for p in holed for r in p]
        # patch the hole back -> solid square
        u = B.overlay(rings, [box(1, 1, 3, 3)], "union")
        assert len(u) == 1 and len(u[0]) == 1 and area(u) == 16.0
        # intersect the holed frame with a box crossing the hole
        i = B.overlay(rings, [box(0, 1.5, 4, 2.5)], "intersection")
        assert area(i) == pytest.approx(2.0, abs=1e-9)  # two 1x1 side bites

    def test_triangles_inclusion_exclusion(self):
        t1 = np.array([[0.1, 0.1], [2.7, 0.3], [1.5, 2.9], [0.1, 0.1]])
        t2 = np.array([[1.0, 0.0], [3.0, 1.0], [0.0, 2.0], [1.0, 0.0]])
        a1, a2 = B.ring_signed_area(t1), B.ring_signed_area(t2)
        ai = area(B.overlay([t1], [t2], "intersection"))
        au = area(B.overlay([t1], [t2], "union"))
        assert ai + au == pytest.approx(a1 + a2, rel=1e-9)


class TestNaryUnion:
    def test_random_boxes_vs_compression_oracle(self):
        rng = np.random.default_rng(7)
        rects = []
        for _ in range(40):
            x0, y0 = rng.integers(0, 30, 2)
            w, h = rng.integers(1, 8, 2)
            rects.append((float(x0), float(y0), float(x0 + w), float(y0 + h)))
        u = B.union_polygons([[box(*r)] for r in rects])
        assert area(u) == pytest.approx(rect_union_area(rects), abs=1e-9)

    def test_frame_of_rects_makes_hole(self):
        frame = [(0, 0, 10, 2), (0, 8, 10, 10), (0, 0, 2, 10), (8, 0, 10, 10)]
        u = B.union_polygons([[box(*r)] for r in frame])
        assert len(u) == 1 and len(u[0]) == 2
        assert area(u) == pytest.approx(rect_union_area(frame), abs=1e-9)

    def test_fold_path_matches_single_pass(self):
        """Divide-and-conquer folding (forced tiny budget) returns the
        same area as the single-pass arrangement."""
        rng = np.random.default_rng(3)
        rects = []
        for _ in range(30):
            x0, y0 = rng.integers(0, 20, 2)
            rects.append((float(x0), float(y0),
                          float(x0 + rng.integers(1, 6)),
                          float(y0 + rng.integers(1, 6))))
        polys = [[box(*r)] for r in rects]
        one = area(B.union_polygons(polys))
        old = B._MAX_FOLD_E
        try:
            B._MAX_FOLD_E = 40  # force deep folding
            folded = area(B.union_polygons(polys))
        finally:
            B._MAX_FOLD_E = old
        assert folded == pytest.approx(one, rel=1e-12)
        assert one == pytest.approx(rect_union_area(rects), abs=1e-9)

    def test_single_polygon_passthrough(self):
        u = B.union_polygons([[box(0, 0, 2, 3)]])
        assert area(u) == 6.0


class TestClipLines:
    L = np.array([[0, 0], [3, 0], [3, 1], [1, 1], [1, 3], [0, 3], [0, 0]],
                 float)

    def test_cross_bottom_arm(self):
        out = B.clip_lines_to_rings([np.array([[-1, 0.5], [4, 0.5]])], [self.L])
        assert len(out) == 1
        np.testing.assert_allclose(out[0], [[0, 0.5], [3, 0.5]])

    def test_cross_left_arm_only(self):
        out = B.clip_lines_to_rings([np.array([[-1., 2], [4, 2]])], [self.L])
        assert len(out) == 1
        np.testing.assert_allclose(out[0], [[0, 2], [1, 2]])

    def test_outside_kept_when_inverted(self):
        out = B.clip_lines_to_rings([np.array([[-1., 2], [4, 2]])], [self.L],
                                    keep_inside=False)
        total = sum(np.hypot(*np.diff(o, axis=0).T).sum() for o in out)
        assert total == pytest.approx(4.0)  # 5 total - 1 inside

    def test_line_through_hole_splits(self):
        holed = B.overlay([box(0, 0, 4, 4)], [box(1, 1, 3, 3)], "difference")
        rings = [r for p in holed for r in p]
        out = B.clip_lines_to_rings([np.array([[-1., 2.], [5., 2.]])], rings)
        lens = sorted(np.hypot(*np.diff(o, axis=0).T).sum() for o in out)
        assert lens == pytest.approx([1.0, 1.0])

    def test_boundary_collinear_piece_kept(self):
        out = B.clip_lines_to_rings(
            [np.array([[-1., 0.], [4., 0.]])], [box(0, 0, 3, 3)])
        total = sum(np.hypot(*np.diff(o, axis=0).T).sum() for o in out)
        assert total == pytest.approx(3.0)
