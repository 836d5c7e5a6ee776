"""OGC validity taxonomy vectors for st_isvalid (reference behavior:
shapely/GEOS ``is_valid`` — see the GEOS IsValidOp rules).  Pure-kernel
test: calls the pandas UDF body directly, no Spark session."""

import pandas as pd
import pytest

from dask_geopandas_spark.geometry import wkt as T
from dask_geopandas_spark.functions import core as FX

CASES = [
    # --- single-ring basics ---
    ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", True, "plain square"),
    ("POLYGON ((0 0, 2 0, 2 2, 0 0))", True, "triangle"),
    ("POLYGON ((0 0, 4 0, 0 4, 4 4, 0 0))", False, "bowtie"),
    ("POLYGON ((0 0, 2 0, 0 0))", False, "two-point ring"),
    # --- holes vs shell ---
    ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))",
     True, "square with hole"),
    ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (3 3, 6 3, 6 6, 3 6, 3 3))",
     False, "hole pokes out of shell"),
    ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (5 5, 6 5, 6 6, 5 6, 5 5))",
     False, "hole fully outside shell"),
    ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 1 1, 1 1, 1 1))",
     False, "degenerate collapsed hole"),
    # --- hole vs hole ---
    ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1), "
     "(1.5 1.5, 2.5 1.5, 2.5 2.5, 1.5 2.5, 1.5 1.5))",
     False, "hole nested inside hole"),
    ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1), "
     "(2.5 1, 3.5 1, 3.5 2, 2.5 2, 2.5 1))",
     True, "two disjoint holes"),
    ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1), "
     "(2 1, 3 1, 3 2, 2 2, 2 1))",
     False, "holes share an edge run"),
    ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1), "
     "(2 2, 3 2, 3 3, 2 3, 2 2))",
     True, "holes touch at one point"),
    # --- connected interior ---
    ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (0 0, 1 1, 2 0.5, 0 0))",
     True, "hole touches shell at one vertex"),
    ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (0 2, 2 1, 4 2, 2 3, 0 2))",
     False, "hole spans shell (2 touches) — interior pinched"),
    ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (2 0, 4 2, 2 4, 0 2, 2 0))",
     False, "diamond hole cuts interior into 4 corners"),
    # --- multipolygon part rules ---
    ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
     "((2 2, 3 2, 3 3, 2 3, 2 2)))", True, "disjoint parts"),
    ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
     "((1 1, 2 1, 2 2, 1 2, 1 1)))", True, "parts touch at a corner"),
    ("MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), "
     "((1 1, 3 1, 3 3, 1 3, 1 1)))", False, "parts overlap"),
    ("MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0)), "
     "((1 1, 2 1, 2 2, 1 2, 1 1)))", False, "nested shells"),
    ("MULTIPOLYGON (((0 0, 4 0, 4 4, 0 4, 0 0), "
     "(1 1, 3 1, 3 3, 1 3, 1 1)), "
     "((1.5 1.5, 2.5 1.5, 2.5 2.5, 1.5 2.5, 1.5 1.5)))",
     True, "part inside another part's hole"),
    ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
     "((1 0, 2 0, 2 1, 1 1, 1 0)))", False, "parts share an edge"),
    # --- non-areal types are always valid ---
    ("POINT (1 2)", True, "point"),
    ("LINESTRING (0 0, 1 1, 0 2)", True, "line"),
]


@pytest.mark.parametrize("wkt,expected,label",
                         CASES, ids=[c[2] for c in CASES])
def test_validity_vector(wkt, expected, label):
    got = FX.st_isvalid.func(pd.Series([T.wkt_to_wkb(wkt)]))[0]
    assert bool(got) == expected, label


def test_validity_null():
    got = FX.st_isvalid.func(pd.Series([None], dtype=object))
    assert got.isna().all()


def test_validity_whole_batch():
    """All vectors in one Arrow batch (the vectorized path must not
    cross-talk between rows)."""
    wkbs = [T.wkt_to_wkb(w) for w, _, _ in CASES]
    got = FX.st_isvalid.func(pd.Series(wkbs))
    assert [bool(g) for g in got] == [e for _, e, _ in CASES]
