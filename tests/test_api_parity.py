"""API-parity audit: every public bound method/property of the
reference's `_Frame`/`GeoDataFrame` (reference expr.py) must exist on
the engine's GeoDataFrame, modulo dask-engine internals that have no
meaning in the DataFrame model (documented exclusions below)."""

import re

import pytest

import dask_geopandas_spark as dgs

# dask expression-protocol internals — not user API (chunk/aggregate/
# combine are the TreeReduce node surface; optimize/func/copy are dask
# graph machinery)
_DASK_INTERNALS = {"aggregate", "chunk", "combine", "func", "optimize",
                   "copy"}


def _reference_surface():
    ref = open("/root/reference/dask_geopandas/expr.py").read()
    methods = set(re.findall(r"^    def ([a-z_][a-z0-9_]*)\(", ref, re.M))
    props = set(re.findall(r"^    @property\n    def ([a-z_][a-z0-9_]*)\(",
                           ref, re.M))
    return sorted((methods | props)
                  - {n for n in methods | props if n.startswith("_")}
                  - _DASK_INTERNALS)


def test_every_reference_method_exists():
    names = _reference_surface()
    assert len(names) >= 35  # the surface we audited (guards regex rot)
    missing = [n for n in names if not hasattr(dgs.GeoDataFrame, n)]
    assert missing == [], f"reference API missing on GeoDataFrame: {missing}"


def test_sindex_partition_query(spark):
    import pandas as pd

    pdf = pd.DataFrame({"x": [0.0, 100.0], "y": [0.0, 100.0]})
    g = dgs.points_from_xy(spark.createDataFrame(pdf), "x", "y")
    # no stored summary -> every partition is a candidate
    assert g.sindex.valid is False and g.sindex.query(0, 0, 1, 1) is None
    g.spatial_partitions = [(0, 0, 10, 10), (90, 90, 110, 110)]
    assert g.sindex.query(-5, -5, 5, 5) == [0]
    assert g.sindex.query(95, 95, 96, 96) == [1]
    assert g.sindex.query(-5, -5, 200, 200) == [0, 1]
    assert len(g.sindex) == 2


def test_set_index_and_demote(spark):
    import pandas as pd

    pdf = pd.DataFrame({"k": [3, 1, 2, 5, 4], "x": [0.0] * 5, "y": [0.0] * 5})
    g = dgs.points_from_xy(spark.createDataFrame(pdf), "x", "y")
    s = g.set_index("k", npartitions=2)
    assert isinstance(s, dgs.GeoDataFrame)
    # range-partitioned: partition maxes are non-decreasing across ids
    from pyspark.sql import functions as F
    parts = (s.df.withColumn("_pid", F.spark_partition_id())
             .groupBy("_pid").agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
             .orderBy("_pid").collect())
    for a, b in zip(parts, parts[1:]):
        assert a["hi"] <= b["lo"]
    plain = g.to_dask_dataframe()
    assert plain is g.df  # the demotion contract: identical frame


def test_top_level_namespace_parity():
    """Every name in the reference's __all__ exists at this package's
    top level (GeoSeries maps to Column per the data model)."""
    ref_all = ["GeoDataFrame", "GeoSeries", "clip", "from_dask_dataframe",
               "from_geopandas", "from_wkb", "from_wkt", "points_from_xy",
               "read_feather", "read_file", "read_parquet", "sjoin",
               "to_feather", "to_parquet"]
    missing = [n for n in ref_all if not hasattr(dgs, n)]
    assert missing == []
    from pyspark.sql import Column
    assert dgs.GeoSeries is Column


def test_top_level_to_parquet_roundtrip(spark, tmp_path):
    import pandas as pd

    pdf = pd.DataFrame({"x": [1.0, 2.0], "y": [3.0, 4.0]})
    g = dgs.points_from_xy(spark.createDataFrame(pdf), "x", "y",
                           crs="EPSG:4326")
    path = str(tmp_path / "toplevel")
    dgs.to_parquet(g, path)
    assert dgs.read_parquet(spark, path).count() == 2


def test_spatial_partitions_survive_row_ops_not_geometry_ops(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    pdf = pd.DataFrame({"k": [1, 2], "x": [0.0, 50.0], "y": [0.0, 50.0]})
    g = dgs.points_from_xy(spark.createDataFrame(pdf), "x", "y",
                           crs="EPSG:4326")
    g.spatial_partitions = [(0, 0, 60, 60)]
    # row subset / projection keep the covering summary
    assert g.filter(F.col("k") == 1).spatial_partitions == [(0, 0, 60, 60)]
    assert g[["k", "geometry"]].spatial_partitions == [(0, 0, 60, 60)]
    # geometry transform invalidates it
    assert g.buffer(1.0).spatial_partitions is None
    assert g.to_crs("EPSG:3857").spatial_partitions is None
