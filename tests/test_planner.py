"""Plan-shape regression tests for the engine's Catalyst countermeasures.

These pin optimizer-dependent behavior that would regress silently (the
query still returns correct rows, just 10x slower on unsplittable
scans), so they assert on the physical plan, not results.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from dask_geopandas_spark.core import no_pushdown


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _line_of(plan: str, needle: str):
    for i, line in enumerate(plan.splitlines()):
        if needle in line:
            return i
    return None


@pytest.fixture(scope="module")
def udf_frame(spark):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(DoubleType())
    def doubled(x: pd.Series) -> pd.Series:
        return x * 2.0

    df = spark.range(0, 1000).withColumn("v", F.col("id").cast("double"))
    # the engine's rebalance shape: repartition directly over the scan
    return df.repartition(8), doubled


def test_plain_udf_filter_sinks_below_exchange(spark, udf_frame):
    """Documents WHY no_pushdown exists: a deterministic filter on a UDF
    output is pushed through the round-robin exchange, dragging the
    ArrowEvalPython stage onto the scan side."""
    df, doubled = udf_frame
    out = df.withColumn("d", doubled("v")).filter(F.col("d") > 0).groupBy().count()
    plan = _plan(out)
    arrow, exch = _line_of(plan, "ArrowEvalPython"), _line_of(plan, "RoundRobinPartitioning")
    assert arrow is not None and exch is not None
    assert arrow > exch  # printed below the exchange = runs before it


def test_no_pushdown_keeps_udf_above_exchange(spark, udf_frame):
    """With the barrier, the Python stage runs after the rebalance (full
    parallelism even on an unsplittable single-row-group scan)."""
    df, doubled = udf_frame
    out = (
        df.withColumn("d", doubled("v"))
        .filter(no_pushdown(F.col("d") > 0))
        .groupBy().count()
    )
    plan = _plan(out)
    arrow, exch = _line_of(plan, "ArrowEvalPython"), _line_of(plan, "RoundRobinPartitioning")
    assert arrow is not None and exch is not None
    assert arrow < exch  # printed above the exchange = runs after it


def test_no_pushdown_preserves_filter_semantics(spark, udf_frame):
    df, doubled = udf_frame
    base = df.withColumn("d", doubled("v"))
    want = base.filter(F.col("d") > 1000.0).count()
    got = base.filter(no_pushdown(F.col("d") > 1000.0)).count()
    assert got == want and want > 0


def test_grid_sjoin_hinted_is_fully_native(spark):
    """Grid sjoin of a hinted point layer against a hinted box layer:
    zero Python stages, and the point side emits its cell id directly
    (no Generate nodes on the left — only the box side's two explodes)."""
    import numpy as np

    import dask_geopandas_spark as dgs

    rng = np.random.default_rng(11)
    pts_pdf = pd.DataFrame({
        "id": range(500),
        "x": rng.uniform(-170, 170, 500),
        "y": rng.uniform(-80, 80, 500),
    })
    box_pdf = pd.DataFrame({
        "bid": range(20),
        "minx": [-170.0 + 17 * i for i in range(20)],
        "miny": [-80.0 + 8 * i for i in range(20)],
    })
    box_pdf["maxx"] = box_pdf.minx + 30.0
    box_pdf["maxy"] = box_pdf.miny + 16.0
    pts = dgs.points_from_xy(
        spark.createDataFrame(pts_pdf), "x", "y", crs="EPSG:4326")
    boxes = dgs.boxes_from_bounds(
        spark.createDataFrame(box_pdf), crs="EPSG:4326")
    out = pts.sjoin(boxes, predicate="within", strategy="grid", grid_level=5)
    # project away the geometry column (as any aggregate/count consumer
    # does): the join/refinement itself must add no Python stage — the
    # only ArrowEvalPython in the full plan is materializing the output
    # WKB geometry, which Catalyst prunes when unused
    plan = _plan(out.df.select("id", "bid"))
    assert "ArrowEvalPython" not in plan
    assert plan.count("Generate") == 2  # box side only; point side direct
    # correctness of the native path against the broadcast path
    key = lambda g: sorted((r["id"], r["bid"]) for r in
                           g.df.select("id", "bid").collect())
    bcast = pts.sjoin(boxes, predicate="within", strategy="broadcast")
    assert key(out) == key(bcast) and len(key(out)) > 0


def test_cx_pushes_bbox_predicate_to_parquet_scan(spark, tmp_path):
    """README's core storage claim: on a stored dataset with a
    materialized bbox struct, .cx becomes native comparisons that reach
    the parquet scan as PushedFilters (row-group stats pruning at
    scale), and the WKB geometry column is pruned from the read."""
    import numpy as np

    import dask_geopandas_spark as dgs

    rng = np.random.default_rng(5)
    pdf = pd.DataFrame({
        "id": np.arange(2000, dtype="int64"),
        "x": rng.uniform(-170, 170, 2000),
        "y": rng.uniform(-80, 80, 2000),
    })
    g = dgs.points_from_xy(
        spark.createDataFrame(pdf).repartition(4), "x", "y",
        crs="EPSG:4326").with_bbox()
    path = str(tmp_path / "sorted")
    g.to_parquet(path, spatial_sort=True, spatial_sort_level=8)

    back = dgs.read_parquet(spark, path)
    assert back.bbox_column in back.df.columns
    sel = back.cx(xmin=-50, ymin=-40, xmax=60, ymax=55).df.select("id")
    plan = _plan(sel)
    scan = [ln for ln in plan.splitlines() if "Scan parquet" in ln or
            "PushedFilters" in ln or "FileScan" in ln]
    text = "\n".join(scan) or plan
    assert "geometry_bbox.minx" in text or "minx" in text
    assert "PushedFilters: []" not in text and "PushedFilters" in text
    # the 21-byte WKB column is not read at all
    assert "ReadSchema" not in text or "geometry:" not in text


def test_stored_point_dataset_clips_and_cx_natively(spark, tmp_path):
    """A GeoParquet dataset whose geometry_types say all-Point reads
    back with the point hint: clip and two-sided .cx run with no
    Python stage and match the generic UDF path."""
    import numpy as np

    import dask_geopandas_spark as dgs

    rng = np.random.default_rng(9)
    pdf = pd.DataFrame({
        "id": np.arange(400, dtype="int64"),
        "x": rng.uniform(-10, 10, 400).round(4),
        "y": rng.uniform(-10, 10, 400).round(4),
    })
    g = dgs.points_from_xy(spark.createDataFrame(pdf), "x", "y",
                           crs="EPSG:4326").with_bbox()
    path = str(tmp_path / "pts")
    g.to_parquet(path)
    back = dgs.read_parquet(spark, path)
    assert back._point and back.envelope_exact

    bare = dgs.GeoDataFrame(back.df, back.geometry_column)  # no hints
    tri = "POLYGON ((-8 -8, 8 -8, 0 9, -8 -8))"
    for sel in [lambda d: d.clip(tri), lambda d: d.clip((-5.0, -5.0, 5.0, 5.0)),
                lambda d: d.cx(xmin=-5, ymin=-5, xmax=5, ymax=5)]:
        fast = sorted(r.id for r in sel(back).df.select("id").collect())
        slow = sorted(r.id for r in sel(bare).df.select("id").collect())
        assert fast == slow and len(fast) > 0
        plan = _plan(sel(back).df.select("id"))
        assert "ArrowEvalPython" not in plan
