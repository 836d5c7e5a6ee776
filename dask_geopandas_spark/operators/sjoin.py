"""Spatial join (reference sjoin.py:14-122 — the flagship distributed op).

The reference prunes partition *pairs* via a driver-side metadata sjoin,
then runs geopandas.sjoin per pair.  The Spark-first equivalent replaces
hand pruning with join strategies Catalyst already knows how to execute:

- **broadcast** (one side small — the reference's geopandas-vs-dask case,
  sjoin.py:56-59): broadcast nested-loop join on the bbox overlap range
  condition, then exact predicate refinement.
- **grid** (both sides big): each row emits the grid cells its bbox
  covers (at ``grid_level``: 2^L × 2^L cells over the union of both
  total bounds); equi-join on cell id → a plain shuffled hash join that
  scales horizontally; duplicate (left,right) candidate pairs from
  multi-cell bboxes are dropped before refinement.  This is exactly the
  reference's partition-pair pruning (sjoin.py:71-82) re-expressed as a
  co-partitioned equi-join.

Only inner join, like the reference (sjoin.py:53-54); predicate coverage:
intersects / contains / contains_properly / within / covers / covered_by.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from ..functions import core as FX

_PREDICATES = {
    "intersects": lambda l, r: FX.st_intersects(l, r),
    "contains": lambda l, r: FX.st_contains(l, r),
    "contains_properly": lambda l, r: FX.st_contains(l, r),
    "within": lambda l, r: FX.st_within(l, r),
    "covers": lambda l, r: FX.st_covers(l, r),
    "covered_by": lambda l, r: FX.st_coveredby(l, r),
}

BROADCAST_ROW_THRESHOLD = 100_000


def _bbox_overlap(lb: str, rb: str) -> Column:
    return (
        (F.col(f"{lb}.minx") <= F.col(f"{rb}.maxx"))
        & (F.col(f"{lb}.maxx") >= F.col(f"{rb}.minx"))
        & (F.col(f"{lb}.miny") <= F.col(f"{rb}.maxy"))
        & (F.col(f"{lb}.maxy") >= F.col(f"{rb}.miny"))
    )


def _suffix_collisions(ldf: DataFrame, rdf: DataFrame,
                       lsuffix: str, rsuffix: str):
    common = set(ldf.columns) & set(rdf.columns)
    for c in common:
        ldf = ldf.withColumnRenamed(c, f"{c}{lsuffix}")
        rdf = rdf.withColumnRenamed(c, f"{c}{rsuffix}")
    return ldf, rdf


def _grid_cells_udf(total_bounds, level: int):
    """Emit the cell ids a bbox covers on a 2^level × 2^level grid."""
    tminx, tminy, tmaxx, tmaxy = total_bounds
    n = 1 << level
    wx = (tmaxx - tminx) or 1.0
    wy = (tmaxy - tminy) or 1.0
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(ArrayType(LongType()))
    def _cells(minx: pd.Series, miny: pd.Series, maxx: pd.Series, maxy: pd.Series) -> pd.Series:
        x0 = np.clip(((minx.to_numpy() - tminx) / wx * n).astype(np.int64), 0, n - 1)
        x1 = np.clip(((maxx.to_numpy() - tminx) / wx * n).astype(np.int64), 0, n - 1)
        y0 = np.clip(((miny.to_numpy() - tminy) / wy * n).astype(np.int64), 0, n - 1)
        y1 = np.clip(((maxy.to_numpy() - tminy) / wy * n).astype(np.int64), 0, n - 1)
        out = []
        for a, b, c, d in zip(x0, x1, y0, y1):
            if a < 0:
                out.append(None)
                continue
            xs = np.arange(a, b + 1)
            ys = np.arange(c, d + 1)
            out.append((xs[:, None] * n + ys[None, :]).ravel().tolist())
        return pd.Series(out, dtype=object)

    return _cells


def sjoin(left, right, how: str = "inner", predicate: str = "intersects",
          strategy: str = "auto", grid_level: int = 7,
          lsuffix: str = "_left", rsuffix: str = "_right"):
    """Spatial join of two GeoDataFrames; returns a GeoDataFrame keeping
    the left geometry (reference keeps left geometry too, sjoin.py:92-101)."""
    from ..core import GeoDataFrame

    if how != "inner":
        # reference contract, sjoin.py:53-54
        raise ValueError("only how='inner' is supported (matches reference)")
    if predicate not in _PREDICATES:
        raise ValueError(
            f"unsupported predicate {predicate!r}; supported: {sorted(_PREDICATES)}"
        )

    lg = left.with_bbox()
    rg = right.with_bbox()
    lgeom, rgeom = lg.geometry_column, rg.geometry_column
    lbbox, rbbox = lg.bbox_column, rg.bbox_column

    ldf, rdf = _suffix_collisions(lg.df, rg.df, lsuffix, rsuffix)
    if lgeom in set(lg.df.columns) & set(rg.df.columns):
        lgeom_j, rgeom_j = f"{lgeom}{lsuffix}", f"{rgeom}{rsuffix}"
        lbbox_j, rbbox_j = f"{lbbox}{lsuffix}", f"{rbbox}{rsuffix}"
    else:
        lgeom_j, rgeom_j = lgeom, rgeom
        lbbox_j, rbbox_j = lbbox, rbbox
        if lbbox in set(lg.df.columns) & set(rg.df.columns):
            lbbox_j, rbbox_j = f"{lbbox}{lsuffix}", f"{rbbox}{rsuffix}"

    if strategy == "auto":
        # broadcast when the right side is clearly small (mirrors the
        # reference's special-case of a plain-geopandas right side)
        strategy = "broadcast" if _is_small(rdf) else "grid"

    if strategy == "broadcast":
        joined = ldf.join(F.broadcast(rdf), on=_bbox_overlap(lbbox_j, rbbox_j), how="inner")
    elif strategy == "grid":
        tb_l = lg.total_bounds()
        tb_r = rg.total_bounds()
        tb = (
            min(tb_l[0], tb_r[0]), min(tb_l[1], tb_r[1]),
            max(tb_l[2], tb_r[2]), max(tb_l[3], tb_r[3]),
        )
        cells = _grid_cells_udf(tb, grid_level)
        lc = ldf.withColumn("_lrow", F.monotonically_increasing_id()).withColumn(
            "_cell",
            F.explode(cells(F.col(f"{lbbox_j}.minx"), F.col(f"{lbbox_j}.miny"),
                            F.col(f"{lbbox_j}.maxx"), F.col(f"{lbbox_j}.maxy"))),
        )
        rc = rdf.withColumn("_rrow", F.monotonically_increasing_id()).withColumn(
            "_cell",
            F.explode(cells(F.col(f"{rbbox_j}.minx"), F.col(f"{rbbox_j}.miny"),
                            F.col(f"{rbbox_j}.maxx"), F.col(f"{rbbox_j}.maxy"))),
        )
        joined = (
            lc.join(rc, on="_cell", how="inner")
            .filter(_bbox_overlap(lbbox_j, rbbox_j))
            .dropDuplicates(["_lrow", "_rrow"])
            .drop("_cell", "_lrow", "_rrow")
        )
    else:
        raise ValueError(f"unknown strategy {strategy!r}")

    refined = joined.filter(
        _PREDICATES[predicate](F.col(lgeom_j), F.col(rgeom_j))
    ).drop(rgeom_j, rbbox_j)

    return GeoDataFrame(refined, lgeom_j, crs_map=getattr(left, "_crs", {}))


def _is_small(df: DataFrame, threshold: int = BROADCAST_ROW_THRESHOLD) -> bool:
    # cheap plan-based guess; fall back to a limited count
    try:
        cnt = df.limit(threshold + 1).count()
        return cnt <= threshold
    except Exception:
        return False
