"""Persisted spatial-bucketed datasets — the spatial member of the
engine's stored-layout family (`write_ivf_index` for vectors,
`write_text_index` for BM25, `write_minhash_index` for near-dups):
shuffle a dataset ONCE with explicit curve-key boundaries
(`GeoDataFrame.spatial_shuffle(boundaries=)`), persist it
hive-partitioned by the bucket id, and every later session gets

- **bbox-pruned reads**: a query window maps to its candidate buckets
  DRIVER-SIDE (the same quadrant-hierarchy interval math the
  co-bucketed join uses, `geometry.curves.bucket_sets_from_bounds`) —
  the scan carries a static ``_spatial_bucket`` PartitionFilter and
  touches only the window's buckets of a 100-TB layout;
- **cross-run co-bucketed joins**: the reader re-attaches the
  boundary-hash column metadata, so `sjoin` recognizes two datasets
  written with the same layout and plans its bucket equi-join (each
  side pays ONE re-hash Exchange after the scan — still no grid
  explode, no bounds job, no per-join layout work).

The reference keeps spatial partitioning in memory per-frame
(expr.py:199-211 `spatial_partitions`); persisting it as a parquet
layout is the Spark-native durable form.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_META_FILE = "_spatial_bucketed_meta.json"


def write_spatial_bucketed(gdf, path: str, by: str = "hilbert",
                           level: int = 16, boundaries=None,
                           total_bounds=None,
                           npartitions: int | None = None,
                           replicate: bool = False,
                           dilate: float = 0.0,
                           append: bool = False) -> None:
    """Shuffle ``gdf`` with explicit curve-key ``boundaries`` and
    persist it hive-partitioned by ``_spatial_bucket`` plus a JSON
    layout sidecar (curve, level, total_bounds, boundaries,
    npartitions, dilation, flags) that `read_spatial_bucketed` rebuilds
    the column metadata from.

    ``total_bounds`` and ``boundaries`` are REQUIRED: a durable layout
    must not depend on a per-write bounds scan (two datasets written
    with the same explicit parameters co-bucket across runs; derived
    bounds would silently diverge).

    ``replicate=True`` persists the JOIN layout — one row per bucket a
    geometry's bbox can meet (plus ``dilate`` margin for distance
    joins), exactly `spatial_shuffle(replicate=True)`'s frame, rows
    DUPLICATED on disk.  Read back, it feeds `sjoin`'s co-bucketed
    path directly; it is not a general-purpose dataset (aggregates
    would double-count straddlers).

    ``append=True`` adds a new batch of rows to an existing layout —
    the daily tile-ingest shape: a batch shuffled with the SAME layout
    parameters lands in the same hive buckets, so the grown dataset
    still bbox-prunes and co-bucket-joins exactly like the original.
    Every layout parameter (curve, level, bounds, boundaries,
    replication flags, geometry column) is VALIDATED against the
    stored sidecar — a drifted layout would silently mis-bucket the
    batch, corrupting every pruned read.  Row disjointness is the
    caller's contract (re-appending a row duplicates it, like any
    parquet append); periodic small-files maintenance is
    ``compact_index(spark, path, dataset='data')``."""
    if boundaries is None or total_bounds is None:
        raise ValueError(
            "write_spatial_bucketed needs explicit boundaries= and "
            "total_bounds= (a durable layout cannot depend on a "
            "per-write bounds scan)")
    base = path.rstrip("/")
    shuffled = gdf.spatial_shuffle(by=by, level=level,
                                   npartitions=npartitions,
                                   total_bounds=total_bounds,
                                   boundaries=boundaries,
                                   replicate=replicate, dilate=dilate)
    meta = dict(shuffled.df.schema["_spatial_bucket"].metadata or {})
    sidecar = {
        "by": by, "level": int(level),
        "total_bounds": [float(v) for v in total_bounds],
        "boundaries": [int(b) for b in boundaries],
        "npartitions": int(npartitions or len(list(boundaries)) + 1),
        "geometry": gdf.geometry_column,
        "crs": getattr(gdf, "crs", None),
        "column_meta": meta,
    }
    from .fs import resolve_fs

    if append:
        from pyarrow import fs as pafs

        fsys, mpath = resolve_fs(base + "/" + _META_FILE)
        if fsys.get_file_info(mpath).type == pafs.FileType.NotFound:
            raise ValueError(
                f"append=True but no spatial layout exists at "
                f"{base!r} — write it first (append cannot define a "
                "layout)")
        with fsys.open_input_stream(mpath) as f:
            stored = json.loads(f.read().decode())
        drift = [k for k in ("by", "level", "total_bounds",
                             "boundaries", "geometry", "crs",
                             "column_meta")
                 if stored.get(k) != sidecar[k]]
        if drift:
            raise ValueError(
                f"appended batch's layout differs from the stored one "
                f"at {base!r} in {drift}: a drifted layout would "
                "mis-bucket the batch and corrupt every pruned "
                "read/co-bucketed join — use the stored parameters "
                "or rewrite the layout")
    (shuffled.df.write.mode("append" if append else "overwrite")
        .partitionBy("_spatial_bucket").parquet(base + "/data"))
    if not append:
        fsys, mpath = resolve_fs(base + "/" + _META_FILE)
        with fsys.open_output_stream(mpath) as out:
            out.write(json.dumps(sidecar).encode())


def read_spatial_bucketed(spark: SparkSession, path: str, bbox=None,
                          coarse: int | None = None):
    """Read a `write_spatial_bucketed` dataset back as a GeoDataFrame
    with its layout metadata restored (so `sjoin` can co-bucket it
    against a same-layout dataset).

    ``bbox=(xmin, ymin, xmax, ymax)`` prunes the scan to the buckets
    the window can meet: the window's candidate bucket list computes
    DRIVER-SIDE from the layout parameters (numpy over the sidecar —
    no Spark job), lands as a static ``_spatial_bucket IN``
    PartitionFilter, and the per-row bbox refinement is the caller's
    usual `.cx`/predicate step.  Pruning is a superset by the same
    hierarchy argument as the join replication: no row intersecting
    the window is ever skipped."""
    import numpy as np

    from .fs import resolve_fs

    base = path.rstrip("/")
    fsys, mpath = resolve_fs(base + "/" + _META_FILE)
    with fsys.open_input_stream(mpath) as f:
        meta = json.loads(f.read().decode())
    df = spark.read.parquet(base + "/data")
    if bbox is not None:
        from ..geometry.curves import bucket_sets_from_bounds

        cm = meta["column_meta"]
        if not cm.get("dgs_cobucket_complete"):
            # a non-replicated non-point layout stores each geometry
            # only in its MIDPOINT's bucket: a straddler's bbox can
            # overlap the window while its midpoint bucket lies
            # outside the window's bucket set — pruning would skip it
            raise ValueError(
                "bbox pruning needs a point layout or one written "
                "with replicate=True (home-bucket placement of "
                "straddling geometries is not window-prunable); "
                "read without bbox= and filter with .cx instead")
        xmin, ymin, xmax, ymax = (float(v) for v in bbox)
        # no dilation of the window is needed even for dilated
        # layouts: a row intersecting the window shares a fine cell
        # with it, and that cell's bucket is in the row's (dilated ⊇
        # plain) replica set AND in the window's set below
        buckets = bucket_sets_from_bounds(
            np.array([xmin]), np.array([ymin]),
            np.array([xmax]), np.array([ymax]),
            tuple(meta["total_bounds"]), meta["boundaries"],
            meta["by"], meta["level"],
            min(meta["level"], 8) if coarse is None else int(coarse))[0]
        df = df.filter(F.col("_spatial_bucket").isin(
            [int(b) for b in buckets]))
    df = df.withMetadata("_spatial_bucket", meta["column_meta"])
    from ..core import GeoDataFrame

    geom = meta["geometry"]
    crs_map = {geom: meta["crs"]} if meta.get("crs") else {}
    return GeoDataFrame(df, geom, crs_map=crs_map)
