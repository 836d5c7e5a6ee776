"""GeoParquet read/write (reference io/parquet.py, io/arrow.py:22-45).

Write path: one parquet file per Spark partition written by pyarrow inside
``mapInPandas`` (the reference writes one file per dask partition the same
way), each carrying the GeoParquet ``geo`` schema-metadata blob: version,
primary column, per-column encoding WKB / CRS / bbox.  This keeps the
metadata contract a plain ``spark.write.parquet`` cannot express.

Read path: ``spark.read.parquet`` (native scan: column pruning, predicate
pushdown, row-group stats) + a driver-side peek at one footer to restore
CRS and the active geometry column, and optionally per-file bboxes for
spatial planning (reference ``gather_spatial_partitions``,
io/parquet.py:72-82).
"""

from __future__ import annotations

import glob
import json
import os

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

GEO_VERSION = "1.0.0"

# above this many files, footer gathering runs as a Spark job instead of
# a serial driver loop (overridable for tests)
_FOOTER_JOB_THRESHOLD = 64


def _geo_meta(geometry: str, crs_map: dict, geometry_columns=None,
              bboxes: dict | None = None,
              geometry_types: dict | None = None) -> bytes:
    """`geo` schema-metadata blob covering EVERY geometry column (the
    reference supports multiple geometry columns each with its own CRS,
    io/arrow.py:41-43; tests/io/test_parquet.py:84-103)."""
    cols = {}
    for g in (geometry_columns or [geometry]):
        cols[g] = {
            "encoding": "WKB",
            "geometry_types": (geometry_types or {}).get(g, []),
            **({"crs": crs_map[g]} if g in crs_map else {}),
            **({"bbox": list(bboxes[g])} if bboxes and g in bboxes else {}),
        }
    return json.dumps(
        {"version": GEO_VERSION, "primary_column": geometry, "columns": cols}
    ).encode()


def to_parquet(gdf, path: str, partition_on: str | None = None,
               write_bbox: bool = True,
               geometry_columns: list[str] | None = None,
               spatial_sort: bool = False,
               spatial_sort_level: int = 16) -> None:
    """Write a GeoDataFrame as GeoParquet: one file per Spark partition,
    each footer carrying the ``geo`` metadata for every geometry column
    and (``write_bbox``) the file-level bbox of the primary column so a
    later ``read_parquet(gather_spatial_partitions=True)`` rebuilds the
    driver-side spatial summary (reference io/parquet.py:22-42).

    ``partition_on`` → hive-style subdirectories (reference
    tests/io/test_parquet.py:188-213 via ``partitionBy``)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if spatial_sort:
        # Hilbert-ordered layout (SURVEY §7 design invariant): each file
        # covers a compact spatial region, so the per-file bboxes written
        # below — and parquet row-group stats on a materialized bbox
        # column — prune tightly for any spatial predicate
        gdf = gdf.spatial_shuffle(by="hilbert", level=spatial_sort_level)
    geometry = gdf.geometry_column
    crs_map = dict(getattr(gdf, "_crs", {}))
    df = gdf.df
    os.makedirs(path, exist_ok=True)
    if geometry_columns is None:
        geometry_columns = [geometry] + [
            c for c in crs_map if c != geometry and c in df.columns
        ]

    def _write_geo_file(table: "pa.Table", dirpath: str) -> None:
        import uuid

        import numpy as np

        from ..geometry import algorithms as A
        from ..geometry import wkb as W

        bboxes = None
        gtypes = None
        if write_bbox and geometry in table.column_names:
            batch = W.parse_wkb(table.column(geometry).to_pylist())
            bb = A.bounds(batch)
            with np.errstate(invalid="ignore"):
                fb = (np.nanmin(bb[:, 0]), np.nanmin(bb[:, 1]),
                      np.nanmax(bb[:, 2]), np.nanmax(bb[:, 3]))
            if np.isfinite(fb).all():
                bboxes = {geometry: [float(v) for v in fb]}
            # GeoParquet spec field: distinct geometry types in the file
            # (NULL rows excluded).  A reader seeing only "Point" knows
            # the bbox test is exact and skips UDF refinement entirely.
            seen = sorted({W.TYPE_NAMES[int(t)] for t in batch.types
                           if int(t) in W.TYPE_NAMES and int(t) != 0})
            gtypes = {geometry: seen}
        meta = _geo_meta(geometry, crs_map, geometry_columns, bboxes, gtypes)
        existing = table.schema.metadata or {}
        table = table.replace_schema_metadata({**existing, b"geo": meta})
        os.makedirs(dirpath, exist_ok=True)
        pq.write_table(
            table, os.path.join(dirpath, f"part-{uuid.uuid4().hex}.parquet"))

    if partition_on is not None:
        # single pass: repartition on the key so each executor partition
        # holds whole key-groups, then write one file per key inside the
        # partition — NOT a driver loop of one filtered job per distinct
        # key, which rescans the input K times
        def write_hive(batches):
            pdfs = list(batches)
            if pdfs:
                pdf = pd.concat(pdfs, ignore_index=True)
                for k, sub in pdf.groupby(partition_on, dropna=True,
                                          observed=True):
                    table = pa.Table.from_pandas(
                        sub.drop(columns=[partition_on]), preserve_index=False)
                    _write_geo_file(
                        table, os.path.join(path, f"{partition_on}={k}"))
            yield pd.DataFrame({"files": pd.Series([1], dtype="int64")})

        (df.repartition(F.col(partition_on))
         .mapInPandas(write_hive, schema="files long").collect())
        return

    def write_part(batches):
        tables = [pa.Table.from_pandas(b, preserve_index=False) for b in batches]
        if tables:
            _write_geo_file(pa.concat_tables(tables), path)
        yield pd.DataFrame({"files": pd.Series([1], dtype="int64")})

    df.mapInPandas(write_part, schema="files long").collect()


def read_parquet(spark: SparkSession, path: str, columns=None,
                 gather_spatial_partitions: bool = True, geometry: str | None = None):
    """Read GeoParquet → GeoDataFrame.  Falls back to a plain DataFrame
    when no ``geo`` metadata and no ``geometry`` arg (reference raises in
    that case; returning plain is the graceful Spark behavior)."""
    import pyarrow.parquet as pq

    from ..core import GeoDataFrame

    df = spark.read.parquet(path)
    if columns:
        df = df.select(*columns)

    primary, crs_map = geometry, {}
    files = sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)) \
        if os.path.isdir(path) else [path]

    def _read_meta(f):
        """(geo_meta_dict | None) for one footer; None = unreadable."""
        try:
            md = pq.read_schema(f).metadata or {}
        except Exception:
            return None
        if b"geo" not in md:
            return {}
        return json.loads(md[b"geo"])

    # footer gathering is metadata-only but at cluster scale a dataset is
    # tens of thousands of files — distribute the reads instead of a
    # serial driver loop (each result is ~a hundred bytes, so the collect
    # stays tiny); small listings stay on the driver (no job overhead)
    if len(files) > _FOOTER_JOB_THRESHOLD and gather_spatial_partitions:
        metas_df = spark.createDataFrame(
            [(f,) for f in files], "f string").repartition(32)

        def read_footers(batches):
            import pandas as _pd
            for b in batches:
                yield _pd.DataFrame({
                    "f": b["f"],
                    "geo": [json.dumps(m) if (m := _read_meta(f)) is not None
                            else None
                            for f in b["f"]],
                })

        got = {r["f"]: r["geo"]
               for r in metas_df.mapInPandas(
                   read_footers, "f string, geo string").collect()}
        metas = [json.loads(got[f]) if got.get(f) else None for f in files]
    else:
        metas = [_read_meta(f) for f in files]

    spatial_partitions = []
    all_point = True  # every file declares only "Point" geometry
    for i, geo in enumerate(metas):
        if geo is None:
            all_point = False
            continue
        if not geo:
            all_point = False
            if gather_spatial_partitions:
                spatial_partitions = None
            continue
        primary = primary or geo.get("primary_column")
        gt = geo.get("columns", {}).get(primary, {}).get("geometry_types")
        if gt != ["Point"]:
            all_point = False
        for col, info in geo.get("columns", {}).items():
            if "crs" in info and col not in crs_map:
                crs_map[col] = info["crs"]
        if gather_spatial_partitions and spatial_partitions is not None:
            bb = geo.get("columns", {}).get(primary, {}).get("bbox")
            if bb is not None:
                spatial_partitions.append(tuple(bb))
            else:
                # one file without a primary-column bbox drops the whole
                # summary (reference io/arrow.py:321-322)
                spatial_partitions = None
        if i == 0 and not gather_spatial_partitions:
            break

    if primary is None or primary not in df.columns:
        return df
    out = GeoDataFrame(df, primary, crs_map=crs_map)
    out.spatial_partitions = spatial_partitions or None
    if files and all_point:
        # GeoParquet geometry_types says every row is a Point: points
        # equal their own envelopes, so bbox predicates are exact —
        # cx/sjoin refinement stays native on the stored dataset, and
        # clip degenerates to a native row filter on the bbox coords
        out._point = True
    return out
