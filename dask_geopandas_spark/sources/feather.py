"""Feather/Arrow-IPC source & sink (reference io/arrow.py:246-430).

Spark has no native Feather reader, so the scan follows the reference's
fragment model Spark-first: the driver lists fragment files (cheap
metadata op), builds a DataFrame of fragment paths, and `mapInPandas`
reads each fragment with pyarrow inside the executors — one task per
fragment, so reads parallelize across the cluster exactly like the
reference's one-partition-per-fragment plan.  Column pruning is pushed
into the fragment read (``columns=``).
"""

from __future__ import annotations

import glob
import os

import pandas as pd
from pyspark.sql import SparkSession

from pyspark.sql.types import StructType

from . import fs as FS


def _pa_schema_to_spark(schema) -> StructType:
    import pyarrow as pa
    from pyspark.sql.types import (
        ArrayType, BinaryType, BooleanType, DateType, DecimalType,
        DoubleType, FloatType, IntegerType, LongType, StringType,
        StructField, TimestampType,
    )

    def conv(t):
        if pa.types.is_decimal(t):
            return DecimalType(t.precision, t.scale)
        if pa.types.is_date(t):
            return DateType()
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            return ArrayType(conv(t.value_type))
        if pa.types.is_int64(t):
            return LongType()
        if pa.types.is_int32(t) or pa.types.is_int16(t) or pa.types.is_int8(t):
            return IntegerType()
        if pa.types.is_float64(t):
            return DoubleType()
        if pa.types.is_float32(t):
            return FloatType()
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return StringType()
        if pa.types.is_binary(t) or pa.types.is_large_binary(t):
            return BinaryType()
        if pa.types.is_boolean(t):
            return BooleanType()
        if pa.types.is_timestamp(t):
            return TimestampType()
        raise NotImplementedError(f"feather type {t}")

    return StructType([StructField(f.name, conv(f.type)) for f in schema])


def read_feather(spark: SparkSession, path: str, columns=None,
                 geometry: str | None = None, crs: str | None = None,
                 filesystem=None):
    """Read feather file(s) → (Geo)DataFrame.  ``path`` may be a file,
    directory, or glob (globs on local paths only).  ``filesystem``: an
    explicit ``pyarrow.fs.FileSystem`` (the Spark-era storage_options,
    reference io/arrow.py:300-301) captured into the fragment tasks."""
    from ..core import GeoDataFrame

    if filesystem is not None or FS.has_scheme(path):
        # URI / explicit fs: route listing through the fs layer (globs
        # unsupported here — pass a file or a directory)
        files = FS.list_files(path, suffixes=(".feather", ".arrow"),
                              filesystem=filesystem) \
            if FS.is_dir(path, filesystem) else [path]
    elif os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.feather"))) or \
            sorted(glob.glob(os.path.join(path, "*.arrow")))
    else:
        files = sorted(glob.glob(path)) if any(c in path for c in "*?[") else [path]
    if not files:
        raise FileNotFoundError(path)

    pa_schema = FS.read_feather_schema(files[0], filesystem)
    # restore geometry column + CRS from `geo` schema metadata (reference
    # io/arrow.py:22-45 round-trips geo metadata through the Arrow schema)
    meta = pa_schema.metadata or {}
    if geometry is None and b"geo" in meta:
        import json

        geo = json.loads(meta[b"geo"])
        geometry = geo.get("primary_column")
        if crs is None:
            crs = (geo.get("columns", {}).get(geometry, {}) or {}).get("crs")
    schema = _pa_schema_to_spark(pa_schema)
    frag_df = spark.createDataFrame([(f,) for f in files], "frag_path: string")
    frag_df = frag_df.repartition(len(files))

    def read_frag(batches):
        import pyarrow.feather as feather

        from dask_geopandas_spark.sources import fs as _FS

        for pdf in batches:
            for p in pdf["frag_path"]:
                # an explicit filesystem rides in via the closure;
                # otherwise the fs is re-resolved from the URI inside
                # the task, so s3a://... fragments read on any executor
                with _FS.open_input(p, filesystem) as f:
                    tbl = feather.read_table(
                        f, columns=list(columns) if columns else None)
                yield tbl.to_pandas()

    out_schema = schema if not columns else StructType(
        [f for f in schema.fields if f.name in set(columns)]
    )
    df = frag_df.mapInPandas(read_frag, schema=out_schema)
    if geometry and geometry in df.columns:
        return GeoDataFrame(df, geometry, crs=crs)
    return df


def to_feather(gdf_or_df, path: str, filesystem=None) -> None:
    """Write one feather file per Spark partition (reference
    io/arrow.py:347-430 writes one per dask partition)."""
    import pyarrow as pa
    import pyarrow.feather as feather

    df = gdf_or_df.df if hasattr(gdf_or_df, "df") else gdf_or_df
    geo_meta = None
    if hasattr(gdf_or_df, "geometry_column"):
        import json

        gcol = gdf_or_df.geometry_column
        geo_meta = json.dumps({
            "primary_column": gcol,
            "columns": {gcol: {"encoding": "WKB",
                               "crs": getattr(gdf_or_df, "crs", None)}},
        }).encode()
    FS.makedirs(path, filesystem)

    def write_part(batches):
        import uuid

        from dask_geopandas_spark.sources import fs as _FS

        tables = [pa.Table.from_pandas(b, preserve_index=False) for b in batches]
        if tables:
            tbl = pa.concat_tables(tables)
            if geo_meta is not None:
                md = dict(tbl.schema.metadata or {})
                md[b"geo"] = geo_meta
                tbl = tbl.replace_schema_metadata(md)
            dest = _FS.join(path, f"part-{uuid.uuid4().hex}.feather")
            with _FS.open_output(dest, filesystem) as f:
                feather.write_feather(tbl, f)
        yield pd.DataFrame({"files": pd.Series([1], dtype="int64")})

    df.mapInPandas(write_part, schema="files long").collect()
