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

import json
import os
import warnings

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from . import fs as FS

GEO_VERSION = "1.0.0"

# above this many files, footer gathering runs as a Spark job instead of
# a serial driver loop (overridable for tests)
_FOOTER_JOB_THRESHOLD = 64


# per-edge accepted struct-field spellings: the GeoParquet 1.1 spec
# name first (what GDAL >= 3.8 / DuckDB-spatial write and read), the
# engine's internal bbox convention second
_BBOX_FIELD_ALIASES = {"xmin": ("xmin", "minx"), "ymin": ("ymin", "miny"),
                       "xmax": ("xmax", "maxx"), "ymax": ("ymax", "maxy")}


def _covering_fields(field_names) -> dict | None:
    """{edge: actual-field-name} for a bbox struct's fields, or None
    when any edge is missing — makes the emitted covering metadata
    self-describing for either field-naming convention."""
    have = set(field_names)
    out = {}
    for edge, aliases in _BBOX_FIELD_ALIASES.items():
        name = next((a for a in aliases if a in have), None)
        if name is None:
            return None
        out[edge] = name
    return out


def _geo_meta(geometry: str, crs_map: dict, geometry_columns=None,
              bboxes: dict | None = None,
              geometry_types: dict | None = None,
              encodings: dict | None = None,
              covering_cols: dict | None = None) -> bytes:
    """`geo` schema-metadata blob covering EVERY geometry column (the
    reference supports multiple geometry columns each with its own CRS,
    io/arrow.py:41-43; tests/io/test_parquet.py:84-103)."""
    cols = {}
    for g in (geometry_columns or [geometry]):
        cols[g] = {
            "encoding": (encodings or {}).get(g, "WKB"),
            "geometry_types": (geometry_types or {}).get(g, []),
            **({"crs": crs_map[g]} if g in crs_map else {}),
            **({"bbox": list(bboxes[g])} if bboxes and g in bboxes else {}),
        }
        if (covering_cols or {}).get(g):
            # GeoParquet 1.1 covering metadata: points external readers
            # at the per-row bbox struct so THEIR scans can prune on its
            # parquet statistics too; field names are whatever the
            # struct actually carries (spec xmin/... from
            # write_covering=True, engine minx/... from with_bbox())
            b, fields = covering_cols[g]
            cols[g]["covering"] = {"bbox": {
                edge: [b, fields[edge]] for edge in
                ("xmin", "ymin", "xmax", "ymax")}}
    return json.dumps(
        {"version": GEO_VERSION, "primary_column": geometry, "columns": cols}
    ).encode()


def to_parquet(gdf, path: str, partition_on: str | None = None,
               write_bbox: bool = True,
               geometry_columns: list[str] | None = None,
               spatial_sort: bool = False,
               spatial_sort_level: int = 16,
               geometry_encoding: str = "WKB",
               write_covering: bool = False,
               filesystem=None) -> None:
    """Write a GeoDataFrame as GeoParquet: one file per Spark partition,
    each footer carrying the ``geo`` metadata for every geometry column
    and (``write_bbox``) the file-level bbox of the primary column so a
    later ``read_parquet(gather_spatial_partitions=True)`` rebuilds the
    driver-side spatial summary (reference io/parquet.py:22-42).

    ``partition_on`` → hive-style subdirectories (reference
    tests/io/test_parquet.py:188-213 via ``partitionBy``).

    ``geometry_encoding="geoarrow"`` (GeoParquet 1.1 / geopandas 1.0
    ``to_parquet(geometry_encoding='geoarrow')``): the primary column is
    stored as a native ``struct<x,y>`` instead of WKB — parquet then
    keeps min/max statistics on the coordinates themselves, and the
    reader rebuilds a SYMBOLIC point layer (zero Python in downstream
    bbox/cx/clip/sjoin plans).  Point layers only (the encoding that
    pays at scale); other types raise.

    ``write_covering=True`` (GeoParquet 1.1 ``covering``, spec §bbox
    and reference io/arrow.py:26-43): materializes a SPEC-NAMED
    per-row bbox struct ``{geometry}_bbox`` with fields
    ``xmin/ymin/xmax/ymax`` (double) and points the ``covering`` key
    at it, so external readers (GDAL >= 3.8, DuckDB spatial) prune
    on its parquet row-group statistics natively; the engine's own
    `read_parquet` consumes the same key (either field-naming
    convention) and rebuilds its internal bbox column without a
    Python stage."""
    import pyarrow as pa

    if spatial_sort:
        # Hilbert-ordered layout (SURVEY §7 design invariant): each file
        # covers a compact spatial region, so the per-file bboxes written
        # below — and parquet row-group stats on a materialized bbox
        # column — prune tightly for any spatial predicate.  Runs BEFORE
        # the write_covering rename: spatial_shuffle reads the engine's
        # minx/... field convention, so renaming to the spec's xmin/...
        # first would raise (r14 ADVICE finding).
        gdf = gdf.spatial_shuffle(by="hilbert", level=spatial_sort_level)
    if write_covering:
        g2 = gdf.with_bbox()
        b = g2.bbox_column
        # rename to the spec's field spelling whatever convention the
        # existing struct carries (a fresh with_bbox emits minx/...,
        # a consumed 1.1 dataset already has xmin/...)
        fields = _covering_fields(
            [f.name for f in g2.df.schema[b].dataType.fields])
        if fields is None:
            raise ValueError(
                f"column {b!r} is not a bbox struct — cannot emit "
                "GeoParquet covering metadata from it")
        gdf = g2._wrap(g2.df.withColumn(b, F.when(
            F.col(b).isNotNull(),
            F.struct(*[F.col(f"{b}.{fields[e]}").cast("double")
                       .alias(e)
                       for e in ("xmin", "ymin", "xmax", "ymax")]))))
    geometry = gdf.geometry_column
    crs_map = dict(getattr(gdf, "_crs", {}))
    df = gdf.df
    FS.makedirs(path, filesystem)
    if geometry_columns is None:
        geometry_columns = [geometry] + [
            c for c in crs_map if c != geometry and c in df.columns
        ]

    def _write_geo_file(table: "pa.Table", dirpath: str) -> None:
        # runs inside executor tasks: an explicit `filesystem` rides in
        # via the closure (pyarrow filesystems pickle); otherwise the fs
        # is re-resolved from the URI string per call (pyarrow C++
        # filesystems are cheap to construct, no cross-process state)
        import uuid

        import numpy as np

        from ..geometry import algorithms as A
        from ..geometry import wkb as W

        bboxes = None
        gtypes = None
        encodings = None
        if geometry_encoding != "WKB" and geometry in table.column_names:
            batch = W.parse_wkb(table.column(geometry).to_pylist())
            bad = set(int(t) for t in batch.types) - {0, W.POINT}
            if bad:
                raise NotImplementedError(
                    "geometry_encoding='geoarrow' supports Point layers "
                    f"only; found type ids {sorted(bad)}")
            xs = np.full(batch.n, np.nan)
            ys = np.full(batch.n, np.nan)
            nn = batch.types != 0
            # one coordinate per non-null, non-empty point, in row order
            starts = batch.geom_coord_starts[:-1]
            has = nn & (np.diff(batch.geom_coord_starts) > 0)
            xs[has] = batch.xs[starts[has]]
            ys[has] = batch.ys[starts[has]]
            import pyarrow as _pa

            struct = _pa.StructArray.from_arrays(
                [_pa.array(xs, type=_pa.float64()),
                 _pa.array(ys, type=_pa.float64())],
                ["x", "y"],
                mask=_pa.array(~nn))
            idx = table.column_names.index(geometry)
            table = table.set_column(idx, geometry, struct)
            encodings = {geometry: "point"}
            gtypes = {geometry: ["Point"]}
            if write_bbox:
                with np.errstate(invalid="ignore"):
                    fb = (np.nanmin(xs), np.nanmin(ys),
                          np.nanmax(xs), np.nanmax(ys))
                if np.isfinite(fb).all():
                    bboxes = {geometry: [float(v) for v in fb]}
        elif write_bbox and geometry in table.column_names:
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
        covering = {}
        for g in (geometry_columns or [geometry]):
            bname = f"{g}_bbox"
            if bname in table.column_names:
                ftype = table.schema.field(bname).type
                fields = _covering_fields(
                    [ftype.field(k).name for k in range(ftype.num_fields)]
                    if pa.types.is_struct(ftype) else [])
                if fields:
                    covering[g] = (bname, fields)
        meta = _geo_meta(geometry, crs_map, geometry_columns, bboxes,
                         gtypes, encodings, covering)
        existing = table.schema.metadata or {}
        table = table.replace_schema_metadata({**existing, b"geo": meta})
        FS.makedirs(dirpath, filesystem)
        FS.write_parquet_table(
            table, FS.join(dirpath, f"part-{uuid.uuid4().hex}.parquet"),
            filesystem)

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
                        table, FS.join(path, f"{partition_on}={k}"))
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


def _read_meta(f: str, filesystem=None):
    """(geo_meta_dict | None) for one footer; None = unreadable.  Footer
    reads route through the fs layer so URIs (s3a://...) work."""
    try:
        md = FS.read_parquet_footer_schema(f, filesystem).metadata or {}
    except Exception:
        return None
    if b"geo" not in md:
        return {}
    return json.loads(md[b"geo"])


def gather_geo_metadata(path: str, spark: SparkSession | None = None,
                        gather_spatial_partitions: bool = True,
                        geometry: str | None = None, filesystem=None):
    """Scan the dataset's parquet footers for GeoParquet ``geo``
    metadata.  Returns (primary_column, crs_map, spatial_partitions,
    all_point, primary_encoding, covering); every field is None/empty
    when the dataset carries no geo metadata.  ``covering`` is the
    primary column's GeoParquet 1.1 ``covering.bbox`` mapping
    (edge -> [column, field]) from the first footer that declares
    one.  Listing and footer reads go through ``sources.fs``
    so remote URIs (s3a://, gs://, any fsspec scheme) keep their CRS
    and per-file bbox instead of silently degrading (reference readers
    accept fsspec storage_options, io/arrow.py:300-301)."""
    try:
        files = FS.list_files(path, suffixes=(".parquet",),
                              filesystem=filesystem)
    except Exception as e:
        warnings.warn(
            f"GeoParquet metadata unavailable for {path!r} ({e}); "
            "returning a frame with no CRS/spatial summary")
        return geometry, {}, None, False, "WKB", None

    primary, crs_map = geometry, {}

    # footer gathering is metadata-only but at cluster scale a dataset is
    # tens of thousands of files — distribute the reads instead of a
    # serial driver loop (each result is ~a hundred bytes, so the collect
    # stays tiny); small listings stay on the driver (no job overhead)
    if (spark is not None and gather_spatial_partitions
            and len(files) > _FOOTER_JOB_THRESHOLD):
        metas_df = spark.createDataFrame(
            [(f,) for f in files], "f string").repartition(32)

        def read_footers(batches):
            import pandas as _pd
            for b in batches:
                yield _pd.DataFrame({
                    "f": b["f"],
                    "geo": [json.dumps(m)
                            if (m := _read_meta(f, filesystem)) is not None
                            else None
                            for f in b["f"]],
                })

        got = {r["f"]: r["geo"]
               for r in metas_df.mapInPandas(
                   read_footers, "f string, geo string").collect()}
        metas = [json.loads(got[f]) if got.get(f) else None for f in files]
    else:
        metas = [_read_meta(f, filesystem) for f in files]

    if files and all(m is None for m in metas):
        warnings.warn(
            f"could not read any parquet footer under {path!r}; "
            "CRS/bbox metadata lost — check filesystem credentials/scheme")

    spatial_partitions = []
    all_point = True  # every file declares only "Point" geometry
    encoding = "WKB"
    covering = None
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
        enc = geo.get("columns", {}).get(primary, {}).get("encoding")
        if enc and enc != "WKB":
            encoding = enc
        if covering is None:
            covering = (geo.get("columns", {}).get(primary, {})
                        .get("covering", {}).get("bbox"))
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

    return (primary, crs_map, spatial_partitions or None,
            bool(files) and all_point, encoding, covering)


def _fragment_scan(spark: SparkSession, files: list, filesystem, columns):
    """Distributed pyarrow scan for filesystems Spark's Hadoop layer
    cannot reach: one task per parquet file, reading through the
    explicit pyarrow filesystem captured in the closure.  Column pruning
    pushes into the fragment read; fragments parallelize per file like
    the reference's one-partition-per-fragment plan (io/parquet.py)."""
    from .feather import _pa_schema_to_spark

    pa_schema = FS.read_parquet_footer_schema(files[0], filesystem)
    schema = _pa_schema_to_spark(pa_schema)
    frag_df = spark.createDataFrame([(f,) for f in files], "frag_path: string")
    frag_df = frag_df.repartition(min(len(files), 256))

    def read_frag(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            for p in pdf["frag_path"]:
                with FS.open_input(p, filesystem) as f:
                    tbl = pq.read_table(
                        f, columns=list(columns) if columns else None)
                yield tbl.to_pandas()

    from pyspark.sql.types import StructType
    out_schema = schema if not columns else StructType(
        [f for f in schema.fields if f.name in set(columns)])
    return frag_df.mapInPandas(read_frag, schema=out_schema)


def read_parquet(spark: SparkSession, path: str, columns=None,
                 gather_spatial_partitions: bool = True,
                 geometry: str | None = None, filesystem=None):
    """Read GeoParquet → GeoDataFrame.  Falls back to a plain DataFrame
    (with a warning) when no ``geo`` metadata and no ``geometry`` arg
    (reference raises in that case; returning plain is the graceful
    Spark behavior).  The data scan is Spark-native (column pruning,
    predicate pushdown, s3a/gs/hdfs support via Hadoop); footer metadata
    goes through ``sources.fs`` so remote URIs keep CRS/bbox too.

    ``filesystem``: an explicit ``pyarrow.fs.FileSystem`` (the Spark-era
    ``storage_options``, reference io/arrow.py:300-301) — both metadata
    and data then read through it via a distributed pyarrow fragment
    scan, covering stores Spark's Hadoop layer cannot reach."""
    from ..core import GeoDataFrame

    if filesystem is None:
        df = spark.read.parquet(path)
        if columns:
            df = df.select(*columns)
    else:
        files = FS.list_files(path, suffixes=(".parquet",),
                              filesystem=filesystem)
        if not files:
            raise FileNotFoundError(path)
        df = _fragment_scan(spark, files, filesystem, columns)

    primary, crs_map, spatial_partitions, all_point, encoding, covering = \
        gather_geo_metadata(
            path, spark, gather_spatial_partitions, geometry, filesystem)

    if primary is None or primary not in df.columns:
        return df
    if covering:
        # GeoParquet 1.1 covering: rebuild the engine's internal bbox
        # struct from the covering-referenced fields (a pure
        # projection over stored columns — Catalyst collapses the
        # GetStructField chain, so bbox predicates still push to the
        # stored struct's parquet row-group stats).  Works for either
        # field-naming convention and for external writers' arbitrary
        # bbox column names.
        try:
            refs = {e: covering[e] for e in
                    ("xmin", "ymin", "xmax", "ymax")}
        except KeyError:
            refs = None
        def _field_ok(v) -> bool:
            # the footer's covering metadata is EXTERNAL input: validate
            # not just that the referenced column exists but that it is
            # a struct actually carrying the referenced field, so a
            # malformed/hostile footer degrades to a plain read (with a
            # warning) instead of an AnalysisException (r14 ADVICE)
            if not (isinstance(v, list) and len(v) == 2
                    and v[0] in df.columns):
                return False
            from pyspark.sql.types import StructType
            dt = df.schema[v[0]].dataType
            return isinstance(dt, StructType) and v[1] in dt.fieldNames()

        if refs and not all(_field_ok(v) for v in refs.values()):
            import warnings
            warnings.warn(
                f"GeoParquet covering metadata for {primary!r} "
                f"references missing columns/fields ({refs}); "
                "skipping the bbox rebuild", stacklevel=2)
            refs = None
        if refs:
            src = {e: F.col(f"{v[0]}.{v[1]}").cast("double")
                   for e, v in refs.items()}
            # no null-guard CASE around the struct: the optimizer
            # collapses GetStructField(CreateNamedStruct) to the
            # stored field reference, so bbox comparisons push to
            # parquet stats — a CASE wrapper would block that, and
            # NULL edges already drop rows through 3-valued logic
            bbox = F.struct(src["xmin"].alias("minx"),
                            src["ymin"].alias("miny"),
                            src["xmax"].alias("maxx"),
                            src["ymax"].alias("maxy"))
            df = df.withColumn(f"{primary}_bbox", bbox)
    if encoding == "point":
        # geoarrow point encoding: the stored column is struct<x,y>.
        # Rebuild a SYMBOLIC point layer over the native coordinates —
        # bbox/cx/clip/sjoin plans stay pure JVM and parquet min/max
        # stats on x/y prune directly.
        from ..core import points_from_xy

        base = (df.withColumn("_ga_x", F.col(f"{primary}.x"))
                .withColumn("_ga_y", F.col(f"{primary}.y"))
                .drop(primary))
        out = points_from_xy(base, "_ga_x", "_ga_y",
                             crs=crs_map.get(primary), geometry=primary)
        out._crs = {**crs_map, **out._crs}
        out.spatial_partitions = spatial_partitions
        out._point = True
        return out
    out = GeoDataFrame(df, primary, crs_map=crs_map)
    out.spatial_partitions = spatial_partitions
    if all_point:
        # GeoParquet geometry_types says every row is a Point: points
        # equal their own envelopes, so bbox predicates are exact —
        # cx/sjoin refinement stays native on the stored dataset, and
        # clip degenerates to a native row filter on the bbox coords
        out._point = True
    return out
