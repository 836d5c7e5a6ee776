"""dask_geopandas_spark: a PySpark-native geospatial analytics engine.

Re-expresses the capabilities of geopandas/dask-geopandas (reference at
/root/reference) Spark-first: WKB BinaryType geometry columns + bbox
struct siblings, vectorized pandas-UDF geometry kernels (pure numpy — no
GEOS in this environment), and native Catalyst plans for the distributed
machinery (bbox pruning, range shuffles, grid-bucketed spatial joins,
partial aggregation).
"""

from .core import (
    GeoDataFrame,
    boxes_from_bounds,
    concat,
    from_dask_dataframe,
    from_geopandas,
    from_wkb,
    from_wkt,
    points_from_xy,
)
from .functions import core as functions
from .functions.core import register_sql_functions
from .operators.sjoin import sjoin
from .operators.clip import clip

__version__ = "0.1.0"

__all__ = [
    "GeoDataFrame",
    "points_from_xy",
    "boxes_from_bounds",
    "from_wkt",
    "from_wkb",
    "from_dask_dataframe",
    "from_geopandas",
    "concat",
    "functions",
    "register_sql_functions",
    "sjoin",
    "clip",
    "read_parquet",
    "read_feather",
    "read_file",
    "write_file",
    "list_layers",
    "read_geojson",
    "to_geojson",
    "to_feather",
    "read_shapefile",
    "to_shapefile",
    "read_geopackage",
    "to_geopackage",
    "read_flatgeobuf",
    "to_flatgeobuf",
    "read_gpx",
    "to_gpx",
    "read_kml",
    "to_kml",
    "read_gml",
    "to_gml",
    "overlay",
    "to_parquet",
    "GeoSeries",
    "__version__",
]


def read_parquet(spark, path, **kw):
    from .sources.geoparquet import read_parquet as _rp

    return _rp(spark, path, **kw)


def read_feather(spark, path, **kw):
    from .sources.feather import read_feather as _rf

    return _rf(spark, path, **kw)


def read_file(spark, path, **kw):
    from .sources.file import read_file as _rf

    return _rf(spark, path, **kw)


def write_file(gdf, path, **kw):
    from .sources.file import write_file as _wf

    return _wf(gdf, path, **kw)


def list_layers(path, **kw):
    from .sources.file import list_layers as _ll

    return _ll(path, **kw)


def read_geojson(spark, path, **kw):
    from .sources.geojson import read_geojson as _rg

    return _rg(spark, path, **kw)


def to_geojson(gdf_or_df, path, **kw):
    from .sources.geojson import to_geojson as _tg

    return _tg(gdf_or_df, path, **kw)


def to_feather(gdf_or_df, path, **kw):
    from .sources.feather import to_feather as _tf

    return _tf(gdf_or_df, path, **kw)


def read_shapefile(spark, path, **kw):
    from .sources.shapefile import read_shapefile as _rs

    return _rs(spark, path, **kw)


def to_shapefile(gdf_or_df, path, **kw):
    from .sources.shapefile import to_shapefile as _ts

    return _ts(gdf_or_df, path, **kw)


def read_geopackage(spark, path, **kw):
    from .sources.geopackage import read_geopackage as _rg

    return _rg(spark, path, **kw)


def to_geopackage(gdf_or_df, path, **kw):
    from .sources.geopackage import to_geopackage as _tg

    return _tg(gdf_or_df, path, **kw)


def read_flatgeobuf(spark, path, **kw):
    from .sources.flatgeobuf import read_flatgeobuf as _rf

    return _rf(spark, path, **kw)


def to_flatgeobuf(gdf_or_df, path, **kw):
    from .sources.flatgeobuf import to_flatgeobuf as _tf

    return _tf(gdf_or_df, path, **kw)


def read_gpx(spark, path, **kw):
    from .sources.xmlvector import read_gpx as _rg

    return _rg(spark, path, **kw)


def to_gpx(gdf_or_df, path, **kw):
    from .sources.xmlvector import to_gpx as _tg

    return _tg(gdf_or_df, path, **kw)


def read_kml(spark, path, **kw):
    from .sources.xmlvector import read_kml as _rk

    return _rk(spark, path, **kw)


def to_kml(gdf_or_df, path, **kw):
    from .sources.xmlvector import to_kml as _tk

    return _tk(gdf_or_df, path, **kw)


def read_gml(spark, path, **kw):
    from .sources.gml import read_gml as _rg

    return _rg(spark, path, **kw)


def to_gml(gdf_or_df, path, **kw):
    from .sources.gml import to_gml as _tg

    return _tg(gdf_or_df, path, **kw)


def overlay(left, right, how="intersection", **kw):
    from .operators.overlay import overlay as _ov

    return _ov(left, right, how=how, **kw)


def to_parquet(gdf, path, **kw):
    from .sources.geoparquet import to_parquet as _tp

    return _tp(gdf, path, **kw)


# The reference's GeoSeries maps to a pyspark Column in this engine's
# data model (SURVEY §1.1): geometry accessors return Columns and
# compose into select/filter.  Exported under the familiar name so
# migrated imports and annotations keep working.
from pyspark.sql import Column as GeoSeries  # noqa: E402
