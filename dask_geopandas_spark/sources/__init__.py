"""I/O connectors (reference io/: parquet.py, arrow.py, file.py).

GeoParquet is the primary format (native Spark parquet scan + `geo`
metadata + per-file bbox summaries); Feather rides pyarrow inside
mapInPandas; `read_file` builds a (path, offset, count) part list on
the driver and reads fragments on executors.
"""

from .bucketed import read_spatial_bucketed, write_spatial_bucketed
from .feather import read_feather, to_feather
from .file import read_file
from .flatgeobuf import read_flatgeobuf, to_flatgeobuf
from .geopackage import read_geopackage, to_geopackage
from .geoparquet import read_parquet, to_parquet
from .shapefile import read_shapefile, to_shapefile
from .warc import (http_response_body, http_status, payload_text,
                   read_cdx, read_warc, read_warc_records,
                   streaming_read_warc, surt_key, to_warc, write_cdx)

__all__ = [
    "read_parquet",
    "to_parquet",
    "read_feather",
    "to_feather",
    "read_file",
    "read_shapefile",
    "to_shapefile",
    "read_geopackage",
    "to_geopackage",
    "read_flatgeobuf",
    "to_flatgeobuf",
    "write_spatial_bucketed",
    "read_spatial_bucketed",
    "read_warc",
    "read_warc_records",
    "streaming_read_warc",
    "to_warc",
    "http_response_body",
    "http_status",
    "payload_text",
    "surt_key",
    "write_cdx",
    "read_cdx",
]
