"""Filesystem routing for the metadata side of the sources: listing,
footer/schema reads, directory creation, and pyarrow file writes, so
GeoParquet/Feather geo metadata survives non-local filesystems
(``s3a://``, ``gs://``, ``hdfs://``, fsspec schemes) instead of silently
degrading to a plain DataFrame (reference readers route everything
through fsspec ``storage_options``, reference io/arrow.py:300-301,
tests/io/test_parquet.py:127-144).

Spark's own data scans are untouched — they already speak the Hadoop
FileSystem layer natively (s3a/gs/hdfs); this module covers only the
pyarrow-side work Spark cannot express (geo footers, one-file-per-
partition writes with custom schema metadata).

Resolution order per path:
1. explicit ``filesystem=`` argument (a ``pyarrow.fs.FileSystem``) —
   the Spark-era equivalent of the reference's ``storage_options``;
   pyarrow filesystems pickle, so they ride into executor closures;
2. a scheme registered via `register_filesystem` (tests, plugins);
3. no scheme → pyarrow ``LocalFileSystem`` (zero overhead);
4. Hadoop-flavored schemes translated to their pyarrow spellings
   (``s3a``/``s3n`` → ``s3``, ``gs`` → ``gcs``) and handed to
   ``pyarrow.fs.FileSystem.from_uri`` (C++ implementations: no GIL,
   re-resolvable from a path string inside any executor task);
5. anything pyarrow rejects falls back to ``fsspec`` when installed.

Executor caveat: process-local filesystems (fsspec ``memory://``,
pyarrow ``_MockFileSystem``) are invisible across Spark's python worker
processes; use an explicit ``filesystem=`` backed by shared storage for
distributed reads/writes.  Production object stores are unaffected.
"""

from __future__ import annotations

import os
import re

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")
# Hadoop scheme → pyarrow scheme
_HADOOP_TO_PA = {"s3a": "s3", "s3n": "s3", "gs": "gcs"}

# scheme → zero-arg factory returning a pyarrow.fs.FileSystem
_REGISTRY: dict = {}


def register_filesystem(scheme: str, factory) -> None:
    """Register a filesystem factory for a URI scheme (driver-side
    resolution only — executor tasks resolve from the path string, so
    prefer the explicit ``filesystem=`` argument for distributed IO)."""
    _REGISTRY[scheme] = factory


def has_scheme(path: str) -> bool:
    return bool(_SCHEME_RE.match(path))


def scheme_of(path: str) -> str | None:
    return path.split("://", 1)[0] if has_scheme(path) else None


def strip_scheme(path: str) -> str:
    return path.split("://", 1)[1] if has_scheme(path) else path


def join(path: str, *parts: str) -> str:
    """os.path.join that keeps URI schemes intact ('/'-joined)."""
    if has_scheme(path):
        return "/".join([path.rstrip("/")] + [p.strip("/") for p in parts])
    return os.path.join(path, *parts)


def resolve_fs(path: str, filesystem=None):
    """(pyarrow.fs.FileSystem, fs-internal path) for a path or URI."""
    from pyarrow import fs as pafs

    if filesystem is not None:
        return filesystem, strip_scheme(path)
    if not has_scheme(path):
        return pafs.LocalFileSystem(), path
    scheme, rest = path.split("://", 1)
    if scheme in _REGISTRY:
        return _REGISTRY[scheme](), rest
    pa_uri = _HADOOP_TO_PA.get(scheme, scheme) + "://" + rest
    try:
        return pafs.FileSystem.from_uri(pa_uri)
    except Exception:
        try:
            import fsspec
            from pyarrow.fs import FSSpecHandler, PyFileSystem
        except ImportError:
            raise ValueError(
                f"no filesystem for scheme {scheme!r} (pyarrow rejected it "
                "and fsspec is not installed); pass filesystem= explicitly")
        fs = fsspec.filesystem(scheme)
        return PyFileSystem(FSSpecHandler(fs)), type(fs)._strip_protocol(path)


def write_one_row_parquet(dir_path: str, cols: dict,
                          filename: str = "part-00000.parquet") -> None:
    """Replace ``dir_path`` with a single-file parquet dataset holding
    one row — the driver-side writer for the 1-row stats/meta datasets
    of the stored indexes (a Spark parquet write of a 1-row local
    relation costs a full job + commit of pure action floor).

    ``cols`` maps column name -> 1-element ``pyarrow.Array`` (insertion
    order = column order).  The directory is deleted and recreated,
    matching overwrite-mode semantics.

    Filesystem resolution follows this module's convention (see the
    module docstring): a SCHEME-LESS path resolves to the local
    filesystem — on a cluster whose ``fs.defaultFS`` is remote, pass
    explicit-scheme paths (``hdfs://…``, ``s3a://…``) so these sidecar
    datasets land on the same filesystem as the Spark-written data
    files, exactly as for every marker/sidecar in this package."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyarrow import fs as pafs

    fsys, dpath = resolve_fs(dir_path.rstrip("/"))
    try:
        if fsys.get_file_info(dpath).type != pafs.FileType.NotFound:
            fsys.delete_dir(dpath)
    except FileNotFoundError:
        pass
    fsys.create_dir(dpath, recursive=True)
    with fsys.open_output_stream(dpath + "/" + filename) as out:
        pq.write_table(pa.table(cols), out)


def _with_scheme(path: str, inner: str) -> str:
    """Re-attach ``path``'s scheme to an fs-internal listing result so
    the file reference stays resolvable from another process."""
    sch = scheme_of(path)
    return f"{sch}://{inner.lstrip('/')}" if sch and sch != "file" else inner


def is_dir(path: str, filesystem=None) -> bool:
    from pyarrow import fs as pafs

    fs, p = resolve_fs(path, filesystem)
    return fs.get_file_info(p).type == pafs.FileType.Directory


def makedirs(path: str, filesystem=None) -> None:
    fs, p = resolve_fs(path, filesystem)
    fs.create_dir(p, recursive=True)


def list_files(path: str, suffixes: tuple = (".parquet",),
               filesystem=None) -> list[str]:
    """Recursive file listing (full URIs) under a path; a plain-file path
    lists as itself.  Object stores serve this from one LIST call."""
    from pyarrow import fs as pafs

    fs, p = resolve_fs(path, filesystem)
    info = fs.get_file_info(p)
    if info.type == pafs.FileType.File:
        return [path]
    sel = pafs.FileSelector(p, recursive=True, allow_not_found=True)
    out = [i.path for i in fs.get_file_info(sel)
           if i.type == pafs.FileType.File
           and (not suffixes or i.path.endswith(suffixes))]
    return sorted(_with_scheme(path, f) for f in out)


def list_files_with_sizes(path: str, suffixes: tuple = (),
                          filesystem=None) -> list[tuple[str, int]]:
    """Like `list_files` but returns (uri, size) pairs from the SAME
    single LIST call — part-list builders over many-file datasets
    (a Common Crawl segment is ~80k files) must not follow a listing
    with one stat call per file."""
    from pyarrow import fs as pafs

    fs, p = resolve_fs(path, filesystem)
    info = fs.get_file_info(p)
    if info.type == pafs.FileType.File:
        return [(path, int(info.size))]
    sel = pafs.FileSelector(p, recursive=True, allow_not_found=True)
    out = [(i.path, int(i.size)) for i in fs.get_file_info(sel)
           if i.type == pafs.FileType.File
           and (not suffixes or i.path.endswith(suffixes))]
    return sorted((_with_scheme(path, f), s) for f, s in out)


def read_parquet_footer_schema(fpath: str, filesystem=None):
    """Arrow schema (with metadata) from one parquet footer — a ranged
    read of the footer bytes only, never the data pages."""
    import pyarrow.parquet as pq

    fs, p = resolve_fs(fpath, filesystem)
    with fs.open_input_file(p) as f:
        return pq.read_schema(f)


def read_feather_schema(fpath: str, filesystem=None):
    """Arrow schema (with metadata) from one feather/IPC file."""
    from pyarrow import ipc

    fs, p = resolve_fs(fpath, filesystem)
    with fs.open_input_file(p) as f:
        return ipc.open_file(f).schema


def open_input(fpath: str, filesystem=None):
    fs, p = resolve_fs(fpath, filesystem)
    return fs.open_input_file(p)


def open_output(fpath: str, filesystem=None):
    fs, p = resolve_fs(fpath, filesystem)
    return fs.open_output_stream(p)


def write_atomic(fpath: str, data: bytes, filesystem=None) -> None:
    """Write a small sidecar file via temp-name + rename so a crash
    mid-write never leaves a torn (half-written) file for later
    readers to choke on — a torn identity sidecar would turn every
    subsequent store read into a JSON parse error instead of the
    store's intended crash-recovery behavior (r14 ADVICE finding).
    `move` is atomic on local/HDFS-like filesystems; object stores
    degrade to copy+delete, still leaving only whole files visible.
    The temp name carries a uuid so CONCURRENT first-time
    initializers never interleave on a shared `.tmp` (writer B
    truncating the file writer A is mid-writing, then A renaming a
    torn file — r15 advice); each writer renames only bytes it wrote
    itself, and the last rename wins whole."""
    import uuid

    fs, p = resolve_fs(fpath, filesystem)
    tmp = f"{p}.{uuid.uuid4().hex}.tmp"
    with fs.open_output_stream(tmp) as out:
        out.write(data)
    fs.move(tmp, p)


def write_parquet_table(table, fpath: str, filesystem=None) -> None:
    import pyarrow.parquet as pq

    fs, p = resolve_fs(fpath, filesystem)
    pq.write_table(table, p, filesystem=fs)
