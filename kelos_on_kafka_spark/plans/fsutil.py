"""Filesystem probes over ``pyarrow.fs`` — the public replacement for
the private ``spark._jvm`` / ``spark._jsc`` Hadoop-FS reach-through the
maintenance operators used before (fragile across Spark versions and
unavailable under Spark Connect).

``pyarrow.fs.FileSystem.from_uri`` resolves ``file://``, ``hdfs://``
(libhdfs), ``s3://`` and ``gcs://`` URIs; bare paths are treated as
driver-local.  Paths must therefore be absolute URIs or driver-visible
local paths — the same contract the parquet maintenance path already
assumes (a cataloged Iceberg deployment replaces all of this with
MERGE / expire-snapshots anyway, see ``maintenance.py``).

Error semantics (load-bearing for ``upsert_partitioned``): a missing
path is reported as ``False`` / an empty listing, while I/O and
permission errors RAISE — existence checks must never swallow a
transient read failure into "table does not exist".
"""

from __future__ import annotations

from pyarrow import fs as pafs


def resolve(path: str) -> tuple[pafs.FileSystem, str]:
    """(filesystem, fs-local path) for a URI or driver-local path."""
    if "://" not in path:
        return pafs.LocalFileSystem(), path
    return pafs.FileSystem.from_uri(path)


def path_exists(path: str) -> bool:
    """True iff the path exists; raises on I/O / permission errors
    (NotFound is the only condition mapped to False)."""
    fs, p = resolve(path)
    return fs.get_file_info(p).type != pafs.FileType.NotFound


def list_subdirs(path: str) -> list[tuple[str, str]]:
    """Immediate subdirectories of ``path`` as (base_name, full_path);
    empty when ``path`` itself does not exist."""
    fs, p = resolve(path)
    selector = pafs.FileSelector(p, recursive=False, allow_not_found=True)
    return [
        (info.base_name, info.path)
        for info in fs.get_file_info(selector)
        if info.type == pafs.FileType.Directory
    ]


def delete_dir(path: str) -> None:
    """Recursively delete a directory."""
    fs, p = resolve(path)
    fs.delete_dir(p)
