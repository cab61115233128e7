"""Snapshot storage abstraction over ``pyarrow.fs`` (VERDICT r1 item #1).

Round 1's index exchange (hive-partitioned run write → per-key merge read) and
snapshot layout assumed a shared POSIX filesystem: ``glob.glob`` listings,
``os.replace`` atomic renames, sidecar files written with ``open()``.  That
only works multi-node when ``index_dir`` is NFS-like.  This module routes every
snapshot I/O through a ``pyarrow.fs.FileSystem`` so an index can live on any
pyarrow-supported store (local disk, S3/GCS via ``s3://``/``gs://`` URIs, or
any fsspec filesystem registered via ``register_scheme``) — the cluster-real
requirement of the north rule (multi-node build over shared object storage).

Commit protocol (replaces blanket tmp-dir + rename):
  - LOCAL filesystems keep the round-1 semantics byte-for-byte: write to
    ``<dir>.tmp`` then atomically rename into place.
  - OBJECT STORES have no atomic directory rename, so staged dirs write
    DIRECTLY to the final path and the **manifest row is the commit point**
    (standard object-store job-commit pattern): a crash mid-write leaves no
    manifest row, and resume deletes + rebuilds the partition.  File-level
    writes use deterministic names, so a retried task overwrites its own
    output instead of duplicating it.

All filesystem handles are picklable (pyarrow guarantees this), so stages that
write sidecars from inside Ray tasks carry ``(fs, path)`` through the closure.
"""

from __future__ import annotations

import json
import os
import posixpath
import uuid
from typing import Callable, Dict, List, Tuple

from pyarrow import fs as pafs

# scheme -> resolver(uri) -> (FileSystem, path-within-fs).  Lets tests (and
# deployments with exotic stores) plug any fsspec filesystem in without
# touching pipeline code.
_SCHEMES: Dict[str, Callable[[str], Tuple[pafs.FileSystem, str]]] = {}


def register_scheme(
    scheme: str, resolver: Callable[[str], Tuple[pafs.FileSystem, str]]
) -> None:
    _SCHEMES[scheme] = resolver


def resolve(path: str) -> Tuple[pafs.FileSystem, str]:
    """Path or URI → (filesystem, in-filesystem path)."""
    if "://" in path:
        scheme = path.split("://", 1)[0]
        if scheme in _SCHEMES:
            return _SCHEMES[scheme](path)
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), os.path.abspath(path)


def is_local(fs: pafs.FileSystem) -> bool:
    return isinstance(fs, pafs.LocalFileSystem)


def join(*parts: str) -> str:
    """Join snapshot-internal path segments (posix separators on every fs)."""
    return posixpath.join(*parts)


def exists(fs: pafs.FileSystem, path: str) -> bool:
    return fs.get_file_info(path).type != pafs.FileType.NotFound


def makedirs(fs: pafs.FileSystem, path: str) -> None:
    fs.create_dir(path, recursive=True)


def rm_tree(fs: pafs.FileSystem, path: str) -> None:
    info = fs.get_file_info(path)
    if info.type == pafs.FileType.Directory:
        fs.delete_dir(path)
    elif info.type != pafs.FileType.NotFound:
        fs.delete_file(path)


def ls_files(
    fs: pafs.FileSystem, path: str, suffix: str = "", recursive: bool = True
) -> List[str]:
    """Sorted file paths under ``path`` (empty when the dir is absent)."""
    if not exists(fs, path):
        return []
    sel = pafs.FileSelector(path, recursive=recursive, allow_not_found=True)
    return sorted(
        f.path
        for f in fs.get_file_info(sel)
        if f.type == pafs.FileType.File and f.path.endswith(suffix)
    )


def ls_dirs(fs: pafs.FileSystem, path: str) -> List[str]:
    if not exists(fs, path):
        return []
    sel = pafs.FileSelector(path, recursive=False, allow_not_found=True)
    return sorted(
        f.path for f in fs.get_file_info(sel) if f.type == pafs.FileType.Directory
    )


def read_json(fs: pafs.FileSystem, path: str) -> dict:
    with fs.open_input_stream(path) as f:
        return json.loads(f.read().decode("utf-8"))


def write_json(fs: pafs.FileSystem, path: str, obj: dict) -> None:
    data = json.dumps(obj, indent=2, sort_keys=True).encode("utf-8")
    with fs.open_output_stream(path) as f:
        f.write(data)


def write_table_idempotent(fs: pafs.FileSystem, table, dir_path: str,
                           name: str, **pq_kwargs) -> None:
    """Write one parquet file with a deterministic name.  Local: tmp+rename
    (atomic).  Object store: direct put (single-object writes are atomic at
    the object level; deterministic names make retries idempotent)."""
    import pyarrow.parquet as pq

    final = join(dir_path, name)
    if is_local(fs):
        os.makedirs(dir_path, exist_ok=True)
        # per-writer unique tmp: two concurrent tasks may legitimately race
        # to write the same idempotent name (e.g. a merge key's term_stats
        # slice when its range buckets land in different batches) — a shared
        # tmp path would interleave their bytes; whichever rename lands last
        # wins with a complete file either way
        tmp = join(dir_path, f".{name}.{os.getpid()}.{uuid.uuid4().hex[:8]}")
        pq.write_table(table, tmp, filesystem=fs, **pq_kwargs)
        os.replace(tmp, final)
    else:
        pq.write_table(table, final, filesystem=fs, **pq_kwargs)


class StagedDir:
    """Stage-then-commit directory write (see module docstring).

    Usage::

        st = StagedDir(fs, final_dir)
        ds.write_parquet(st.path, filesystem=fs, ...)
        st.commit()          # local: rename .tmp → final; remote: no-op
    """

    def __init__(self, fs: pafs.FileSystem, final_dir: str):
        self.fs = fs
        self.final = final_dir
        if is_local(fs):
            self.path = final_dir.rstrip("/") + ".tmp"
            rm_tree(fs, self.path)
            rm_tree(fs, final_dir)
        else:
            rm_tree(fs, final_dir)
            self.path = final_dir

    def commit(self) -> None:
        # a zero-row Dataset write creates no dir at all — materialize it so
        # downstream listings see an empty-but-valid stage output
        if not exists(self.fs, self.path):
            makedirs(self.fs, self.path)
        if is_local(self.fs):
            os.replace(self.path, self.final)
