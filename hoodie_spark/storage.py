"""Storage abstraction for table-directory mutations.

Reference parity: FSUtils.java / HoodieWrapperFileSystem — every file
mutation in the reference goes through a FileSystem facade so the same
write client runs on HDFS, S3, GCS, local disk. Here the hot-path
mutations (:meth:`WriteClient._write_files` finalize, cleaner deletes,
rollback deletes) go through this seam; a cluster deployment implements
the same interface over an object store and nothing above it changes.

Correctness note for non-atomic-rename stores (S3): visibility in this
design is MANIFEST-based — readers list files from the commit JSON, never
from directory listings — so ``rename`` degrading to copy+delete is safe:
a half-finalized file is simply never referenced until the commit
publishes.
"""

from __future__ import annotations

import os
import shutil


class Storage:
    """Minimal filesystem interface; paths are plain strings."""

    def listdir(self, path: str) -> list[str]:
        raise NotImplementedError

    def makedirs(self, path: str) -> None:
        raise NotImplementedError

    def rename(self, src: str, dst: str) -> None:
        raise NotImplementedError

    def remove(self, path: str) -> None:
        raise NotImplementedError

    def rmtree(self, path: str) -> None:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def size(self, path: str) -> int:
        raise NotImplementedError


class LocalStorage(Storage):
    """POSIX backend (the test/runtime default): atomic rename, recursive
    delete via shutil."""

    def listdir(self, path: str) -> list[str]:
        return sorted(os.listdir(path))

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def rename(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def remove(self, path: str) -> None:
        os.remove(path)

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def size(self, path: str) -> int:
        return os.path.getsize(path)


LOCAL = LocalStorage()


def relpath_from_uri(uri: str, base: str) -> str:
    """Partition-qualified relative path from an ``input_file_name()`` URI.

    The single normalizer for every keyspace derived from
    ``F.input_file_name`` (write-time expression stats, ANALYZE sidecars):
    both sides must produce identical keys or the fsview stats overlay
    silently stops matching. Never key by basename — bucket-index tables
    write identically named base files in several partitions per commit."""
    from urllib.parse import unquote, urlparse

    p = unquote(urlparse(uri).path) if "://" in uri else uri
    return os.path.relpath(os.path.abspath(p), os.path.abspath(base))
