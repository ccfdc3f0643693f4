"""FileIO — pluggable metadata/commit I/O for the lake table format.

The table format splits I/O into two planes:

- **Bulk data plane** (parquet read/write): always goes through Spark's and
  Arrow's own filesystem abstractions, which already speak object stores
  (s3a://, abfss://, …).  The table only manipulates *paths*.
- **Metadata/commit plane** (snapshots, manifest shards, refs, GC): a
  handful of small files whose write protocol carries the table's
  atomicity guarantees.  THIS is what FileIO abstracts, because the
  POSIX idioms (hard-link exclusive create, rename) don't exist on object
  stores and must map to different primitives.

``LocalFileIO`` implements the protocol on a shared POSIX filesystem.  An
object-store implementation maps:

- ``put_exclusive``  → conditional put (S3 ``If-None-Match: *``, GCS
  ``x-goog-if-generation-match: 0``) — the commit-atomicity primitive;
- ``put_atomic``     → plain PUT (single-key puts are atomic on S3);
- ``read``/``list``/``delete``/``size`` → GET / LIST / DELETE / HEAD.

Everything the driver does per commit through this interface is
O(changed shards + 1): one exclusive snapshot put, one shard put per
changed partition, and (on the read path) one GET per *changed* shard —
untouched shards are reused by reference and memoized.
"""

from __future__ import annotations

import os
import posixpath
import threading
import time
import uuid


class CommitConflict(Exception):
    """Another writer committed the same snapshot/ref version first."""


class FileIO:
    """Metadata-plane I/O protocol (see module docstring)."""

    def makedirs(self, path: str) -> None:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def isdir(self, path: str) -> bool:
        raise NotImplementedError

    def list(self, path: str) -> list[str]:
        """Names (not paths) of entries directly under ``path``; [] if absent."""
        raise NotImplementedError

    def walk_files(self, path: str):
        """Yield (absolute_path, relative_path) for every file under ``path``."""
        raise NotImplementedError

    def read(self, path: str) -> bytes:
        raise NotImplementedError

    def put_atomic(self, path: str, data: bytes) -> None:
        """Write ``data`` so readers see either nothing or all of it."""
        raise NotImplementedError

    def put_exclusive(self, path: str, data: bytes) -> None:
        """Atomically create ``path`` with ``data``; raise ``CommitConflict``
        if it already exists — the commit-protocol primitive."""
        raise NotImplementedError

    def delete(self, path: str) -> None:
        raise NotImplementedError

    def size(self, path: str) -> int:
        raise NotImplementedError

    def mtime(self, path: str) -> float:
        """Last-modified time (epoch seconds) — the orphan-GC grace clock.
        Object stores expose this as the object's Last-Modified header."""
        raise NotImplementedError

    def cleanup_empty_dirs(self, path: str) -> None:
        """Remove empty directories under ``path`` (not ``path`` itself).
        Object stores have no directories — implementations may no-op."""
        raise NotImplementedError


class LocalFileIO(FileIO):
    """POSIX implementation: tmp + fsync + hard link for exclusive create
    (two racing writers cannot both win the link), tmp + rename for atomic
    overwrite."""

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def list(self, path: str) -> list[str]:
        try:
            return os.listdir(path)
        except FileNotFoundError:
            return []

    def walk_files(self, path: str):
        for root, _dirs, files in os.walk(path):
            for fn in files:
                absp = os.path.join(root, fn)
                yield absp, os.path.relpath(absp, path)

    def read(self, path: str) -> bytes:
        with open(path, "rb") as fh:
            return fh.read()

    def _write_tmp(self, path: str, data: bytes) -> str:
        tmp = os.path.join(os.path.dirname(path), f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "wb") as fh:
            fh.write(data)
            fh.flush()
            os.fsync(fh.fileno())
        return tmp

    def put_atomic(self, path: str, data: bytes) -> None:
        os.replace(self._write_tmp(path, data), path)

    def put_exclusive(self, path: str, data: bytes) -> None:
        tmp = self._write_tmp(path, data)
        try:
            os.link(tmp, path)
        except FileExistsError as e:
            raise CommitConflict(f"{path} already exists") from e
        finally:
            os.unlink(tmp)

    def delete(self, path: str) -> None:
        if os.path.exists(path):
            os.unlink(path)

    def size(self, path: str) -> int:
        return os.path.getsize(path)

    def mtime(self, path: str) -> float:
        return os.path.getmtime(path)

    def cleanup_empty_dirs(self, path: str) -> None:
        # bottom-up unconditional rmdir: a parent emptied by its child's
        # removal in this same walk must also go (os.walk's topdown=False
        # `dirs` list predates the child deletions, so checking it would
        # leave freshly-emptied parents behind); rmdir on a non-empty dir
        # just raises and is skipped
        for root, _dirs, _files in os.walk(path, topdown=False):
            if root != path:
                try:
                    os.rmdir(root)
                except OSError:
                    pass


class MemoryFileIO(FileIO):
    """Object-store-semantics implementation: a flat key→bytes namespace with
    no real directories, conditional-put exclusivity, and no rename/link.

    Exists to prove (and test) that the table's commit protocol needs ONLY
    the primitives an object store offers — every ``os.*`` idiom lives behind
    ``LocalFileIO``.  ``put_exclusive`` is a compare-and-swap on key absence
    under one lock, i.e. exactly S3 ``If-None-Match: *`` semantics; LIST is a
    prefix scan.  Driver-process-local by construction (the metadata plane is
    driver-side), so it also serves as the in-memory test double.
    """

    def __init__(self) -> None:
        self._objects: dict[str, bytes] = {}
        self._mtimes: dict[str, float] = {}
        self._dirs: set[str] = set()
        self._lock = threading.Lock()

    @staticmethod
    def _norm(path: str) -> str:
        return posixpath.normpath(path.replace(os.sep, "/"))

    def makedirs(self, path: str) -> None:
        with self._lock:
            self._dirs.add(self._norm(path))

    def exists(self, path: str) -> bool:
        p = self._norm(path)
        with self._lock:
            return p in self._objects or self.isdir(path)

    def isdir(self, path: str) -> bool:
        p = self._norm(path)
        pref = p + "/"
        return p in self._dirs or any(k.startswith(pref) for k in self._objects)

    def list(self, path: str) -> list[str]:
        pref = self._norm(path) + "/"
        with self._lock:
            names = {
                k[len(pref):].split("/", 1)[0]
                for k in self._objects
                if k.startswith(pref)
            }
            names |= {
                d[len(pref):].split("/", 1)[0]
                for d in self._dirs
                if d.startswith(pref)
            }
        return sorted(names)

    def walk_files(self, path: str):
        pref = self._norm(path) + "/"
        with self._lock:
            keys = [k for k in self._objects if k.startswith(pref)]
        for k in sorted(keys):
            yield k, k[len(pref):]

    def read(self, path: str) -> bytes:
        p = self._norm(path)
        with self._lock:
            if p not in self._objects:
                raise FileNotFoundError(p)
            return self._objects[p]

    def put_atomic(self, path: str, data: bytes) -> None:
        p = self._norm(path)
        with self._lock:
            self._objects[p] = data
            self._mtimes[p] = time.time()

    def put_exclusive(self, path: str, data: bytes) -> None:
        p = self._norm(path)
        with self._lock:
            if p in self._objects:
                raise CommitConflict(f"{p} already exists")
            self._objects[p] = data
            self._mtimes[p] = time.time()

    def delete(self, path: str) -> None:
        p = self._norm(path)
        with self._lock:
            self._objects.pop(p, None)
            self._mtimes.pop(p, None)

    def size(self, path: str) -> int:
        p = self._norm(path)
        with self._lock:
            if p not in self._objects:
                raise FileNotFoundError(p)
            return len(self._objects[p])

    def mtime(self, path: str) -> float:
        p = self._norm(path)
        with self._lock:
            if p not in self._mtimes:
                raise FileNotFoundError(p)
            return self._mtimes[p]

    def cleanup_empty_dirs(self, path: str) -> None:
        pref = self._norm(path) + "/"
        with self._lock:
            live = {k.rsplit("/", 1)[0] for k in self._objects}
            self._dirs = {
                d
                for d in self._dirs
                if not d.startswith(pref)
                or any(ld == d or ld.startswith(d + "/") for ld in live)
            }
