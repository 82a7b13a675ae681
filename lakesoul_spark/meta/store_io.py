"""Pluggable byte-level IO backends for the metadata commit log.

The MetaStore's correctness rests on exactly three storage primitives
(reference mapping: ``rust/lakesoul-io/src/object_store.rs`` wraps the
same three behind the ``object_store`` crate; the commit protocol
``DelayedCommitProtocol.scala`` relies on the rename/PUT atomicity of
whichever store backs the table):

1. **conditional create** (``put_if_absent``): claim a name with its
   full content, or lose cleanly — POSIX ``link(2)``, S3
   ``PutObject + If-None-Match:*``;
2. **atomic whole-object replace** (``put``): readers see either the
   old or the new content, never a torn write — POSIX ``rename(2)``,
   any object-store PUT;
3. **list + read-after-write consistency** (``list_names`` /
   ``read_bytes``): a successful write is visible to subsequent reads
   and listings (S3 has been strongly consistent since 2020).

Everything else in the store (checkpoint rollups, head probing,
pruning) is built from these. Backends:

- :class:`LocalStoreIO` — POSIX filesystem (default; link/rename).
- :class:`MemoryObjectStoreIO` — in-memory S3-semantics test double:
  a flat key→bytes map, NO directories, NO rename, NO link; writes
  are atomic whole-object PUTs and the conditional create is an
  If-None-Match PUT (compare-and-claim under one lock, the atomicity
  the real service provides server-side). The conflict-rule suite
  runs against this to prove the protocol never silently depends on
  POSIX-only behavior.
- :class:`FsspecStoreIO` — adapter over any ``fsspec`` filesystem
  (import-gated; fsspec is optional). Conditional create uses
  exclusive-create mode where the filesystem supports it.
"""

from __future__ import annotations

import os
import threading
import uuid


class StoreIO:
    """Interface. Paths are plain strings; directory arguments may not
    exist as objects on flat stores (list by prefix instead)."""

    def read_bytes(self, path: str) -> bytes:
        raise NotImplementedError

    def put_if_absent(self, path: str, data: bytes) -> bool:
        """Atomically create ``path`` with ``data`` iff absent.
        Returns False (without writing) when the name is taken."""
        raise NotImplementedError

    def put(self, path: str, data: bytes) -> None:
        """Atomic whole-object overwrite (last writer wins)."""
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def list_names(self, dirpath: str) -> list[str]:
        """Base names of objects directly under ``dirpath``; [] when
        nothing is there."""
        raise NotImplementedError

    def remove(self, path: str) -> None:
        """Delete; missing object is not an error (S3 DELETE shape)."""
        raise NotImplementedError

    def rmtree(self, prefix: str) -> None:
        """Delete every object under ``prefix``."""
        raise NotImplementedError

    def makedirs(self, dirpath: str) -> None:
        """Create directories where the store has them; no-op on flat
        object stores."""
        raise NotImplementedError


class LocalStoreIO(StoreIO):
    """POSIX backend: conditional create via hard link (the payload is
    written to a private temp file and linked into place, so the
    destination appears atomically with its full content — a plain
    O_CREAT|O_EXCL + write would expose a zero-byte commit to
    concurrent readers between the two syscalls), replace via
    rename."""

    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def put_if_absent(self, path: str, data: bytes) -> bool:
        tmp = f"{path}.{uuid.uuid4().hex}.tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        try:
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def put(self, path: str, data: bytes) -> None:
        tmp = os.path.join(
            os.path.dirname(path), f".{os.path.basename(path)}.{uuid.uuid4().hex}.tmp"
        )
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def list_names(self, dirpath: str) -> list[str]:
        try:
            return os.listdir(dirpath)
        except FileNotFoundError:
            return []

    def remove(self, path: str) -> None:
        try:
            os.remove(path)
        except OSError:
            pass

    def rmtree(self, prefix: str) -> None:
        import shutil

        shutil.rmtree(prefix, ignore_errors=True)

    def makedirs(self, dirpath: str) -> None:
        os.makedirs(dirpath, exist_ok=True)


class MemoryObjectStoreIO(StoreIO):
    """S3-semantics test double: flat key space, atomic PUTs, strong
    read-after-write and list-after-write consistency, conditional
    create as an If-None-Match PUT. No directories, rename, or link
    exist — code paths that would need them fail here, which is the
    point of running the conflict suite against this backend."""

    def __init__(self):
        self._objects: dict[str, bytes] = {}
        self._lock = threading.Lock()

    @staticmethod
    def _key(path: str) -> str:
        return path.rstrip("/")

    def read_bytes(self, path: str) -> bytes:
        with self._lock:
            try:
                return self._objects[self._key(path)]
            except KeyError:
                raise FileNotFoundError(path) from None

    def put_if_absent(self, path: str, data: bytes) -> bool:
        # the lock models the SERVER-side atomicity of a conditional
        # PUT: the existence check and the write are one operation
        with self._lock:
            k = self._key(path)
            if k in self._objects:
                return False
            self._objects[k] = bytes(data)
            return True

    def put(self, path: str, data: bytes) -> None:
        with self._lock:
            self._objects[self._key(path)] = bytes(data)

    def exists(self, path: str) -> bool:
        with self._lock:
            return self._key(path) in self._objects

    def list_names(self, dirpath: str) -> list[str]:
        prefix = self._key(dirpath) + "/"
        with self._lock:
            out = set()
            for k in self._objects:
                if k.startswith(prefix):
                    out.add(k[len(prefix):].split("/", 1)[0])
            return sorted(out)

    def remove(self, path: str) -> None:
        with self._lock:
            self._objects.pop(self._key(path), None)

    def rmtree(self, prefix: str) -> None:
        p = self._key(prefix) + "/"
        with self._lock:
            for k in [k for k in self._objects if k.startswith(p) or k == self._key(prefix)]:
                del self._objects[k]

    def makedirs(self, dirpath: str) -> None:
        pass  # flat namespace


class FsspecStoreIO(StoreIO):
    """Adapter over an ``fsspec`` AbstractFileSystem (optional
    dependency — construction raises ImportError when fsspec is
    missing). Conditional create uses exclusive-create open mode,
    which is only an atomic claim on filesystems that truly implement
    it (local ``O_EXCL``; object stores with If-None-Match PUTs).
    Filesystems that merely EMULATE 'xb' with a non-atomic
    exists-then-write (plain s3fs et al.) would silently weaken the
    interface contract put_if_absent promises — construction REFUSES
    them unless the caller opts in with ``allow_non_atomic=True``
    (single-writer deployments only), mirroring the reference's choice
    of a transactional PG metastore over raw S3."""

    # protocols whose exclusive-create is a real atomic claim
    _ATOMIC_XB = frozenset({"file", "local", "memory"})

    def __init__(self, fs=None, protocol: str = "file",
                 *, allow_non_atomic: bool = False):
        if fs is None:
            import fsspec  # raises ImportError when absent

            fs = fsspec.filesystem(protocol)
        self.fs = fs
        proto = fs.protocol
        protos = proto if isinstance(proto, (tuple, list)) else (proto,)
        if (not allow_non_atomic
                and not any(p in self._ATOMIC_XB for p in protos)):
            raise ValueError(
                f"fsspec filesystem {protos!r} has no atomic exclusive "
                "create: put_if_absent would be a racy exists-then-write. "
                "Use a conditional-PUT backend (or a transactional "
                "metastore), or pass allow_non_atomic=True for "
                "single-writer deployments."
            )

    def read_bytes(self, path: str) -> bytes:
        with self.fs.open(path, "rb") as f:
            return f.read()

    @staticmethod
    def _is_file_like(fs) -> bool:
        proto = fs.protocol
        protos = proto if isinstance(proto, (tuple, list)) else (proto,)
        return any(p in ("file", "local") for p in protos)

    def put_if_absent(self, path: str, data: bytes) -> bool:
        # object stores upload the WHOLE object on close (one PUT), so
        # no reader can observe a partial claim; on file-like
        # filesystems 'xb' opens the final name before the payload is
        # written — a concurrent read_bytes between create and write
        # can see a short file. Writing in ONE call before close
        # minimizes (not eliminates) that window; POSIX deployments
        # should use LocalStoreIO, whose link(2) publish is atomic.
        try:
            with self.fs.open(path, "xb") as f:
                f.write(data)
            return True
        except FileExistsError:
            return False

    def put(self, path: str, data: bytes) -> None:
        # whole-object replace: a plain 'wb' open on a FILE-like
        # filesystem truncates in place (readers can observe an empty
        # or torn object), so stage to a temp name and mv — os.rename
        # under fsspec's local implementation, atomic. Object stores
        # get the single-PUT path: the upload happens on close and the
        # swap is atomic server-side.
        if self._is_file_like(self.fs):
            tmp = f"{path}.tmp-{uuid.uuid4().hex[:12]}"
            with self.fs.open(tmp, "wb") as f:
                f.write(data)
            self.fs.mv(tmp, path)
        else:
            with self.fs.open(path, "wb") as f:
                f.write(data)

    def exists(self, path: str) -> bool:
        return bool(self.fs.exists(path))

    def list_names(self, dirpath: str) -> list[str]:
        try:
            return [p.rstrip("/").rsplit("/", 1)[-1] for p in self.fs.ls(dirpath, detail=False)]
        except FileNotFoundError:
            return []

    def remove(self, path: str) -> None:
        try:
            self.fs.rm_file(path)
        except FileNotFoundError:
            pass

    def rmtree(self, prefix: str) -> None:
        try:
            self.fs.rm(prefix, recursive=True)
        except FileNotFoundError:
            pass

    def makedirs(self, dirpath: str) -> None:
        self.fs.makedirs(dirpath, exist_ok=True)
