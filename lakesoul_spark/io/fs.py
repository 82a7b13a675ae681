"""URI-aware filesystem access for driver-side data-file operations.

The heavy data path (parquet read/write) already goes through Spark's
Hadoop filesystem layer, which speaks s3a/gs/abfs/hdfs natively — only
the DRIVER-side bookkeeping (staging-dir listing at commit, fsck size
checks, vacuum orphan sweeps, in-place import discovery) touched the
filesystem directly through ``os.walk``/``getsize``, which silently
pins those operations to a POSIX mount. This module routes them through
``pyarrow.fs`` instead (reference: ``rust/lakesoul-io/src/object_store.rs``
and ``hdfs/mod.rs`` abstract the same operations behind the
``object_store`` crate), so the same code serves:

- plain paths → ``LocalFileSystem`` (bit-identical to the old behavior);
- URI paths (``s3://…``, ``hdfs://…``) → ``FileSystem.from_uri``;
- an injected filesystem (tests use pyarrow's in-memory mock — a flat
  object store with no POSIX semantics — to prove nothing here needs
  ``os``).

Listings are one recursive LIST per prefix with sizes included in the
``FileInfo`` — never a per-file stat round-trip, which is the access
pattern that matters on an object store at 100 TB (a commit of 10k
files costs one LIST, not 10k HEADs).
"""

from __future__ import annotations


def filesystem_for(path: str, fs=None):
    """Resolve ``path`` to ``(FileSystem, fs-native path)``.

    An explicitly injected ``fs`` wins (native path assumed); a
    ``scheme://`` URI resolves through ``FileSystem.from_uri`` (which
    picks S3/GCS/HDFS/local from the scheme); anything else is a local
    path."""
    from pyarrow import fs as pafs

    if fs is not None:
        return fs, path
    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def list_files(path: str, fs=None, *, suffix: str | None = None):
    """Recursive listing under ``path``: sorted ``[(native_path, size)]``
    of files (optionally filtered by ``suffix``). Missing prefix → []."""
    from pyarrow import fs as pafs

    f, p = filesystem_for(path, fs)
    sel = pafs.FileSelector(p, recursive=True, allow_not_found=True)
    out = [
        (i.path, i.size)
        for i in f.get_file_info(sel)
        if i.type == pafs.FileType.File
        and (suffix is None or i.path.endswith(suffix))
    ]
    out.sort()
    return out


def parquet_metadata(native_path: str, fs):
    """Footer-only metadata read through the filesystem handle."""
    import pyarrow.parquet as pq

    with fs.open_input_file(native_path) as fh:
        return pq.ParquetFile(fh).metadata


def parquet_metadata_and_sums(native_path: str, fs, sum_cols):
    """Footer metadata plus exact per-column sums (``io/stats.py
    file_sums``) in ONE file open — the commit-time bookkeeping read.
    ``sum_cols`` empty/None skips the data read entirely (footer
    only, byte-identical cost to :func:`parquet_metadata`)."""
    import pyarrow.parquet as pq

    from lakesoul_spark.io.stats import file_sums

    with fs.open_input_file(native_path) as fh:
        pf = pq.ParquetFile(fh)
        sums = file_sums(pf, sum_cols) if sum_cols else None
        return pf.metadata, sums


def delete_file(native_path: str, fs) -> None:
    """Best-effort delete (missing object is not an error — S3 DELETE
    shape)."""
    try:
        fs.delete_file(native_path)
    except FileNotFoundError:
        pass


def exists(path: str, fs=None) -> bool:
    """True when ``path`` exists as a file OR a directory/prefix (on
    flat stores a "directory" exists when any key lives under it)."""
    from pyarrow import fs as pafs

    f, p = filesystem_for(path, fs)
    info = f.get_file_info(p)
    if info.type != pafs.FileType.NotFound:
        return True
    # flat object stores have no directory entries: probe the prefix
    sel = pafs.FileSelector(p, recursive=False, allow_not_found=True)
    return bool(f.get_file_info(sel))


def remove_tree(path: str, fs=None) -> None:
    """Delete everything under ``path`` (and the directory itself where
    the store has directories). Missing path is not an error — the
    rollback-cleanup shape."""
    f, p = filesystem_for(path, fs)
    try:
        f.delete_dir(p)
    except (FileNotFoundError, OSError):
        # flat stores may refuse delete_dir on a pure prefix: fall back
        # to object-wise deletes of the listing
        for native, _sz in list_files(path, fs):
            delete_file(native, f)


def copy_file(src: str, dst: str, *, src_fs=None, dst_fs=None,
              chunk_bytes: int = 32 << 20) -> None:
    """Stream-copy ONE object through the filesystem seam — the unit
    move of a deep CLONE (reference shape:
    ``rust/lakesoul-io/src/object_store.rs`` routes every byte move
    through the ObjectStore trait). Works on POSIX paths, ``scheme://``
    URIs, and injected filesystems alike; parent directories are
    created where the store has them (no-op on flat object stores).
    ``compression=None`` on both ends — a copy must move raw bytes,
    never re/de-compress by filename inference."""
    sf, sp = filesystem_for(src, src_fs)
    df, dp = filesystem_for(dst, dst_fs)
    parent = dp.rsplit("/", 1)[0] if "/" in dp else ""
    if parent:
        df.create_dir(parent, recursive=True)
    with sf.open_input_stream(sp, compression=None) as r, \
            df.open_output_stream(dp, compression=None) as w:
        while True:
            buf = r.read(chunk_bytes)
            if not buf:
                break
            w.write(buf)


def relative_to(native_path: str, native_root: str) -> str:
    """``native_path`` relative to ``native_root`` using '/' separators
    (both must come from the same filesystem resolution)."""
    root = native_root.rstrip("/") + "/"
    if not native_path.startswith(root):
        raise ValueError(f"{native_path!r} is not under {native_root!r}")
    return native_path[len(root):]
