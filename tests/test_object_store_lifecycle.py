"""Full table lifecycle with BOTH control planes off POSIX: the commit
log on the in-memory S3-semantics store (conditional PUT, no
directories/rename/link) and every driver-side data-file bookkeeping
operation through an injected pyarrow-style filesystem proxy.

Proves the protocol stack has no ``os.*`` escape hatch outside
LocalStoreIO (reference: ``rust/lakesoul-io/src/object_store.rs``
abstracts the same ops behind the ``object_store`` crate; commit
atomicity per ``DelayedCommitProtocol.scala``):

- metadata: after the whole lifecycle, nothing under the table's
  ``_lakesoul_meta`` exists on local disk — every metadata byte lived
  in the MemoryObjectStoreIO key space;
- data bookkeeping: commit-time staging listings, footer-stats reads,
  and vacuum deletes all route through the injected filesystem (call
  counters assert each op class actually went through it).

The parquet payload itself is written/read by Spark's Hadoop layer
(the data plane — s3a/hdfs native in production), which is exactly the
reference's split: native IO for data, metadata service for commits.
"""

import os

import pytest
from pyarrow import fs as pafs

from lakesoul_spark.table import LakeSoulTable, write


class CountingFS:
    """Duck-typed pyarrow-filesystem proxy: delegates to
    LocalFileSystem but counts every bookkeeping call class. Any
    os.*-based bypass would show up as a zero counter."""

    def __init__(self):
        self._fs = pafs.LocalFileSystem()
        self.calls = {"list": 0, "open": 0, "delete": 0}

    def get_file_info(self, sel):
        self.calls["list"] += 1
        return self._fs.get_file_info(sel)

    def open_input_file(self, path):
        self.calls["open"] += 1
        return self._fs.open_input_file(path)

    def delete_file(self, path):
        self.calls["delete"] += 1
        return self._fs.delete_file(path)


@pytest.fixture()
def object_store_planes(monkeypatch):
    import lakesoul_spark.io.fs as fsmod
    import lakesoul_spark.meta.store as store_mod
    from lakesoul_spark.meta.store_io import MemoryObjectStoreIO

    mem = MemoryObjectStoreIO()
    monkeypatch.setattr(store_mod, "_DEFAULT_IO", mem)

    counting = CountingFS()
    real = fsmod.filesystem_for

    def injected(path, fs=None):
        if fs is not None:
            return real(path, fs)
        return counting, path

    monkeypatch.setattr(fsmod, "filesystem_for", injected)
    return mem, counting


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_full_lifecycle_on_non_posix_planes(spark, tmp_path,
                                            object_store_planes):
    mem, counting = object_store_planes
    path = str(tmp_path / "t")

    # create + initial write (v1)
    df = spark.createDataFrame(
        [(i, f"s{i}", i * 10) for i in range(40)], "id int, s string, v int"
    )
    write(df, path, mode="overwrite", hash_partitions=["id"],
          hash_bucket_num=4)
    t = LakeSoulTable.for_path(spark, path)
    assert t.to_df().count() == 40

    # upsert delta (v2) -> MOR read
    t.upsert(spark.createDataFrame(
        [(1, "x1", 111), (40, "s40", 400)], "id int, s string, v int"
    ))
    got = {r.id: (r.s, r.v) for r in t.to_df().collect()}
    assert got[1] == ("x1", 111) and got[40] == ("s40", 400)
    assert len(got) == 41

    # time travel to v1 still sees the pre-upsert state
    v1 = LakeSoulTable.for_path_snapshot(spark, path, version=1)
    assert {r.id: r.v for r in v1.to_df().collect()}[1] == 10

    # compaction (v3): one file per bucket, view unchanged
    before = _rows(t.to_df(), "id", "s", "v")
    t.compaction()
    t2 = LakeSoulTable.for_path(spark, path)
    assert _rows(t2.to_df(), "id", "s", "v") == before

    # update + delete commands
    t2.update("id = 2", {"v": "999"})
    t2.delete("id = 3")
    got = {r.id: r.v for r in t2.to_df().collect()}
    assert got[2] == 999 and 3 not in got and len(got) == 40

    # vacuum drops the pre-compaction generations
    removed = LakeSoulTable.for_path(spark, path).vacuum(retention_ms=0)
    assert removed > 0
    # the vacuumed table still reads correctly
    assert LakeSoulTable.for_path(spark, path).to_df().count() == 40

    # --- the non-POSIX proofs -----------------------------------------
    # 1. every metadata byte lived in the memory object store: nothing
    #    under _lakesoul_meta ever touched the local filesystem
    from lakesoul_spark.meta.store import META_DIR

    assert not os.path.exists(os.path.join(path, META_DIR))
    assert any(META_DIR in k for k in mem._objects)
    # 2. the bookkeeping went through the injected filesystem
    assert counting.calls["list"] > 0, "staging/vacuum listings bypassed fs"
    assert counting.calls["open"] > 0, "footer stats reads bypassed fs"
    assert counting.calls["delete"] > 0, "vacuum deletes bypassed fs"


def test_concurrent_create_loses_cleanly_on_object_store(
        spark, tmp_path, object_store_planes):
    """Conditional-PUT create: the second creator of the same table
    path loses with FileExistsError — the If-None-Match PUT is the
    arbiter, no directory existence check involved."""
    from lakesoul_spark.meta.store import MetaStore, TableInfo

    path = str(tmp_path / "dup")
    info = TableInfo(table_id="a", table_name="dup", path=path,
                     schema_json="{}", range_partitions=[],
                     hash_partitions=["id"], hash_bucket_num=1)
    MetaStore(path).create_table(info)
    with pytest.raises(FileExistsError):
        MetaStore(path).create_table(info)
