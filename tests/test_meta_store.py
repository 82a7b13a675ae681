"""Commit log / snapshot / conflict-rule unit tests (no Spark).

Models the reference suites for the metadata layer: optimistic
concurrency per DBManager.java:480-576, MVCC snapshots, incremental
file resolution (DataOperation.scala:160-240).
"""

import pytest

from lakesoul_spark.meta.store import (
    NON_PARTITIONED,
    OP_APPEND,
    OP_COMPACTION,
    OP_DELETE,
    OP_MERGE,
    OP_UPDATE,
    CommitConflict,
    FileOp,
    MetaStore,
    TableInfo,
)


@pytest.fixture(autouse=True, params=["local", "object-store"])
def meta_backend(request, monkeypatch):
    """Run the ENTIRE metadata suite on both IO backends: the POSIX
    default (link/rename) and the in-memory S3-semantics double
    (conditional PUT + atomic whole-object writes, no directories or
    rename) — proving the commit protocol's conflict rules never
    silently depend on POSIX-only behavior."""
    import lakesoul_spark.meta.store as store_mod

    if request.param == "object-store":
        from lakesoul_spark.meta.store_io import MemoryObjectStoreIO

        monkeypatch.setattr(store_mod, "_DEFAULT_IO", MemoryObjectStoreIO())
    else:
        monkeypatch.setattr(store_mod, "_DEFAULT_IO", None)
    return request.param


def mk_store(tmp_path, **kw):
    store = MetaStore(str(tmp_path / "t"))
    info = TableInfo(
        table_id="tid",
        table_name="t",
        path=store.table_path,
        schema_json="{}",
        range_partitions=kw.get("range_partitions", []),
        hash_partitions=kw.get("hash_partitions", []),
        hash_bucket_num=kw.get("hash_bucket_num", 0),
    )
    store.create_table(info)
    return store


def add(path, part=NON_PARTITIONED, bucket=-1):
    return FileOp(op="add", path=path, partition_desc=part, bucket=bucket)


def dele(path, part=NON_PARTITIONED, bucket=-1):
    return FileOp(op="del", path=path, partition_desc=part, bucket=bucket)


def test_create_twice_fails(tmp_path):
    mk_store(tmp_path)
    with pytest.raises(FileExistsError):
        mk_store(tmp_path)


def test_commit_and_snapshot_replay(tmp_path):
    s = mk_store(tmp_path)
    s.commit(OP_APPEND, [add("data/a.parquet")])
    s.commit(OP_MERGE, [add("data/b.parquet")])
    s.commit(OP_UPDATE, [dele("data/a.parquet"), add("data/c.parquet")])
    snap = s.snapshot()
    assert snap.version == 3
    assert [f.path for f in snap.files] == ["data/b.parquet", "data/c.parquet"]
    # time travel to v1
    snap1 = s.snapshot(version=1)
    assert [f.path for f in snap1.files] == ["data/a.parquet"]


def test_snapshot_by_timestamp(tmp_path):
    s = mk_store(tmp_path)
    c1 = s.commit(OP_APPEND, [add("data/a.parquet")])
    c2 = s.commit(OP_APPEND, [add("data/b.parquet")])
    snap = s.snapshot(timestamp_ms=c1.timestamp_ms)
    assert snap.version >= 1
    assert "data/a.parquet" in {f.path for f in snap.files}
    snap_all = s.snapshot(timestamp_ms=c2.timestamp_ms + 10)
    assert len(snap_all.files) == 2


def test_partition_pruned_snapshot(tmp_path):
    s = mk_store(tmp_path, range_partitions=["d"])
    s.commit(OP_APPEND, [add("data/a.parquet", "d=1"), add("data/b.parquet", "d=2")])
    snap = s.snapshot(partition_descs={"d=1"})
    assert [f.path for f in snap.files] == ["data/a.parquet"]


def test_conflict_rules(tmp_path):
    s = mk_store(tmp_path)
    base = s.head_version()
    s.commit(OP_APPEND, [add("data/a.parquet")])
    # append/merge rebase silently over concurrent commits
    s.commit(OP_MERGE, [add("data/b.parquet")], base_version=base)
    # update aborts when a concurrent commit touched the same partition
    with pytest.raises(CommitConflict):
        s.commit(OP_UPDATE, [dele("data/a.parquet")], base_version=base)
    # compaction rebases over append/merge
    s.commit(OP_COMPACTION, [dele("data/a.parquet"), add("data/c.parquet")], base_version=base)
    # ...but a second compaction racing the first aborts
    with pytest.raises(CommitConflict):
        s.commit(OP_COMPACTION, [dele("data/a.parquet")], base_version=base)


def test_incremental_skips_compaction(tmp_path):
    s = mk_store(tmp_path)
    c1 = s.commit(OP_APPEND, [add("data/a.parquet")])
    s.commit(OP_MERGE, [add("data/b.parquet")])
    s.commit(OP_COMPACTION, [dele("data/a.parquet"), dele("data/b.parquet"), add("data/c.parquet")])
    c4 = s.commit(OP_MERGE, [add("data/d.parquet")])
    files, commits = s.incremental_files(c1.timestamp_ms)
    paths = [f.path for f in files]
    assert "data/c.parquet" not in paths  # compaction excluded
    assert "data/b.parquet" in paths and "data/d.parquet" in paths
    assert {c.seq for c in commits} == {2, 4}
    assert c4.seq == 4


def test_streaming_idempotence(tmp_path):
    s = mk_store(tmp_path)
    s.commit(OP_APPEND, [add("data/a.parquet")], query_id="q1", batch_id=3)
    assert s.has_batch("q1", 3)
    assert s.has_batch("q1", 2)  # older batch already covered
    assert not s.has_batch("q1", 4)
    assert not s.has_batch("q2", 0)


def test_incremental_update_breaks_range(tmp_path):
    """An Update commit strictly inside the range empties the
    incremental result (reference DataOperation.scala:228-245: a
    rewritten partition cannot be represented as a row delta)."""
    store = mk_store(tmp_path)
    store.commit(OP_APPEND, [add("f1")])
    ts1 = store.read_commit(1).timestamp_ms
    store.commit(OP_APPEND, [add("f2")])
    store.commit(OP_UPDATE, [dele("f1"), add("f3")])
    store.commit(OP_APPEND, [add("f4")])
    files, cs = store.incremental_files(ts1)
    assert files == [] and cs == []
    # a range that starts after the update is clean again
    ts3 = store.read_commit(3).timestamp_ms
    files, _ = store.incremental_files(ts3)
    assert [f.path for f in files] == ["f4"]


def test_checkpoint_bounds_metadata_reads(tmp_path):
    """1,000 commits: a FRESH store resolves head/snapshot/has_batch by
    reading O(checkpoint interval) commit files, not O(#commits) — the
    file-log analog of the reference's indexed PG metadata
    (DBManager.java). Correctness: checkpointed replay == full replay."""
    store = mk_store(tmp_path)
    n = 1000
    for i in range(n):
        store.commit(
            OP_APPEND, [add(f"data/f{i}.parquet")],
            query_id="qA", batch_id=i,
        )
    # drop one early file via a later commit so the rollup must apply dels
    store.commit(
        OP_APPEND,
        [FileOp(op="del", path="data/f0.parquet",
                partition_desc=NON_PARTITIONED, bucket=-1)],
    )

    fresh = MetaStore(store.table_path)
    reads = {"n": 0}
    orig = MetaStore.read_commit

    def counting(self, seq):
        reads["n"] += 1
        return orig(self, seq)

    MetaStore.read_commit = counting
    try:
        head = fresh.head_version()
        snap = fresh.snapshot()
        assert fresh.has_batch("qA", n - 1)
        assert not fresh.has_batch("qA", n)
    finally:
        MetaStore.read_commit = orig
    assert head == n + 1
    assert len(snap.files) == n - 1
    assert reads["n"] <= 3 * fresh.checkpoint_interval

    # checkpointed replay must equal a checkpoint-free full replay
    bare = MetaStore(store.table_path)
    bare.latest_checkpoint_seq = lambda max_seq=None: 0
    assert {f.path for f in bare.snapshot().files} == {f.path for f in snap.files}
    assert {(f.path, f.commit_seq) for f in bare.snapshot().files} == {
        (f.path, f.commit_seq) for f in snap.files
    }


def test_checkpoint_retention_bounds_meta_dir(tmp_path):
    """100+ checkpoint intervals: old rollups are pruned to the newest
    ``checkpoint_keep``, so the meta dir stays O(keep) while head and
    snapshot resolution keep working — and a snapshot BELOW the oldest
    kept checkpoint still replays correctly from the commit log."""
    store = mk_store(tmp_path)
    n = 110 * store.checkpoint_interval  # 110 rollup opportunities
    for i in range(n):
        store.commit(OP_APPEND, [add(f"data/f{i}.parquet")])

    names = store.io.list_names(store.meta_dir)
    cps = [f for f in names if f.startswith("checkpoint.")]
    assert len(cps) == store.checkpoint_keep
    # meta dir itself is bounded: table_info + commits dir + kept rollups
    assert len(names) <= store.checkpoint_keep + 2

    fresh = MetaStore(store.table_path)
    assert fresh.head_version() == n
    assert len(fresh.snapshot().files) == n
    # deep time travel (seq 5 — far below the oldest kept checkpoint)
    assert len(fresh.snapshot(version=5).files) == 5


def test_checkpoint_time_travel_and_timestamp_resolution(tmp_path):
    """Binary-search timestamp resolution + checkpointed historical
    replay agree with the naive definitions."""
    store = mk_store(tmp_path)
    for i in range(100):
        store.commit(OP_APPEND, [add(f"data/f{i}.parquet")])
    c50 = store.read_commit(50)
    assert store.version_at_timestamp(c50.timestamp_ms) == 50
    assert store.version_at_timestamp(c50.timestamp_ms - 1) == 49
    assert store.version_at_timestamp(store.read_commit(100).timestamp_ms + 10) == 100
    assert store.version_at_timestamp(store.read_commit(1).timestamp_ms - 10) == 0
    # historical snapshot through a checkpoint boundary (interval 32)
    snap = store.snapshot(version=50)
    assert len(snap.files) == 50
    snap33 = store.snapshot(version=33)
    assert len(snap33.files) == 33


def test_concurrent_writers_all_land(tmp_path):
    """8 threads x 4 Merge commits race on one table through SEPARATE
    MetaStore instances: the atomic create-if-absent protocol must land
    all 32 commits exactly once, in a gap-free sequence, with every
    file visible in the final snapshot (reference DBManager.java
    optimistic retry under real contention, not just replayed
    conflicts)."""
    import threading

    s = mk_store(tmp_path)
    errs = []

    def worker(w):
        try:
            st = MetaStore(s.table_path)
            for i in range(4):
                st.commit(OP_MERGE, [add(f"data/w{w}-{i}.parquet")])
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(w,)) for w in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errs == []
    fresh = MetaStore(s.table_path)
    commits = fresh.commits()
    assert [c.seq for c in commits] == list(range(1, 33))
    assert len({c.commit_id for c in commits}) == 32
    # strictly monotonic timestamps (incremental reads address by ts)
    ts = [c.timestamp_ms for c in commits]
    assert all(a < b for a, b in zip(ts, ts[1:]))
    paths = {f.path for f in fresh.snapshot().files}
    assert paths == {f"data/w{w}-{i}.parquet" for w in range(8) for i in range(4)}


def test_fsspec_store_refuses_non_atomic_conditional_create():
    """FsspecStoreIO must not silently weaken put_if_absent's atomic
    contract: filesystems whose 'xb' is an emulated exists-then-write
    (s3 et al.) are refused at construction unless the caller opts in
    for single-writer use."""
    from lakesoul_spark.meta.store_io import FsspecStoreIO

    class FakeS3:
        protocol = ("s3", "s3a")

    class FakeLocal:
        protocol = "file"

    with pytest.raises(ValueError, match="no atomic exclusive create"):
        FsspecStoreIO(fs=FakeS3())
    # explicit opt-in and genuinely-atomic protocols both construct
    assert FsspecStoreIO(fs=FakeS3(), allow_non_atomic=True).fs is not None
    assert FsspecStoreIO(fs=FakeLocal()).fs is not None


def test_concurrent_writers_across_processes(tmp_path, meta_backend):
    """The thread race, escalated to PROCESSES: 6 separate interpreter
    processes x 5 Merge commits race one table through link(2)
    conditional creates — no shared GIL, no shared locks, only the
    filesystem primitive (the multi-driver deployment the reference
    serves with PostgreSQL transactions, DBManager.java). All 30
    commits must land exactly once in a gap-free sequence."""
    import multiprocessing as mp

    if meta_backend != "local":
        pytest.skip("in-memory object store does not span processes; "
                    "its server-side conditional-PUT atomicity is "
                    "modeled in-process by the thread race")

    s = mk_store(tmp_path)

    ctx = mp.get_context("spawn")
    procs = [
        ctx.Process(target=_process_committer, args=(s.table_path, w))
        for w in range(6)
    ]
    for p in procs:
        p.start()
    for p in procs:
        p.join(120)
    assert all(p.exitcode == 0 for p in procs), \
        [p.exitcode for p in procs]
    fresh = MetaStore(s.table_path)
    commits = fresh.commits()
    assert [c.seq for c in commits] == list(range(1, 31))
    assert len({c.commit_id for c in commits}) == 30
    files = {f.path for f in fresh.snapshot().files}
    assert files == {f"data/p{w}-{i}.parquet"
                     for w in range(6) for i in range(5)}


def _process_committer(table_path, w):
    # module-level so spawn can pickle it; each process builds its own
    # MetaStore (separate page caches, separate fds)
    st = MetaStore(table_path)
    for i in range(5):
        st.commit(OP_MERGE, [add(f"data/p{w}-{i}.parquet")])
