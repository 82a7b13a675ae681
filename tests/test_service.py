"""Compaction service daemon: poll-driven maintenance rounds."""

from lakesoul_spark.meta.store import MetaStore
from lakesoul_spark.service import CompactionService
from lakesoul_spark.table import LakeSoulTable, write


def _df(spark, data, schema):
    return spark.createDataFrame(data, schema)


def test_service_compacts_hot_skips_quiet(spark, tmp_path):
    wh = tmp_path / "wh"
    wh.mkdir()
    hot, quiet = str(wh / "hot"), str(wh / "quiet")
    for p in (hot, quiet):
        write(_df(spark, [(i, 0) for i in range(8)], "id int, v int"), p,
              mode="overwrite", hash_partitions=["id"], hash_bucket_num=1)
    t = LakeSoulTable.for_path(spark, hot)
    for g in range(1, 4):
        t.upsert(_df(spark, [(i, g) for i in range(4)], "id int, v int"))

    svc = CompactionService(spark, warehouse=str(wh), l0_file_num_limit=4)
    done = svc.run_once()
    assert set(done) == {hot}
    assert "compacted" in done[hot]
    assert MetaStore(hot).snapshot().max_generations_per_bucket() == 1
    assert MetaStore(quiet).snapshot().max_generations_per_bucket() == 1
    before_quiet = {f.path for f in MetaStore(quiet).snapshot().files}

    # second round: nothing advanced -> no work, quiet files untouched
    assert svc.run_once() == {}
    assert {f.path for f in MetaStore(quiet).snapshot().files} == before_quiet

    # results survive the service pass
    got = sorted((r[0], r[1]) for r in t.to_df().collect())
    assert got == [(i, 3 if i < 4 else 0) for i in range(8)]

    assert svc.serve(interval_s=0.01, max_rounds=2) == 2


def test_service_survives_mv_refresh_conflict(spark, tmp_path, monkeypatch):
    """A CommitConflict escaping an MV refresh (the daemon losing
    max_attempts races to user-driven refreshes) must not crash
    run_once: it is recorded, the remaining tables still get their
    round, and the source head is NOT advanced so the next round
    retries the window."""
    import lakesoul_spark.mv as mv_mod
    from lakesoul_spark.meta.store import CommitConflict
    from lakesoul_spark.mv import AggMV

    wh = tmp_path / "wh"
    wh.mkdir()
    src, mvp = str(wh / "a_src"), str(wh / "b_mv")
    write(_df(spark, [(i, i) for i in range(20)], "k int, v int"),
          src, mode="overwrite")
    AggMV.create(spark, src, mvp, group_by=["k"],
                 aggs={"total": ("sum", "v")})
    # a later-sorting plain table that must still be maintained after
    # the MV's refresh blows up
    hot = str(wh / "c_hot")
    write(_df(spark, [(i, 0) for i in range(8)], "id int, v int"), hot,
          mode="overwrite", hash_partitions=["id"], hash_bucket_num=1)
    t = LakeSoulTable.for_path(spark, hot)
    for g in range(1, 4):
        t.upsert(_df(spark, [(i, g) for i in range(4)], "id int, v int"))

    real_open = mv_mod.open_view

    class _Exploding:
        def __init__(self, inner):
            self._inner = inner

        def refresh(self):
            raise CommitConflict("lost 5 races in a row")

    calls = {"n": 0}

    def fake_open(spark_, path):
        calls["n"] += 1
        return _Exploding(real_open(spark_, path))

    monkeypatch.setattr("lakesoul_spark.mv.open_view", fake_open)
    svc = CompactionService(spark, warehouse=str(wh), l0_file_num_limit=4)
    done = svc.run_once()
    assert done[mvp]["mv_conflict"]
    assert "compacted" in done[hot]  # the loop kept going past the MV
    # head NOT advanced: the next round retries the same window
    monkeypatch.setattr("lakesoul_spark.mv.open_view", real_open)
    done2 = svc.run_once()
    assert done2[mvp]["mv_refreshed"]["applied"]
    got = sorted((r[0], r[1]) for r in
                 AggMV(spark, mvp).to_df().collect())
    assert got == [(i, float(i)) for i in range(20)]
