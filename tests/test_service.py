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
