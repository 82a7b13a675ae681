"""Upsert matrix ported from the reference's primary suite
(``UpsertSuiteBase.scala``, 27 cases): new/existing partitions,
null handling, filters after upsert, multi-upsert chains, concurrency.
"""

import threading

import pytest
from pyspark.sql import functions as F

from lakesoul_spark.meta.store import MetaStore
from lakesoul_spark.table import LakeSoulTable, write


def _df(spark, data, schema):
    return spark.createDataFrame(data, schema)


def _mk(spark, path, rows=None, range_p=None):
    base = rows or [(20201101, 1, 1, 1), (20201101, 2, 2, 2), (20201101, 3, 3, 3),
                    (20201102, 4, 4, 4)]
    df = _df(spark, base, "range int, hash int, value int, name int")
    write(df, path, range_partitions=range_p if range_p is not None else ["range"],
          hash_partitions=["hash"], hash_bucket_num=2)
    return LakeSoulTable.for_path(spark, path)


def rows(t, cols=("range", "hash", "value", "name")):
    return sorted(tuple(r) for r in t.to_df().select(*cols).collect())


def test_upsert_into_new_range_partition(spark, tmp_table):
    t = _mk(spark, tmp_table)
    t.upsert(_df(spark, [(20201103, 5, 5, 5)], "range int, hash int, value int, name int"))
    assert (20201103, 5, 5, 5) in rows(t)
    assert len(rows(t)) == 5


def test_upsert_existing_and_new_partition_mixed(spark, tmp_table):
    t = _mk(spark, tmp_table)
    t.upsert(_df(spark, [(20201101, 1, 11, 11), (20201104, 9, 9, 9)],
                 "range int, hash int, value int, name int"))
    r = rows(t)
    assert (20201101, 1, 11, 11) in r and (20201104, 9, 9, 9) in r
    assert (20201101, 1, 1, 1) not in r


def test_upsert_same_key_repeatedly_last_wins(spark, tmp_table):
    t = _mk(spark, tmp_table)
    for v in (10, 20, 30):
        t.upsert(_df(spark, [(20201101, 1, v, v)], "range int, hash int, value int, name int"))
    assert (20201101, 1, 30, 30) in rows(t)
    assert len([x for x in rows(t) if x[1] == 1]) == 1


def test_upsert_nulls_overwrite_with_use_last(spark, tmp_table):
    """Default merge is UseLast: a null in the newest version wins."""
    t = _mk(spark, tmp_table)
    t.upsert(_df(spark, [(20201101, 1, None, None)],
                 "range int, hash int, value int, name int"))
    assert (20201101, 1, None, None) in rows(t)


def test_upsert_nulls_kept_out_with_use_last_not_null(spark, tmp_table):
    t = _mk(spark, tmp_table)
    t.upsert(_df(spark, [(20201101, 1, None, 99)],
                 "range int, hash int, value int, name int"))
    t.register_merge_operator("value", "use_last_not_null")
    got = {(r["hash"]): (r["value"], r["name"]) for r in t.to_df().collect()}
    assert got[1] == (1, 99)  # value kept from older version, name updated


def test_filter_after_upsert(spark, tmp_table):
    """The reference's filter-after-upsert matrix: predicates evaluate
    on the MERGED view, not the raw delta files."""
    t = _mk(spark, tmp_table)
    t.upsert(_df(spark, [(20201101, 2, 222, 2)],
                 "range int, hash int, value int, name int"))
    got = t.to_df().filter(F.col("value") > 100).collect()
    assert [(r["hash"], r["value"]) for r in got] == [(2, 222)]
    # filtering on the old value finds nothing
    assert t.to_df().filter((F.col("hash") == 2) & (F.col("value") == 2)).count() == 0


def test_upsert_without_range_partition(spark, tmp_table):
    t = _mk(spark, tmp_table, range_p=[])
    t.upsert(_df(spark, [(20201101, 1, 111, 1)],
                 "range int, hash int, value int, name int"))
    assert (20201101, 1, 111, 1) in rows(t)


def test_upsert_subset_columns_then_filter(spark, tmp_table):
    t = _mk(spark, tmp_table)
    t.upsert(_df(spark, [(20201101, 1, 77)], "range int, hash int, value int"))
    got = {r["hash"]: (r["value"], r["name"]) for r in t.to_df().collect()}
    assert got[1] == (77, 1)  # value updated, name untouched (not in delta)


def test_upsert_missing_pk_rejected(spark, tmp_table):
    t = _mk(spark, tmp_table)
    with pytest.raises(ValueError, match="missing partition/PK"):
        t.upsert(_df(spark, [(20201101, 5)], "range int, value int"))


def test_concurrent_upserts_both_commit(spark, tmp_table):
    """Merge commits auto-rebase (reference DBManager mergeConflict):
    two writers racing on the same table both land."""
    t = _mk(spark, tmp_table)
    errs = []

    def up(v):
        try:
            LakeSoulTable.for_path(spark, tmp_table).upsert(
                _df(spark, [(20201101, 100 + v, v, v)],
                    "range int, hash int, value int, name int")
            )
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=up, args=(v,)) for v in (1, 2, 3, 4)]
    [x.start() for x in ts]
    [x.join() for x in ts]
    assert not errs
    store = MetaStore(tmp_table)
    assert store.head_version() == 5  # initial write + 4 merges
    got = {r["hash"] for r in t.to_df().collect()}
    assert {101, 102, 103, 104} <= got


def test_many_upserts_then_compaction_equivalence(spark, tmp_table):
    """Reference CompactionDoNotChangeResult over a longer delta chain."""
    t = _mk(spark, tmp_table)
    for i in range(10):
        t.upsert(_df(spark, [(20201101, i % 4, 1000 + i, i)],
                     "range int, hash int, value int, name int"))
    before = rows(t)
    t.compaction()
    assert rows(LakeSoulTable.for_path(spark, tmp_table)) == before
    store = MetaStore(tmp_table)
    per_bucket = {}
    for f in store.snapshot().files:
        k = (f.partition_desc, f.bucket)
        per_bucket[k] = per_bucket.get(k, 0) + 1
    assert all(v == 1 for v in per_bucket.values())


def test_cow_upsert_matches_delta_upsert(spark, tmp_path):
    """Reference UpsertCommand.scala:125-143 non-delta path: the COW
    full-outer rewrite must produce the same table as the delta path
    (non-null sources), and leave ONE generation per bucket."""
    from pyspark.sql import functions as F

    base = [(i, f"s{i}", i * 10) for i in range(40)]
    delta = [(i, f"S{i}", i * 100) for i in range(0, 40, 3)] + [
        (100 + i, f"n{i}", -i) for i in range(5)]

    results = {}
    for mode in ("delta", "cow"):
        path = str(tmp_path / mode)
        write(_df(spark, base, "id int, s string, v int"), path,
              mode="overwrite", hash_partitions=["id"], hash_bucket_num=4)
        t = LakeSoulTable.for_path(spark, path)
        t.upsert(_df(spark, delta, "id int, s string, v int"), cow=(mode == "cow"))
        results[mode] = sorted(map(tuple, t.to_df().collect()))
        gens = t.store.snapshot().max_generations_per_bucket()
        assert gens == (1 if mode == "cow" else 2), (mode, gens)
    assert results["cow"] == results["delta"]


def test_cow_upsert_partial_columns_range_partitioned(spark, tmp_path):
    """COW partial-column upsert keeps untouched columns and rewrites
    only the range partitions present in the source."""
    path = str(tmp_path / "t")
    write(_df(spark, [(1, "a", "x", 1), (2, "a", "y", 2), (3, "b", "z", 3)],
              "id int, p string, s string, v int"),
          path, mode="overwrite", range_partitions=["p"],
          hash_partitions=["id"], hash_bucket_num=2)
    t = LakeSoulTable.for_path(spark, path)
    before_b = {f.path for f in t.store.snapshot(partition_descs={"p=b"}).files}
    t.upsert(_df(spark, [(1, "a", 100), (4, "a", 400)], "id int, p string, v int"),
             cow=True)
    got = sorted(map(tuple, t.to_df().collect()))
    assert got == [(1, "a", "x", 100), (2, "a", "y", 2),
                   (3, "b", "z", 3), (4, "a", None, 400)]
    after_b = {f.path for f in t.store.snapshot(partition_descs={"p=b"}).files}
    assert before_b == after_b  # untouched partition keeps its files


def test_merge_scope_split_with_partial_column_single_bucket(spark, tmp_path):
    """Merge-scope refinement edge: one bucket holds TWO generations
    (merge branch) while another bucket's ONLY generation is a
    partial-column file (plain branch) — the plain scan must null-fill
    the absent column and union cleanly with the merged branch."""
    from lakesoul_spark.functions.spark_hash import bucket_of
    from lakesoul_spark.table import LakeSoulTable, write

    path = str(tmp_path / "t")
    n_b = 4
    # keys for two distinct buckets
    k_merge = next(k for k in range(100) if bucket_of([k], ["int"], n_b) == 0)
    k_plain = next(k for k in range(100) if bucket_of([k], ["int"], n_b) == 1)
    write(spark.createDataFrame([(k_merge, "a", 1)], "id int, s string, v int"),
          path, hash_partitions=["id"], hash_bucket_num=n_b)
    t = LakeSoulTable.for_path(spark, path)
    # second generation for bucket 0 (forces the merge branch)
    t.upsert(spark.createDataFrame([(k_merge, 11)], "id int, v int"))
    # bucket 1's ONLY generation misses column s (plain branch)
    t.upsert(spark.createDataFrame([(k_plain, 22)], "id int, v int"))

    got = {r.id: (r.s, r.v) for r in
           LakeSoulTable.for_path(spark, path).to_df().collect()}
    assert got == {k_merge: ("a", 11), k_plain: (None, 22)}
    plan = (LakeSoulTable.for_path(spark, path).to_df()
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Union") == 1 and plan.count("HashAggregate") <= 2
