"""Per-file column stats: collection at commit time, scan-time file
skipping (metadata-only), and the merge-group correctness contract."""

import pyspark.sql.functions as F
import pytest

from lakesoul_spark.io.stats import group_bounds, prune_files
from lakesoul_spark.meta.store import MetaStore
from lakesoul_spark.table import LakeSoulTable, write


def _mk(spark, path, rows, pk=("k",), props=None, bucket_num=2):
    df = spark.createDataFrame(rows, "k long, v long, s string")
    write(
        df, path, mode="overwrite",
        hash_partitions=list(pk), hash_bucket_num=bucket_num,
        properties=props or {},
    )
    return LakeSoulTable.for_path(spark, path)


def test_stats_collected_on_write(spark, tmp_table):
    _mk(
        spark, tmp_table,
        [(i, i * 10, f"s{i}") for i in range(20)],
        props={"lakesoul.statsColumns": "v,s"},
    )
    snap = MetaStore(tmp_table).snapshot()
    assert snap.files
    for f in snap.files:
        assert f.stats and "k" in f.stats and "v" in f.stats and "s" in f.stats
        lo, hi = f.stats["v"]
        assert 0 <= lo <= hi <= 190
    # union over all buckets covers the whole domain
    b = group_bounds(snap.files) if len(snap.files) == 1 else None
    all_lo = min(f.stats["v"][0] for f in snap.files)
    all_hi = max(f.stats["v"][1] for f in snap.files)
    assert (all_lo, all_hi) == (0, 190)


def test_datasource_scan_prunes_files(spark, tmp_table):
    # one range partition column would conflate partition pruning with
    # stats pruning; use a plain PK table and filter on a stats column
    _mk(
        spark, tmp_table,
        [(i, i * 10, f"s{i}") for i in range(40)],
        props={"lakesoul.statsColumns": "v"},
        bucket_num=4,
    )
    from pyspark.sql.datasource import GreaterThan

    from lakesoul_spark.streaming.source import LakeSoulBatchReader

    rd = LakeSoulBatchReader(tmp_table, {})
    n_all = len(rd.partitions())
    rd2 = LakeSoulBatchReader(tmp_table, {})
    rd2.pushFilters([GreaterThan(("v",), 10_000)])  # beyond every bound
    assert len(rd2.partitions()) < n_all

    # results still correct end-to-end (Spark re-checks rows)
    from lakesoul_spark.streaming.source import register

    register(spark)
    got = (
        spark.read.format("lakesoul").load(tmp_table)
        .filter(F.col("v") > 250).select("k", "v").collect()
    )
    assert sorted((r.k, r.v) for r in got) == [(i, i * 10) for i in range(26, 40)]


def test_group_wise_pruning_never_resurfaces_stale_rows(spark, tmp_table):
    """THE correctness case: gen2 supersedes a row with a value the
    filter rejects. Per-file pruning would drop gen2 (its bounds miss
    the predicate) and leave gen1's stale row visible; group-wise
    union-bounds pruning keeps or drops the generations together."""
    t = _mk(
        spark, tmp_table, [(1, 100, "a"), (2, 200, "b")],
        props={"lakesoul.statsColumns": "v"}, bucket_num=1,
    )
    t.upsert(spark.createDataFrame([(1, 5, "a2")], "k long, v long, s string"))

    # merged view: k=1 -> v=5 (fails v>50), k=2 -> v=200 (passes)
    got = t.to_df(file_filters=[("v", ">", 50)]).select("k", "v").collect()
    assert sorted((r.k, r.v) for r in got) == [(2, 200)]

    # the same through the DataSource scan path
    from lakesoul_spark.streaming.source import register

    register(spark)
    got2 = (
        spark.read.format("lakesoul").load(tmp_table)
        .filter(F.col("v") > 50).select("k", "v").collect()
    )
    assert sorted((r.k, r.v) for r in got2) == [(2, 200)]

    # and the unit-level demonstration that per-file WOULD be wrong:
    snap = MetaStore(tmp_table).snapshot()
    per_file = prune_files(snap.files, [("v", ">", 50)], group_wise=False)
    kept_paths = {f.path for f in per_file}
    assert any(f.path not in kept_paths for f in snap.files), \
        "per-file pruning should drop the low-v generation (the trap)"


def test_to_df_file_filters_match_plain_filter(spark, tmp_table):
    t = _mk(
        spark, tmp_table,
        [(i, i * 10, f"s{i % 7}") for i in range(50)],
        props={"lakesoul.statsColumns": "v,s"}, bucket_num=4,
    )
    want = sorted(
        (r.k, r.v) for r in
        t.to_df().filter((F.col("v") >= 100) & (F.col("v") < 300))
        .select("k", "v").collect()
    )
    got = sorted(
        (r.k, r.v) for r in
        t.to_df(file_filters=[("v", ">=", 100), ("v", "<", 300)])
        .select("k", "v").collect()
    )
    assert got == want and len(got) == 20


def test_point_lookup_with_stats(spark, tmp_table):
    t = _mk(
        spark, tmp_table,
        [(i, i * 10, f"s{i}") for i in range(30)],
        bucket_num=4,
    )
    got = t.point_lookup(k=17).select("k", "v").collect()
    assert [(r.k, r.v) for r in got] == [(17, 170)]
    # a key outside every file's PK range prunes to zero rows
    assert t.point_lookup(k=10_000).count() == 0


def test_prune_keeps_files_without_stats():
    """Old commits (pre-stats) and stat-less columns never prune."""
    from lakesoul_spark.meta.store import FileEntry

    f = FileEntry(
        commit_seq=1, file_seq=0, path="p", partition_desc="-5",
        bucket=0, file_exist_cols=["k", "v"], commit_op="AppendCommit",
    )
    assert prune_files([f], [("v", ">", 100)], group_wise=False) == [f]


def test_group_bounds_drops_cols_missing_in_any_member():
    """Schema evolution: a generation lacking the column (default-fill
    path) makes the column unusable for the whole group."""
    from lakesoul_spark.meta.store import FileEntry

    def fe(path, stats):
        return FileEntry(
            commit_seq=1, file_seq=0, path=path, partition_desc="-5",
            bucket=0, file_exist_cols=["k"], commit_op="MergeCommit",
            stats=stats,
        )

    a = fe("a", {"k": [0, 10], "v": [5, 9]})
    b = fe("b", {"k": [5, 20]})
    assert group_bounds([a, b]) == {"k": [0, 20]}


def test_datasource_pk_in_bucket_set_pruning(spark, tmp_table):
    """IN over a single-column PK prunes to the union of the values'
    buckets (the multi-key point lookup)."""
    _mk(
        spark, tmp_table,
        [(i, i * 10, f"s{i}") for i in range(64)],
        bucket_num=8,
    )
    from pyspark.sql.datasource import In

    from lakesoul_spark.streaming.source import LakeSoulBatchReader, register

    rd_all = LakeSoulBatchReader(tmp_table, {})
    n_all = len(rd_all.partitions())
    rd = LakeSoulBatchReader(tmp_table, {})
    rd.pushFilters([In(("k",), (3, 17))])
    assert rd._bucket_filter is not None and 1 <= len(rd._bucket_filter) <= 2
    assert len(rd.partitions()) < n_all

    register(spark)
    got = (
        spark.read.format("lakesoul").load(tmp_table)
        .filter(F.col("k").isin(3, 17)).select("k", "v").collect()
    )
    assert sorted((r.k, r.v) for r in got) == [(3, 30), (17, 170)]


def test_to_df_file_filters_prune_partitions(spark, tmp_table):
    """file_filters on a range-partition column prune partition descs
    (typed), and results equal the plain filter."""
    df = spark.createDataFrame(
        [(i, i % 12, i * 10) for i in range(120)], "id long, p int, v long"
    )
    write(df, tmp_table, mode="overwrite", range_partitions=["p"])
    t = LakeSoulTable.for_path(spark, tmp_table)
    got = sorted(
        r.id for r in t.to_df(file_filters=[("p", ">=", 10)]).collect()
    )
    assert got == [i for i in range(120) if i % 12 >= 10]


# ------------------------------------------------------------ properties

def _matches(op, value, r):
    return {
        "=": r == value, "<": r < value, "<=": r <= value,
        ">": r > value, ">=": r >= value,
    }[op] if op != "in" else r in value


def _fe(path, group, seq, vals):
    from lakesoul_spark.meta.store import FileEntry

    return FileEntry(
        commit_seq=seq, file_seq=0, path=path, partition_desc="-5",
        bucket=group, file_exist_cols=["k", "v"], commit_op="MergeCommit",
        stats={"v": [min(vals), max(vals)]} if vals else None,
    )


try:
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, deadline=None)
    @given(data=st.data())
    def test_prune_never_drops_a_file_with_a_matching_row(data):
        """Soundness (per-file mode): any file containing a row that
        satisfies the predicate survives pruning, for every op and
        random [min,max]-consistent contents."""
        from lakesoul_spark.io.stats import prune_files

        files, rows_by_path = [], {}
        for i in range(data.draw(st.integers(1, 8))):
            vals = data.draw(
                st.lists(st.integers(-50, 50), min_size=1, max_size=12)
            )
            files.append(_fe(f"f{i}", 0, 1, vals))
            rows_by_path[f"f{i}"] = vals
        op = data.draw(st.sampled_from(["=", "<", "<=", ">", ">=", "in"]))
        value = (
            data.draw(st.lists(st.integers(-60, 60), min_size=1, max_size=5))
            if op == "in" else data.draw(st.integers(-60, 60))
        )
        kept = {
            f.path
            for f in prune_files(files, [("v", op, value)], group_wise=False)
        }
        for f in files:
            if any(_matches(op, value, r) for r in rows_by_path[f.path]):
                assert f.path in kept

    @settings(max_examples=300, deadline=None)
    @given(data=st.data())
    def test_group_prune_never_drops_a_matching_merged_row(data):
        """Soundness (group-wise mode, the MOR contract): if the MERGED
        view of a (partition,bucket) group — newest generation wins per
        key — contains a matching row, the whole group survives."""
        from lakesoul_spark.io.stats import prune_files

        n_groups = data.draw(st.integers(1, 3))
        files, contents = [], {}   # path -> {key: v}
        fid = 0
        for g in range(n_groups):
            for seq in range(1, data.draw(st.integers(2, 4))):
                kv = data.draw(
                    st.dictionaries(
                        st.integers(0, 6), st.integers(-50, 50),
                        min_size=1, max_size=5,
                    )
                )
                files.append(_fe(f"f{fid}", g, seq, list(kv.values())))
                contents[f"f{fid}"] = (g, seq, kv)
                fid += 1
        op = data.draw(st.sampled_from(["=", "<", "<=", ">", ">="]))
        value = data.draw(st.integers(-60, 60))
        kept_groups = {
            f.bucket
            for f in prune_files(files, [("v", op, value)], group_wise=True)
        }
        for g in range(n_groups):
            merged: dict = {}
            for path, (gg, seq, kv) in sorted(
                contents.items(), key=lambda x: x[1][1]
            ):
                if gg == g:
                    merged.update(kv)       # newest seq wins per key
            if any(_matches(op, value, v) for v in merged.values()):
                assert g in kept_groups, (
                    f"group {g} merged={merged} pred=v{op}{value}"
                )
except ImportError:  # pragma: no cover - hypothesis always bundled here
    pass


def test_point_lookup_multi_key(spark, tmp_table):
    t = _mk(
        spark, tmp_table,
        [(i, i * 10, f"s{i}") for i in range(40)],
        bucket_num=8,
    )
    got = sorted(
        (r.k, r.v) for r in t.point_lookup(k=[3, 17, 29]).collect()
    )
    assert got == [(3, 30), (17, 170), (29, 290)]
    # misses prune to zero; single-key path unchanged
    assert t.point_lookup(k=[100_000, 200_000]).count() == 0
    assert [(r.k, r.v) for r in t.point_lookup(k=17).collect()] == [(17, 170)]


def test_point_lookup_multi_key_composite_pk(spark, tmp_table):
    df = spark.createDataFrame(
        [(i % 5, i, i * 10) for i in range(50)], "a long, b long, v long"
    )
    write(df, tmp_table, mode="overwrite",
          hash_partitions=["a", "b"], hash_bucket_num=4)
    t = LakeSoulTable.for_path(spark, tmp_table)
    # exact tuples only — (0,10) and (1,6), NOT the cross product (0,6)/(1,10)
    got = sorted(
        (r.a, r.b, r.v)
        for r in t.point_lookup(a=[0, 1], b=[10, 6]).collect()
    )
    assert got == [(0, 10, 100), (1, 6, 60)]


try:
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=300, deadline=None)
    @given(data=st.data())
    def test_desc_pruning_matches_brute_force_eval(data):
        """Soundness+exactness of the typed partition-desc check: for
        random int/date/string partition values round-tripped through
        the desc string encoding, _desc_matches_cmp agrees with direct
        Python evaluation of the predicate on the original value."""
        import datetime
        import json

        from lakesoul_spark.streaming.source import (
            _desc_matches_cmp,
            _part_casters,
        )

        kind = data.draw(st.sampled_from(["long", "date", "string"]))
        if kind == "long":
            v = data.draw(st.integers(-1000, 1000))
            lit = data.draw(st.integers(-1000, 1000))
            typ = "long"
        elif kind == "date":
            v = datetime.date(2020, 1, 1) + datetime.timedelta(
                days=data.draw(st.integers(0, 1500))
            )
            lit = datetime.date(2020, 1, 1) + datetime.timedelta(
                days=data.draw(st.integers(0, 1500))
            )
            typ = "date"
        else:
            v = data.draw(st.text(
                alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                min_size=1, max_size=8))
            lit = data.draw(st.text(
                alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                min_size=1, max_size=8))
            typ = "string"
        op = data.draw(st.sampled_from(["=", "<", "<=", ">", ">="]))

        class _Info:
            schema_json = json.dumps(
                {"type": "struct",
                 "fields": [{"name": "p", "type": typ,
                             "nullable": True, "metadata": {}}]}
            )

        casters = _part_casters(_Info())
        # the desc stores str(v) — same encoding the writer produces
        got = _desc_matches_cmp({"p": str(v)}, [("p", op, lit)], casters)
        want = {"=": v == lit, "<": v < lit, "<=": v <= lit,
                ">": v > lit, ">=": v >= lit}[op]
        assert got == want, f"{kind} {v!r} {op} {lit!r}"
except ImportError:  # pragma: no cover
    pass


def test_timestamp_stats_tz_normalization():
    """tz-aware footer stats vs naive predicate literals compare in ONE
    domain (ADVICE r3): an '=' at a file's min bound must NOT prune."""
    import datetime

    from lakesoul_spark.io.stats import (
        encode_stat_value,
        normalize_pred_value,
    )

    naive = datetime.datetime(2020, 1, 1, 5, 0, 0)
    aware = naive.replace(tzinfo=datetime.timezone.utc)
    # same instant → same encoding, regardless of awareness
    assert encode_stat_value(aware) == encode_stat_value(naive)
    assert normalize_pred_value(aware) == normalize_pred_value(naive)
    assert encode_stat_value(aware) == normalize_pred_value(naive)
    # non-UTC zones collapse to the UTC instant
    est = naive.replace(tzinfo=datetime.timezone(datetime.timedelta(hours=-5)))
    assert encode_stat_value(est) == encode_stat_value(
        datetime.datetime(2020, 1, 1, 10, 0, 0)
    )

    class _F:
        partition_desc = "-5"
        bucket = 0
        stats = {"ts": [encode_stat_value(aware),
                        encode_stat_value(aware + datetime.timedelta(hours=1))]}

    kept = prune_files([_F()], [("ts", "=", naive)], group_wise=False)
    assert kept, "equal-instant min bound must not prune the file"
    kept = prune_files([_F()], [("ts", "<=", naive)], group_wise=False)
    assert kept


def test_timestamp_stats_skipping_end_to_end(spark, tmp_table):
    """Timestamp stats column: filter at the exact min boundary of a
    file returns its rows (would silently vanish before the tz fix)."""
    import datetime

    base = datetime.datetime(2021, 6, 1, 12, 0, 0)
    rows = [(i, base + datetime.timedelta(minutes=i)) for i in range(20)]
    df = spark.createDataFrame(rows, "k long, ts timestamp")
    write(df, tmp_table, mode="overwrite",
          hash_partitions=["k"], hash_bucket_num=2,
          properties={"lakesoul.statsColumns": "ts"})
    t = LakeSoulTable.for_path(spark, tmp_table)
    snap = MetaStore(tmp_table).snapshot()
    assert any(f.stats and "ts" in f.stats for f in snap.files)
    got = t.to_df(file_filters=[("ts", "=", base)]).collect()
    assert [(r.k, r.ts) for r in got] == [(0, base)]
    got = t.to_df(file_filters=[("ts", "<=", base)]).collect()
    assert [(r.k, r.ts) for r in got] == [(0, base)]


def test_point_lookup_composite_pk_rejects_sets(spark, tmp_table):
    """Sets are unordered — on a composite PK they would pair values
    across columns arbitrarily (ADVICE r3). Single-col PK sets stay OK."""
    df = spark.createDataFrame(
        [(i % 5, i, i * 10) for i in range(50)], "a long, b long, v long"
    )
    write(df, tmp_table, mode="overwrite",
          hash_partitions=["a", "b"], hash_bucket_num=4)
    t = LakeSoulTable.for_path(spark, tmp_table)
    with pytest.raises(ValueError, match="ordered list/tuple"):
        t.point_lookup(a={0, 1}, b=[10, 6])
    # 1-element sets carry no ordering ambiguity
    assert t.point_lookup(a={0}, b={10}).count() == 1
