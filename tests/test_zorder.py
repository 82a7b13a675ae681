"""Z-order clustering (operators/zorder.py + LakeSoulTable.optimize_zorder):
row preservation, multi-column stats skipping, guards."""

import random

import pytest
from pyspark.sql import Row, functions as F

from lakesoul_spark.io.stats import prune_files
from lakesoul_spark.table import LakeSoulTable, write
from tests.conftest import SF_DIR


def _events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def test_zorder_preserves_rows_and_skips_on_both_columns(spark, tmp_path):
    path = str(tmp_path / "t")
    write(_events(spark), path, mode="overwrite")
    t = LakeSoulTable.for_path(spark, path)
    before = sorted(map(tuple, t.to_df().collect()))
    r = t.optimize_zorder(["user_id", "value"], target_files=16)
    assert r["files_out"] == 16
    t = LakeSoulTable.for_path(spark, path)
    assert sorted(map(tuple, t.to_df().collect())) == before
    files = t.store.snapshot().files
    assert len(files) == 16
    # every clustered column prunes alone — the multi-dimensional win
    for preds in ([("user_id", "=", 7)], [("value", ">=", 300.0)]):
        kept = prune_files(files, preds, group_wise=False)
        assert len(kept) <= len(files) // 2, (preds, len(kept))
    # and the pruned read equals the full filter
    preds = [("user_id", "=", 7), ("value", ">=", 100.0)]
    got = sorted(map(tuple, t.to_df(file_filters=preds).collect()))
    exp = sorted(map(tuple, t.to_df()
                     .filter("user_id = 7 AND value >= 100.0").collect()))
    assert got == exp


def test_zorder_fuzz_pruned_reads_match(spark, tmp_path):
    rng = random.Random(8)
    rows = [
        Row(a=rng.randint(0, 999), b=rng.random() * 1000.0,
            c=rng.choice("xyz"))
        for _ in range(4000)
    ]
    path = str(tmp_path / "t")
    write(spark.createDataFrame(rows), path, mode="overwrite")
    t = LakeSoulTable.for_path(spark, path)
    t.optimize_zorder(["a", "b"], target_files=8, bits=5)
    t = LakeSoulTable.for_path(spark, path)
    for _ in range(6):
        lo_a, lo_b = rng.randint(0, 999), rng.random() * 1000.0
        preds = [("a", ">=", lo_a), ("b", "<", lo_b)]
        got = t.to_df(file_filters=preds).count()
        exp = t.to_df().filter(f"a >= {lo_a} AND b < {lo_b}").count()
        assert got == exp, preds


def test_zorder_respects_range_partitions(spark, tmp_path):
    ev = _events(spark).withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    path = str(tmp_path / "t")
    write(ev, path, mode="overwrite", range_partitions=["day"])
    t = LakeSoulTable.for_path(spark, path)
    before = sorted(map(tuple, t.to_df().collect()))
    t.optimize_zorder(["user_id", "value"], target_files=8)
    t = LakeSoulTable.for_path(spark, path)
    assert sorted(map(tuple, t.to_df().collect())) == before
    # files still live under their partition dirs
    descs = {f.partition_desc for f in t.store.snapshot().files}
    assert all(d.startswith("day=") for d in descs) and len(descs) > 1


def test_zorder_partition_scoped_rewrite(spark, tmp_path):
    ev = _events(spark).withColumn(
        "half", (F.col("event_id") % 2).cast("string")
    )
    path = str(tmp_path / "t")
    write(ev, path, mode="overwrite", range_partitions=["half"])
    t = LakeSoulTable.for_path(spark, path)
    before = sorted(map(tuple, t.to_df().collect()))
    r = t.optimize_zorder(["user_id", "value"], target_files=4,
                          partition_desc="half=0")
    assert r["files_in"] >= 1
    t = LakeSoulTable.for_path(spark, path)
    assert sorted(map(tuple, t.to_df().collect())) == before


def test_zorder_guards(spark, tmp_path):
    ev = _events(spark)
    pk_path = str(tmp_path / "pk")
    write(ev, pk_path, mode="overwrite",
          hash_partitions=["event_id"], hash_bucket_num=4)
    with pytest.raises(ValueError, match="non-PK"):
        LakeSoulTable.for_path(spark, pk_path).optimize_zorder(["user_id"])
    path = str(tmp_path / "t")
    write(ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd")),
          path, mode="overwrite", range_partitions=["day"])
    t = LakeSoulTable.for_path(spark, path)
    with pytest.raises(ValueError, match="unknown"):
        t.optimize_zorder(["nope"])
    with pytest.raises(ValueError, match="range-partition"):
        t.optimize_zorder(["day", "value"])
    with pytest.raises(ValueError, match="z-order"):
        t.optimize_zorder(["event_type"])  # string: no range locality


def test_zorder_timestamp_and_constant_columns(spark, tmp_path):
    ev = _events(spark).withColumn("konst", F.lit(5))
    path = str(tmp_path / "t")
    write(ev, path, mode="overwrite")
    t = LakeSoulTable.for_path(spark, path)
    before = t.to_df().count()
    # timestamp bins via unix_micros; the constant column collapses to
    # zero boundaries and contributes nothing (no crash, no skew)
    t.optimize_zorder(["ts", "konst"], target_files=4)
    t = LakeSoulTable.for_path(spark, path)
    assert t.to_df().count() == before
    files = t.store.snapshot().files
    kept = prune_files(
        files, [("ts", ">=", _events(spark).agg(
            F.max("ts")).collect()[0][0])], group_wise=False)
    assert len(kept) <= max(1, len(files) // 2)


def test_zorder_three_columns_with_timestamp(spark, tmp_path):
    """Three-way curve incl. a timestamp: rows preserved, every
    clustered column prunes alone, pruned reads equal plain filters."""
    ev = _events(spark)
    path = str(tmp_path / "t")
    write(ev, path, mode="overwrite")
    t = LakeSoulTable.for_path(spark, path)
    before = sorted(map(tuple, t.to_df().collect()))
    t.optimize_zorder(["user_id", "value", "ts"], target_files=16, bits=4)
    t = LakeSoulTable.for_path(spark, path)
    assert sorted(map(tuple, t.to_df().collect())) == before
    files = t.store.snapshot().files
    preds_list = [[("user_id", "=", 7)], [("value", ">=", 300.0)]]
    for preds in preds_list:
        kept = prune_files(files, preds, group_wise=False)
        assert len(kept) < len(files), preds
        got = t.to_df(file_filters=preds).count()
        exp = t.to_df().filter(
            " AND ".join(f"{c} {op} {v}" for c, op, v in preds)).count()
        assert got == exp


def test_service_declarative_reclustering(spark, tmp_path):
    """A table carrying lakesoul.zorder.columns is re-clustered by the
    maintenance daemon once minCommits new commits accumulate; rows are
    never changed and the trigger resets after each pass."""
    from lakesoul_spark.service import CompactionService

    wh = tmp_path / "wh"
    wh.mkdir()
    ev = _events(spark)
    path = str(wh / "t")
    write(ev, path, mode="overwrite",
          properties={"lakesoul.zorder.columns": "user_id,value",
                      "lakesoul.zorder.minCommits": "3",
                      "lakesoul.zorder.targetFileBytes": "4000"})
    svc = CompactionService(spark, warehouse=str(wh))
    # 1 commit < minCommits: no clustering yet
    r = svc.run_once()
    assert "clustered" not in r.get(path, {})
    slices = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]
    for s in slices[:2]:
        write(s, path, mode="append")
    before = sorted(map(tuple,
        LakeSoulTable.for_path(spark, path).to_df().collect()))
    r = svc.run_once()
    assert r[path]["clustered"]["z_cols"] == ["user_id", "value"]
    t = LakeSoulTable.for_path(spark, path)
    assert sorted(map(tuple, t.to_df().collect())) == before
    # stats now serve the clustered columns: the value tail lives in
    # a thin z-region, so its predicate must drop files
    files = t.store.snapshot().files
    hi = ev.agg(F.max("value")).collect()[0][0]
    kept = prune_files(files, [("value", ">=", hi * 0.9)],
                       group_wise=False)
    assert len(kept) < len(files)
    # trigger reset: the immediate next round does not re-cluster
    r = svc.run_once()
    assert "clustered" not in r.get(path, {})


def test_zorder_width_guard_and_nan_binning(spark, tmp_path):
    """(a) A curve whose interleaved width exceeds 63 bits is rejected
    loudly (past 63 the Morton literals overflow BIGINT and Spark's
    non-ANSI CAST would silently NULL the z-value, destroying the
    clustering order). (b) NaN values bin at the curve's ORIGIN with
    the NULLs — Spark's NaN-greater-than-everything ordering must not
    leak them into the top bin."""
    import math

    from lakesoul_spark.operators.zorder import zorder_sql

    rows = [Row(**{f"c{j}": float(i * (j + 1)) for j in range(8)})
            for i in range(200)]
    df = spark.createDataFrame(rows)
    cols8 = [(f"c{j}", "double") for j in range(8)]
    with pytest.raises(ValueError, match="> 63"):
        zorder_sql(df, cols8, bits=12)  # 8 x 12 = 96 interleaved bits
    # 8 cols x 7 bits = 56 <= 63: fine
    assert "element_at" in zorder_sql(df, cols8, bits=7)

    # NaN/NULL rows rank into bin 0 (z-value equal to the minimum row's)
    vals = ([Row(a=float(i), b=float(i)) for i in range(100)]
            + [Row(a=float("nan"), b=None)])
    dfn = spark.createDataFrame(vals)
    z = zorder_sql(dfn, [("a", "double"), ("b", "double")], bits=4)
    got = dfn.selectExpr("a", f"{z} AS z").collect()
    zmin = min(r["z"] for r in got)
    nan_z = [r["z"] for r in got if r["a"] != r["a"]]
    assert nan_z == [zmin]
    top = max(r["z"] for r in got)
    assert nan_z[0] != top
