"""Vectorized murmur3 (functions/spark_hash_np) — bit-exactness vs the
scalar implementation, null-PK rejection, and the arrow-writer
throughput floor the vectorization exists for."""

import datetime as dt
import os
import random
import time

import numpy as np
import pyarrow as pa
import pytest

from lakesoul_spark.functions.spark_hash import bucket_of, hash_value
from lakesoul_spark.functions.spark_hash_np import (
    bucket_array,
    hash_column_np,
)

_COLS = [
    ("i", "int"), ("l", "bigint"), ("s", "string"), ("d", "date"),
    ("t", "timestamp"), ("b", "boolean"), ("y", "binary"),
]


def _fixture(n=3000, seed=7) -> pa.Table:
    rng = random.Random(seed)
    return pa.table({
        "i": pa.array([rng.randint(-2**31, 2**31 - 1) for _ in range(n)],
                      pa.int32()),
        "l": pa.array([rng.randint(-2**63, 2**63 - 1) for _ in range(n)],
                      pa.int64()),
        "s": pa.array(["".join(chr(rng.randint(32, 0x2FF))
                               for _ in range(rng.randint(0, 23)))
                       for _ in range(n)]),
        "d": pa.array([dt.date(1970, 1, 1)
                       + dt.timedelta(days=rng.randint(-20000, 20000))
                       for _ in range(n)], pa.date32()),
        "t": pa.array([dt.datetime(2020, 1, 1)
                       + dt.timedelta(seconds=rng.randint(0, 10**8),
                                      microseconds=rng.randint(0, 999999))
                       for _ in range(n)], pa.timestamp("us")),
        "b": pa.array([rng.random() < 0.5 for _ in range(n)]),
        "y": pa.array([bytes(rng.randint(0, 255)
                             for _ in range(rng.randint(0, 17)))
                       for _ in range(n)], pa.binary()),
    })


def test_hash_np_matches_scalar_per_type():
    tbl = _fixture()
    for c, t in _COLS:
        seeds = np.full(tbl.num_rows, 42, np.uint32)
        got = hash_column_np(tbl[c], t, seeds).view(np.int32)
        exp = np.array([hash_value(v, t, 42) for v in tbl[c].to_pylist()],
                       np.int32)
        assert (got == exp).all(), c


def test_bucket_array_matches_scalar_chain():
    tbl = _fixture()
    pk = [c for c, _ in _COLS]
    tps = [t for _, t in _COLS]
    got = bucket_array(tbl, pk, tps, 16)
    exp = np.array([bucket_of([r[c] for c in pk], tps, 16)
                    for r in tbl.to_pylist()])
    assert (got == exp).all()


def test_hash_np_sliced_offset_columns():
    """arrow slices carry a nonzero buffer offset — the buffer views
    must honor it."""
    tbl = _fixture()
    sl = tbl.slice(1234, 777)
    got = hash_column_np(sl["s"], "string",
                         np.full(777, 42, np.uint32)).view(np.int32)
    exp = np.array([hash_value(v, "string", 42)
                    for v in sl["s"].to_pylist()], np.int32)
    assert (got == exp).all()


@pytest.mark.parametrize("bad_type,value,arrow_arr", [
    ("array<int>", [1], lambda: pa.array([[1]], pa.list_(pa.int32()))),
    ("map<string,int>", {"a": 1},
     lambda: pa.array([[("a", 1)]], pa.map_(pa.string(), pa.int32()))),
])
def test_pk_type_rejection_parity(spark, tmp_path, bad_type, value, arrow_arr):
    """Every PK-type gate — CREATE (shared by the Spark writer, SQL
    DDL, and write_arrow-target tables), the scalar bucket hash
    (point-lookup pruning), and the vectorized arrow hash — rejects
    the identical type set with the same 'unsupported PK type' error;
    no path can accept a table another path can't bucket."""
    from lakesoul_spark.table import create_table

    with pytest.raises(ValueError, match="unsupported PK type"):
        create_table(spark, str(tmp_path / "t"), f"pk {bad_type}, v int",
                     hash_partitions=["pk"])
    with pytest.raises(ValueError, match="unsupported PK type"):
        hash_value(value, bad_type)
    with pytest.raises(ValueError, match="unsupported PK type"):
        hash_column_np(arrow_arr(), bad_type, np.full(1, 42, np.uint32))


def test_float_double_decimal_hash_matches_spark(spark):
    """r8 (ADVICE): float/double/decimal PKs hash — the reference's
    hash covers Float32/Float64/Decimal128/256
    (``rust/lakesoul-io/src/utils/hash/mod.rs`` downcast_primitive_array)
    — and the scalar encodings are bit-exact vs ``F.hash``: float as
    int-bits (-0.0 normalized, NaN canonical 0x7FC00000), double as
    long-bits, decimal as unscaled long (precision ≤ 18) or BigInteger
    two's-complement bytes (> 18)."""
    from decimal import Decimal

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from lakesoul_spark.functions.spark_hash import (
        hash_decimal, hash_double, hash_float,
    )

    floats = [0.0, -0.0, 1.5, -1.5, 3.4e38, 1e-40, float("nan"),
              float("inf"), float("-inf"), 123.456]
    doubles = list(floats) + [1e308, -2.2250738585072014e-308]
    ds = [Decimal("0"), Decimal("1.23"), Decimal("-99999999.999999"),
          Decimal("123456789012.345678"), Decimal("-0.000001")]
    db = [Decimal("0"), Decimal("12345678901234567890123.456789"),
          Decimal("-98765432109876543210987.654321"), Decimal("0.000001"),
          Decimal("99999999999999999999999999999999.999999")]
    n = len(doubles)
    pad = lambda xs: xs + [None] * (n - len(xs))  # noqa: E731
    df = spark.createDataFrame(
        list(zip(pad(floats), doubles, pad(ds), pad(db))),
        T.StructType([
            T.StructField("f", T.FloatType()),
            T.StructField("d", T.DoubleType()),
            T.StructField("ds", T.DecimalType(18, 6)),
            T.StructField("db", T.DecimalType(38, 6)),
        ]))
    for r in df.select(
            "f", "d", "ds", "db",
            F.hash("f").alias("hf"), F.hash("d").alias("hd"),
            F.hash("ds").alias("hds"), F.hash("db").alias("hdb")).collect():
        if r["f"] is not None:
            assert hash_float(r["f"], 42) == r["hf"], r
        assert hash_double(r["d"], 42) == r["hd"], r
        if r["ds"] is not None:
            assert hash_decimal(r["ds"], "decimal(18,6)", 42) == r["hds"], r
        if r["db"] is not None:
            assert hash_decimal(r["db"], "decimal(38,6)", 42) == r["hdb"], r


def test_float_double_decimal_hash_np_matches_scalar():
    """Vectorized twin bit-exact vs scalar for the r8 types, including
    sliced (nonzero-offset) decimal128 buffers."""
    from decimal import Decimal

    rng = random.Random(3)
    floats = [0.0, -0.0, float("nan"), float("inf"), float("-inf")] \
        + [rng.uniform(-1e30, 1e30) for _ in range(400)]
    doubles = list(floats) + [rng.uniform(-1e300, 1e300) for _ in range(400)]
    ds = [Decimal(rng.randint(-10**17, 10**17)).scaleb(-6)
          for _ in range(400)]
    db = [Decimal(rng.randint(-10**31, 10**31)).scaleb(-6)
          for _ in range(400)] + [Decimal(0)]
    for col, t in [
        (pa.array(floats, pa.float32()), "float"),
        (pa.array(doubles, pa.float64()), "double"),
        (pa.array(ds, pa.decimal128(18, 6)), "decimal(18,6)"),
        (pa.array(db, pa.decimal128(38, 6)), "decimal(38,6)"),
    ]:
        seeds = np.full(len(col), 42, np.uint32)
        got = hash_column_np(col, t, seeds).view(np.int32)
        exp = np.array([hash_value(v, t, 42) for v in col.to_pylist()],
                       np.int32)
        assert (got == exp).all(), t
        got2 = hash_column_np(col.slice(7, 100), t,
                              seeds[:100]).view(np.int32)
        assert (got2 == exp[7:107]).all(), ("slice", t)


def test_double_pk_table_cross_writer(spark, tmp_path):
    """End-to-end with a double PK (newly allowed): both writers land
    rows in identical buckets and point-lookup pruning agrees."""
    from lakesoul_spark.arrow.writer import write_arrow
    from lakesoul_spark.table import LakeSoulTable, write

    rng = random.Random(5)
    rows = [(rng.uniform(-1e6, 1e6), i) for i in range(80)] + [(0.0, 900)]
    df = spark.createDataFrame(rows, "pk double, v int")
    p_spark, p_arrow = str(tmp_path / "vs"), str(tmp_path / "va")
    write(df, p_spark, hash_partitions=["pk"], hash_bucket_num=4)
    write(df.limit(0), p_arrow, hash_partitions=["pk"], hash_bucket_num=4)
    wrote = write_arrow(p_arrow, pa.table({
        "pk": pa.array([r[0] for r in rows], pa.float64()),
        "v": pa.array([r[1] for r in rows], pa.int32()),
    }))
    assert wrote == len(rows)
    ta = LakeSoulTable.for_path(spark, p_arrow)
    ts = LakeSoulTable.for_path(spark, p_spark)
    assert sorted(map(tuple, ta.to_df().collect())) == \
        sorted(map(tuple, ts.to_df().collect())) == sorted(rows)
    probe = rows[3][0]
    assert [tuple(r) for r in ta.point_lookup(pk=probe).collect()] == \
        [tuple(r) for r in ts.point_lookup(pk=probe).collect()] == \
        [(probe, 3)]


def test_bucket_array_rejects_null_pk():
    tbl = pa.table({"id": pa.array([1, None, 3], pa.int64())})
    with pytest.raises(ValueError, match="contains nulls"):
        bucket_array(tbl, ["id"], ["bigint"], 4)


def test_write_arrow_million_row_throughput(spark, tmp_path):
    """The reason write_arrow is vectorized (reference native writer
    ``rust/lakesoul-io/src/writer/async_writer/sort_writer.rs``): a
    1M-row ingest must sustain a rate the per-row-Python path could
    never reach (~6k rows/s measured before the rewrite; the floor
    below is 15x that), and the layout must stay Spark-readable with
    last-wins dedup intact."""
    from lakesoul_spark.arrow.writer import write_arrow
    from lakesoul_spark.table import LakeSoulTable, write

    n = 1_000_000
    rng = np.random.default_rng(42)
    ids = rng.integers(0, n, n)  # dups → exercises the dedup path
    batch = pa.table({
        "id": pa.array(ids, pa.int64()),
        "s": pa.array(np.char.add("k", ids.astype(str))),
        "v": pa.array(np.arange(n), pa.int64()),
    })
    path = str(tmp_path / "big")
    write(spark.createDataFrame([(int(-1), "seed", int(-1))],
                                "id long, s string, v long"),
          path, hash_partitions=["id"], hash_bucket_num=16)

    t0 = time.monotonic()
    wrote = write_arrow(path, batch)
    elapsed = time.monotonic() - t0
    uniq = len(np.unique(ids))
    assert wrote == uniq
    rate = n / elapsed
    # wall-clock floors are machine-dependent: enforce only when asked
    # (LAKESOUL_PERF_ASSERT=1), otherwise record the rate without
    # failing a loaded CI box on a correctness-unrelated number
    if os.environ.get("LAKESOUL_PERF_ASSERT") == "1":
        assert rate > 90_000, f"write_arrow ingest {rate:,.0f} rows/s"
    else:
        print(f"write_arrow ingest rate: {rate:,.0f} rows/s (floor not "
              "enforced; set LAKESOUL_PERF_ASSERT=1 to enforce)")

    # spot-check layout + last-wins through the Spark MOR view
    tb = LakeSoulTable.for_path(spark, path)
    assert tb.to_df().count() == uniq + 1
    last_v = {}
    for i, v in zip(ids.tolist(), range(n)):
        last_v[i] = v
    probe = int(ids[0])
    row = tb.point_lookup(id=probe).collect()
    assert [tuple(r) for r in row] == [(probe, f"k{probe}", last_v[probe])]


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_cross_writer_layout_equivalence(spark, tmp_path, seed):
    """The layout contract, fuzzed: the SAME rows written through the
    Spark writer and through write_arrow must produce (a) identical
    MOR views, (b) identical per-bucket sorted row sequences in the
    physical files, and (c) identical point-lookup pruning — across
    random ids (negative/large), unicode strings, null value columns,
    and a random bucket count."""
    import random

    import duckdb

    from lakesoul_spark.arrow.writer import write_arrow
    from lakesoul_spark.table import LakeSoulTable, write

    rng = random.Random(seed)
    n_bucket = rng.choice([1, 3, 8])
    rows = []
    used = set()
    for _ in range(rng.randint(50, 150)):
        i = rng.randint(-(2**40), 2**40)
        if i in used:
            continue
        used.add(i)
        s = ("".join(chr(rng.randint(32, 0x24F)) for _ in range(rng.randint(0, 12)))
             if rng.random() > 0.1 else None)
        v = rng.randint(-1000, 1000) if rng.random() > 0.1 else None
        rows.append((i, s, v))

    schema = "id long, s string, v int"
    p_spark = str(tmp_path / "via_spark")
    p_arrow = str(tmp_path / "via_arrow")
    df = spark.createDataFrame(rows, schema)
    write(df, p_spark, mode="overwrite", hash_partitions=["id"],
          hash_bucket_num=n_bucket)
    # arrow side: an empty table with the identical schema/spec, all
    # rows arriving through write_arrow
    write(df.limit(0), p_arrow, mode="overwrite", hash_partitions=["id"],
          hash_bucket_num=n_bucket)
    ids = pa.array([r[0] for r in rows], pa.int64())
    ss = pa.array([r[1] for r in rows], pa.string())
    vs = pa.array([r[2] for r in rows], pa.int32())
    wrote = write_arrow(p_arrow, pa.table({"id": ids, "s": ss, "v": vs}))
    assert wrote == len(rows)

    ta = LakeSoulTable.for_path(spark, p_arrow)
    ts = LakeSoulTable.for_path(spark, p_spark)
    assert sorted(map(tuple, ta.to_df().collect())) == \
        sorted(map(tuple, ts.to_df().collect()))

    # physical layout: same bucket dirs, same PK-sorted sequences
    con = duckdb.connect()

    def bucket_rows(root):
        import glob
        out = {}
        for f in glob.glob(f"{root}/data/*/__bucket=*/*.parquet"):
            b = int(f.split("__bucket=")[1].split("/")[0])
            got = con.execute(
                f"SELECT id, s, v FROM read_parquet('{f}') ORDER BY id"
            ).fetchall()
            out.setdefault(b, []).extend(got)
        return out

    ra, rs = bucket_rows(p_arrow), bucket_rows(p_spark)
    assert set(ra) == set(rs)
    for b in ra:
        assert ra[b] == rs[b], f"bucket {b} differs"

    # point lookup prunes to the same single bucket on both tables
    probe = rows[0][0]
    assert [tuple(r) for r in ta.point_lookup(id=probe).collect()] == \
        [tuple(r) for r in ts.point_lookup(id=probe).collect()]


@pytest.mark.parametrize("seed", [21, 22])
def test_cross_writer_equivalence_range_and_composite_pk(
        spark, tmp_path, seed):
    """Cross-writer fuzz, extended to the layout dimensions the basic
    round skips: a RANGE partition column (incl. values needing the
    hive escaping and the null sentinel) and a COMPOSITE (string, int)
    primary key — same MOR view, same per-(partition, bucket) sorted
    file sequences from both writers."""
    import glob
    import random

    import duckdb

    from lakesoul_spark.arrow.writer import write_arrow
    from lakesoul_spark.table import LakeSoulTable, write

    rng = random.Random(seed)
    regions = ["us-east 1", "eu/west", "ap", None]  # space, slash, null
    rows = []
    used = set()
    for _ in range(rng.randint(60, 120)):
        k1 = "".join(chr(rng.randint(97, 0x1F0)) for _ in range(rng.randint(1, 8)))
        k2 = rng.randint(-10**6, 10**6)
        if (k1, k2) in used:
            continue
        used.add((k1, k2))
        rows.append((k1, k2, rng.choice(regions), rng.random()))

    schema = "k1 string, k2 int, region string, v double"
    p_spark = str(tmp_path / "vs")
    p_arrow = str(tmp_path / "va")
    df = spark.createDataFrame(rows, schema)
    kw = dict(hash_partitions=["k1", "k2"], range_partitions=["region"],
              hash_bucket_num=3)
    write(df, p_spark, mode="overwrite", **kw)
    write(df.limit(0), p_arrow, mode="overwrite", **kw)
    wrote = write_arrow(p_arrow, pa.table({
        "k1": pa.array([r[0] for r in rows]),
        "k2": pa.array([r[1] for r in rows], pa.int32()),
        "region": pa.array([r[2] for r in rows]),
        "v": pa.array([r[3] for r in rows], pa.float64()),
    }))
    assert wrote == len(rows)

    ta = LakeSoulTable.for_path(spark, p_arrow)
    ts = LakeSoulTable.for_path(spark, p_spark)
    got_a = sorted(map(tuple, ta.to_df().collect()))
    got_s = sorted(map(tuple, ts.to_df().collect()))
    # compare against the INPUT, not just each other: the r6 reader
    # bug (URI-encoded _metadata.file_path vs raw metadata paths)
    # dropped special-char partitions from BOTH sides equally, so a
    # writers-agree check alone cannot catch silent row loss
    assert got_a == got_s == sorted(rows)

    con = duckdb.connect()

    def layout(root):
        out = {}
        for f in glob.glob(f"{root}/data/*/region=*/__bucket=*/*.parquet"):
            part = f.split("/region=")[1].split("/")[0]
            b = int(f.split("__bucket=")[1].split("/")[0])
            got = con.execute(
                f"SELECT k1, k2, v FROM read_parquet('{f}') ORDER BY k1, k2"
            ).fetchall()
            out.setdefault((part, b), []).extend(got)
        return out

    la, ls_ = layout(p_arrow), layout(p_spark)
    assert set(la) == set(ls_)
    for key in la:
        assert la[key] == ls_[key], f"partition/bucket {key} differs"

    # metadata partition descs normalize identically (escaping + null
    # sentinel)
    from lakesoul_spark.meta.store import MetaStore
    da = {f.partition_desc for f in MetaStore(p_arrow).snapshot().files}
    ds = {f.partition_desc for f in MetaStore(p_spark).snapshot().files}
    assert da == ds
