"""functions/local_df.py: job-free LocalRelation frames — value
fidelity across types, zero-job materialization, and the large-input
fallback."""

import datetime as dt
import math

import pytest

from lakesoul_spark.functions.local_df import MAX_LOCAL_ROWS, local_df


def _njobs(spark):
    return spark.sparkContext._jsc.sc().dagScheduler().nextJobId()


def test_local_relation_zero_jobs(spark):
    df = local_df(spark, [(1, "a"), (2, "b")], "id int, s string")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalRelation" in plan
    j0 = _njobs(spark)
    assert sorted(map(tuple, df.collect())) == [(1, "a"), (2, "b")]
    assert _njobs(spark) == j0  # collect without a single job


def test_value_fidelity_all_types(spark):
    rows = [(
        -(2**40), "naïve %20 'q' \"x\\y\" \n+", b"\x00\xff", True,
        1.5, float("nan"), dt.date(2024, 2, 29),
        dt.datetime(2024, 2, 29, 23, 59, 59, 123456),
        [1.0, -2.5, float("inf")], ["a", None, ""], None,
    )]
    schema = ("i long, s string, b binary, f boolean, d double, "
              "nan double, dt date, ts timestamp, ad array<double>, "
              "astr array<string>, ns string")
    got = local_df(spark, rows, schema).collect()[0]
    assert got.i == rows[0][0]
    assert got.s == rows[0][1]
    assert bytes(got.b) == rows[0][2]
    assert got.f is True
    assert got.d == 1.5
    assert math.isnan(got.nan)
    assert got.dt == rows[0][6]
    assert got.ts == rows[0][7]
    assert got.ad[0] == 1.0 and got.ad[1] == -2.5 and math.isinf(got.ad[2])
    assert list(got.astr) == ["a", None, ""]
    assert got.ns is None


def test_double_exact_roundtrip(spark):
    vals = [0.1 + 0.2, 1e-300, -1.7976931348623157e308, 2**53 + 1.0]
    got = local_df(spark, [(v,) for v in vals], "v double").collect()
    assert sorted(r.v for r in got) == sorted(vals)


def test_decimal_and_empty_array(spark):
    from decimal import Decimal

    got = local_df(spark, [(Decimal("12.34"), [])],
                   "d decimal(10,2), a array<string>").collect()[0]
    assert got.d == Decimal("12.34") and list(got.a) == []


def test_large_input_falls_back(spark):
    n = MAX_LOCAL_ROWS + 5
    df = local_df(spark, [(i,) for i in range(n)], "id long")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalRelation" not in plan  # RDD-backed fallback
    assert df.count() == n


def test_empty_rows(spark):
    df = local_df(spark, [], "id long, s string")
    assert df.collect() == [] and df.columns == ["id", "s"]


def test_bool_as_int_and_aware_timestamp(spark):
    """A Python bool for an integral column must not render the SQL
    token `True`; a tz-aware datetime renders as the same UTC instant
    (session TZ is pinned UTC)."""
    aware = dt.datetime(2024, 6, 1, 12, 0, 0,
                        tzinfo=dt.timezone(dt.timedelta(hours=2)))
    got = local_df(spark, [(True, 7, aware)],
                   "b int, i long, ts timestamp").collect()[0]
    assert got.b == 1 and got.i == 7
    assert got.ts == dt.datetime(2024, 6, 1, 10, 0, 0)


def test_numpy_values_and_scalar_cap(spark):
    """numpy scalars/arrays render fine, and numpy arrays count
    element-wise toward the parser-cost cap (fallback engages)."""
    np = pytest.importorskip("numpy")
    got = local_df(
        spark, [(np.int64(5), np.float64(1.5), np.array([1.0, 2.0]))],
        "i long, d double, a array<double>",
    ).collect()[0]
    assert got.i == 5 and got.d == 1.5 and list(got.a) == [1.0, 2.0]
    big = [(np.arange(600, dtype=np.float64),) for _ in range(40)]  # 24k scalars
    df = local_df(spark, [(list(r[0]),) for r in big], "a array<double>")
    assert "LocalRelation" not in \
        df._jdf.queryExecution().optimizedPlan().toString()


def test_unsupported_type_raises(spark):
    with pytest.raises(ValueError, match="cannot render"):
        local_df(spark, [({"k": 1},)], "m map<string,int>")


def test_file_meta_frame_is_local_relation(spark, tmp_path):
    """The reader's broadcast file-meta frame must stay a LocalRelation
    (zero-job broadcast): an RDD-backed frame here re-adds a full
    scheduler round-trip to EVERY MOR read."""
    from pyspark.sql import functions as F

    from lakesoul_spark.io.reader import _file_meta_df
    from lakesoul_spark.meta.store import MetaStore
    from lakesoul_spark.table import LakeSoulTable, write

    path = str(tmp_path / "t")
    write(spark.range(50).select(F.col("id").alias("k"),
                                 F.col("id").alias("v")),
          path, hash_partitions=["k"], hash_bucket_num=2)
    t = LakeSoulTable.for_path(spark, path)
    snap = MetaStore(path).snapshot()
    meta = _file_meta_df(spark, t.info, snap.files)
    assert "LocalRelation" in \
        meta._jdf.queryExecution().optimizedPlan().toString()


def test_hostile_decimal_and_timestamp_values(spark):
    """r8 (ADVICE): the decimal branch round-trips through
    ``Decimal(str(v))`` and the stringly timestamp fallback travels
    base64 — a quote/paren in a stringly-typed value either renders
    correctly or raises, never breaks (or injects into) the SQL."""
    import decimal

    # hostile decimal strings fail closed
    for bad in ("1); DROP TABLE x; --", "abc'", "(1)"):
        with pytest.raises((ValueError, decimal.InvalidOperation,
                            ArithmeticError)):
            local_df(spark, [(bad,)], "d decimal(10,2)")
    with pytest.raises(ValueError, match="non-finite"):
        local_df(spark, [(decimal.Decimal("Infinity"),)], "d decimal(10,2)")
    # decimal-as-string of a VALID number still renders exactly
    got = local_df(spark, [("12.34",)], "d decimal(10,2)").collect()[0]
    assert str(got.d) == "12.34"
    # stringly timestamp: a valid string parses; a hostile string is a
    # *data* error (ANSI cast failure or NULL), never a broken/injected
    # SQL text
    got = local_df(spark, [("2020-01-01 00:00:00",)], "ts timestamp") \
        .collect()[0]
    assert got.ts is not None
    try:
        bad = local_df(spark, [("evil'); --",)], "ts timestamp").collect()
        assert bad[0].ts is None
    except Exception as e:  # ANSI cast error mentions the VALUE, not a
        # parse failure of the generated statement
        assert "PARSE_SYNTAX_ERROR" not in str(e)


def test_parameterized_char_types(spark):
    """r8 (ADVICE): varchar(n)/char(n) DDL renders through the string
    branch instead of falling through to ValueError (Spark itself only
    enforces char/varchar length at table insertion, not on CAST — the
    values pass through)."""
    got = local_df(spark, [("hello world", "ab")],
                   "v varchar(5), c char(4)").collect()[0]
    assert got.v == "hello world"
    assert got.c == "ab"


def test_numpy_values_survive_fallback(spark):
    """r8 (ADVICE): numpy arrays/scalars are normalized before the
    over-cap createDataFrame fallback, so a numpy-laden frame works on
    BOTH sides of the 16k-scalar cap."""
    np = pytest.importorskip("numpy")
    rows = [(np.int64(i), np.arange(600, dtype=np.float64))
            for i in range(40)]  # 24k scalars → fallback path
    df = local_df(spark, rows, "i long, a array<double>")
    assert "LocalRelation" not in \
        df._jdf.queryExecution().optimizedPlan().toString()
    got = df.orderBy("i").collect()
    assert got[0].i == 0 and list(got[0].a[:3]) == [0.0, 1.0, 2.0]
    assert len(got) == 40
