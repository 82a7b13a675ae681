"""Temporal join operators: as-of (backward/forward, tolerance,
tie-break) and bucketized interval join."""

import pytest

from lakesoul_spark.operators.joins import asof_join, interval_join


def _df(spark, data, schema):
    return spark.createDataFrame(data, schema)


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_asof_join_backward(spark):
    left = _df(spark, [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 7, "d")],
               "k int, ts long, name string")
    right = _df(spark, [(1, 10, "x", 1), (1, 10, "y", 2), (1, 15, "z", 3),
                        (3, 1, "q", 4)],
                "k int, ts long, rv string, rid long")
    out = asof_join(left, right, on="k", left_ts="ts", tie_break="rid")
    got = _rows(out, "k", "ts", "name", "r_rv", "r_rid")
    assert got == [
        (1, 5, "c", None, None),     # nothing at or before ts=5
        (1, 10, "a", "y", 2),        # ts tie: max rid wins
        (1, 20, "b", "z", 3),
        (2, 7, "d", None, None),     # key absent on the right
    ]


def test_asof_join_forward_and_tolerance(spark):
    left = _df(spark, [(1, 10, "a"), (1, 20, "b"), (1, 5, "c")],
               "k int, ts long, name string")
    right = _df(spark, [(1, 10, "x", 1), (1, 10, "y", 2), (1, 15, "z", 3)],
                "k int, ts long, rv string, rid long")
    out = asof_join(left, right, on="k", left_ts="ts",
                    direction="forward", tie_break="rid")
    got = _rows(out, "ts", "name", "r_rv", "r_rid")
    assert got == [
        (5, "c", "x", 1),            # nearest at/after 5 is ts=10, min rid
        (10, "a", "x", 1),
        (20, "b", None, None),       # nothing at or after 20
    ]
    tol = asof_join(left, right, on="k", left_ts="ts", tolerance=4,
                    tie_break="rid")
    got = _rows(tol, "ts", "name", "r_rid")
    assert got == [
        (5, "c", None),              # no match at or before ts=5
        (10, "a", 2),                # distance 0 <= 4
        (20, "b", None),             # ts=15 match is 5 away > 4 -> nulled
    ]
    with pytest.raises(ValueError):
        asof_join(left, right, on="k", left_ts="ts", direction="sideways")


def test_asof_join_struct_match_is_atomic(spark):
    """A legitimately-null right column must come from the SAME matched
    row, never an older row's non-null value (the per-column last()
    trap the struct packing exists to prevent)."""
    left = _df(spark, [(1, 30, "a")], "k int, ts long, name string")
    right = _df(spark, [(1, 10, "old", 1), (1, 20, None, 2)],
                "k int, ts long, rv string, rid long")
    out = asof_join(left, right, on="k", left_ts="ts", tie_break="rid")
    r = out.collect()[0]
    assert (r["r_rid"], r["r_rv"]) == (2, None)


def test_interval_join_buckets_and_bounds(spark):
    points = _df(spark, [(1, 10), (1, 25), (2, 10)], "k int, p long")
    iv = _df(spark, [(1, 5, 12, 1), (1, 24, 30, 2), (1, 11, 24, 3),
                     (2, 11, 12, 4)],
             "k int, s long, e long, iid int")
    out = interval_join(points, iv, on="k", point_ts="p",
                        start_col="s", end_col="e", bucket=10)
    assert _rows(out, "k", "p", "iid") == [(1, 10, 1), (1, 25, 2)]
    # inclusive bounds on both ends, across a bucket boundary
    edge = interval_join(
        _df(spark, [(1, 24)], "k int, p long"), iv, on="k",
        point_ts="p", start_col="s", end_col="e", bucket=10,
    )
    assert _rows(edge, "p", "iid") == [(24, 2), (24, 3)]
    # each matching pair appears exactly once even when the interval
    # spans many buckets
    wide = interval_join(
        points, _df(spark, [(1, 0, 100, 9)], "k int, s long, e long, iid int"),
        on="k", point_ts="p", start_col="s", end_col="e", bucket=10,
    )
    assert _rows(wide, "p", "iid") == [(10, 9), (25, 9)]
    with pytest.raises(ValueError, match="collision"):
        interval_join(points.withColumnRenamed("p", "s"), iv, on="k",
                      point_ts="s", start_col="s", end_col="e", bucket=10)
