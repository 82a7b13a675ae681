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


# ------------------------------------------------------ model-based fuzz

def _asof_model(lrows, rrows, direction, tolerance):
    """Brute-force as-of: per left row scan every right row of the key.
    tie_break = rid (unique), so the winner is always deterministic."""
    out = []
    for (k, ts, name) in lrows:
        if direction == "backward":
            cand = [r for r in rrows if r[0] == k and r[1] <= ts]
            # nearest ts, then max rid
            best = max(cand, key=lambda r: (r[1], r[3]), default=None)
            dist = ts - best[1] if best else None
        else:
            cand = [r for r in rrows if r[0] == k and r[1] >= ts]
            # nearest ts, then min rid (the operator's forward contract)
            best = min(cand, key=lambda r: (r[1], r[3]), default=None)
            dist = best[1] - ts if best else None
        if best is not None and tolerance is not None and dist > tolerance:
            best = None
        out.append((k, ts, name,
                    best[2] if best else None, best[3] if best else None))
    return sorted(out, key=lambda t: (t[0], t[1], t[2] or ""))


def test_asof_join_fuzz_vs_model(spark):
    """Seeded random histories (duplicate keys, ts ties on and across
    sides, null payloads, sparse keys) x {backward, forward} x
    {tolerance on/off} match the brute-force per-row model."""
    import random

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        keys = [1, 2, 3, 4]
        lrows = [
            (rng.choice(keys), rng.randrange(0, 40),
             f"L{i}") for i in range(30)
        ]
        rrows = [
            (rng.choice(keys + [9]), rng.randrange(0, 40),
             rng.choice([None, "x", "y"]), i) for i in range(25)
        ]
        left = _df(spark, lrows, "k int, ts long, name string")
        right = _df(spark, rrows, "k int, ts long, rv string, rid long")
        for direction in ("backward", "forward"):
            for tol in (None, 5):
                out = asof_join(left, right, on="k", left_ts="ts",
                                direction=direction, tolerance=tol,
                                tie_break="rid")
                got = sorted(
                    ((r["k"], r["ts"], r["name"], r["r_rv"], r["r_rid"])
                     for r in out.collect()),
                    key=lambda t: (t[0], t[1], t[2] or ""),
                )
                want = _asof_model(lrows, rrows, direction, tol)
                assert got == want, (seed, direction, tol)


def test_interval_join_fuzz_vs_model(spark):
    """Seeded random points/intervals (inverted intervals allowed —
    empty, zero-width, bucket-boundary-straddling) x bucket widths
    match the brute-force nested loop, each pair exactly once."""
    import random

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        keys = [1, 2, 3]
        pts = [(rng.choice(keys), rng.randrange(0, 100)) for _ in range(40)]
        ivs = []
        for i in range(25):
            s = rng.randrange(0, 100)
            e = s + rng.randrange(-3, 30)  # some inverted -> match nothing
            ivs.append((rng.choice(keys), s, e, i))
        want = sorted(
            (k, p, iid)
            for (k, p) in pts
            for (ik, s, e, iid) in ivs
            if ik == k and s <= p <= e
        )
        points = _df(spark, pts, "k int, p long")
        iv = _df(spark, ivs, "k int, s long, e long, iid int")
        for bucket in (1, 7, 10, 64):
            out = interval_join(points, iv, on="k", point_ts="p",
                                start_col="s", end_col="e", bucket=bucket)
            assert _rows(out, "k", "p", "iid") == want, (seed, bucket)


def test_interval_join_span_guard(spark):
    """A degenerate interval (open-ended sentinel end / wrong-unit
    bucket) raises naming the offending span instead of exploding the
    join — the guard is plan-embedded (raise_error in the sequence end
    arg), so the intervals side is never computed twice; an intended
    fan-out passes with a raised cap."""
    points = _df(spark, [(1, 10)], "k int, p long")
    hostile = _df(spark, [(1, 0, 2**62, 7)],
                  "k int, s long, e long, iid int")
    with pytest.raises(Exception, match="buckets of width"):
        interval_join(points, hostile, on="k", point_ts="p",
                      start_col="s", end_col="e", bucket=10).collect()
    wide = _df(spark, [(1, 0, 50_000, 7)],
               "k int, s long, e long, iid int")
    with pytest.raises(Exception, match="5001 buckets"):
        interval_join(points, wide, on="k", point_ts="p",
                      start_col="s", end_col="e", bucket=10).collect()
    out = interval_join(points, wide, on="k", point_ts="p",
                        start_col="s", end_col="e", bucket=10,
                        max_buckets_per_interval=6000)
    assert _rows(out, "p", "iid") == [(10, 7)]
