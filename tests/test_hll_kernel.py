"""functions/hll_kernel — the pure-Python DataSketches HLL union used
by the Spark-free arrow fold — validated BYTE-FOR-BYTE against Spark's
own ``hll_union_agg`` (the library the kernel re-implements ships
inside Spark, so Spark is the ground truth oracle). The sweep crosses
every state-machine boundary: LIST→SET at 8 coupons, SET growth at
3/4 capacity, SET→HLL promotion at 385 (lgK=12), coupon-into-HLL,
HLL×HLL out-of-order merges, and already-OOO inputs."""

import pytest
from pyspark.sql import functions as F

from lakesoul_spark.functions.hll_kernel import union_sketches

_CACHE: dict = {}


def _sk(spark, n, start=0, parts=1):
    key = (n, start, parts)
    if key not in _CACHE:
        df = spark.range(start, start + n)
        df = df.coalesce(1) if parts == 1 else df.repartition(parts)
        _CACHE[key] = bytes(df.agg(F.hll_sketch_agg("id")).collect()[0][0])
    return _CACHE[key]


def _spark_union(spark, sketches):
    """hll_union_agg over a single ordered partition — the reference
    result for the same input order."""
    rows = [(i, bytearray(s)) for i, s in enumerate(sketches)]
    df = (spark.createDataFrame(rows, "idx int, s binary")
          .coalesce(1).sortWithinPartitions("idx"))
    return bytes(df.agg(F.hll_union_agg("s")).collect()[0][0])


def _est(spark, b):
    return (spark.createDataFrame([(bytearray(b),)], "s binary")
            .select(F.hll_sketch_estimate("s")).collect()[0][0])


@pytest.mark.slow
def test_union_byte_exact_across_mode_boundaries(spark):
    cases = [
        [(1, 0, 1), (2, 100, 1)],              # tiny lists
        [(3, 0, 1), (4, 2, 1)],                # overlapping lists
        [(7, 0, 1), (7, 3, 1)],                # list crosses 8 -> set
        [(5, 0, 1), (5, 100, 1)],
        [(24, 0, 1), (1, 500, 1)],             # set at growth boundary
        [(25, 0, 1), (1, 500, 1)],
        [(100, 0, 1), (100, 50, 1)],           # set stays set
        [(200, 0, 1), (200, 150, 1)],          # set growth
        [(300, 0, 1), (84, 300, 1)],           # 384: last pre-promotion
        [(300, 0, 1), (85, 300, 1)],           # 385: exact promotion
        [(300, 0, 1), (86, 300, 1)],           # first post-promotion HIP
        [(300, 0, 1), (300, 200, 1)],          # promotion mid-union
        [(600, 0, 1), (100, 0, 1)],            # hll + subset coupons
        [(100, 0, 1), (600, 0, 1)],            # coupons then hll
        [(100, 90000, 1), (600, 0, 1)],        # new-key coupons then hll
        [(600, 0, 1), (100, 90000, 1)],        # hll then new-key coupons
        [(600, 0, 1), (600, 400, 1)],          # hll x hll (OOO merge)
        [(600, 0, 1), (700, 10000, 1), (50, 30000, 1)],  # merge + coupons
        [(2000, 0, 4), (600, 0, 1)],           # already-OOO input
        [(900, 0, 1)],                          # single hll passthrough
        [(3000, 0, 4)],                          # single OOO passthrough
        [(5000, 0, 4), (4000, 2500, 2)],        # big
        # SATURATED registers (>~35k distinct at lgK=12 leaves no zero
        # register): curMin rises above 0, exercising the byte-6
        # curMin field and the rebuild's min scan — the region a
        # curMin/auxCount offset mixup silently corrupts
        [(120_000, 0, 4), (120_000, 60_000, 4)],
        [(120_000, 0, 4), (500, 0, 1)],
        [(200_000, 0, 4)],
    ]
    for case in cases:
        sketches = [_sk(spark, *c) for c in case]
        assert _spark_union(spark, sketches) == union_sketches(sketches), \
            f"byte mismatch for {case}"


@pytest.mark.slow
def test_pairwise_fold_estimates_equal_one_shot(spark):
    """The arrow fold unions all generations per row in one shot; this
    pins that even chained (pairwise) unions — which may differ in
    coupon hash placement / post-merge HIP bytes — never differ in the
    ESTIMATE, the value every reader consumes."""
    chains = [
        [(120, 0, 1), (120, 60, 1), (120, 120, 1)],
        [(300, 0, 1), (300, 150, 1), (60, 500, 1)],
        [(50, 0, 1), (50, 25, 1), (50, 50, 1), (50, 75, 1)],
        [(600, 0, 1), (600, 300, 1), (40, 10000, 1)],
        [(2000, 0, 4), (100, 0, 1), (700, 5000, 1)],
    ]
    for case in chains:
        sketches = [_sk(spark, *c) for c in case]
        one = union_sketches(sketches)
        pair = sketches[0]
        for nxt in sketches[1:]:
            pair = union_sketches((pair, nxt))
        assert _est(spark, pair) == _est(spark, one) \
            == _est(spark, _spark_union(spark, sketches))


def test_union_null_and_refusal_semantics(spark):
    a = _sk(spark, 10)
    assert union_sketches([None, a, None]) == union_sketches([a])
    assert union_sketches([None, None]) is None
    assert union_sketches([]) is None
    # compact images (datasketches-python default) refuse loudly
    compact = bytearray(a)
    compact[5] |= 8
    with pytest.raises(ValueError, match="compact"):
        union_sketches([bytes(compact)])
    # lgK mismatch refuses rather than silently downsampling
    other = bytearray(a)
    other[3] = 11
    with pytest.raises(ValueError, match="lgK"):
        union_sketches([a, bytes(other)])
    # non-HLL bytes refuse
    with pytest.raises(ValueError, match="DataSketches"):
        union_sketches([b"\x00" * 16])

def test_estimate_spark_free(spark):
    """kernel.estimate(): exact vs Spark in EVERY regime — coupon
    modes round to the same long, in-order HLL is the same HIP
    accumulator, and OOO merges go through the same composite
    estimator (bias-correction tables extracted from the bundled
    DataSketches jar, hll_tables.py)."""
    from lakesoul_spark.functions.hll_kernel import estimate

    assert estimate(None) == 0.0
    for n in (1, 7, 8, 100, 384):
        b = _sk(spark, n)
        assert abs(estimate(b) - _est(spark, b)) < 1e-3, n
    for n in (385, 500, 900, 20000):
        b = _sk(spark, n, parts=1)
        # HIP path is exact: Spark's hll_sketch_estimate returns the
        # ROUNDED long of the same accumulator this returns raw
        assert round(estimate(b)) == _est(spark, b), n
    for case in ([(600, 0, 1), (600, 400, 1)],
                 [(2000, 0, 4), (5000, 2500, 4)],
                 [(120_000, 0, 4), (120_000, 60_000, 4)]):
        b = union_sketches([_sk(spark, *c) for c in case])
        s = _est(spark, b)
        # the composite estimator is a pure function of the register
        # array, so kernel and Spark agree on the identical image
        assert round(estimate(b)) == s, (case, estimate(b), s)


def test_composite_estimate_exact_vs_spark_all_regimes(spark):
    """VERDICT r10 task 5: round(estimate(u)) == hll_sketch_estimate(u)
    over MERGED (out-of-order) sketches spanning 1k..200k distinct —
    the crossover (linear-counting vs interpolated), the interpolation
    mid-range, and the raw-scaled upper tail beyond the table."""
    from pyspark.sql import functions as F

    from lakesoul_spark.functions.hll_kernel import _parse, estimate

    for n in (1_000, 2_000, 5_000, 12_000, 40_000, 90_000, 200_000):
        df = spark.range(n).withColumn("g", F.col("id") % 2)
        row = (
            df.groupBy("g")
            .agg(F.hll_sketch_agg(F.col("id").cast("string")).alias("s"))
            .agg(F.hll_union_agg("s").alias("u"))
            .select(F.hll_sketch_estimate("u").alias("e"), "u")
            .collect()[0]
        )
        img = bytes(row["u"])
        assert _parse(img).ooo, n  # HLL x HLL merge must be OOO
        assert round(estimate(img)) == row["e"], n


@pytest.mark.slow
def test_union_byte_exact_random_domains(spark):
    """Seeded fuzz over non-integer value domains (strings, doubles,
    negative ints — different hash bit distributions than range()) and
    random split/overlap/order shapes: kernel union stays byte-exact
    vs Spark's."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(0xC0FFEE)

    def sk_expr(n, seed, kind):
        df = spark.range(n).coalesce(1)
        if kind == "str":
            col = F.concat(F.lit(f"s{seed}-"), F.col("id").cast("string"))
        elif kind == "dbl":
            # hll_sketch_agg takes int/bigint/string/binary only —
            # hash the double's string form for a non-integer domain
            col = ((F.col("id") * 1.618 + seed).cast("double")
                   .cast("string"))
        else:
            col = (F.col("id") * 37 - seed * 1000).cast("long")
        return bytes(df.agg(F.hll_sketch_agg(col)).collect()[0][0])

    for case_i in range(12):
        k = rng.randint(2, 4)
        sketches = []
        for _ in range(k):
            kind = rng.choice(["str", "dbl", "neg"])
            n = rng.choice([4, 30, 200, 384, 385, 500, 1500])
            sketches.append(sk_expr(n, rng.randint(0, 5), kind))
        assert _spark_union(spark, sketches) == union_sketches(sketches), \
            f"case {case_i}"
