"""Temporal join operators: as-of join and interval (range) join.

Spark has no native ASOF JOIN (pandas, DuckDB and Flink temporal joins
do); a naive theta-join rewrite is a per-key cross product. These are
the scale-safe Spark-first re-expressions:

- :func:`asof_join` — union-tag + per-key ordered window with
  ``last(ignorenulls)``: ONE shuffle on the join key, no range
  cross-product. The matched right row travels as a single struct, so
  its columns can never mix rows (per-column ``last`` would pick
  different source rows when a field is legitimately null).
- :func:`interval_join` — bucketized equi-join: every point lands in
  exactly ONE time bucket, every interval explodes to the buckets it
  covers (cost ∝ span/width + 1 per interval), the join is a plain
  equi-shuffle on (keys..., bucket) followed by the exact range
  filter. No pair can appear twice (the point's bucket is unique), so
  no dedup pass; neither side needs to fit in memory.

100 TB notes: both operators shuffle once on uniform keys. The as-of
window sorts each key's rows inside one task — a single pathological
key (billions of rows) is the skew unit; shard such keys by coarse
time range upstream and stitch boundaries, as with any ordered-window
operator. ``interval_join`` skew is bounded by the bucket width: pick
width ≈ the typical interval span so hot buckets hold O(points per
span) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on,
    left_ts: str = "ts",
    right_ts: str | None = None,
    direction: str = "backward",
    tolerance=None,
    tie_break: str | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """For every left row, attach the nearest right row of the same
    key at or before (``direction="backward"``) / at or after
    (``"forward"``) its timestamp — nulls when no match (left join
    semantics).

    ``tolerance`` (same unit as the ts columns, which must be numeric
    for it) nulls out matches further than that from the left
    timestamp. ``tie_break`` names a right column used to pick a
    deterministic winner among right rows sharing one timestamp (the
    max wins for backward, min for forward — the "latest" row either
    way). Output: every left column, plus each non-key right column as
    ``{right_prefix}{name}``.
    """
    from pyspark.sql import Window

    on = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lpay_cols = [c for c in left.columns if c not in on]
    rpay_cols = [c for c in right.columns if c not in on]
    lstruct = F.struct(*[F.col(c) for c in lpay_cols])
    rstruct = F.struct(*[F.col(c) for c in rpay_cols])
    ltype = left.select(lstruct.alias("_p")).schema["_p"].dataType.simpleString()
    rtype = right.select(rstruct.alias("_p")).schema["_p"].dataType.simpleString()

    sides = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        lstruct.alias("__lpay"),
        F.lit(None).cast(rtype).alias("__rpay"),
    ).unionByName(right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(ltype).alias("__lpay"),
        rstruct.alias("__rpay"),
    ))
    backward = direction == "backward"
    # right rows must precede left rows at equal ts (both directions
    # are ts-inclusive), hence __is_left ascending after the ts order
    ordering = [
        F.col("__ts").asc() if backward else F.col("__ts").desc(),
        F.col("__is_left").asc(),
    ]
    if tie_break is not None:
        tb = F.col(f"__rpay.{tie_break}")
        ordering.append(tb.asc() if backward else tb.desc())
    w = (
        Window.partitionBy(*on)
        .orderBy(*ordering)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        sides.withColumn("__m", F.last("__rpay", ignorenulls=True).over(w))
        .filter(F.col("__is_left") == 1)
    )
    if tolerance is not None:
        mts = F.col(f"__m.{right_ts}")
        dist = (F.col("__ts") - mts) if backward else (mts - F.col("__ts"))
        out = out.withColumn(
            "__m", F.when(dist <= F.lit(tolerance), F.col("__m"))
        )
    return out.select(
        *on,
        *[F.col(f"__lpay.{c}").alias(c) for c in lpay_cols],
        *[F.col(f"__m.{c}").alias(f"{right_prefix}{c}") for c in rpay_cols],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    on,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket: int,
    max_buckets_per_interval: int = 4096,
) -> DataFrame:
    """Inner-join every point to every interval of the same key that
    contains it (``start_col <= point_ts <= end_col``, inclusive).

    Timestamps must be integral (epoch ns/us/ms); ``bucket`` is the
    bucket width in the same unit. Integer ``div`` keeps the bucket
    math exact where a double division would lose ulps at epoch-nano
    magnitudes. Non-key column names must not collide across the two
    inputs (rename before calling). Output: point columns + interval
    columns of each matching pair.

    ``max_buckets_per_interval`` bounds the per-interval replication
    factor (``(end - start) / bucket``); a degenerate span — an
    open-ended sentinel end, a bucket width in the wrong unit — raises
    at execution naming the offending width (a plan-embedded check, so
    the intervals side is never computed twice) instead of exploding
    the join or tripping Spark's sequence-length cap opaquely.
    """
    on = [on] if isinstance(on, str) else list(on)
    clash = (set(points.columns) & set(intervals.columns)) - set(on)
    if clash:
        raise ValueError(f"column collision between inputs: {sorted(clash)}")
    b = int(bucket)
    cap = int(max_buckets_per_interval)
    p = points.withColumn("__b", F.expr(f"`{point_ts}` div {b}"))
    # span guard, embedded IN the plan (no extra pass over the
    # intervals side — an eager validation aggregate would execute an
    # expensive upstream pipeline twice): a degenerate interval
    # (open-ended sentinel like Long.MAX, or a bucket= in the wrong
    # unit) would otherwise fan one row into millions of join keys or
    # trip Spark's sequence-length cap with an opaque error mid-job.
    # The guarded end expression raises per offending row, naming its
    # span, in the same job that would have exploded.
    span = f"((`{end_col}` div {b}) - (`{start_col}` div {b}) + 1)"
    end_guarded = (
        f"CASE WHEN {span} > {cap} THEN CAST(raise_error(concat("
        f"'an interval spans ', CAST({span} AS STRING), "
        f"' buckets of width {b} (cap {cap}): check for open-ended "
        f"sentinel {end_col} values or a bucket width in the wrong "
        f"time unit; raise max_buckets_per_interval= only if the "
        f"fan-out is intended')) AS BIGINT) "
        f"ELSE `{end_col}` div {b} END"
    )
    i = intervals.withColumn(
        "__b",
        F.explode(F.sequence(
            F.expr(f"`{start_col}` div {b}"),
            F.expr(end_guarded),
        )),
    )
    return (
        p.join(i, on + ["__b"])
        .filter(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) <= F.col(end_col))
        )
        .drop("__b")
    )
