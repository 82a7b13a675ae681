"""Z-order (Morton-curve) clustering expression for multi-column file
skipping.

Per-file [min, max] stats (``io/stats.py``) prune perfectly when the
data is sorted by the filtered column — but sorting by one column
scatters every other. Interleaving the bits of several columns' rank
bins puts rows that are close in ALL dimensions into the same files,
so each file covers a small hyper-rectangle and a predicate on ANY of
the clustered columns skips most files. This is the standard lakehouse
OPTIMIZE/ZORDER capability (the reference leans on its PG-side stats
filtering the same way, but ships no multi-dimensional clustering).

Spark-first shape, built for 100 TB:

- per-column QUANTILE bins (one bounded ``approxQuantile`` pass, driver
  memory O(bins)), so skewed distributions still spread across the full
  bin range — equi-width bins would collapse a heavy-tailed column into
  one bin;
- the z-value is ONE compact Column expression: the bin lookup is
  ``size(filter(boundaries, b -> v > b))`` and the bit-interleave is a
  precomputed Morton LOOKUP TABLE indexed by bin (``element_at``), so
  the plan carries two small literal arrays per column instead of a
  bits×columns chain of shift/mask nodes — fully codegen'd, no UDF;
- rows are then range-partitioned and sorted by the z-value
  (``repartitionByRange`` samples boundaries itself), which makes every
  output file AND every parquet row group a contiguous z-range.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame

# column types the curve can bin (order-preserving double projection)
_NUMERIC = ("tinyint", "smallint", "int", "bigint", "float", "double")


def _as_double_sql(col: str, dtype: str) -> str:
    """Order-preserving projection of a column into DOUBLE for binning
    (backtick-escaped; quantile order is all that matters, so lossy
    bigint→double rounding is harmless)."""
    q = f"`{col}`"
    t = dtype.lower()
    if t in _NUMERIC or t.startswith("decimal"):
        return f"CAST({q} AS DOUBLE)"
    if t.startswith("timestamp"):
        # unix_micros rejects TIMESTAMP_NTZ; the cast is a fixed-offset
        # shift in one session timezone, so quantile ORDER is preserved
        return f"CAST(unix_micros(CAST({q} AS TIMESTAMP)) AS DOUBLE)"
    if t == "date":
        return f"CAST(datediff({q}, DATE'1970-01-01') AS DOUBLE)"
    raise ValueError(
        f"cannot z-order by {col!r} of type {dtype!r}: need a numeric, "
        "decimal, date, or timestamp column (strings have no "
        "range-locality to preserve)"
    )


def _fmt(v: float) -> str:
    """SQL literal for a boundary double (repr round-trips exactly)."""
    if v != v:  # NaN never helps as a boundary
        raise ValueError("NaN quantile boundary")
    if v == float("inf"):
        return "CAST('Infinity' AS DOUBLE)"
    if v == float("-inf"):
        return "CAST('-Infinity' AS DOUBLE)"
    return f"CAST({v!r} AS DOUBLE)"


def zorder_sql(
    df: DataFrame,
    cols: list[tuple[str, str]],
    *,
    bits: int = 6,
    relative_error: float = 0.001,
) -> str:
    """Build the z-value SQL expression for ``cols`` (list of
    ``(name, spark_type)``) over ``df``'s distribution.

    One ``approxQuantile`` pass computes every column's ``2^bits - 1``
    bin boundaries together; duplicate boundaries (low-cardinality or
    heavily skewed columns) are collapsed, shrinking that column's bit
    width so the interleave wastes no positions. NULL and NaN rank
    into bin 0 (null comparisons are filtered out of the boundary
    count), so they cluster together at the curve's origin.
    """
    if not cols:
        raise ValueError("need at least one z-order column")
    if not 1 <= bits <= 12:
        raise ValueError("bits must be in [1, 12]")
    ncols = len(cols)
    proj = df.selectExpr(
        *[f"{_as_double_sql(c, t)} AS __z{i}"
          for i, (c, t) in enumerate(cols)]
    )
    nb = (1 << bits) - 1
    probs = [i / (1 << bits) for i in range(1, nb + 1)]
    allb = proj.stat.approxQuantile(
        [f"__z{i}" for i in range(ncols)], probs, relative_error
    )
    binned = []
    for (c, t), raw in zip(cols, allb):
        bounds = sorted({b for b in raw if b == b})  # dedupe, drop NaN
        if not bounds:  # constant/all-null column: contributes nothing
            continue
        width = max(1, math.ceil(math.log2(len(bounds) + 1)))
        binned.append((c, t, bounds, width))
    # MSB-ALIGN the interleave: a low-cardinality column's bin uses
    # fewer bits; left-shift it to the common width so its most
    # significant bit competes at the top of the curve — otherwise the
    # widest column owns every high bit and the narrow columns degrade
    # to a plain sort on the wide one (no skipping on them at all)
    wmax = max((w for *_x, w in binned), default=0)
    # stride over the columns that actually bin (dropped constant/
    # all-null columns waste no interleave positions), and guard the
    # total curve width: the top bit position is wmax*stride - 1, and
    # past 63 the Morton literals overflow BIGINT — Spark would parse
    # them as decimals and the final CAST silently NULLs (non-ANSI),
    # destroying the clustering order with no error.
    stride = len(binned)
    if wmax * stride > 63:
        raise ValueError(
            f"z-order curve too wide: {stride} column(s) x {wmax} bit(s) "
            f"= {wmax * stride} interleaved bits > 63 (BIGINT); lower "
            f"bits= to at most {63 // stride} for {stride} columns"
        )
    terms = []
    for j, (c, t, bounds, width) in enumerate(binned):
        morton = [
            sum(
                ((((v << (wmax - width)) >> i) & 1) << (i * stride + j))
                for i in range(wmax)
            )
            for v in range(len(bounds) + 1)
        ]
        blist = ", ".join(_fmt(b) for b in bounds)
        mlist = ", ".join(str(m) for m in morton)
        # NaN compares greater than every double in Spark SQL, so bare
        # `v > b` would rank NaN into the TOP bin; nanvl maps it to
        # -Infinity (> no boundary -> bin 0, with the NULLs, as the
        # docstring promises). NULL itself stays NULL: `NULL > b` is
        # NULL, filter() drops it, bin 0.
        dcol = f"nanvl({_as_double_sql(c, t)}, CAST('-Infinity' AS DOUBLE))"
        terms.append(
            f"element_at(array({mlist}), "
            f"size(filter(array({blist}), b -> {dcol} > b)) + 1)"
        )
    if not terms:
        return "CAST(0 AS BIGINT)"
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"
