"""Per-column merge operators for merge-on-read.

Reference semantics: when delta files within a bucket carry the same PK,
the sorted-stream merger collapses the run through a per-column operator
(``rust/lakesoul-io/src/physical_plan/merge/sorted/merge_operator.rs:22-50``;
Scala UDF registration surface ``lakesoul-spark/.../merge/parquet/batch/
merge_operator/MergeOperator.scala:17-85``):

- ``use_last`` (default)         — newest version's value wins
- ``use_last_not_null``          — newest non-null value wins
- ``sum_all``                    — sum of the value across all versions
- ``sum_last``                   — value of the newest version (within a
                                   file PKs are unique — the writer sorts
                                   and per-batch dedups — so the "sum of
                                   the last run" degenerates to the last
                                   value)
- ``joined_all_by_comma`` / ``joined_all_by_semicolon``
                                 — all non-null values oldest→newest,
                                   stringified and delimiter-joined
- ``joined_last_by_comma`` / ``joined_last_by_semicolon``
                                 — newest non-null value, stringified
- ``min_all`` / ``max_all``      — extremum across all versions
                                   (extensions beyond the reference's
                                   family: with ``sum_all`` they make
                                   MOR generations usable as AGGREGATE
                                   PARTIALS — the incremental
                                   materialized-view read path in
                                   ``lakesoul_spark/mv.py``; min/max
                                   are associative so partials compose
                                   under compaction exactly like sums)
- ``hll_union_all``              — Datasketches HLL union across all
                                   versions (binary sketch columns;
                                   union-of-sketches == sketch-of-union,
                                   so distinct-count partials compose
                                   losslessly — mv.py count_distinct)

Spark-first re-expression: instead of a k-way sorted stream merge, the
MOR view groups by PK and evaluates each column's operator as a native
aggregate over the commit-ordered versions — ``max_by`` / ``sum`` /
``array_sort(collect_list(...))`` — so the whole merge stays inside
whole-stage codegen with map-side partial aggregation; no Python UDFs.

A column's value only "exists" in versions whose file physically
contains the column (``file_exist_cols``): the ``has`` expression guards
every operator, which is what makes join-free multi-stream wide-table
assembly work (concurrent writers upserting disjoint column sets).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

MERGE_OP_NAMES = frozenset(
    {
        "use_last",
        "use_last_not_null",
        "sum_all",
        "sum_last",
        "joined_all_by_comma",
        "joined_all_by_semicolon",
        "joined_last_by_comma",
        "joined_last_by_semicolon",
        "min_all",
        "max_all",
        "hll_union_all",
    }
)


# User-defined merge operators (reference MergeOperator.scala:17-85 +
# ExtractMergeOperator.scala:20-47: an arbitrary MergeOperator[T] class
# registered as a named UDF). Spark-first re-expression: the extension
# point is an AGGREGATE-EXPRESSION BUILDER ``(col, ord_, has) -> Column``
# rather than a row-at-a-time class, so custom merges run as codegen'd
# hash aggregates exactly like the builtins. ``ord_`` is the comparable
# version struct (commit_seq, file_seq); ``has`` guards versions whose
# file physically contains the column (file_exist_cols semantics). A
# genuinely imperative merge can still aggregate via collect_list +
# a pandas UDF inside the builder.
_CUSTOM_OPS: dict = {}


def register_merge_operator(name: str, builder) -> None:
    """Register ``builder(col, ord_, has) -> Column`` under ``name`` for
    use anywhere a builtin merge-operator name is accepted."""
    if not callable(builder):
        raise TypeError("merge operator builder must be callable")
    if name in MERGE_OP_NAMES:
        raise ValueError(f"{name!r} is a builtin merge operator")
    _CUSTOM_OPS[name] = builder


def collect_versions(col: Column, ord_: Column, has: Column) -> Column:
    """Helper for custom builders: non-null values oldest→newest as an
    array (the raw material of the reference's MergeOperator.mergeData)."""
    entries = F.collect_list(
        F.when(has & col.isNotNull(), F.struct(ord_.alias("o"), col.alias("v")))
    )
    return F.transform(F.array_sort(entries), lambda x: x["v"])


def _joined_all(col: Column, ord_: Column, has: Column, delim: str) -> Column:
    entries = F.collect_list(
        F.when(
            has & col.isNotNull(),
            F.struct(ord_.alias("o"), col.cast("string").alias("v")),
        )
    )
    return F.array_join(
        F.transform(F.array_sort(entries), lambda x: x["v"]), delim
    )


def merge_agg_expr(op: str, col: Column, ord_: Column, has: Column) -> Column:
    """Aggregate expression implementing merge operator ``op`` for one
    column, over version rows ordered by ``ord_`` (a comparable struct of
    (commit_seq, file_seq)); ``has`` is true when the row's source file
    physically contains the column."""
    if op == "use_last" or op == "sum_last":
        return F.max_by(col, F.when(has, ord_))
    if op == "use_last_not_null":
        return F.max_by(col, F.when(has & col.isNotNull(), ord_))
    if op == "sum_all":
        return F.sum(F.when(has, col))
    if op == "min_all":
        return F.min(F.when(has, col))
    if op == "max_all":
        return F.max(F.when(has, col))
    if op == "hll_union_all":
        return F.hll_union_agg(F.when(has, col))
    if op == "joined_all_by_comma":
        return _joined_all(col, ord_, has, ",")
    if op == "joined_all_by_semicolon":
        return _joined_all(col, ord_, has, ";")
    if op == "joined_last_by_comma" or op == "joined_last_by_semicolon":
        return F.max_by(col.cast("string"), F.when(has & col.isNotNull(), ord_))
    if op in _CUSTOM_OPS:
        return _CUSTOM_OPS[op](col, ord_, has)
    raise ValueError(
        f"unknown merge operator {op!r}; known: "
        f"{sorted(MERGE_OP_NAMES | _CUSTOM_OPS.keys())}"
    )
