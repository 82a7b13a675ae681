"""Query packs wired into ``__spark_entry__``: each entry pairs a
Spark DataFrame implementation with an exact DuckDB oracle SQL string.

Determinism contract (what makes value-hash comparison possible):
- per-row arithmetic in DOUBLE (IEEE ops are bit-identical across
  engines), aggregate sums through DECIMAL(18,6) (exact, order-
  insensitive), final cast back to DOUBLE;
- averages/ratios as a single double division of exact sums;
- every hash is md5 (hex string), identical everywhere;
- top-k windows always carry an id tie-break;
- timestamps leave results as formatted strings or years.
"""

from lakesoul_spark.queries import lakehouse, pipeline, tpch


# Module order determines the external correctness-check window (the driver
# verifies a 50-query prefix of this dict).  Round 8 executes the r7
# ROUND-8 NOTE / VERDICT task 1 verbatim: rotate to (lakehouse, tpch,
# pipeline) so the 43 queries whose last driver row is r6 (25 lakehouse
# + 18 tpch) all re-enter the window, defer the ten r7-green relational
# queries to the back, and front everything r8-new/changed:
#   - dedup_index_refresh (NEW) — persisted MinHash-LSH band index:
#     build, incremental refresh, indexed ingest classification;
#   - text_bm25_batch (NEW) — batched BM25 (query table, two scans);
#   - text_bm25_topk (CHANGED) — matched-tf persist (its df branch was
#     silently re-tokenizing the corpus as a third scan);
#   - pipeline_corpus_profile (CHANGED) — skew-safe exact quantiles
#     (value-keyed pre-agg replaces the one-task-per-source window);
#   - streaming_sessionize (CHANGED) — event-time-correct replay
#     closure (sessions held until the watermark passes end + gap);
#   - w_asof_join / w_interval_join (NEW) — temporal joins Spark
#     lacks natively, via operators/joins.py.
# Window: 7 front + 25 lakehouse (incl. r7-green sql_surface) + 18
# tpch = exactly 50; every query ≤1 round stale afterwards.
# ROUND-9 NOTE (window arithmetic, exact): after r8, 50 queries are
# r8-green, 47 are r7-green (the r7 window minus the three re-verified
# in the r8 front), and 12 have NO driver row yet (added late in r8,
# deferred below so they would not displace the 43 planned refreshes;
# all locally hash-verified at 3 SFs via tools/verify_oracle.py):
# streaming_stream_join, lakehouse_rollback, lakehouse_convert,
# lakehouse_bucket_join, lakehouse_upsert_on_join,
# lakehouse_incremental_mv, lakehouse_zorder_skipping,
# lakehouse_star_mv, lakehouse_mv_count_distinct,
# lakehouse_transform_mv, text_corpus_freq_score,
# embedding_class_centroids.
# That is 59 queries needing r9 rows but the window holds 50: FRONT
# the 12 never-verified + the oldest r7-green 38; the 9 r7-green
# queries that don't fit (pick the stablest relational ones — q1/q3/
# q4, w_*, rollup/setop/json already re-verified locally in r8) go
# FIRST in the r10 front (they'll be exactly 2 rounds stale — the
# ledger boundary, never beyond). Rotate _MODULE_ORDER to (pipeline,
# tpch, lakehouse)-ish and defer the r8-green lakehouse/tpch bulk.
_MODULE_ORDER = (lakehouse, tpch, pipeline)

_FRONT = (
    "dedup_index_refresh", "text_bm25_batch", "w_asof_join",
    "w_interval_join", "text_bm25_topk", "pipeline_corpus_profile",
    "streaming_sessionize",
)

_DEFER = (
    "q1_pricing_summary", "q3_unshipped_revenue", "q4_order_priority",
    "q20_heavy_suppliers", "w_top_orders_per_customer",
    "w_running_user_value", "w_sessionization", "rollup_region_customers",
    "setop_repeat_customers", "json_event_props",
    # r8 late additions (see ROUND-9 NOTE): deferred to protect the
    # planned 50-window, locally hash-verified, fronted in r9
    "streaming_stream_join", "lakehouse_rollback", "lakehouse_convert",
    "lakehouse_bucket_join", "lakehouse_upsert_on_join",
    "lakehouse_incremental_mv", "lakehouse_zorder_skipping",
    "lakehouse_star_mv", "lakehouse_mv_count_distinct",
    "lakehouse_transform_mv", "text_corpus_freq_score",
    "embedding_class_centroids",
)  # NOTE: _DEFER tail mirrors the never-verified list above


def _ordered(items: dict) -> dict:
    front = {n: items[n] for n in _FRONT if n in items}
    back = {n: items[n] for n in _DEFER if n in items}
    mid = {n: v for n, v in items.items() if n not in front and n not in back}
    return {**front, **mid, **back}


def all_queries():
    out = {}
    for mod in _MODULE_ORDER:
        out.update(mod.QUERIES)
    return _ordered(out)


def all_oracles():
    """Oracle SQL per query. Values registered as zero-arg callables
    are resolved HERE (not at import): fixture-dependent oracles (the
    ANN ones retrain kmeans over the active fixture) stay lazy, and a
    callable returning None degrades that query to a rows-only check."""
    out = {}
    for mod in _MODULE_ORDER:
        for name, sql in mod.ORACLES.items():
            if callable(sql):
                sql = sql()
            if sql is not None:
                out[name] = sql
    return _ordered(out)
