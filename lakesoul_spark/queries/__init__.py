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
# verifies a 50-query prefix of this dict).  Round 10 executes the r9
# ROUND-10 NOTE / VERDICT task 1 verbatim.  Ledger after r9: 50
# queries r9-green, 50 r8-green, 9 r7-green (two rounds stale — the
# boundary).  The window holds 50: FRONT the 9 r7-green first, then
# the 3 NEW r10 oracle queries covering r9-new capability
# (lakehouse_metadata_count → count_fast/min_max_fast/DESCRIBE DETAIL/
# SQL count(*) fast path; lakehouse_clone → deep/shallow/time-travel
# CLONE lifecycle; lakehouse_delete_matching → distributed tombstone
# delete + re-ingest), then the 38 OLDEST r8-green (by first
# appearance in git history).  The 12 youngest r8-green (first
# appearance ≥ commit 1786630149; the 1786630149 tie between
# streaming_sessionize and streaming_stateful_dedup broken by
# deferring the alphabetically-later name) spill to _DEFER.
# ROUND-11 NOTE (window arithmetic, exact): after r10 the pack holds
# 113 queries — 50 r10-green, 50 r9-green, 12 r8-green, and 1 NEVER
# driver-verified (lakehouse_star_mv_repin, added r10-late for the
# r10-new repin_dims capability; locally hash-verified at 3 SFs).
# r11 MUST front the never-verified query first, then the 12 r8-green
# (w_asof_join, w_interval_join, dedup_index_refresh, text_bm25_batch,
# pipeline_corpus_profile, text_bm25_topk, lakehouse_arrow_writer,
# streaming_latest_state, lakehouse_column_ddl,
# lakehouse_multikey_lookup, lakehouse_stats_skipping,
# streaming_stateful_dedup — they hit the 2-round staleness
# boundary; all 13 are the _DEFER tuple below in r11-front order),
# then fill the window with the 37 oldest r9-green; the 13 r9-green
# that don't fit lead the r12 front.  Any NEW r11 oracle queries
# displace the youngest r9-green slots, same rule as this round.
_MODULE_ORDER = (pipeline, tpch, lakehouse)

_FRONT = (
    # --- 9 r7-green at the 2-round staleness boundary (ROUND-10 NOTE)
    "q1_pricing_summary", "q3_unshipped_revenue", "q4_order_priority",
    "w_top_orders_per_customer", "w_running_user_value",
    "w_sessionization", "rollup_region_customers",
    "setop_repeat_customers", "json_event_props",
    # --- 3 NEW r10 queries: driver rows for r9-new capability ---
    "lakehouse_metadata_count", "lakehouse_clone",
    "lakehouse_delete_matching",
    # --- 38 oldest r8-green (the 50 minus the 12 deferred below) ---
    "lakehouse_upsert_mor", "lakehouse_upsert_cow",
    "lakehouse_partial_upsert", "lakehouse_merge_operators",
    "lakehouse_merge_into", "lakehouse_custom_merge_op",
    "lakehouse_cdc_read", "lakehouse_time_travel",
    "lakehouse_incremental", "lakehouse_update_delete",
    "lakehouse_compaction", "lakehouse_leveled_compaction",
    "lakehouse_partition_overwrite", "lakehouse_pk_point_lookup",
    "lakehouse_schema_evolution", "lakehouse_cdc_incremental",
    "lakehouse_sql_surface",
    "streaming_sink_sum", "streaming_tumbling_window",
    "streaming_sessionize",
    "q2_min_cost_supplier", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q7_nation_volume", "q8_market_share",
    "q9_profit_by_nation_year", "q10_returned_items",
    "q11_important_parts", "q12_late_shipments",
    "q13_customer_distribution", "q14_promo_revenue", "q15_top_supplier",
    "q16_part_supplier_variety", "q17_small_quantity_revenue",
    "q18_large_volume_customer", "q19_disjunctive_predicates",
    "q21_waiting_suppliers", "q22_idle_customers",
)

_DEFER = (
    # r11 front order: first the r10-late never-driver-verified query
    # (hash-verified locally at 3 SFs), then the 12 youngest r8-green
    # that spill past the 50-window — exactly 2 rounds stale after
    # r10 (ROUND-11 NOTE above).
    "lakehouse_star_mv_repin",
    "w_asof_join", "w_interval_join", "dedup_index_refresh",
    "text_bm25_batch", "pipeline_corpus_profile", "text_bm25_topk",
    "lakehouse_arrow_writer", "streaming_latest_state",
    "lakehouse_column_ddl", "lakehouse_multikey_lookup",
    "lakehouse_stats_skipping", "streaming_stateful_dedup",
)


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
