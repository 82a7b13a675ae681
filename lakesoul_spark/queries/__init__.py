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
# verifies a 50-query prefix of this dict).  Round 12 executes the r11
# ROUND-12 NOTE / VERDICT task 1 verbatim.  Ledger after r11: 50
# queries r11-green, 50 r10-green, 15 r9-green (two rounds stale —
# the boundary), 2 never-driver-verified (text_ngram_repetition,
# text_gopher_rules; both locally hash-verified at 3 SFs).  The
# window holds 50: FRONT the 2 never-verified queries first, then the
# 15 r9-green oldest-first, then the 2 NEW r12 oracle queries
# covering r12-new capability (lakehouse_incremental_join_mv →
# delta-maintained JOIN materialized view, ΔA⋈B ∪ A⋈ΔB with PK-upsert
# folding; lakehouse_groupby_sum_fast → partition-GROUP-BY + SUM(col)
# on the zero-job metadata fast path, with an in-query SHOW
# PARTITIONS EXTENDED proof-gate assert), then the 31 OLDEST
# r10-green (by first appearance in git history) — the 2 NEW queries
# displace the 2 youngest of the 33 that would otherwise fit
# (q8_market_share, q11_important_parts), per the standing
# displacement rule.
# ROUND-13 NOTE (window arithmetic, exact): after r12 the pack holds
# 119 queries — 50 r12-green (this window), 50 r11-green, and 19
# r10-green which hit the 2-round staleness boundary (the _DEFER
# tuple below is already the full r13-front order, oldest-first:
# q8_market_share, q11_important_parts, q12_late_shipments,
# q13_customer_distribution, q15_top_supplier,
# q16_part_supplier_variety, q17_small_quantity_revenue,
# lakehouse_cdc_incremental, streaming_tumbling_window,
# lakehouse_custom_merge_op, lakehouse_upsert_cow,
# q21_waiting_suppliers, lakehouse_leveled_compaction,
# lakehouse_merge_into, lakehouse_sql_surface, streaming_sessionize,
# lakehouse_metadata_count, lakehouse_clone,
# lakehouse_delete_matching).  r13 MUST front those 19, then fill the
# window with the 31 oldest r11-green; the 19 r11-green that don't
# fit lead the r14 front.  Any NEW r13 oracle queries displace the
# youngest r11-green slots, same rule as this round.
_MODULE_ORDER = (pipeline, tpch, lakehouse)

_FRONT = (
    # --- the 2 r11-late never-driver-verified queries (ROUND-12 NOTE) ---
    "text_ngram_repetition", "text_gopher_rules",
    # --- 15 r9-green at the 2-round staleness boundary, oldest-first ---
    "ann_l2_topk", "text_tfidf_topk",
    "ann_index_refresh_hot", "streaming_stream_join",
    "lakehouse_bucket_join", "lakehouse_convert", "lakehouse_rollback",
    "lakehouse_upsert_on_join", "lakehouse_incremental_mv",
    "lakehouse_zorder_skipping", "lakehouse_star_mv",
    "lakehouse_mv_count_distinct", "lakehouse_transform_mv",
    "text_corpus_freq_score", "embedding_class_centroids",
    # --- 2 NEW r12 queries: driver rows for r12-new capability ---
    "lakehouse_incremental_join_mv", "lakehouse_groupby_sum_fast",
    # --- 31 oldest r10-green (the 33 minus the 2 displaced) ---
    "q1_pricing_summary", "q3_unshipped_revenue", "q4_order_priority",
    "w_top_orders_per_customer", "w_running_user_value",
    "w_sessionization", "rollup_region_customers",
    "setop_repeat_customers", "json_event_props",
    "lakehouse_upsert_mor", "lakehouse_partial_upsert",
    "lakehouse_merge_operators", "lakehouse_cdc_read",
    "lakehouse_time_travel", "lakehouse_incremental",
    "lakehouse_update_delete", "lakehouse_compaction",
    "lakehouse_partition_overwrite", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q9_profit_by_nation_year",
    "q10_returned_items", "q14_promo_revenue",
    "q18_large_volume_customer", "q19_disjunctive_predicates",
    "q22_idle_customers", "lakehouse_pk_point_lookup",
    "streaming_sink_sum", "lakehouse_schema_evolution",
    "q2_min_cost_supplier", "q7_nation_volume",
)

_DEFER = (
    # r13 front order (ROUND-13 NOTE above): the 19 r10-green that
    # hit the 2-round staleness boundary after r12, oldest-first —
    # the 2 displaced by this round's new queries lead.
    "q8_market_share", "q11_important_parts", "q12_late_shipments",
    "q13_customer_distribution", "q15_top_supplier",
    "q16_part_supplier_variety", "q17_small_quantity_revenue",
    "lakehouse_cdc_incremental", "streaming_tumbling_window",
    "lakehouse_custom_merge_op", "lakehouse_upsert_cow",
    "q21_waiting_suppliers", "lakehouse_leveled_compaction",
    "lakehouse_merge_into", "lakehouse_sql_surface",
    "streaming_sessionize", "lakehouse_metadata_count",
    "lakehouse_clone", "lakehouse_delete_matching",
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
