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
# verifies a 50-query prefix of this dict).  Round 16 executes the r15
# ROUND-16 NOTE / r15-VERDICT task 4 verbatim.  Ledger after r15: 50
# queries r15-green, 50 r14-green, 26 r13-green at the 2-round
# staleness boundary.  The window holds 50: FRONT the 26 stale
# r13-green in the pinned r16 order (the previous round's _DEFER
# tuple, reproduced verbatim below), then fill with the 24 OLDEST
# r14-green (by first appearance in git history, the exact
# enumeration from the ROUND-16 NOTE).  No new oracle queries this
# round (optimization round — the registry still declares all 126).
# ROUND-17 NOTE (window arithmetic, exact): after r16 the pack holds
# 126 queries — 50 r16-green (this window), 50 r15-green (the
# previous _FRONT), and 26 r14-green which hit the 2-round staleness
# boundary (the _DEFER tuple below is already the full r17-front
# order, oldest-first by first git appearance; ties alphabetical).
# r17 MUST front those 26, then fill the window with the 24 OLDEST
# r15-green (by first git appearance, the exact order:
# ann_cosine_topk, ann_ivf_topk, dedup_embedding_cosine, dedup_exact,
# dedup_minhash_lsh, dedup_ngram_jaccard, dedup_simhash,
# multimodal_features, text_fingerprint, text_langid, text_stats,
# lakehouse_schema_evolution, q11_important_parts, q12_late_shipments,
# q13_customer_distribution, q15_top_supplier,
# q16_part_supplier_variety, q17_small_quantity_revenue,
# q20_heavy_suppliers, q2_min_cost_supplier, q7_nation_volume,
# q8_market_share, lakehouse_cdc_incremental,
# streaming_tumbling_window); the 26 r15-green that don't fit
# (dedup_embedding_blocked, lakehouse_custom_merge_op,
# lakehouse_upsert_cow, ann_l2_topk, text_tfidf_topk,
# ann_index_refresh_hot, streaming_stream_join, lakehouse_bucket_join,
# lakehouse_convert, lakehouse_rollback, lakehouse_upsert_on_join,
# lakehouse_incremental_mv, lakehouse_zorder_skipping,
# lakehouse_star_mv, lakehouse_mv_count_distinct,
# lakehouse_transform_mv, text_corpus_freq_score,
# embedding_class_centroids, text_ngram_repetition,
# text_gopher_rules, lakehouse_groupby_sum_fast,
# lakehouse_incremental_join_mv, lakehouse_cdc_mv_rollup,
# lakehouse_mv_delete_cascade, lakehouse_pk_transform_mv,
# lakehouse_mv_exact_distinct) lead the r18 front.  Any NEW r17
# oracle queries displace the youngest r15-green slots, same rule as
# every round.
_MODULE_ORDER = (pipeline, tpch, lakehouse)

_FRONT = (
    # --- 26 r13-green at the 2-round staleness boundary (the pinned
    # ROUND-16 front = r15's _DEFER verbatim, oldest-first; the 4
    # displaced by r15's new queries lead) ---
    "q21_waiting_suppliers",
    "ann_index_search", "lakehouse_leveled_compaction",
    "dedup_clusters", "pipeline_stratified_sample", "text_pii_scrub",
    "pipeline_contamination", "text_quality_flags",
    "lakehouse_merge_into", "multimodal_frame_sample",
    "lakehouse_sql_surface", "streaming_stateful_dedup",
    "streaming_sessionize", "pipeline_pack_sequences",
    "pipeline_shuffle_shards", "pipeline_weighted_mix",
    "text_vocab_topk", "dedup_ngram_coverage",
    "lakehouse_stats_skipping", "pipeline_chunk_windows",
    "pipeline_source_cap", "lakehouse_metadata_count",
    "lakehouse_clone", "lakehouse_delete_matching",
    "lakehouse_left_join_mv", "lakehouse_pk_join_mv",
    # --- 24 oldest r14-green (ROUND-16 NOTE enumeration) ---
    "q1_pricing_summary", "q3_unshipped_revenue",
    "q4_order_priority", "w_top_orders_per_customer",
    "w_running_user_value", "w_sessionization",
    "rollup_region_customers", "setop_repeat_customers",
    "json_event_props", "lakehouse_upsert_mor",
    "lakehouse_partial_upsert", "lakehouse_merge_operators",
    "lakehouse_cdc_read", "lakehouse_time_travel",
    "lakehouse_incremental", "lakehouse_update_delete",
    "lakehouse_compaction", "lakehouse_partition_overwrite",
    "q5_local_supplier_volume", "q6_forecast_revenue",
    "q9_profit_by_nation_year", "q10_returned_items",
    "q14_promo_revenue", "q18_large_volume_customer",
)

_DEFER = (
    # r17 front order (ROUND-17 NOTE above): the 26 r14-green that
    # hit the 2-round staleness boundary after r16, oldest-first by
    # first git appearance (ties alphabetical).
    "q19_disjunctive_predicates", "q22_idle_customers",
    "lakehouse_pk_point_lookup", "streaming_sink_sum",
    "lakehouse_multikey_lookup", "dedup_chunk_global",
    "multimodal_audio_features", "ann_index_refresh",
    "dedup_incremental_ingest", "embedding_pca_project",
    "ann_pca_ivf_topk", "ann_index_estimator",
    "ann_multibit_topk", "lakehouse_column_ddl",
    "streaming_latest_state", "lakehouse_arrow_writer",
    "pipeline_corpus_profile", "text_bm25_topk",
    "text_bm25_batch", "dedup_index_refresh",
    "w_asof_join", "w_interval_join",
    "lakehouse_star_mv_repin", "lakehouse_arrow_finalize_mv",
    "lakehouse_count_where_fast", "lakehouse_join_mv_rollup",
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
