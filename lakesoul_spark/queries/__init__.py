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
# verifies a 50-query prefix of this dict).  Round 13 executes the r12
# ROUND-13 NOTE / VERDICT task 1 verbatim.  Ledger after r12: 50
# queries r12-green, 50 r11-green, 19 r10-green at the 2-round
# staleness boundary.  The window holds 50: FRONT the 19 stale
# r10-green in the pinned order, then the 2 NEW r13 oracle queries
# covering r13-new capability (lakehouse_left_join_mv → LEFT-OUTER
# JoinMV with unique right key, NULL-extension replaced by PK-upsert
# when the late match lands; lakehouse_pk_join_mv → JoinMV over a
# PK-keyed upsert-churning dim with an IN-QUERY side-file-pruning
# assert), then the 29 OLDEST r11-green (by first appearance in git
# history) — the 2 NEW queries displace the 2 youngest of the 31
# that would otherwise fit (lakehouse_multikey_lookup,
# dedup_chunk_global), per the standing displacement rule.
# ROUND-14 NOTE (window arithmetic, exact): after r13 the pack holds
# 121 queries — 50 r13-green (this window), 50 r12-green, and 21
# r11-green which hit the 2-round staleness boundary (the _DEFER
# tuple below is already the full r14-front order, oldest-first:
# lakehouse_multikey_lookup, dedup_chunk_global,
# multimodal_audio_features, ann_index_refresh,
# dedup_incremental_ingest, embedding_pca_project, ann_pca_ivf_topk,
# ann_index_estimator, lakehouse_column_ddl, ann_multibit_topk,
# streaming_latest_state, lakehouse_arrow_writer,
# pipeline_corpus_profile, text_bm25_topk, text_bm25_batch,
# dedup_index_refresh, w_asof_join, w_interval_join,
# lakehouse_star_mv_repin, lakehouse_count_where_fast,
# lakehouse_arrow_finalize_mv).  r14 MUST front those 21, then fill
# the window with the 29 oldest r12-green (by first appearance in
# git history: text_ngram_repetition and text_gopher_rules are
# r11-late, the r9-refreshed block next, then the TPC-H/lakehouse
# veterans); the 21 r12-green that don't fit lead the r15 front.
# Any NEW r14 oracle queries displace the youngest r12-green slots,
# same rule as this round.
_MODULE_ORDER = (pipeline, tpch, lakehouse)

_FRONT = (
    # --- 19 r10-green at the 2-round staleness boundary (the pinned
    # ROUND-13 front, oldest-first; the 2 displaced by r12's new
    # queries lead) ---
    "q8_market_share", "q11_important_parts", "q12_late_shipments",
    "q13_customer_distribution", "q15_top_supplier",
    "q16_part_supplier_variety", "q17_small_quantity_revenue",
    "lakehouse_cdc_incremental", "streaming_tumbling_window",
    "lakehouse_custom_merge_op", "lakehouse_upsert_cow",
    "q21_waiting_suppliers", "lakehouse_leveled_compaction",
    "lakehouse_merge_into", "lakehouse_sql_surface",
    "streaming_sessionize", "lakehouse_metadata_count",
    "lakehouse_clone", "lakehouse_delete_matching",
    # --- 2 NEW r13 queries: driver rows for r13-new capability ---
    "lakehouse_left_join_mv", "lakehouse_pk_join_mv",
    # --- 29 oldest r11-green (the 31 minus the 2 displaced) ---
    "ann_cosine_topk", "ann_ivf_topk", "dedup_embedding_cosine",
    "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_simhash", "multimodal_features", "text_fingerprint",
    "text_langid", "text_stats", "q20_heavy_suppliers",
    "dedup_embedding_blocked", "ann_index_search", "dedup_clusters",
    "pipeline_stratified_sample", "pipeline_contamination",
    "text_pii_scrub", "text_quality_flags", "multimodal_frame_sample",
    "streaming_stateful_dedup", "dedup_ngram_coverage",
    "pipeline_pack_sequences", "pipeline_shuffle_shards",
    "pipeline_weighted_mix", "text_vocab_topk",
    "lakehouse_stats_skipping", "pipeline_chunk_windows",
    "pipeline_source_cap",
)

_DEFER = (
    # r14 front order (ROUND-14 NOTE above): the 21 r11-green that
    # hit the 2-round staleness boundary after r13, oldest-first —
    # the 2 displaced by this round's new queries lead.
    "lakehouse_multikey_lookup", "dedup_chunk_global",
    "multimodal_audio_features", "ann_index_refresh",
    "dedup_incremental_ingest", "embedding_pca_project",
    "ann_pca_ivf_topk", "ann_index_estimator",
    "lakehouse_column_ddl", "ann_multibit_topk",
    "streaming_latest_state", "lakehouse_arrow_writer",
    "pipeline_corpus_profile", "text_bm25_topk", "text_bm25_batch",
    "dedup_index_refresh", "w_asof_join", "w_interval_join",
    "lakehouse_star_mv_repin", "lakehouse_count_where_fast",
    "lakehouse_arrow_finalize_mv",
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
