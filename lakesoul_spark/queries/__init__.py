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
# verifies a 50-query prefix of this dict).  Round 11 executes the r10
# ROUND-11 NOTE / VERDICT task 1 verbatim.  Ledger after r10: 50
# queries r10-green, 50 r9-green, 12 r8-green (two rounds stale — the
# boundary), 1 never-driver-verified (lakehouse_star_mv_repin).  The
# window holds 50: FRONT the never-verified query first, then the 12
# r8-green, then the 2 NEW r11 oracle queries covering r10/r11-new
# capability (lakehouse_count_where_fast → partition-only WHERE on the
# SQL count(*) metadata fast path with the scoped proof gate;
# lakehouse_arrow_finalize_mv → Spark-free finalized AggMV read via
# LakeSoulArrowDataset(finalize_mv=True) + the exact HLL composite
# estimator), then the 35 OLDEST r9-green (by first appearance in git
# history) — the 2 NEW queries displace the 2 youngest of the 37 that
# would otherwise fit (ann_l2_topk, text_tfidf_topk), per the standing
# displacement rule.
# ROUND-12 NOTE (window arithmetic, exact): after r11 the pack holds
# 117 queries — 50 r11-green (this window), 50 r10-green, 15 r9-green
# which hit the 2-round staleness boundary, and 2 NEVER
# driver-verified (text_ngram_repetition + text_gopher_rules, added
# r11-late for the Gopher quality-filter suite; both locally
# hash-verified at 3 SFs).  r12 MUST front the 2 never-verified
# queries first, then the 15 r9-green (the _DEFER tuple below is
# already the full r12-front order: text_ngram_repetition,
# text_gopher_rules, then oldest-first — ann_l2_topk,
# text_tfidf_topk, ann_index_refresh_hot, streaming_stream_join,
# lakehouse_bucket_join, lakehouse_convert, lakehouse_rollback,
# lakehouse_upsert_on_join, lakehouse_incremental_mv,
# lakehouse_zorder_skipping, lakehouse_star_mv,
# lakehouse_mv_count_distinct, lakehouse_transform_mv,
# text_corpus_freq_score, embedding_class_centroids), then fill the
# window with the 33 oldest r10-green; the 17 r10-green that don't
# fit lead the r13 front.  Any NEW r12 oracle queries displace the
# youngest r10-green slots, same rule as this round.
_MODULE_ORDER = (pipeline, tpch, lakehouse)

_FRONT = (
    # --- the r10-late never-driver-verified query (ROUND-11 NOTE) ---
    "lakehouse_star_mv_repin",
    # --- 12 r8-green at the 2-round staleness boundary ---
    "w_asof_join", "w_interval_join", "dedup_index_refresh",
    "text_bm25_batch", "pipeline_corpus_profile", "text_bm25_topk",
    "lakehouse_arrow_writer", "streaming_latest_state",
    "lakehouse_column_ddl", "lakehouse_multikey_lookup",
    "lakehouse_stats_skipping", "streaming_stateful_dedup",
    # --- 2 NEW r11 queries: driver rows for r10/r11-new capability ---
    "lakehouse_count_where_fast", "lakehouse_arrow_finalize_mv",
    # --- 35 oldest r9-green (the 37 minus the 2 displaced) ---
    "ann_cosine_topk", "ann_ivf_topk", "dedup_embedding_cosine",
    "dedup_exact", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_simhash", "multimodal_features", "text_fingerprint",
    "text_langid", "text_stats",
    "q20_heavy_suppliers", "dedup_embedding_blocked",
    "ann_index_search", "dedup_clusters", "pipeline_stratified_sample",
    "pipeline_contamination", "text_pii_scrub", "text_quality_flags",
    "multimodal_frame_sample",
    "dedup_ngram_coverage", "pipeline_pack_sequences",
    "pipeline_shuffle_shards", "pipeline_weighted_mix",
    "text_vocab_topk", "pipeline_chunk_windows", "pipeline_source_cap",
    "dedup_chunk_global", "multimodal_audio_features",
    "ann_index_refresh", "dedup_incremental_ingest",
    "embedding_pca_project", "ann_pca_ivf_topk", "ann_index_estimator",
    "ann_multibit_topk",
)

_DEFER = (
    # r12 front order (ROUND-12 NOTE above): first the 2 r11-late
    # never-driver-verified queries (hash-verified locally at 3 SFs),
    # then the 15 r9-green that hit the 2-round staleness boundary
    # after r11, oldest-first — the 2 displaced by this round's new
    # queries lead those.
    "text_ngram_repetition", "text_gopher_rules",
    "ann_l2_topk", "text_tfidf_topk",
    "ann_index_refresh_hot", "streaming_stream_join",
    "lakehouse_bucket_join", "lakehouse_convert", "lakehouse_rollback",
    "lakehouse_upsert_on_join", "lakehouse_incremental_mv",
    "lakehouse_zorder_skipping", "lakehouse_star_mv",
    "lakehouse_mv_count_distinct", "lakehouse_transform_mv",
    "text_corpus_freq_score", "embedding_class_centroids",
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
