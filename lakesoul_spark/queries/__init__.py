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
# verifies a 50-query prefix of this dict).  Round 6 rotates to
# (lakehouse, tpch, pipeline) per the r5 plan: the lakehouse pack
# (incl. the r5-new tail lakehouse_column_ddl / streaming_latest_state /
# lakehouse_arrow_writer, never driver-checked) and the relational TPC-H
# pack (last driver-green in r4) get re-verified after r5's
# reader/writer/fs changes.  Two r6-CHANGED queries are additionally
# pulled to the very FRONT (the rotation-ledger rule: changed/new
# queries never wait a round for a driver row):
#   - embedding_pca_project — reshaped to scalar pc0..pc7 output (was
#     the r5 red row: array<double> broke the driver's canonicalizer);
#   - ann_multibit_topk — now hash-checked (rerank == |corpus| with
#     nprobe == nlist makes the output provably equal brute-force
#     top-k, which has a plain SQL oracle).
# Window: 3 front + 26 lakehouse + 21 core TPC-H = exactly 50; the six
# tpch extras (w_*/rollup/setop/json, green r4) are deferred to the
# back so the q1..q22 relational set fits minus q20 (displaced by the
# r6-new tfidf query).
#
# ROUND-7 NOTE: rotate to (pipeline, tpch, lakehouse) with
# _FRONT = (*r7-new-or-changed, q20_heavy_suppliers, w_top_orders_
# per_customer, w_running_user_value, w_sessionization, rollup_region_
# customers, setop_repeat_customers, json_event_props) and _DEFER = ()
# — q20 and the six extras are the only queries last green in r4
# (3 rounds stale by r7), so they MUST be in the r7 window; 7 front +
# pipeline 36 = 43 leaves 7 slots for tpch core. The lakehouse pack
# and remaining tpch were driver-green in r6 and can wait for r8.
_MODULE_ORDER = (lakehouse, tpch, pipeline)

# r6-changed queries plus the one r6-NEW query (text_tfidf_topk) lead
# the window so nothing ships without a driver row; the one tpch query
# this displaces (q20, green r4) leads the r7 rotation with the
# pipeline pack and the tpch extras.
_FRONT = ("embedding_pca_project", "ann_multibit_topk", "text_tfidf_topk")

_DEFER = (
    "w_top_orders_per_customer", "w_running_user_value", "w_sessionization",
    "rollup_region_customers", "setop_repeat_customers", "json_event_props",
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
