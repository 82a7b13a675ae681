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


def all_queries():
    out = {}
    for mod in (tpch, pipeline, lakehouse):
        out.update(mod.QUERIES)
    return out


def all_oracles():
    out = {}
    for mod in (tpch, pipeline, lakehouse):
        out.update(mod.ORACLES)
    return out
