"""Driver contract for the spark-graft builder (PySpark target).

Wires the engine's query packs (``lakesoul_spark.queries``) into the
driver's verify harness:

- ``entry(spark)`` — flagship pricing-summary query (TPC-H Q1 shape)
  at sf0.001.
- ``queries()`` — every implemented operator/query from SURVEY.md §2:
  relational pack (tpch.py), lakehouse-semantics pack (lakehouse.py —
  upsert/MOR/CDC/time-travel/compaction expressed over the driver's
  parquet fixtures), training-data pipeline pack (pipeline.py — dedup,
  similarity, text analysis, multimodal plumbing).
- ``oracle_sql()`` — exact DuckDB twin per query; as of round 6 every
  registered query carries one (the numpy-kernel ANN oracles refit the
  identical deterministic quantizer on the identically-ordered
  sample), so no rows-only checks remain.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from lakesoul_spark.queries import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    qs = all_queries()
    return qs["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
