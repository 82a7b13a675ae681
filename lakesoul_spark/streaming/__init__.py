"""Structured Streaming surface (SURVEY.md §2.8).

- :func:`write_stream` — streaming sink: ``foreachBatch`` → bucketed
  sorted write + idempotent commit keyed on (query_id, batch_id)
  (reference ``LakeSoulSink.scala:36-88``,
  ``LakeSoulDataSource.scala:44-75``).
- :mod:`lakesoul_spark.streaming.source` — a real
  ``spark.readStream.format("lakesoul")`` micro-batch source via the
  PySpark Python Data Source API; offsets are commit-log versions
  (reference ``StreamParquetScan.scala:108-136``).
"""

from lakesoul_spark.streaming.sink import write_batch, write_stream
from lakesoul_spark.streaming.source import LakeSoulPyDataSource, register

__all__ = ["write_stream", "write_batch", "LakeSoulPyDataSource", "register"]
