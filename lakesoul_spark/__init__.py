"""lakesoul_spark — a PySpark-native lakehouse engine.

A from-scratch re-expression of the capabilities of lakesoul-io/LakeSoul
(reference at /root/reference, studied for behavior only) built idiomatically
on the Spark DataFrame / SQL / Catalyst / Structured Streaming stack:

- ACID table format over parquet + a file-based commit log
  (reference: PostgreSQL metadata, ``rust/proto/src/entity.proto``)
- primary-key upsert with merge-on-read and per-column merge operators
  (reference: ``rust/lakesoul-io/src/physical_plan/merge/sorted/merge_operator.rs``)
- CDC table semantics, time travel, incremental + streaming reads
  (reference: ``lakesoul-spark/.../rules/ProcessCDCTableMergeOnRead.scala``,
  ``.../tables/LakeSoulTable.scala:642-723``)
- compaction, update/delete DML, schema evolution
- large-scale training-data pipeline operators (dedup, similarity search,
  text analysis, multimodal plumbing) beyond the reference surface.

Everything is declarative DataFrame code: Catalyst provides pushdown,
pruning, join strategy, AQE; we provide the table format, the MOR view
builder, and the metadata-driven planning (partition + bucket pruning).
"""

from lakesoul_spark.table import LakeSoulTable, create_table, write
from lakesoul_spark.meta.store import MetaStore, TableInfo
from lakesoul_spark.session import lakesoul_session
from lakesoul_spark.service import CompactionService

__version__ = "0.2.0"

__all__ = [
    "LakeSoulTable",
    "create_table",
    "write",
    "MetaStore",
    "TableInfo",
    "lakesoul_session",
    "CompactionService",
]
