"""Streaming sink: micro-batch writes with exactly-once commits.

Re-expresses the reference sink (``LakeSoulSink.scala:36-88``) as a
``foreachBatch`` pipeline — the idiomatic Structured Streaming shape
for a transactional table sink:

- **append** — plain Append commit; on a PK table the batch becomes a
  Merge (delta) commit, exactly like the reference's ``writeBatch``
  setting the merge commit type for hash-partitioned tables.
- **complete** — truncate + rewrite per batch (reference
  ``LakeSoulSink.scala:57-63``).
- **update** — requires a PK table (reference
  ``LakeSoulDataSource.scala:62-68``); upsert semantics.
- **exactly-once** — the commit carries (query_id, batch_id); a
  replayed batch whose id is already recorded is skipped (reference
  ``LakeSoulSink.scala:44-48``, ``StreamingRecord.getBatchId``).
- ``NullType`` columns are rejected (reference
  ``LakeSoulSink.scala:40-42``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql.types import NullType

from lakesoul_spark.io.writer import write_table_data
from lakesoul_spark.meta.store import (
    OP_APPEND,
    OP_MERGE,
    OP_UPDATE,
    FileOp,
    MetaStore,
)

_MODES = ("append", "complete", "update")


def default_query_id(checkpoint_location: str) -> str:
    """Stable idempotence key for one checkpoint lineage.

    The reference sink keys on Spark's streaming query id
    (``StreamExecution.QUERY_ID_KEY``), which lives in the checkpoint
    and survives restarts; hashing the resolved checkpoint path gives
    the same property without reaching into Spark internals."""
    import hashlib

    key = os.path.abspath(checkpoint_location)
    return "lakesoul-ckpt-" + hashlib.sha256(key.encode()).hexdigest()[:24]


def write_batch(
    df: DataFrame,
    path: str,
    batch_id: int,
    *,
    output_mode: str = "append",
    query_id: str = "",
    range_partitions: list[str] | None = None,
    hash_partitions: list[str] | None = None,
    hash_bucket_num: int = 4,
) -> bool:
    """Write one micro-batch; returns False if skipped as a duplicate.

    First batch creates the table (streaming CTAS, as in the reference
    Kafka ingestion job auto-creating tables)."""
    if output_mode not in _MODES:
        raise ValueError(f"unsupported output mode {output_mode!r}")
    for f in df.schema.fields:
        if isinstance(f.dataType, NullType):
            raise ValueError(
                f"column {f.name!r} is NullType — not writable "
                "(reference LakeSoulSink.scala:40-42)"
            )

    store = MetaStore(os.path.abspath(path))
    if not store.exists():
        from lakesoul_spark.table import create_table

        create_table(
            df.sparkSession,
            path,
            df.schema,
            range_partitions=range_partitions,
            hash_partitions=hash_partitions,
            hash_bucket_num=hash_bucket_num,
        )
        store = MetaStore(os.path.abspath(path))
    info = store.table_info()

    if output_mode == "update" and not info.is_pk_table:
        raise ValueError(
            "update output mode requires a primary-key table "
            "(reference LakeSoulDataSource.scala:62-68)"
        )
    if query_id and store.has_batch(query_id, batch_id):
        return False

    ops = write_table_data(df, info)
    if output_mode == "complete":
        dels = [
            FileOp(op="del", path=f.path, partition_desc=f.partition_desc,
                   bucket=f.bucket)
            for f in store.snapshot().files
        ]
        store.commit(OP_UPDATE, dels + ops, query_id=query_id, batch_id=batch_id)
    else:
        op = OP_MERGE if info.is_pk_table else OP_APPEND
        store.commit(op, ops, query_id=query_id, batch_id=batch_id)
    return True


def write_stream(
    sdf: DataFrame,
    path: str,
    *,
    checkpoint_location: str,
    output_mode: str = "append",
    query_id: str | None = None,
    range_partitions: list[str] | None = None,
    hash_partitions: list[str] | None = None,
    hash_bucket_num: int = 4,
    trigger: dict | None = None,
):
    """``df.writeStream.format("lakesoul")`` equivalent. Returns the
    started :class:`~pyspark.sql.streaming.StreamingQuery`.

    ``trigger`` is passed through to ``DataStreamWriter.trigger`` (e.g.
    ``{"availableNow": True}`` or ``{"processingTime": "30 seconds"}``).

    Idempotence keys on the CHECKPOINT LINEAGE (reference
    ``LakeSoulSink.scala:46`` keys on the Spark queryId, which is
    persisted in the checkpoint and stable across restarts): batch ids
    are scoped to one checkpoint, so deriving the id from
    ``checkpoint_location`` is stable across restarts of the same
    logical query and unique per lineage. This closes the at-least-once
    replay window: a batch committed to the table but not yet recorded
    in the streaming checkpoint is replayed after a crash-restart with
    the SAME qid, so ``has_batch`` sees it and skips the double write.
    A fresh query (new checkpoint dir) gets a fresh qid, so its batch
    ids restarting at 0 are never misread as duplicates. Pass
    ``query_id`` explicitly to override."""
    qid = query_id or default_query_id(checkpoint_location)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        write_batch(
            batch_df,
            path,
            batch_id,
            output_mode=output_mode,
            query_id=qid,
            range_partitions=range_partitions,
            hash_partitions=hash_partitions,
            hash_bucket_num=hash_bucket_num,
        )


    writer = (
        sdf.writeStream.foreachBatch(process)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_location)
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
