"""Spark-free Arrow writer: ingest a pyarrow Table into a LakeSoul
table and commit it through the metadata store — the write-side twin of
:mod:`lakesoul_spark.arrow.dataset` (reference standalone Writer,
``python/src/lakesoul/io/__init__.py:135-240``: PyArrow write + commit
with primary keys / partitions / hash buckets, no Spark session).

The layout contract is byte-compatible with the Spark writer
(``io/writer.py``): files land under ``data/<token>/<range dirs>/
__bucket=<i>/``, rows are bucketed with the same murmur3(seed 42)
chain (``functions/spark_hash.py`` — bit-exact with Spark's
``pmod(hash(pk...), n)``), deduped last-wins within the batch, sorted
by PK inside each bucket file, and range-partition values live in the
directory name only (reattached from metadata at read). FileOps +
footer stats come from the same ``_collect_file_ops`` the Spark commit
uses, so stats skipping and bucket-pruned lookups work identically on
arrow-written files.

Use case: a training worker (embedding job, labeling pass) appends or
upserts results back into the lake from a plain Python process.
"""

from __future__ import annotations

import os
import uuid


def write_arrow(table_path: str, data, *, mode: str = "append") -> int:
    """Write a ``pyarrow.Table`` (or RecordBatch) into an EXISTING
    LakeSoul table and commit. Returns the number of rows written.

    - PK tables: the batch is an upsert (Merge commit) — within-batch
      duplicates collapse last-wins, like the Spark writer's dedup.
    - non-PK tables: ``mode="append"`` adds files; ``mode="overwrite"``
      is not supported here (use Spark's writer for partition
      overwrite semantics).

    Value columns may be a subset of the table schema
    (``file_exist_cols`` fill applies at read); PK and range-partition
    columns are required.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    import urllib.parse

    from lakesoul_spark.functions.spark_hash import bucket_of
    from lakesoul_spark.io.partition import HIVE_DEFAULT_PARTITION
    from lakesoul_spark.io.writer import _collect_file_ops, table_schema
    from lakesoul_spark.meta.store import (
        DATA_DIR, OP_APPEND, OP_MERGE, MetaStore,
    )

    if isinstance(data, pa.RecordBatch):
        data = pa.Table.from_batches([data])
    if not isinstance(data, pa.Table):
        raise TypeError("data must be a pyarrow Table or RecordBatch")
    if mode != "append":
        raise ValueError(
            "write_arrow supports mode='append' only (PK tables upsert; "
            "use the Spark writer for overwrite/replaceWhere)"
        )

    store = MetaStore(table_path)
    info = store.table_info()
    schema = table_schema(info)
    types = {f.name: f.dataType.simpleString() for f in schema.fields}
    known = set(types)
    unknown = [c for c in data.column_names if c not in known]
    if unknown:
        raise ValueError(f"columns not in table schema: {unknown}")
    pk, rc, n = info.hash_partitions, info.range_partitions, info.hash_bucket_num
    for required in pk + rc:
        if required not in data.column_names:
            raise ValueError(f"missing required column {required!r}")
    if data.num_rows == 0:
        return 0

    rows = data.to_pylist()
    pk_types = [types[c] for c in pk]
    if pk:
        # last-wins within the batch (the Spark writer's dedup), then
        # the same murmur3 chain the Spark writer buckets with
        dedup: dict[tuple, dict] = {}
        for r in rows:
            dedup[tuple(r[c] for c in pk)] = r
        rows = list(dedup.values())
        for r in rows:
            r["__bucket"] = bucket_of([r[c] for c in pk], pk_types, n)
    else:
        for r in rows:
            r["__bucket"] = -1

    groups: dict[tuple, list[dict]] = {}
    for r in rows:
        key = (tuple(r[c] for c in rc), r["__bucket"])
        groups.setdefault(key, []).append(r)

    token = uuid.uuid4().hex[:16]
    out_dir = os.path.join(table_path, DATA_DIR, token)
    data_cols = [c for c in data.column_names if c not in rc]
    # file schema follows the TABLE's Spark types (timestamp_ntz →
    # timestamp[us] etc. — the physical encoding the Spark vectorized
    # reader expects), NOT whatever the input batch inferred
    from pyspark.sql.types import StructType as _St

    from lakesoul_spark.streaming.source import _arrow_schema

    table_arrow = _arrow_schema(
        _St([f for f in schema.fields if f.name in set(data_cols)])
    )
    file_schema = pa.schema([table_arrow.field(c) for c in data_cols])
    for (range_vals, bucket), grp in sorted(
        groups.items(), key=lambda kv: (str(kv[0][0]), kv[0][1])
    ):
        if pk:
            grp.sort(key=lambda r: tuple(r[c] for c in pk))
        d = out_dir
        for c, v in zip(rc, range_vals):
            # Spark's escaped hive-style dir naming, so arrow-written
            # and Spark-written files normalize to the SAME desc
            enc = (
                HIVE_DEFAULT_PARTITION if v is None
                else urllib.parse.quote(str(v), safe="")
            )
            d = os.path.join(d, f"{c}={enc}")
        if bucket >= 0:
            d = os.path.join(d, f"__bucket={bucket}")
        os.makedirs(d, exist_ok=True)
        tbl = pa.Table.from_pylist(
            [{c: r[c] for c in data_cols} for r in grp], schema=file_schema
        )
        pq.write_table(
            tbl, os.path.join(d, f"part-{uuid.uuid4().hex[:12]}.parquet")
        )

    ops = _collect_file_ops(info, out_dir, list(data.column_names))
    store.commit(OP_MERGE if pk else OP_APPEND, ops)
    return len(rows)
