"""Spark-free Arrow writer: ingest a pyarrow Table into a LakeSoul
table and commit it through the metadata store — the write-side twin of
:mod:`lakesoul_spark.arrow.dataset` (reference standalone Writer,
``python/src/lakesoul/io/__init__.py:135-240``: PyArrow write + commit
with primary keys / partitions / hash buckets, no Spark session).

The layout contract is byte-compatible with the Spark writer
(``io/writer.py``): files land under ``data/<token>/<range dirs>/
__bucket=<i>/``, rows are bucketed with the same murmur3(seed 42)
chain (``functions/spark_hash_np.py`` — numpy-vectorized, bit-exact
with Spark's ``pmod(hash(pk...), n)``), deduped last-wins within the
batch, sorted by PK inside each bucket file, and range-partition
values live in the directory name only (reattached from metadata at
read). FileOps + footer stats come from the same ``_collect_file_ops``
the Spark commit uses, so stats skipping and bucket-pruned lookups
work identically on arrow-written files.

The whole path is columnar (reference native writer
``rust/lakesoul-io/src/writer/async_writer/sort_writer.rs``): bucket
assignment is a numpy murmur3 over arrow buffers, dedup + PK sort ride
two ``pyarrow.compute.sort_indices``/``take`` passes, and per-bucket
files are zero-copy table slices — no per-row Python anywhere.

Use case: a training worker (embedding job, labeling pass) appends or
upserts results back into the lake from a plain Python process.
"""

from __future__ import annotations

import os
import uuid


def write_arrow(
    table_path: str, data, *, mode: str = "append",
    max_records_per_file: int | None = None,
) -> int:
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

    ``max_records_per_file`` rolls a bucket's output into multiple
    PK-contiguous files (the Spark writer's ``max_records_per_file`` /
    the reference native writer's ``max_file_size`` split,
    ``rust/lakesoul-io/src/writer/async_writer/multipart_writer.rs``)
    so one hot bucket in a large ingest doesn't become a single giant
    file — readers keep per-file parallelism and min/max stats stay
    selective.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    from lakesoul_spark.io.partition import (
        EMPTY_STRING, HIVE_DEFAULT_PARTITION, NULL_STRING,
        escape_path_name,
    )
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
    cdc = info.cdc_column
    if cdc and cdc not in data.column_names:
        # same contract as the Spark writer's _align (io/writer.py): a
        # CDC row without its change flag would surface with a null op
        # and be silently dropped by the MOR CDC filter — data loss,
        # not a partial-column upsert
        raise ValueError(
            f"CDC table batches must carry the change column {cdc!r} "
            "(e.g. 'insert'/'update'/'delete' per row)"
        )
    if data.num_rows == 0:
        return 0

    import numpy as np
    import pyarrow.compute as pc

    from lakesoul_spark.functions.spark_hash_np import bucket_array

    nrows = data.num_rows
    pk_types = [types[c] for c in pk]
    # vectorized murmur3(seed 42) chain — bit-exact with the scalar
    # bucket_of and Spark's pmod(hash(pk...), n) (cross-checked in
    # test_spark_hash_np); per-row Python never touches the data
    buckets = (
        bucket_array(data, pk, pk_types, n) if pk
        else np.full(nrows, -1, np.int64)
    )
    tbl = data.append_column("__bucket", pa.array(buckets, pa.int32()))
    tbl = tbl.append_column(
        "__idx", pa.array(np.arange(nrows, dtype=np.int64), pa.int64())
    )

    def _adjacent_same(t: pa.Table, cols: list[str]) -> np.ndarray:
        """bool[i] — row i equals row i+1 on all ``cols`` (null-safe)."""
        same = np.ones(t.num_rows - 1, dtype=bool)
        for c in cols:
            col = t[c].combine_chunks() if isinstance(
                t[c], pa.ChunkedArray) else t[c]
            left, right = col.slice(0, t.num_rows - 1), col.slice(1)
            eq = pc.fill_null(pc.equal(left, right), False).to_numpy(
                zero_copy_only=False).astype(bool)
            lnull = pc.is_null(left).to_numpy(zero_copy_only=False)
            rnull = pc.is_null(right).to_numpy(zero_copy_only=False)
            same &= np.where(lnull | rnull, lnull & rnull, eq)
        return same

    if pk:
        # last-wins dedup (the Spark writer's semantics): stable order
        # by (pk..., arrival) then keep the LAST row of each PK run
        order = pc.sort_indices(
            tbl, sort_keys=[(c, "ascending") for c in pk]
            + [("__idx", "ascending")]
        )
        tbl = tbl.take(order)
        if tbl.num_rows > 1:
            keep = np.ones(tbl.num_rows, dtype=bool)
            keep[:-1] = ~_adjacent_same(tbl, pk)
            if not keep.all():
                tbl = tbl.filter(pa.array(keep))

    # one sort groups (range, bucket) contiguously AND delivers the
    # per-bucket PK order the layout contract requires; __idx keeps
    # non-PK appends in arrival order
    group_cols = list(rc) + ["__bucket"]
    tbl = tbl.take(pc.sort_indices(
        tbl, sort_keys=[(c, "ascending") for c in group_cols]
        + [(c, "ascending") for c in pk] + [("__idx", "ascending")]
    ))

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

    # group boundaries on (range cols, bucket): arrow slices per group,
    # cast once to the table's physical types, no row materialization
    if tbl.num_rows > 1:
        bounds = np.flatnonzero(~_adjacent_same(tbl, group_cols)) + 1
    else:
        bounds = np.empty(0, np.int64)
    starts = [0, *bounds.tolist()]
    ends = [*bounds.tolist(), tbl.num_rows]
    for s, e in zip(starts, ends):
        d = out_dir
        for c in rc:
            v = tbl[c][s].as_py()
            # BYTE-IDENTICAL dir naming to the Spark writer: string
            # nulls/empties get the writer's sentinels (io/writer.py
            # plants them BEFORE partitionBy, preserving the null-vs-''
            # distinction the reference keeps, TransactionalWrite.scala
            # :187-198), non-string nulls get Spark's own hive default
            # dir, and values escape with Spark's escapePathName set —
            # not a generic URL-quote, which diverges on spaces
            if v is None:
                enc = (NULL_STRING if types.get(c) == "string"
                       else HIVE_DEFAULT_PARTITION)
            elif types.get(c) == "string" and str(v) == "":
                enc = EMPTY_STRING
            else:
                enc = escape_path_name(str(v))
            d = os.path.join(d, f"{c}={enc}")
        bucket = tbl["__bucket"][s].as_py()
        if bucket >= 0:
            d = os.path.join(d, f"__bucket={bucket}")
        os.makedirs(d, exist_ok=True)
        step = max_records_per_file or (e - s)
        for cs in range(s, e, step):
            part = (
                tbl.slice(cs, min(step, e - cs))
                .select(data_cols).cast(file_schema)
            )
            pq.write_table(
                part,
                os.path.join(d, f"part-{uuid.uuid4().hex[:12]}.parquet"),
            )

    ops = _collect_file_ops(info, out_dir, list(data.column_names))
    store.commit(OP_MERGE if pk else OP_APPEND, ops)
    return tbl.num_rows


class ArrowBatchWriter:
    """Streaming Spark-free writer with the reference standalone
    Writer's transactional shape (``python/src/lakesoul/io/
    __init__.py:135-240``): ``write()`` accepts RecordBatch / Table /
    RecordBatchReader incrementally, ``finish()`` buckets+sorts+commits
    everything as ONE Merge/Append commit (readers never see a partial
    ingest), ``abort()`` discards pending data without touching the
    table. Usable as a context manager — a clean exit commits, an
    exception aborts.

    Batches are held as zero-copy arrow chunks until finish (a worker
    delta, not the bulk path); the heavy lifting — vectorized murmur3
    bucketing, dedup, PK sort, per-bucket files — is
    :func:`write_arrow`'s columnar pipeline, so rows/s matches the
    one-shot call.
    """

    def __init__(self, table_path: str,
                 *, max_records_per_file: int | None = None):
        self._path = table_path
        self._max_records_per_file = max_records_per_file
        self._chunks: list = []
        self._result: int | None = None
        self._aborted = False

    # -- the reference Writer's surface --------------------------------
    @property
    def closed(self) -> bool:
        return self._result is not None or self._aborted

    def write(self, data) -> int:
        """Buffer Arrow data; returns the number of rows accepted."""
        import pyarrow as pa

        if self.closed:
            raise RuntimeError("writer is closed")
        if isinstance(data, pa.RecordBatch):
            data = pa.Table.from_batches([data])
        elif isinstance(data, pa.RecordBatchReader):
            data = data.read_all()
        if not isinstance(data, pa.Table):
            raise TypeError(
                "data must be a pyarrow RecordBatch, Table, or "
                "RecordBatchReader"
            )
        if self._chunks and data.schema != self._chunks[0].schema:
            raise ValueError(
                "batch schema differs from the first batch's schema"
            )
        self._chunks.append(data)
        return data.num_rows

    def finish(self) -> int:
        """Commit everything buffered as one commit; returns rows
        written (post-dedup). Idempotent."""
        import pyarrow as pa

        if self._aborted:
            raise RuntimeError("writer has been aborted")
        if self._result is not None:
            return self._result
        if not self._chunks:
            self._result = 0
            return 0
        # commit BEFORE dropping the buffer: if write_arrow raises
        # (validation / IO / commit conflict) the chunks stay intact so
        # a retry of finish() re-attempts the same commit instead of
        # silently returning 0 from the empty-buffer branch
        data = pa.concat_tables(self._chunks)
        result = write_arrow(
            self._path, data,
            max_records_per_file=self._max_records_per_file,
        )
        self._chunks = []
        self._result = result
        return self._result

    def abort(self) -> None:
        """Drop pending batches; nothing reaches the table."""
        self._chunks = []
        self._aborted = True

    def __enter__(self) -> "ArrowBatchWriter":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        if exc_type is not None:
            self.abort()
        elif not self.closed:
            self.finish()
