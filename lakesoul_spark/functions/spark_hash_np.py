"""Numpy-vectorized Spark murmur3 (seed 42) — the column-at-a-time twin
of :mod:`lakesoul_spark.functions.spark_hash`.

Same semantics (Spark's Murmur3_x86_32 with per-type input encoding,
multi-column hashes chained through the seed; reference implements the
identical hash natively in ``rust/lakesoul-io/src/utils/hash/
mod.rs:19-24,57``), but computed over whole columns at once so the
Spark-free arrow writer can bucket millions of rows without a per-row
Python loop. All 32-bit arithmetic rides numpy's native uint32 wrap
(mod 2^32 for free); variable-length strings/binary are grouped by
byte length so every group hashes as fixed-width word columns.

``test_spark_hash_np`` cross-checks every type against the scalar
implementation value-for-value.
"""

from __future__ import annotations

import numpy as np

_U = np.uint32


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U(r)) | (x >> _U(32 - r))


def _mix_k1(k1: np.ndarray) -> np.ndarray:
    return _rotl(k1 * _U(0xCC9E2D51), 15) * _U(0x1B873593)


def _mix_h1(h1: np.ndarray, k1: np.ndarray) -> np.ndarray:
    h1 = _rotl(h1 ^ k1, 13)
    return h1 * _U(5) + _U(0xE6546B64)


def _fmix(h1: np.ndarray, length) -> np.ndarray:
    h1 = h1 ^ _U(length)
    h1 ^= h1 >> _U(16)
    h1 = h1 * _U(0x85EBCA6B)
    h1 ^= h1 >> _U(13)
    h1 = h1 * _U(0xC2B2AE35)
    h1 ^= h1 >> _U(16)
    return h1


def hash_int_np(values: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """4-byte word hash (int/short/byte/date/boolean encodings)."""
    k = (values.astype(np.int64) & 0xFFFFFFFF).astype(_U)
    return _fmix(_mix_h1(seeds, _mix_k1(k)), 4)


def hash_long_np(values: np.ndarray, seeds: np.ndarray) -> np.ndarray:
    """8-byte hash as two little-endian words (long/timestamp)."""
    v = values.astype(np.int64).view(np.uint64)
    low = (v & np.uint64(0xFFFFFFFF)).astype(_U)
    high = (v >> np.uint64(32)).astype(_U)
    h1 = _mix_h1(seeds, _mix_k1(low))
    h1 = _mix_h1(h1, _mix_k1(high))
    return _fmix(h1, 8)


def hash_bytes_np(
    buf: np.ndarray, starts: np.ndarray, lengths: np.ndarray,
    seeds: np.ndarray,
) -> np.ndarray:
    """Spark's hashUnsafeBytes over a ragged byte buffer: rows grouped
    by length, each group vectorized word-at-a-time with the SIGNED
    tail-byte mix. ``buf`` uint8, ``starts``/``lengths`` per row."""
    out = np.empty(len(starts), dtype=_U)
    for length in np.unique(lengths):
        idx = np.flatnonzero(lengths == length)
        h1 = seeds[idx].astype(_U, copy=True)
        n = int(length)
        if n:
            mat = buf[starts[idx][:, None] + np.arange(n)]
            aligned = n - n % 4
            for i in range(0, aligned, 4):
                word = (
                    mat[:, i].astype(_U)
                    | (mat[:, i + 1].astype(_U) << _U(8))
                    | (mat[:, i + 2].astype(_U) << _U(16))
                    | (mat[:, i + 3].astype(_U) << _U(24))
                )
                h1 = _mix_h1(h1, _mix_k1(word))
            for i in range(aligned, n):
                # signed tail byte, reinterpreted as uint32 two's
                # complement (Spark's non-standard murmur3 tail)
                b = mat[:, i].astype(np.int8).astype(np.int32)
                h1 = _mix_h1(h1, _mix_k1(b.view(_U)))
        out[idx] = _fmix(h1, n)
    return out


def _utf8_raw(col):
    """(buf, starts, lengths) views over a pyarrow string/binary column
    — zero per-row work, the bytes stay in arrow's contiguous buffer."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = col.cast(pa.large_binary())
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], np.int64)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    buf = (np.frombuffer(bufs[2], np.uint8)
           if bufs[2] is not None else np.empty(0, np.uint8))
    return buf, offsets[:-1].copy(), np.diff(offsets)


def hash_column_np(col, spark_type: str, seeds: np.ndarray) -> np.ndarray:
    """Chain one pyarrow column into the running per-row seeds (uint32),
    with Spark's per-type encoding. PK columns must be null-free (the
    caller validates)."""
    import pyarrow as pa

    t = spark_type.lower()
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if t in ("integer", "int", "short", "smallint", "byte", "tinyint"):
        return hash_int_np(col.cast(pa.int64()).to_numpy(), seeds)
    if t in ("long", "bigint"):
        return hash_long_np(col.cast(pa.int64()).to_numpy(), seeds)
    if t == "date":
        days = col.cast(pa.date32()).cast(pa.int32()).to_numpy()
        return hash_int_np(days, seeds)
    if t.startswith("timestamp"):
        ts = col.cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        return hash_long_np(ts, seeds)
    if t == "boolean":
        return hash_int_np(
            col.cast(pa.int8()).to_numpy().astype(np.int64), seeds
        )
    if t in ("string", "varchar", "binary"):
        buf, starts, lengths = _utf8_raw(col)
        return hash_bytes_np(buf, starts, lengths, seeds)
    if t in ("float", "real"):
        v = col.cast(pa.float32()).to_numpy()
        v = np.where(v == np.float32(0.0), np.float32(0.0), v)  # -0.0→+0.0
        bits = v.view(np.int32)
        bits = np.where(np.isnan(v), np.int32(0x7FC00000), bits)
        return hash_int_np(bits.astype(np.int64), seeds)
    if t == "double":
        v = col.cast(pa.float64()).to_numpy()
        v = np.where(v == 0.0, 0.0, v)
        bits = v.view(np.int64)
        bits = np.where(np.isnan(v), np.int64(0x7FF8000000000000), bits)
        return hash_long_np(bits, seeds)
    if t.startswith("decimal"):
        return _hash_decimal_np(col, t, seeds)
    raise ValueError(f"unsupported PK type for bucketing: {spark_type}")


def _hash_decimal_np(col, spark_type: str, seeds: np.ndarray) -> np.ndarray:
    """Spark's decimal hash, vectorized. Precision ≤ 18: the unscaled
    value fits int64, which for a two's-complement decimal128 buffer is
    exactly the little-endian low word — hash it as a long, no per-row
    work. Precision > 18: hashUnsafeBytes over BigInteger
    two's-complement bytes (per-row byte build, then the grouped-by-
    length vectorized byte hash)."""
    import pyarrow as pa

    from lakesoul_spark.functions.spark_hash import (
        _big_integer_bytes, _decimal_params, _decimal_unscaled,
    )

    precision, scale = _decimal_params(spark_type)
    arr = col.cast(pa.decimal128(min(precision, 38), scale)) \
        if precision <= 38 else col
    if precision <= 18:
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        buf = np.frombuffer(arr.buffers()[1], np.int64)
        lo = buf[arr.offset * 2 : (arr.offset + len(arr)) * 2 : 2]
        return hash_long_np(lo, seeds)
    chunks = []
    starts, lengths = [], []
    pos = 0
    for v in arr.to_pylist():
        b = _big_integer_bytes(_decimal_unscaled(v, scale))
        chunks.append(np.frombuffer(b, np.uint8))
        starts.append(pos)
        lengths.append(len(b))
        pos += len(b)
    buf = np.concatenate(chunks) if chunks else np.empty(0, np.uint8)
    return hash_bytes_np(
        buf, np.asarray(starts, np.int64), np.asarray(lengths, np.int64),
        seeds,
    )


def bucket_array(table, pk: list[str], spark_types: list[str],
                 bucket_num: int) -> np.ndarray:
    """Vectorized ``pmod(hash(pk...), n)`` over a pyarrow Table — the
    column twin of :func:`lakesoul_spark.functions.spark_hash.bucket_of`
    (bit-exact with Spark's ``pmod(hash(...), n)``)."""
    import pyarrow.compute as pc

    seeds = np.full(table.num_rows, 42, dtype=_U)
    for c, t in zip(pk, spark_types):
        if pc.any(pc.is_null(table[c])).as_py():
            raise ValueError(f"primary key column {c!r} contains nulls")
        seeds = hash_column_np(table[c], t, seeds)
    h = seeds.view(np.int32).astype(np.int64)
    return np.mod(h, bucket_num)  # numpy mod == Spark pmod for n > 0
