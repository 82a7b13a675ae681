"""Spark-compatible Murmur3 (seed 42) in pure Python.

``F.hash`` is Murmur3 x86_32 with Spark's own per-type input encoding;
the reference implements the identical hash natively so that bucket
layouts agree across engines (``rust/lakesoul-io/src/utils/hash/
mod.rs:19-24,57``). We need it driver-side to compute which bucket a
PK literal lands in — point-lookup bucket pruning
(``rust/lakesoul-io/src/reader.rs:160-180``) — without launching a job.

Semantics mirrored from Spark's Murmur3_x86_32 / Murmur3Hash
expression: ints/dates hash as 4-byte words, longs/timestamps as two
words, strings as UTF-8 bytes (4-byte words + SIGNED tail bytes one at
a time), and multi-column hashes chain through the seed:
``hash(a, b) = hash_b(seed=hash_a(seed=42))``.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math as _math
import re as _re
import struct as _struct

_MASK = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & _MASK
    k1 = _rotl(k1, 15)
    return (k1 * 0x1B873593) & _MASK


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _MASK


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _MASK
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _MASK
    h1 ^= h1 >> 16
    return h1


def _to_signed(x: int) -> int:
    return x - (1 << 32) if x >= (1 << 31) else x


def hash_int(value: int, seed: int) -> int:
    h1 = _mix_h1(seed & _MASK, _mix_k1(value & _MASK))
    return _to_signed(_fmix(h1, 4))


def hash_long(value: int, seed: int) -> int:
    v = value & 0xFFFFFFFFFFFFFFFF
    low, high = v & _MASK, (v >> 32) & _MASK
    h1 = _mix_h1(seed & _MASK, _mix_k1(low))
    h1 = _mix_h1(h1, _mix_k1(high))
    return _to_signed(_fmix(h1, 8))


def hash_bytes(data: bytes, seed: int) -> int:
    """Spark's hashUnsafeBytes: word-at-a-time, then each tail byte
    mixed individually as a SIGNED int (non-standard murmur3 tail)."""
    h1 = seed & _MASK
    n = len(data)
    aligned = n - n % 4
    for i in range(0, aligned, 4):
        word = int.from_bytes(data[i:i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(word))
    for i in range(aligned, n):
        b = data[i]
        if b >= 0x80:
            b -= 0x100  # signed byte
        h1 = _mix_h1(h1, _mix_k1(b & _MASK))
    return _to_signed(_fmix(h1, n))


_EPOCH_DATE = _dt.date(1970, 1, 1)


def hash_float(value: float, seed: int) -> int:
    """Spark hashes a float as ``hash_int(floatToIntBits(f))`` with
    ``-0.0f`` normalized to ``0.0f`` (SPARK-26021) and every NaN
    canonicalized to ``0x7FC00000`` (Java ``floatToIntBits``).
    Mirrors the reference's Float32 arm
    (``rust/lakesoul-io/src/utils/hash/mod.rs`` downcast_primitive_array)."""
    f = float(value)
    if _math.isnan(f):
        bits = 0x7FC00000
    else:
        if f == 0.0:
            f = 0.0  # -0.0 == 0.0 → hash as +0.0
        bits = _struct.unpack("<i", _struct.pack("<f", f))[0]
    return hash_int(bits, seed)


def hash_double(value: float, seed: int) -> int:
    """``hash_long(doubleToLongBits(d))`` with the same -0.0/NaN
    normalization as :func:`hash_float`."""
    f = float(value)
    if _math.isnan(f):
        bits = 0x7FF8000000000000
    else:
        if f == 0.0:
            f = 0.0
        bits = _struct.unpack("<q", _struct.pack("<d", f))[0]
    return hash_long(bits, seed)


_DECIMAL_RE = _re.compile(r"decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)")


def _decimal_params(spark_type: str) -> tuple[int, int]:
    m = _DECIMAL_RE.match(spark_type.lower())
    if m:
        return int(m.group(1)), int(m.group(2))
    return 10, 0  # Spark's DecimalType default


def _decimal_unscaled(value, scale: int) -> int:
    d = value if isinstance(value, _decimal.Decimal) else _decimal.Decimal(str(value))
    with _decimal.localcontext() as ctx:
        ctx.prec = 100  # default 28-digit context would ROUND a
        # decimal(38) unscaled value — exactness is the whole point
        unscaled = d.scaleb(scale)
        if unscaled != int(unscaled):
            raise ValueError(
                f"decimal value {d} does not fit scale {scale} exactly"
            )
        return int(unscaled)


def _big_integer_bytes(x: int) -> bytes:
    """Java ``BigInteger.toByteArray()``: minimal big-endian two's
    complement (1 byte for zero)."""
    bl = x.bit_length() if x >= 0 else (-x - 1).bit_length()
    return x.to_bytes(bl // 8 + 1, "big", signed=True)


def hash_decimal(value, spark_type: str, seed: int) -> int:
    """Spark's decimal hash: unscaled long when precision ≤ 18, else
    ``hashUnsafeBytes`` over the BigInteger two's-complement bytes of
    the unscaled value (matches the reference's Decimal128/256 arms)."""
    precision, scale = _decimal_params(spark_type)
    unscaled = _decimal_unscaled(value, scale)
    if precision <= 18:
        return hash_long(unscaled, seed)
    return hash_bytes(_big_integer_bytes(unscaled), seed)


def hash_value(value, spark_type: str, seed: int = 42) -> int:
    """Hash one value with Spark's per-type encoding. ``spark_type`` is
    the simpleString of the column type."""
    t = spark_type.lower()
    if t in ("integer", "int", "short", "smallint", "byte", "tinyint"):
        return hash_int(int(value), seed)
    if t in ("long", "bigint"):
        return hash_long(int(value), seed)
    if t == "date":
        d = value if isinstance(value, _dt.date) else _dt.date.fromisoformat(str(value))
        return hash_int((d - _EPOCH_DATE).days, seed)
    if t.startswith("timestamp"):
        if isinstance(value, _dt.datetime):
            epoch = _dt.datetime(1970, 1, 1, tzinfo=value.tzinfo)
            micros = int((value - epoch).total_seconds() * 1_000_000)
        else:
            micros = int(value)
        return hash_long(micros, seed)
    if t in ("string", "varchar"):
        return hash_bytes(str(value).encode("utf-8"), seed)
    if t == "binary":
        return hash_bytes(bytes(value), seed)
    if t == "boolean":
        return hash_int(1 if value else 0, seed)
    if t in ("float", "real"):
        return hash_float(value, seed)
    if t == "double":
        return hash_double(value, seed)
    if t.startswith("decimal"):
        return hash_decimal(value, t, seed)
    raise ValueError(f"unsupported PK type for bucket pruning: {spark_type}")


def check_pk_type(name: str, spark_type: str) -> None:
    """CREATE-time gate shared by every writer: the bucketing hash is
    defined for exactly these types (this module and its vectorized
    twin ``spark_hash_np``). Rejecting complex/unsupported PKs at table
    creation keeps the Spark writer, ``write_arrow``, and point-lookup
    pruning in agreement — instead of a table that writes fine through
    one path and fails in another. Float/double/decimal are supported
    (the reference hashes Float32/Float64 and Decimal128/256 —
    ``rust/lakesoul-io/src/utils/hash/mod.rs``)."""
    t = spark_type.lower()
    ok = t in (
        "integer", "int", "short", "smallint", "byte", "tinyint",
        "long", "bigint", "date", "string", "varchar", "binary",
        "boolean", "float", "real", "double",
    ) or t.startswith("timestamp") or t.startswith("decimal")
    if not ok:
        raise ValueError(
            f"unsupported PK type for bucketing: column {name!r} has "
            f"type {spark_type} (supported: integral, float, double, "
            "decimal, string, binary, boolean, date, timestamp)"
        )


def bucket_of(values: list, spark_types: list[str], bucket_num: int) -> int:
    """``pmod(hash(pk...), n)`` — the file bucket a PK tuple lands in."""
    h = 42
    for v, t in zip(values, spark_types):
        h = hash_value(v, t, h)
    return h % bucket_num if h % bucket_num >= 0 else h % bucket_num + bucket_num
