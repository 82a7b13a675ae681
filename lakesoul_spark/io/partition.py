"""Range-partition descriptor encoding.

``partition_desc`` strings are ``"col=val,col=val"`` with a sentinel for
non-partitioned tables, mirroring the reference metadata layer
(``rust/proto/src/entity.proto:49-51``). Empty / null string values get
sentinel encodings like the reference writer
(``lakesoul-spark/.../TransactionalWrite.scala:187-198``).
"""

from __future__ import annotations

import urllib.parse

from lakesoul_spark.meta.store import NON_PARTITIONED

NULL_STRING = "__L@KESOUL_NULL__"
EMPTY_STRING = "__L@KESOUL_EMPTY_STRING__"
HIVE_DEFAULT_PARTITION = "__HIVE_DEFAULT_PARTITION__"


# Spark's ExternalCatalogUtils.escapePathName set (Unix): ASCII control
# chars plus these printables; everything else (incl. space) is written
# literally into the directory name.
_SPARK_ESCAPED = set('"#%\'*/:=?\\\x7f{[]^') | {chr(c) for c in range(1, 32)}


def escape_path_name(s: str) -> str:
    """Byte-for-byte twin of Spark's hive-style dir-name escaping
    (ExternalCatalogUtils.escapePathName): only Spark's escape set maps
    to %XX (uppercase hex) — NOT a generic URL-quote, which would
    escape spaces/unicode and diverge from what ``partitionBy``
    writes. Used by the Spark-free arrow writer so both writers emit
    identical directory names."""
    return "".join(
        f"%{ord(ch):02X}" if ch in _SPARK_ESCAPED else ch for ch in s
    )


def encode_value(v) -> str:
    if v is None:
        return NULL_STRING
    s = str(v)
    if s == "":
        return EMPTY_STRING
    return urllib.parse.quote(s, safe="")


def decode_value(s: str) -> str | None:
    if s in (NULL_STRING, HIVE_DEFAULT_PARTITION):
        return None
    if s == EMPTY_STRING:
        return ""
    return urllib.parse.unquote(s)


def make_desc(range_cols: list[str], values: list) -> str:
    if not range_cols:
        return NON_PARTITIONED
    return ",".join(f"{c}={encode_value(v)}" for c, v in zip(range_cols, values))


def parse_desc(desc: str) -> dict[str, str | None]:
    """partition_desc → {col: decoded string value (None for null)}."""
    if desc == NON_PARTITIONED or not desc:
        return {}
    out: dict[str, str | None] = {}
    for part in desc.split(","):
        k, _, v = part.partition("=")
        out[k] = decode_value(v)
    return out


def desc_from_dir_components(components: list[str]) -> str:
    """Hive-style ``col=val`` dir names (as written by Spark's
    ``partitionBy``) → partition_desc. Spark URL-escapes dir values
    (ExternalCatalogUtils.escapePathName), same scheme we decode."""
    if not components:
        return NON_PARTITIONED
    parts = []
    for comp in components:
        k, _, v = comp.partition("=")
        raw = urllib.parse.unquote(v)
        if v == HIVE_DEFAULT_PARTITION:
            parts.append(f"{k}={NULL_STRING}")
        elif raw in (NULL_STRING, EMPTY_STRING):
            # writer-planted sentinels (null / empty string survive
            # partitionBy distinctly) — pass through verbatim, never
            # re-quoted (encode_value would escape the '@')
            parts.append(f"{k}={raw}")
        else:
            # re-encode with our quoting to normalize
            parts.append(f"{k}={encode_value(raw)}")
    return ",".join(parts)
