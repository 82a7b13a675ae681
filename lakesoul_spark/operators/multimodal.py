"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas stages.

The Spark-side machinery here is real and tested — schema contract,
`mapInPandas` batch shape, partition-parallel execution; only the
media decode itself is stubbed (deterministic fake features behind
``decode_stub``) because media libraries are out of scope for this
container. Swapping in PIL/ffmpeg is a one-function change.

Scale design: payloads never leave executors, batches stream through
Arrow (`spark.sql.execution.arrow.maxRecordsPerBatch` bounds memory),
and feature extraction is a map-only stage — no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, payload binary, media_type string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, byte_len long, "
    "payload_md5 string, feature_dim int"
)


def pack_media(df: DataFrame, id_col: str, data_col: str, media_type: str) -> DataFrame:
    """Wrap an arbitrary column as an opaque binary payload with typed
    metadata — the storage shape for multimodal tables (binary column +
    metadata columns, never parsed by the engine itself)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(data_col).cast("string"), "UTF-8").alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
    )


def decode_stub(payload: bytes, media_type: str) -> dict:
    """STUB decode. Real deployments replace this with PIL / torchaudio /
    ffmpeg frame sampling; the container has no media libs, so features
    are deterministic functions of the bytes (md5, length)."""
    import hashlib

    return {
        "byte_len": len(payload),
        "payload_md5": hashlib.md5(payload).hexdigest(),
        "feature_dim": 0,
    }


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column via
    ``mapInPandas`` — the pattern for decode / resize / frame-sample
    stages. Batch shape: pandas DataFrames of the input schema;
    output rows need not align 1:1 with input rows."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = [
                decode_stub(p, t)
                for p, t in zip(pdf["payload"], pdf["media_type"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "media_type", pdf["media_type"].values)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, payload binary, media_type string, "
    "width int, height int, duration_ms int"
)

FRAME_SCHEMA = "media_id long, frame_index int, frame_md5 string"


def resize_media(media: DataFrame, *, width: int, height: int) -> DataFrame:
    """Resize stage: 1:1 binary→binary map with updated metadata. The
    pixel work is STUBBED (no PIL in this container: the fake "resized"
    payload is the md5 digest cycled to exactly width*height*3 bytes,
    deterministic in the input); the Spark-side shape — Arrow-batched
    binary in/out, metadata columns rewritten, map-only stage — is the
    real contract a PIL-backed implementation drops into."""
    import hashlib

    import pandas as pd

    n_bytes = width * height * 3

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            digests = [hashlib.md5(p).digest() for p in pdf["payload"]]
            out = pdf.copy()
            out["payload"] = [
                (d * (n_bytes // len(d) + 1))[:n_bytes] for d in digests
            ]
            out["width"] = width
            out["height"] = height
            yield out

    return media.mapInPandas(run, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, *, every_ms: int) -> DataFrame:
    """Frame-sampling stage: 1:N fan-out through ``mapInPandas`` (one
    input video row → ceil(duration/every_ms) frame rows) — the batch
    shape a real ffmpeg-backed sampler uses. The frame DECODE is
    stubbed deterministically (frame_md5 = md5(payload_md5 ':' idx)),
    which keeps the fan-out itself fully value-checkable by a SQL
    oracle."""
    import hashlib

    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, idxs, md5s = [], [], []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                if dur is None or pd.isna(dur):
                    continue
                pmd5 = hashlib.md5(payload).hexdigest()
                n = (int(dur) + every_ms - 1) // every_ms
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    md5s.append(
                        hashlib.md5(f"{pmd5}:{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame_md5": md5s}
            )

    return media.mapInPandas(run, FRAME_SCHEMA)
