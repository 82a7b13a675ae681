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


_PIL_PROBE: list = []  # [] = unprobed, [None] = absent, [module] = present


def _pil():
    """Optional real image decode: PIL when installed, else None.
    Resolved lazily (executors probe their own environment) but cached
    per process — a FAILED import is not cached in sys.modules, so an
    uncached probe would re-walk sys.path for every payload."""
    if not _PIL_PROBE:
        try:
            from PIL import Image
            _PIL_PROBE.append(Image)
        except ImportError:
            _PIL_PROBE.append(None)
    return _PIL_PROBE[0]


_AV_PROBE: list = []  # same caching contract as _PIL_PROBE


def _av():
    """Optional real video decode: PyAV (ffmpeg bindings) when
    installed, else None — the video twin of the PIL gate."""
    if not _AV_PROBE:
        try:
            import av
            _AV_PROBE.append(av)
        except ImportError:
            _AV_PROBE.append(None)
    return _AV_PROBE[0]


def decode_stub(payload: bytes, media_type: str) -> dict:
    """STUB decode: features are deterministic functions of the bytes
    (md5, length). The real path (:func:`decode_media`) is used when
    PIL is installed AND the payload actually decodes."""
    import hashlib

    return {
        "byte_len": len(payload),
        "payload_md5": hashlib.md5(payload).hexdigest(),
        "feature_dim": 0,
    }


def decode_media(payload: bytes, media_type: str) -> dict:
    """Decode features for one payload: real pixel metadata via PIL for
    images when the library exists and the bytes parse as an image;
    otherwise the deterministic stub. Non-image payloads (and every
    payload in this PIL-less container) take the stub path, so
    oracle-checked fixtures hash identically with or without PIL."""
    image_mod = _pil()
    if image_mod is not None and media_type == "image":
        import io

        try:
            with image_mod.open(io.BytesIO(payload)) as img:
                feats = decode_stub(payload, media_type)
                # real decode: feature_dim = per-pixel channels x pixels
                feats["feature_dim"] = (
                    len(img.getbands()) * img.width * img.height
                )
                return feats
        except Exception:
            pass  # undecodable bytes → stub
    return decode_stub(payload, media_type)


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column via
    ``mapInPandas`` — the pattern for decode / resize / frame-sample
    stages. Batch shape: pandas DataFrames of the input schema;
    output rows need not align 1:1 with input rows."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = [
                decode_media(p, t)
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
    """Resize stage: 1:1 binary→binary map with updated metadata.

    When PIL is installed and a payload decodes as an image, the resize
    is REAL (bilinear to width×height, RGB bytes out). Otherwise —
    including every payload in this PIL-less container and any
    undecodable bytes — the deterministic stub runs: the fake "resized"
    payload is the md5 digest cycled to exactly width*height*3 bytes.
    Either way the Spark-side contract is identical: Arrow-batched
    binary in/out, metadata columns rewritten, map-only stage."""
    import hashlib

    import pandas as pd

    n_bytes = width * height * 3

    def one(payload: bytes) -> bytes:
        image_mod = _pil()
        if image_mod is not None:
            import io

            try:
                with image_mod.open(io.BytesIO(payload)) as img:
                    return img.convert("RGB").resize((width, height)).tobytes()
            except Exception:
                pass
        d = hashlib.md5(payload).digest()
        return (d * (n_bytes // len(d) + 1))[:n_bytes]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [one(p) for p in pdf["payload"]]
            out["width"] = width
            out["height"] = height
            yield out

    return media.mapInPandas(run, RESIZED_SCHEMA)


WAV_FEATURE_SCHEMA = (
    "media_id long, sample_rate int, n_channels int, sample_width int, "
    "n_frames long, duration_ms long, rms double"
)


def synthesize_wav(
    n_frames: int, amplitude: int, *, sample_rate: int = 8000
) -> bytes:
    """Deterministic mono 16-bit PCM WAV: a square wave of constant
    magnitude ``amplitude`` (samples alternate +a/-a), so the decoded
    RMS is exactly ``amplitude`` — which keeps real signal math
    SQL-oracle-checkable. Used by tests and the audio query fixture."""
    import io
    import wave

    import numpy as np

    samples = np.full(int(n_frames), int(amplitude), dtype=np.int16)
    samples[1::2] *= -1
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_audio(payload: bytes) -> dict | None:
    """REAL audio decode via the stdlib ``wave`` module (no optional
    dependency, unlike the PIL/PyAV gates): parse the RIFF/WAVE header
    for rate/channels/width/frames and compute RMS amplitude from the
    PCM samples with numpy. Returns None when the bytes are not a WAV
    (callers fall back to null features).

    Reference analog: LakeSoul stores media as opaque binary and
    delegates decode to Python-side consumers
    (python/src/lakesoul/arrow/dataset.py); here decode itself is an
    engine operator stage."""
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            nch = w.getnchannels()
            sw = w.getsampwidth()
            rate = w.getframerate()
            nf = w.getnframes()
            frames = w.readframes(nf)
    except Exception:
        return None
    rms = None
    if sw == 2 and frames:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float64)
        rms = float(np.sqrt(np.mean(x * x)))
    return {
        "sample_rate": rate,
        "n_channels": nch,
        "sample_width": sw,
        "n_frames": nf,
        "duration_ms": nf * 1000 // rate if rate else 0,
        "rms": rms,
    }


def pack_wav(
    df: DataFrame,
    id_col: str,
    frames_col,
    amplitude_col,
    *,
    sample_rate: int = 8000,
) -> DataFrame:
    """Synthesize a WAV payload per row (Arrow-batched, executor-side —
    payloads never touch the driver) into the standard MEDIA_SCHEMA.
    ``frames_col``/``amplitude_col`` are Column expressions evaluated
    per row; the payload is :func:`synthesize_wav` of their values."""
    import pandas as pd

    base = df.select(
        F.col(id_col).cast("long").alias("media_id"),
        frames_col.cast("int").alias("_frames"),
        amplitude_col.cast("int").alias("_amp"),
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": [
                        synthesize_wav(nf, a, sample_rate=sample_rate)
                        for nf, a in zip(pdf["_frames"], pdf["_amp"])
                    ],
                    "media_type": "audio",
                    "width": pd.array([None] * len(pdf), dtype="Int32"),
                    "height": pd.array([None] * len(pdf), dtype="Int32"),
                    "duration_ms": pd.array(
                        [
                            int(nf) * 1000 // sample_rate
                            for nf in pdf["_frames"]
                        ],
                        dtype="Int32",
                    ),
                }
            )

    return base.mapInPandas(run, MEDIA_SCHEMA)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Audio feature extraction over binary payloads: real WAV decode
    (stdlib ``wave`` + numpy RMS) through ``mapInPandas``; payloads
    that do not parse as WAV keep their row with null features (a
    feature extractor must not silently drop rows). Batch output is
    assembled COLUMN-wise — per-row dicts cost more than the decode
    itself at thousands of rows per Arrow batch."""
    import pandas as pd

    _keys = ("sample_rate", "n_channels", "sample_width", "n_frames",
             "duration_ms", "rms")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            cols: dict = {"media_id": pdf["media_id"]}
            for k in _keys:
                cols[k] = []
            for payload in pdf["payload"]:
                feats = decode_audio(payload)
                for k in _keys:
                    cols[k].append(feats[k] if feats else None)
            yield pd.DataFrame(cols)

    return media.mapInPandas(run, WAV_FEATURE_SCHEMA)


def _real_frames(payload: bytes, every_ms: int, av_mod) -> list[str] | None:
    """Decode ``payload`` with PyAV and return the md5 of the RGB bytes
    of one frame per ``every_ms`` of media time; None when the bytes do
    not open as a video (→ caller falls back to the stub)."""
    import hashlib
    import io

    try:
        with av_mod.open(io.BytesIO(payload)) as container:
            stream = container.streams.video[0]
            out: list[str] = []
            next_ts = 0.0
            for frame in container.decode(stream):
                t_ms = float(frame.time or 0.0) * 1000.0
                if t_ms + 1e-6 >= next_ts:
                    rgb = frame.to_ndarray(format="rgb24")
                    out.append(hashlib.md5(rgb.tobytes()).hexdigest())
                    next_ts += every_ms
            return out or None
    except Exception:
        return None


def sample_frames(media: DataFrame, *, every_ms: int) -> DataFrame:
    """Frame-sampling stage: 1:N fan-out through ``mapInPandas`` (one
    input video row → ceil(duration/every_ms) frame rows) — the batch
    shape a real ffmpeg-backed sampler uses.

    When PyAV (ffmpeg bindings) is installed AND the payload opens as a
    video, frames are REALLY decoded — one per ``every_ms`` of media
    time, ``frame_md5`` = md5 of the frame's RGB bytes (mirror of the
    PIL gate in :func:`decode_media`). Otherwise — every payload in
    this av-less container, and any undecodable bytes — the
    deterministic stub runs (frame_md5 = md5(payload_md5 ':' idx) over
    the metadata duration), which keeps the fan-out fully
    value-checkable by a SQL oracle on stub fixtures."""
    import hashlib

    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        av_mod = _av()
        for pdf in batches:
            ids, idxs, md5s = [], [], []
            for mid, payload, mtype, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["media_type"],
                pdf["duration_ms"],
            ):
                if av_mod is not None and mtype == "video":
                    real = _real_frames(payload, every_ms, av_mod)
                    if real is not None:
                        for i, h in enumerate(real):
                            ids.append(mid)
                            idxs.append(i)
                            md5s.append(h)
                        continue
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
