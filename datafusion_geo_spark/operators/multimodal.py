"""Multimodal column handling: opaque binary payloads + typed metadata.

Decode is ENVIRONMENT-ADAPTIVE: when Pillow is importable
(``_HAS_PIL``), image payloads are really decoded (dimensions
extracted, resize re-encoded); otherwise — and for any payload PIL
cannot open, e.g. the text stand-ins in the fixtures — a deterministic
byte-stat stub runs instead. BOTH paths emit the same schema and
compute the payload-metadata columns (n_bytes / checksum / head_byte)
identically from the raw bytes, so swapping environments never changes
the metadata contract — only the decode-only columns
(decoded/width/height) light up. ffmpeg-style audio/video decoding has
no in-container library either; audio features are computed natively
(numpy PCM DSP, :func:`audio_frame_features`).
"""

from __future__ import annotations

import importlib.util

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (BinaryType, BooleanType, IntegerType, LongType,
                               StringType, StructField, StructType)

#: Pillow availability probe — decides the default decode path at import
#: time (cheap: find_spec does not import the module).
_HAS_PIL = importlib.util.find_spec("PIL") is not None

MEDIA_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("payload", BinaryType()),
    StructField("media_type", StringType()),
    StructField("n_bytes", IntegerType()),
])

FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", IntegerType()),
    StructField("checksum", LongType()),
    StructField("head_byte", IntegerType()),
    # decode-only columns: -1/False when the payload is not a decodable
    # image OR no decoder is present (sentinels, not NULLs — keeps the
    # pandas/DuckDB dtypes integer under every environment)
    StructField("decoded", BooleanType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
])


def to_media(df: DataFrame, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Derive a media table from documents: payload = utf-8 bytes of the
    text (a deterministic stand-in for image/audio blobs), plus typed
    metadata columns. At scale this is the landing schema for any binary
    modality: (key, payload binary, media_type, n_bytes)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.length(payload).alias("n_bytes"),
    )


def _decode_stub(payload: bytes) -> dict:
    """Deterministic byte-stat 'decode': the payload-metadata columns
    every path shares, plus not-decoded sentinels. Runs when no image
    library is present OR the payload is not a decodable image."""
    return {
        "n_bytes": len(payload),
        "checksum": sum(payload) % 997,
        "head_byte": payload[0] if payload else None,
        "decoded": False, "width": -1, "height": -1,
    }


def _decode_real(payload: bytes) -> dict:
    """PIL-backed decode: identical byte-metadata computation, plus real
    image dimensions when the payload opens as an image. Any payload
    PIL rejects (text stand-ins, truncated blobs) falls back to the
    stub row — so on non-image corpora the real and stub paths agree
    on EVERY column (tested in tests/test_multimodal.py)."""
    feat = _decode_stub(payload)
    try:
        import io

        from PIL import Image
        with Image.open(io.BytesIO(payload)) as im:
            feat.update(decoded=True, width=im.width, height=im.height)
    except Exception:
        pass
    return feat


_FEATURE_COLS = ("n_bytes", "checksum", "head_byte",
                 "decoded", "width", "height")


def decode_features(media: DataFrame, real_decode: bool = None) -> DataFrame:
    """Feature-extract every payload with ``mapInPandas`` (Arrow-batched;
    the production shape for CPU-heavy per-item decode at 100 TB — one
    Python worker per core, no shuffle, linear scale-out).

    ``real_decode``: None (default) auto-detects Pillow on the driver
    (``_HAS_PIL``); True requires it (ImportError otherwise); False
    forces the stub. Both paths share the schema and the byte-metadata
    columns; only decoded/width/height differ, and only on payloads
    that actually ARE images."""
    if real_decode is None:
        real_decode = _HAS_PIL
    if real_decode and not _HAS_PIL:
        raise ImportError(
            "decode_features(real_decode=True) needs Pillow, which is not "
            "importable here; pass real_decode=False/None for the stub path")
    decode = _decode_real if real_decode else _decode_stub

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode(bytes(p)) for p in pdf["payload"]]
            out = {"doc_id": pdf["doc_id"].values}
            out.update({c: [f[c] for f in feats] for c in _FEATURE_COLS})
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("payload", BinaryType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
])


def _resize_stub(b: bytes, target: int) -> bytes:
    """Deterministic byte 'resize': subsample to target bytes (or pad by
    repetition). Bytes, not chars — payloads are opaque binary; a real
    image is not text. Callers that reinterpret the output as text (the
    driver oracle decodes it as UTF-8) rely on the input being
    single-byte-per-char ASCII."""
    if len(b) >= target:
        step = len(b) // target
        return b[::step][:target]
    return (b * (target // max(len(b), 1) + 1))[:target]


def resize_images(media: DataFrame, width: int = 16, height: int = 16,
                  real_decode: bool = None) -> DataFrame:
    """Resize plumbing: per-item transform keeping the binary column
    shape (1 row in → 1 row out, new payload + dimension metadata).

    ``real_decode`` follows the :func:`decode_features` contract: None
    auto-detects Pillow, True requires it, False forces the stub. On
    the real path a payload PIL can open is decoded, resized to
    (width, height) and re-encoded as PNG; anything else gets the stub
    byte-subsample — so the two paths agree row-for-row on non-image
    corpora (the fixtures), and the output schema never varies."""
    if real_decode is None:
        real_decode = _HAS_PIL
    if real_decode and not _HAS_PIL:
        raise ImportError(
            "resize_images(real_decode=True) needs Pillow, which is not "
            "importable here; pass real_decode=False/None for the stub path")
    target = width * height

    def one(b: bytes) -> bytes:
        if real_decode:
            try:
                import io

                from PIL import Image
                with Image.open(io.BytesIO(b)) as im:
                    buf = io.BytesIO()
                    im.resize((width, height)).save(buf, format="PNG")
                    return buf.getvalue()
            except Exception:
                pass  # not an image — fall through to the stub
        return _resize_stub(b, target)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].values,
                "payload": [one(bytes(p)) for p in pdf["payload"]],
                "width": width, "height": height,
            })

    return media.mapInPandas(batches, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame", BinaryType()),
    StructField("byte_offset", IntegerType()),
])


def sample_frames(media: DataFrame, frame_size: int = 64,
                  stride: int = 2) -> DataFrame:
    """Frame sampling plumbing: the 1→N row explosion a video pipeline
    needs — each payload yields every ``stride``-th fixed-size chunk as
    its own row. ``mapInPandas`` handles the fan-out without a shuffle;
    output rows stay co-partitioned with their source item (frame-level
    downstream ops — embed, filter — start from here)."""
    step = frame_size * stride

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames, offs = [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(p)
                for fi, off in enumerate(range(0, len(b), step)):
                    ids.append(doc_id)
                    idxs.append(fi)
                    frames.append(b[off:off + frame_size])
                    offs.append(off)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs,
                                "frame": frames, "byte_offset": offs})

    return media.mapInPandas(batches, FRAME_SCHEMA)


AUDIO_FRAME_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("n_samples", IntegerType()),
    StructField("sum_sq", LongType()),
    StructField("zcr", IntegerType()),
])


def audio_frame_features(media: DataFrame, window: int = 256) -> DataFrame:
    """REAL audio-style feature extraction (no external libs — numpy
    only): payloads are interpreted as unsigned 8-bit PCM, framed into
    ``window``-sample windows, each window DC-centered at its integer
    floor-mean, then reduced to energy (sum of squared centered
    samples) and zero-crossing count. All-integer arithmetic, so the
    result is EXACT and engine-portable — unlike the stubbed
    image/video decoders this path computes a genuine DSP feature.

    Scale shape: mapInPandas over Arrow batches, one output row per
    (payload, frame) — embarrassingly parallel, no shuffle until the
    caller aggregates."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "frame_idx", "n_samples",
                                    "sum_sq", "zcr")}
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                s = np.frombuffer(bytes(payload), dtype=np.uint8) \
                    .astype(np.int64)
                for f in range(0, max(len(s), 1), window):
                    win = s[f:f + window]
                    if len(win) == 0:
                        continue
                    m = int(win.sum()) // len(win)
                    c = win - m
                    sq = int((c * c).sum())
                    neg = c < 0
                    z = int((neg[1:] != neg[:-1]).sum())
                    rows["doc_id"].append(did)
                    rows["frame_idx"].append(f // window)
                    rows["n_samples"].append(len(win))
                    rows["sum_sq"].append(sq)
                    rows["zcr"].append(z)
            yield pd.DataFrame(rows)

    return media.select("doc_id", "payload").mapInPandas(
        gen, schema=AUDIO_FRAME_SCHEMA)
