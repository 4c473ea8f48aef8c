"""Multimodal column handling: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are NOT available in this container
(environment constraint), so the decode step is a deterministic stub —
but the Spark-side plumbing is real and tested: schema, Arrow batch
shape, ``mapInPandas`` signature, partitioning. Swapping
``_decode_stub`` for a real decoder (PIL/ffmpeg) is a one-function
change; everything else (batch iteration, schema contract, metadata
propagation) is production-shaped.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

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
    """Deterministic fake 'decode': byte stats standing in for real
    feature extraction. A real implementation would do e.g.
    ``PIL.Image.open(io.BytesIO(payload))`` + resize + embed."""
    return {
        "n_bytes": len(payload),
        "checksum": sum(payload) % 997,
        "head_byte": payload[0] if payload else None,
    }


def decode_features(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Feature-extract every payload with ``mapInPandas`` (Arrow-batched;
    the production shape for CPU-heavy per-item decode at 100 TB — one
    Python worker per core, no shuffle, linear scale-out).

    ``real_decode=True`` raises: actual image/audio decoding libraries
    are unavailable in this environment by design."""
    if real_decode:
        raise NotImplementedError(
            "real media decode needs PIL/ffmpeg/torchaudio — not available "
            "in this container; the stub path exercises identical plumbing")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [_decode_stub(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].values,
                "n_bytes": [f["n_bytes"] for f in feats],
                "checksum": [f["checksum"] for f in feats],
                "head_byte": [f["head_byte"] for f in feats],
            })

    return media.mapInPandas(batches, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("payload", BinaryType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
])


def resize_images(media: DataFrame, width: int = 16, height: int = 16,
                  real_decode: bool = False) -> DataFrame:
    """Resize plumbing: per-item transform keeping the binary column
    shape (1 row in → 1 row out, new payload + dimension metadata).
    The stub 'resize' deterministically subsamples the payload to
    width*height bytes; a real implementation decodes with PIL, resizes,
    re-encodes — same schema, same batch iteration.

    The stub slices BYTES (payloads are opaque binary — a real image is
    not text, so byte granularity is the honest stand-in). Callers that
    reinterpret the subsampled payload as text (the driver oracle
    decodes it as UTF-8) rely on the input being single-byte-per-char
    ASCII; byte-subsampled multibyte UTF-8 yields invalid sequences."""
    if real_decode:
        raise NotImplementedError(
            "real image resize needs PIL — not available in this container")
    target = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for p in pdf["payload"]:
                b = bytes(p)
                if len(b) >= target:
                    step = len(b) // target
                    out.append(b[::step][:target])
                else:  # pad by repetition
                    out.append((b * (target // max(len(b), 1) + 1))[:target])
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].values,
                "payload": out,
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
