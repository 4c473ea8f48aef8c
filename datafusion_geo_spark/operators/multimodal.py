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
