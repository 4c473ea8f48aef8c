"""Python UDTF surface (Spark 4 `@udtf`): table-valued functions for
one-row-to-many-rows expansion inside SQL/LATERAL.

The reference exposes no UDTF (SURVEY §2.10 — scalar UDFs + one UDAF
only); Spark adds the surface, and this module demonstrates it with a
chunker that is GATED EQUAL to the fast-path operator
(operators/dedup.py chunk_documents — pure higher-order array
functions): identical stride/window/tail semantics, identical output,
same DuckDB oracle. Same philosophy as sources/pyds.py: the Python
surface exists for logic built-ins can't express; when built-ins can
express it, they win (the UDTF is row-at-a-time Python — the honest
cost), and the gate proves the two implementations never drift.

returnType is a StructType INSTANCE (the normalize.py rule: DDL
strings parse through the active session at import time).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf
from pyspark.sql.types import (IntegerType, StringType, StructField,
                               StructType)

__all__ = ["ChunkUDTF", "CHUNK_TOKENS", "OVERLAP"]

CHUNK_TOKENS = 64
OVERLAP = 16
_STRIDE = CHUNK_TOKENS - OVERLAP

_SCHEMA = StructType([
    StructField("chunk_idx", IntegerType()),
    StructField("chunk_text", StringType()),
    StructField("n_tokens", IntegerType()),
])


@udtf(returnType=_SCHEMA)
class ChunkUDTF:
    """LATERAL chunker: yields the overlapping 64-token windows of one
    document (stride 48), final partial window kept iff it starts
    inside the document — chunk_documents' exact contract, including
    the single empty chunk for degenerate input."""

    def eval(self, text: str):
        words = [] if text is None else text.split()
        n = len(words)
        n_chunks = max(1, (n - OVERLAP + _STRIDE - 1) // _STRIDE)
        for i in range(n_chunks):
            piece = words[i * _STRIDE:i * _STRIDE + CHUNK_TOKENS]
            yield i, " ".join(piece), min(n - i * _STRIDE, CHUNK_TOKENS)
