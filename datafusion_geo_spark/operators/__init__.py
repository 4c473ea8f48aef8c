"""Operators beyond the reference's ST_* surface: spatial join
strategies, plus the LLM training-data pipeline set (dedup, similarity
search, text analysis, multimodal columns) — BASELINE.json north star."""

from . import (asof_join, dedup, multimodal, range_join, sampling,
               similarity, spatial_join, text)

__all__ = ["asof_join", "dedup", "multimodal", "range_join", "sampling",
           "similarity", "spatial_join", "text"]
