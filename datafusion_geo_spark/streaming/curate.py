"""Streaming curation: quality-gate + first-seen dedup as one stream.

The curate-as-you-ingest shape (the reference has no streaming surface,
SURVEY.md §2.9): documents arrive on a stream, the stateless Gopher
quality gate drops junk BEFORE any state is keyed (the cheapest place
to shed load), and survivors dedup by content hash with a struct-MIN
first-seen aggregate — one streaming aggregation, which is all
Structured Streaming allows (chained streaming aggregates are
unsupported; any per-language rollup happens downstream on the compacted
output, which is orders of magnitude smaller than the input).

State story: one row per distinct surviving content hash. Bounded-replay
runner below (complete + availableNow) equals the batch query the DuckDB
oracle runs; an unbounded deployment uses update mode to an upsert sink
with the same state-residency story documented for streaming first-seen
dedup (streaming/dedup.py module docstring).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.text import gopher_metrics
from ..sources.fixtures import load_documents_stream
from .runner import run_bounded_complete


def streaming_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-fixture runner: documents stream (with injected exact
    copies, id+1000000, so the dedup state is exercised) → Gopher keep
    filter → first-seen-by-content-hash with copy counts. Returns the
    compacted batch result (availableNow replay, memory sink)."""
    src = load_documents_stream(spark, sf_dir).select(
        "doc_id", "text", "lang")
    dup = src.select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                     "text", "lang")
    u = src.unionByName(dup)
    m = gopher_metrics(F.col("text"))
    kept = u.where(m["keep"]).select(
        "doc_id", "text", "lang",
        # reuse the metric's word count — a fresh words_col() here would
        # re-split every surviving document's text a second time
        m["n_words"].cast("int").alias("n_tokens"))
    agg = (kept
           .groupBy(F.md5(F.col("text")).alias("text_md5"))
           .agg(F.min(F.struct("doc_id", "lang", "n_tokens")).alias("c"),
                F.count(F.lit(1)).alias("n_copies")))
    return run_bounded_complete(agg, "stream_curate_",
                                source_paths=(
                                    f"{sf_dir}/documents.parquet",)).select(
        "text_md5",
        F.col("c.doc_id").alias("canonical_id"),
        F.col("c.lang").alias("lang"),
        F.col("c.n_tokens").alias("n_tokens"),
        "n_copies")
