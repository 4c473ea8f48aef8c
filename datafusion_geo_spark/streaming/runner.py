"""Shared bounded-replay runner for streaming operators' oracle paths."""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame


def run_bounded_complete(agg: DataFrame, prefix: str) -> DataFrame:
    """Run a streaming aggregate to completion over a bounded source
    (availableNow trigger, complete mode, in-memory sink) and return the
    final result as a batch DataFrame. ONE definition of the runner so a
    fix (checkpointing, sink choice) lands everywhere. The memory table
    stays registered for the session — the returned frame reads from it
    lazily, so it cannot be dropped here; bounded-oracle runs create a
    handful of small tables, not an unbounded leak."""
    name = prefix + uuid.uuid4().hex[:8]
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    return agg.sparkSession.table(name)
