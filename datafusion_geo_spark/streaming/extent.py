"""Incremental (streaming) spatial extent over the events stream.

Extends the reference's only aggregate — st_extent, a two-phase
partial/merge/final bbox union (/root/reference/src/function/extent.rs:75-128)
— to unbounded data with Structured Streaming: per event-time window and
event_type, maintain the running bbox of event points. The watermark
bounds state: windows older than the watermark are finalized and dropped,
so state size is O(active windows × groups) regardless of stream length.

Points derive analytically from event columns (x = value,
y = user_id % 100) so the batch/DuckDB oracle can reproduce results
exactly — on a bounded input, availableNow streaming ≡ batch SQL.
"""

from __future__ import annotations

import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# Event ingestion (schema-adaptive ts normalization, stream-dir shim) is
# shared with the batch path — ONE loader, so a fixture encoding change
# cannot diverge batch from streaming again (the round-2 regression).
from ..sources.fixtures import _symlink_dir, load_events_stream  # noqa: F401


def streaming_extent(spark: SparkSession, sf_dir: str,
                     window: str = "1 hour",
                     watermark: str = "2 hours") -> DataFrame:
    """Run the windowed extent over the bounded events fixture with an
    availableNow trigger and return the final result as a DataFrame.

    Plan shape: file stream source → event-time watermark → window +
    group-by aggregation (native min/max, partial+final with streaming
    state store) → memory sink. On a real cluster the same query runs
    unbounded (kafka/file source) with identical semantics."""
    stream = load_events_stream(spark, sf_dir)
    pts = stream.select(
        "ts",
        "event_type",
        F.col("value").alias("x"),
        (F.col("user_id") % 100).cast("double").alias("y"))
    agg = (pts.withWatermark("ts", watermark)
           .groupBy(F.window("ts", window).alias("w"), "event_type")
           .agg(F.min("x").alias("xmin"), F.min("y").alias("ymin"),
                F.max("x").alias("xmax"), F.max("y").alias("ymax"),
                F.count("*").alias("n_events")))
    name = "stream_extent_" + uuid.uuid4().hex[:8]
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name).select(
        F.col("w.start").alias("window_start"), "event_type",
        "xmin", "ymin", "xmax", "ymax", "n_events")
