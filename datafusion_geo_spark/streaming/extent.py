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

import hashlib
import os
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType, TimestampType)

# The events fixture stores ts as parquet TIMESTAMP(NANOS), which Spark's
# parquet reader rejects outright ([PARQUET_TYPE_ILLEGAL]). We read it as
# raw int64 nanos (spark.sql.legacy.parquet.nanosAsLong) and convert to a
# microsecond timestamp with integer division — never via double, which
# loses precision above 2^53.
EVENTS_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", LongType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
    StructField("props", StringType()),
])


def _symlink_dir(file_path: str) -> str:
    """Directory (under the repo's .cache) containing a symlink to the
    given file — makes a single read-only file consumable by the
    directory-based file stream source."""
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".cache", "streams")
    key = hashlib.md5(file_path.encode()).hexdigest()[:12]
    d = os.path.join(root, key)
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, os.path.basename(file_path))
    if not os.path.islink(link):
        os.symlink(file_path, link)
    return d


def streaming_extent(spark: SparkSession, sf_dir: str,
                     window: str = "1 hour",
                     watermark: str = "2 hours") -> DataFrame:
    """Run the windowed extent over the bounded events fixture with an
    availableNow trigger and return the final result as a DataFrame.

    Plan shape: file stream source → event-time watermark → window +
    group-by aggregation (native min/max, partial+final with streaming
    state store) → memory sink. On a real cluster the same query runs
    unbounded (kafka/file source) with identical semantics."""
    # The file-stream source needs a *directory*; the fixture is a single
    # read-only parquet file. Expose it through a symlink directory under
    # the repo (the only writable location in this environment).
    stream_dir = _symlink_dir(f"{sf_dir}/events.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = (spark.readStream.schema(EVENTS_SCHEMA).parquet(stream_dir))
    pts = stream.select(
        F.timestamp_micros(F.expr("ts div 1000")).alias("ts"),
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
