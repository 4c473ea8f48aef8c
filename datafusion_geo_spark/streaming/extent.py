"""Incremental (streaming) spatial extent over the events stream.

Extends the reference's only aggregate — st_extent, a two-phase
partial/merge/final bbox union (/root/reference/src/function/extent.rs:75-128)
— to unbounded data with Structured Streaming: per event-time window and
event_type, maintain the running bbox of event points.

Output modes (the deployable path is APPEND, the default):

- ``append``: a window is emitted exactly once, when the watermark
  passes its end; its state is then evicted. State size is O(open
  windows × groups) regardless of stream length and the sink receives
  each finalized bbox once — this is the mode an unbounded production
  stream runs. Note Spark's drop of late rows is LAZY: a behind-
  watermark row merges into a window whose state is still alive and is
  only guaranteed dropped after that window was emitted + evicted
  (pinned in tests/test_streaming_semantics.py).
- ``complete``: Spark keeps ALL window state forever and re-emits the
  full result every trigger — unbounded state on an unbounded stream.
  Only correct for bounded replays; it is what the bounded-oracle
  correctness runner uses because it reports every window including the
  still-open ones.

Points derive analytically from event columns (x = value,
y = user_id % 100) so the batch/DuckDB oracle can reproduce results
exactly — on a bounded input, availableNow streaming ≡ batch SQL
(append mode ≡ batch SQL restricted to windows closed by the final
watermark).
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
                     watermark: str = "2 hours",
                     output_mode: str = "append") -> DataFrame:
    """Run the windowed extent over the bounded events fixture with an
    availableNow trigger and return the result as a DataFrame.

    Plan shape: file stream source → event-time watermark → window +
    group-by aggregation (native min/max, partial+final with streaming
    state store) → memory sink. On a real cluster the same query runs
    unbounded (kafka/file source) with identical semantics — in the
    default ``append`` mode, where each window is emitted once when the
    watermark passes it and its state is evicted (see module docstring
    for the append/complete trade-off)."""
    if output_mode not in ("append", "complete"):
        raise ValueError(f"output_mode must be append|complete, got "
                         f"{output_mode!r}")
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
    # r12: state partitions from source volume (always sound); the
    # no-data batch is dropped ONLY in complete mode — APPEND mode
    # needs it, it is the batch whose watermark advance flushes the
    # final windows to the sink (runner.replay_confs)
    from .runner import replay_confs
    with replay_confs(spark,
                      source_paths=(f"{sf_dir}/events.parquet",),
                      drop_no_data=(output_mode == "complete")):
        q = (agg.writeStream.format("memory").queryName(name)
             .outputMode(output_mode).trigger(availableNow=True).start())
        q.awaitTermination()
    return spark.table(name).select(
        F.col("w.start").alias("window_start"), "event_type",
        "xmin", "ymin", "xmax", "ymax", "n_events")
