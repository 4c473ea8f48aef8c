"""Shared bounded-replay runner for streaming operators' oracle paths."""

from __future__ import annotations

import contextlib
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


def _source_bytes(*paths: str) -> int:
    """Total bytes under the given files/directories (driver-side local
    listing — the fixture stream sources are local dirs; an object-store
    deployment would take the size from its catalog or FileSystem
    listing the same way the rollup compactor does)."""
    total = 0
    for p in paths:
        if os.path.isfile(p):
            total += os.path.getsize(p)
        elif os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                for f in files:
                    with contextlib.suppress(OSError):
                        total += os.path.getsize(os.path.join(root, f))
    return total


def stateful_shuffle_partitions(spark: SparkSession, *paths: str) -> int:
    """Scale-adaptive shuffle-partition count for a STATEFUL streaming
    query over the given bounded source: ~1 partition per 32 MB of
    source, clamped to [1, defaultParallelism].

    Why (guide §2 "make partitioning scale-adaptive, not a constant"):
    every stateful-operator partition owns its own state store, and each
    store pays per-micro-batch file-commit work whether or not it holds
    any state — a stream-stream join keeps FOUR stores per partition.
    Inheriting the session's core-count-sized shuffle partitions means a
    few-hundred-row replay commits 32x4 store files per batch for idle
    stores (measured: streaming_join 5.8 s -> 2.3 s at sf0.1 when the
    state partitioning follows the data volume). The same rule sizes
    partitions UP with a bigger source; the defaultParallelism clamp
    only reproduces today's behavior at the top end — a production
    deployment with large per-key state raises the cap with cluster
    size (state volume, not core count, is the driver)."""
    nbytes = _source_bytes(*paths)
    dp = spark.sparkContext.defaultParallelism
    return max(1, min(dp, (nbytes + (32 << 20) - 1) >> 25))


@contextlib.contextmanager
def replay_confs(spark: SparkSession, source_paths=(),
                 drop_no_data: bool = False):
    """Scoped session confs for one bounded availableNow replay:

    * ``spark.sql.shuffle.partitions`` sized from the source volume
      (:func:`stateful_shuffle_partitions`) when ``source_paths`` is
      non-empty — the state-store partition count is captured from the
      session conf at query start, so the scope must enclose
      ``start()``;
    * ``spark.sql.streaming.noDataMicroBatches.enabled=false`` when
      ``drop_no_data`` — ONLY valid for sinks whose final table does
      not depend on a trailing watermark-advance batch: complete-mode
      aggregates (the sink holds the full aggregate after the last data
      batch), update-mode foreachBatch (emission happens on data), the
      eager inner stream-stream join, and NoTimeout arbitrary-state
      operators (the state fn is only invoked for keys with data).
      APPEND-mode windowed aggregates MUST keep the no-data batch: it
      is what advances the watermark past the final windows and flushes
      them to the sink.

    Both confs are restored afterwards; the oracle paths run replays
    sequentially, so scoping via session conf is race-free here."""
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    old_ndb = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled", "true")
    try:
        if source_paths:
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(stateful_shuffle_partitions(spark, *source_paths)))
        if drop_no_data:
            spark.conf.set(
                "spark.sql.streaming.noDataMicroBatches.enabled", "false")
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", old_ndb)


def run_bounded_complete(agg: DataFrame, prefix: str,
                         source_paths=()) -> DataFrame:
    """Run a streaming aggregate to completion over a bounded source
    (availableNow trigger, complete mode, in-memory sink) and return the
    final result as a batch DataFrame. ONE definition of the runner so a
    fix (checkpointing, sink choice) lands everywhere. The memory table
    stays registered for the session — the returned frame reads from it
    lazily, so it cannot be dropped here; bounded-oracle runs create a
    handful of small tables, not an unbounded leak.

    r12: state partitions sized from the source volume and the trailing
    no-data micro-batch dropped (always sound in complete mode — the
    sink already holds the full aggregate after the last data batch;
    see :func:`replay_confs`)."""
    name = prefix + uuid.uuid4().hex[:8]
    spark = agg.sparkSession
    with replay_confs(spark, source_paths=source_paths,
                      drop_no_data=True):
        q = (agg.writeStream.format("memory").queryName(name)
             .outputMode("complete").trigger(availableNow=True).start())
        q.awaitTermination()
    return spark.table(name)
