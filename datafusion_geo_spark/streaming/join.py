"""Stream-stream interval join — the attribution query (views joined to
the click they preceded) as Structured Streaming.

Spark requirements for an unbounded stream-stream join, all satisfied
here: BOTH sides carry event-time watermarks, and the join condition
includes an equality key plus a bounded time range — the range bound is
what lets the state store evict a side's rows once the other side's
watermark passes their match window. Inner-join results emit as soon as
a match is found (no watermark wait in append mode), so a bounded
availableNow replay produces exactly the batch join the oracle runs.

Scale notes: the join state is per-key and bounded by (watermark +
range) hours of data per side — the streaming analogue of the batch
interval join's bucket bound. Skewed users accumulate state linearly,
not quadratically (pairs stream out as they match).
"""

from __future__ import annotations

import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def streaming_click_attribution(spark: SparkSession, sf_dir: str,
                                band: str = "1 hour") -> DataFrame:
    """Each (click, view) pair for the same user where the view happened
    in the ``band`` BEFORE (or exactly at) the click — run to completion
    over the bounded fixture and returned as a batch frame with
    epoch-micro timestamps (the oracle-comparable encoding)."""
    from ..sources.fixtures import load_events_stream
    clicks = (load_events_stream(spark, sf_dir)
              .where(F.col("event_type") == "click")
              .select(F.col("user_id"),
                      F.col("ts").alias("click_ts"),
                      F.col("event_id").alias("click_id"))
              .withWatermark("click_ts", band))
    views = (load_events_stream(spark, sf_dir)
             .where(F.col("event_type") == "view")
             .select(F.col("user_id").alias("v_user"),
                     F.col("ts").alias("view_ts"),
                     F.col("event_id").alias("view_id"))
             .withWatermark("view_ts", band))
    j = clicks.join(
        views,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {band}"))
        & (F.col("view_ts") <= F.col("click_ts")),
        "inner")
    out = j.select("user_id", "click_id", "view_id",
                   F.unix_micros(F.col("click_ts")).alias("click_ts_us"),
                   F.unix_micros(F.col("view_ts")).alias("view_ts_us"))
    name = "stream_attr_" + uuid.uuid4().hex[:8]
    # r12 (guide §2 scale-adaptive partitioning): the stream-stream
    # join keeps FOUR state stores per shuffle partition; size the
    # partition count from the source volume instead of inheriting the
    # core-count default (5.8 -> ~1.7 s at sf0.1). Dropping the no-data
    # batch is sound here: the INNER join emits pairs the moment they
    # match inside a data batch — the trailing watermark-advance batch
    # only evicts state, it never adds sink rows.
    from .runner import replay_confs
    with replay_confs(spark,
                      source_paths=(f"{sf_dir}/events.parquet",),
                      drop_no_data=True):
        q = (out.writeStream.format("memory").queryName(name)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
    # PINNED ASSUMPTION (advisor-flagged r4): equality with the batch
    # oracle relies on the whole fixture replaying in ONE micro-batch —
    # with multiple batches and out-of-order files, rows older than the
    # watermark (delay = band) would be evicted from join state and the
    # stream would lawfully drop pairs the batch join keeps. One batch is
    # structural here (single fixture file, no maxFilesPerTrigger), but
    # assert it so a future multi-file fixture fails loudly instead of
    # silently diverging. Production use with late data should widen the
    # watermark delay beyond the join band.
    data_batches = [p for p in q.recentProgress
                    if p.get("numInputRows", 0) > 0]
    assert len(data_batches) <= 1, (
        f"streaming_click_attribution replayed in {len(data_batches)} "
        "micro-batches; batch-oracle equivalence is only guaranteed for "
        "a single-batch replay (widen the watermark beyond the band for "
        "multi-batch input)")
    return spark.table(name)
