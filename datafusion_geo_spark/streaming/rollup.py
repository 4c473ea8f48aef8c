"""Streaming continuous aggregate: maintain the hourly rollup table
from an event STREAM — the TimescaleDB continuous-aggregate pattern as
Structured Streaming (no batch-slicing contract needed).

Design: the stream runs a windowed event-time aggregate (1-hour tumbling
windows, watermarked), and ``foreachBatch`` upserts each UPDATED key
into a parquet dataset partitioned by (hour, event_type) with dynamic
partition overwrite. Because update-mode rows carry the key's FULL
running aggregate (streaming state holds the totals), overwriting
exactly that key's directory is correct and idempotent even when a
micro-batch carries a partial hour — the restriction the batch rollup's
"complete hours per batch" contract exists to avoid. Late events inside
the watermark simply re-emit their key with new totals; the next upsert
replaces the directory.

Stats are the MERGEABLE subset (counts, exact cent-sums, min/max):
exact distinct-user counts are not mergeable from aggregated state — a
production rollup carries an HLL sketch column for reach (Spark's
hll_sketch_agg/hll_union_agg), omitted here because sketch bytes are
engine-specific and the DuckDB oracle could not replay them.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.rollup import hour_col


def _hourly_stream_agg(events: DataFrame) -> DataFrame:
    return (events
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"),
                     F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.round(F.col("value") * 100).cast("long"))
                  .alias("sum_cents"),
                 F.min("value").alias("min_value"),
                 F.max("value").alias("max_value"))
            .select(hour_col("w.start").alias("hour"),
                    "event_type", "n_events", "sum_cents",
                    "min_value", "max_value"))


def streaming_hourly_rollup(spark: SparkSession, sf_dir: str,
                            path: str) -> DataFrame:
    """Run the bounded fixture stream to completion (availableNow),
    upserting every updated (hour, event_type) into ``path``; returns
    the maintained table. NULL-timestamp events are dropped by the
    event-time window, matching the oracle's ``ts IS NOT NULL``."""
    from ..sources.fixtures import load_events_stream
    import shutil
    import uuid
    shutil.rmtree(path, ignore_errors=True)
    # the uuid'd checkpoint below makes each run independent; without
    # wiping the parent, every run would leave an orphan offset/commit
    # log tree behind
    shutil.rmtree(path + ".chk", ignore_errors=True)
    agg = _hourly_stream_agg(load_events_stream(spark, sf_dir))

    def upsert(batch: DataFrame, _bid: int) -> None:
        if not batch.columns:
            return
        (batch.repartition("hour", "event_type")
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("hour", "event_type")
         .parquet(path))

    chk = os.path.join(path + ".chk", uuid.uuid4().hex[:8])
    q = (agg.writeStream.outputMode("update")
         .foreachBatch(upsert)
         .option("checkpointLocation", chk)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    df = spark.read.parquet(path)
    return df.select(F.col("hour").cast("long").alias("hour"),
                     F.col("event_type").cast("string").alias("event_type"),
                     "n_events", "sum_cents", "min_value", "max_value")
