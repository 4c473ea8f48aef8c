"""Streaming geofencing — the canonical streaming-spatial shape: an
unbounded point stream filtered/tagged against a small static set of
fence polygons.

Design (all stock Structured Streaming + this repo's geometry
kernels):
  * fences are STATIC and broadcast — the stream never shuffles for the
    containment check, each executor holds every fence (a fleet of
    fences is thousands of polygons, not terabytes);
  * the match is a stream-static inner join under a native bbox
    prefilter (JVM range condition against the broadcast fence bboxes)
    with the exact ST_Covers kernel refining survivors — the same
    broadcast-bbox-join discipline as the batch
    operators/spatial_join.py, so a point crossing no fence bbox costs
    zero Python;
  * the result is stateless (no watermark, no keyed state): alerts
    stream out as soon as the micro-batch computes, and the per-fence
    hit totals below keep only a bounded (fence_id) state.
"""

from __future__ import annotations

import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def fences_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A small static fence table derived from nation rows: one axis-
    aligned polygon per nation (same analytic derivation family as the
    boxes_nation fixture, offset so fences overlap the customer point
    lattice)."""
    from ..functions import st_geomfromtext
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    x0 = (F.col("n_nationkey") * 13 % 340 - 170).cast("double")
    y0 = (F.col("n_nationkey") * 3 - 37).cast("double")
    wkt = F.concat(
        F.lit("POLYGON(("),
        x0, F.lit(" "), y0, F.lit(","),
        x0 + 20, F.lit(" "), y0, F.lit(","),
        x0 + 20, F.lit(" "), y0 + 8, F.lit(","),
        x0, F.lit(" "), y0 + 8, F.lit(","),
        x0, F.lit(" "), y0, F.lit("))"))
    return n.select(F.col("n_nationkey").alias("fence_id"),
                    x0.alias("fx0"), y0.alias("fy0"),
                    (x0 + 20).alias("fx1"), (y0 + 8).alias("fy1"),
                    st_geomfromtext(wkt).alias("fence"))


def streaming_geofence_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-fence hit totals for a bounded replay of the events stream:
    each event is mapped to a deterministic point (user_id lattice, the
    customer-point derivation), bbox-matched against the broadcast
    fences, refined with exact ST_Covers, and counted per fence.
    Bounded replay in complete mode ≡ the batch join+GROUP BY twin."""
    from ..functions import st_covers, st_point
    from ..sources.fixtures import load_events_stream
    ev = (load_events_stream(spark, sf_dir)
          .where(F.col("user_id").isNotNull())
          .withColumn("px", (F.col("user_id") % 360 - 180).cast("double"))
          .withColumn("py", ((F.col("user_id") % 25) * 3 - 37.5)
                      .cast("double")))
    fences = F.broadcast(fences_nation(spark, sf_dir))
    j = ev.join(
        fences,
        (F.col("px") >= F.col("fx0")) & (F.col("px") <= F.col("fx1"))
        & (F.col("py") >= F.col("fy0")) & (F.col("py") <= F.col("fy1")),
        "inner")
    j = j.where(st_covers(F.col("fence"),
                          st_point(F.col("px"), F.col("py"))))
    agg = (j.groupBy("fence_id")
           .agg(F.count(F.lit(1)).alias("n_hits"),
                F.sum(F.round(F.col("value") * 100).cast("long"))
                .alias("sum_cents")))
    from .runner import run_bounded_complete
    return run_bounded_complete(agg, "stream_geofence_",
                                source_paths=(f"{sf_dir}/events.parquet",))
