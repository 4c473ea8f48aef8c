"""Stream-static enrichment join — the most common production streaming
shape: an unbounded event stream joined to a small, slowly-changing
dimension table, then aggregated.

Spark semantics used here, all stock Structured Streaming:
  * a STREAM ⋈ STATIC inner/left join needs no watermark and keeps no
    join state — the static side is just re-resolved per micro-batch
    (so dimension updates between batches are picked up automatically);
  * ``F.broadcast`` on the dimension pins the broadcast-hash-join plan:
    at the 100-TB design point the events stream never shuffles for the
    enrichment, each executor holds the dim;
  * the downstream grouped aggregate carries streaming state per
    (segment, event_type) — a bounded key space.
"""

from __future__ import annotations

import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def streaming_enriched_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events stream enriched with the customer's market segment via a
    broadcast stream-static join (user_id = c_custkey; events from
    users without a customer row fall into a NULL segment, preserved by
    the left join), aggregated to per-(segment, event_type) totals.
    Bounded replay (availableNow) in complete mode ≡ the batch
    join+GROUP BY the oracle runs. Cent-sums in exact int64 so the
    value hash is summation-order-independent."""
    from ..sources.fixtures import load_events_stream, load_table
    events = load_events_stream(spark, sf_dir).where(F.col("ts").isNotNull())
    dim = F.broadcast(
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("user_id"), "c_mktsegment"))
    enriched = events.join(dim, "user_id", "left")
    agg = (enriched
           .groupBy("c_mktsegment", "event_type")
           .agg(F.count(F.lit(1)).alias("n_events"),
                F.sum(F.round(F.col("value") * 100).cast("long"))
                 .alias("sum_cents")))
    # (no countDistinct: exact distinct aggregation is unsupported on
    # streams — production reach metrics use approx/HLL sketches, which
    # the DuckDB oracle could not replay)
    from .runner import run_bounded_complete
    return run_bounded_complete(agg, "stream_enrich_",
                                source_paths=(f"{sf_dir}/events.parquet",))
