"""Streaming first-seen dedup over the events stream.

The third streaming operator (the reference has no streaming surface,
SURVEY.md §2.9): per dedup key, keep the FIRST occurrence by event time
and count how many duplicates arrived — the streaming twin of the batch
exact-dedup operator (operators/dedup.py). A web-scale ingest pipeline
runs exactly this shape to drop re-crawled/replayed records before they
reach storage.

Plan: streaming groupBy aggregation with a struct-MIN — the "first"
row is min((ts, event_id)), an associative/commutative aggregate, so it
runs partial+final with streaming state (one row per live key) and no
sort anywhere. Deterministic even within a micro-batch, unlike
``dropDuplicates`` (which keeps an arbitrary row per key and so can't
be oracle-checked). On the bounded fixture with an availableNow trigger
the result equals the batch window query the DuckDB oracle runs.

Unbounded-state story: first-seen dedup is keyed on (user_id,
event_type), and a key's state must stay resident for as long as a
duplicate of that key may still arrive — unlike a windowed aggregate
there is no event-time bound to evict on, so complete/update keep one
state row per live key FOREVER by design. Deploying this unbounded
means either (a) ``update`` output mode — each key's first-seen row is
re-emitted only when it changes, sink is an upsert store — plus a state
TTL via ``dropDuplicatesWithinWatermark`` semantics when "first within
the watermark horizon" is acceptable, or (b) bounding the key domain
(e.g. daily key-space rollover baked into the key). The bounded-oracle
runner below uses ``complete`` + availableNow, which on a finite replay
is exact.
"""

from __future__ import annotations


import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.fixtures import load_events_stream


def streaming_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First event per (user_id, event_type) by (event time, event_id),
    with the duplicate count; bounded-fixture runner (availableNow
    trigger, memory sink). Epoch-micros longs out — the canonical
    integer representation hashes identically across engines."""
    ev = load_events_stream(spark, sf_dir).select(
        "user_id", "event_type",
        F.unix_micros(F.col("ts")).alias("ts_us"), "event_id")
    agg = (ev.groupBy("user_id", "event_type")
           .agg(F.min(F.struct(F.col("ts_us"), F.col("event_id")))
                .alias("first"),
                F.count(F.lit(1)).alias("n_events")))
    from .runner import run_bounded_complete
    return run_bounded_complete(agg, "stream_firstseen_",
                                source_paths=(
                                    f"{sf_dir}/events.parquet",)).select(
        "user_id", "event_type",
        F.col("first.ts_us").alias("first_ts_us"),
        F.col("first.event_id").alias("first_event_id"),
        "n_events")
