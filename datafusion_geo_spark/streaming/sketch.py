"""Streaming HyperLogLog: constant-state cardinality tracking.

The streaming twin of operators/sketch.py hll_registers — and the rare
streaming aggregate whose state is CONSTANT by construction: the
grouped MAX over 2^b registers keeps exactly 2^b state rows no matter
how many events arrive, so unlike first-seen dedup (one state row per
live key forever) or windowed aggregates (watermark-evicted), this
deploys unbounded with no watermark and no TTL story at all. That is
the operational pitch of a sketch: the distinct-user count of an
infinite stream in 256 integers.

``hll_registers`` is pure select + groupBy/MAX (associative,
commutative), so the SAME operator code drives both the batch and the
streaming plan — Structured Streaming runs it partial+final with the
register table as its state, and ``complete`` mode re-emits the 2^b-row
table per micro-batch (tiny). On a bounded replay with an availableNow
trigger the final table equals the batch query, which is what the
DuckDB oracle checks.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.sketch import hll_registers
from ..sources.fixtures import load_events_stream
from .runner import run_bounded_complete


def streaming_hll(spark: SparkSession, sf_dir: str, b: int = 8) -> DataFrame:
    """HLL register table over the events stream's user_id, bounded-
    fixture runner. Output (register, rho) — integer-exact, identical
    to the batch hll_registers on the same data."""
    ev = (load_events_stream(spark, sf_dir)
          .where(F.col("user_id").isNotNull())
          .select(F.col("user_id").cast("string").alias("key")))
    agg = hll_registers(ev, "key", b=b)
    return run_bounded_complete(agg, "stream_hll_")


def streaming_cms(spark: SparkSession, sf_dir: str,
                  depth: int = 4, width: int = 1024) -> DataFrame:
    """CountMin sketch over the events stream's user_id — the second
    constant-state streaming sketch next to streaming_hll: the grouped
    SUM over (row, cell) keeps at most depth*width state rows no
    matter how many events arrive (no watermark, no TTL — the sketch
    is the eviction policy), and the same operator code
    (operators/sketch.py count_min_sketch) drives batch and stream.
    Bounded availableNow replay equals the batch cell table, which the
    oracle replays hash-for-hash."""
    from ..operators.sketch import count_min_sketch
    ev = (load_events_stream(spark, sf_dir)
          .where(F.col("user_id").isNotNull())
          .select(F.col("user_id").cast("string").alias("tok")))
    agg = count_min_sketch(ev, "tok", depth=depth, width=width)
    return run_bounded_complete(agg, "stream_cms_")
