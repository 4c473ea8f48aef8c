"""Custom stateful streaming operator: event sessionization with
``applyInPandasWithState``.

The reference has zero streaming surface (SURVEY.md §2.9); this is a
beyond-reference operator in the category a large-scale event/training
pipeline needs: split each user's event stream into sessions separated by
more than ``gap`` of inactivity, maintaining per-user state (the open
session) across micro-batches.

Semantics per micro-batch, per user:
  1. merge the user's new events (sorted by event time) with the open
     session carried in state;
  2. close a session whenever the gap to the next event exceeds ``gap``;
  3. EMIT all sessions touched this batch — closed ones finally, the
     still-open one as an amendable partial (update-stream semantics);
  4. keep only the open session in state: O(1) state per user, bounded
     regardless of stream length.

On the bounded events fixture with an availableNow trigger the input
arrives in one micro-batch, so the emitted rows equal batch
sessionization exactly — which is what the DuckDB oracle computes with
lag()/sum() window functions (__spark_entry__.oracle_sql()
['streaming_sessions']).

Money math on cents (int64): double summation would make the value-hash
comparison order-dependent.
"""

from __future__ import annotations

import uuid
from typing import Iterator, Tuple

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (LongType, StructField, StructType,
                               TimestampType)

from ..sources.fixtures import load_events_stream

#  Session bounds are epoch-MICROS longs, not timestamps: a canonical
#  integer representation hashes identically everywhere, whereas a
#  timestamp column's value depends on each engine's internal unit
#  (µs vs ns) and sink conversion — the round-1 driver hash-fail was
#  exactly such a representation mismatch on an exact-value match.
OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", LongType()),
    StructField("session_end", LongType()),
    StructField("n_events", LongType()),
    StructField("total_cents", LongType()),
])

# open-session state: [start_us, last_us, n, cents]
STATE_SCHEMA = StructType([
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
    StructField("n", LongType()),
    StructField("cents", LongType()),
])


def _session_fn(gap_us: int):
    from pyspark.sql.streaming.state import GroupState

    def fn(key: Tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        ts_list: list = []
        cents_list: list = []
        for pdf in pdfs:
            ts_list.extend(pdf["ts_us"].tolist())
            cents_list.extend(pdf["cents"].tolist())
        order = sorted(range(len(ts_list)), key=ts_list.__getitem__)

        if state.exists:
            start_us, last_us, n, cents = state.get
        else:
            start_us = last_us = None
            n = cents = 0

        out = []
        for i in order:
            t, c = int(ts_list[i]), int(cents_list[i])
            if start_us is None:
                start_us, last_us, n, cents = t, t, 1, c
            elif t - last_us > gap_us:
                out.append((user_id, start_us, last_us, n, cents))
                start_us, last_us, n, cents = t, t, 1, c
            else:
                last_us, n, cents = t, n + 1, cents + c
        if start_us is not None:
            # the still-open session: emitted as an amendable partial so
            # bounded runs equal batch sessionization; kept in state for
            # the next micro-batch on unbounded streams
            out.append((user_id, start_us, last_us, n, cents))
            state.update((start_us, last_us, n, cents))

        if out:
            yield pd.DataFrame({
                "user_id": [r[0] for r in out],
                "session_start": [r[1] for r in out],
                "session_end": [r[2] for r in out],
                "n_events": [r[3] for r in out],
                "total_cents": [r[4] for r in out],
            })

    return fn


def streaming_sessions(spark: SparkSession, sf_dir: str,
                       gap_minutes: int = 30) -> DataFrame:
    """Sessionize the events stream; returns the final sessions table for
    the bounded fixture (availableNow trigger, memory sink)."""
    stream = load_events_stream(spark, sf_dir)
    ev = stream.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"))
    sessions = (ev.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_minutes * 60_000_000),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout"))
    name = "stream_sessions_" + uuid.uuid4().hex[:8]
    # r12 MEASURED AND LEFT ALONE (guide §1.1): neither replay conf
    # helps an applyInPandasWithState operator — resizing partitions to
    # the source volume serializes the per-group pandas work (1.5 ->
    # 5.7 s), and dropping the trailing no-data batch measured ~0.3 s
    # SLOWER (1.84 -> 2.1 s, reproducible; the idle batch is cheaper
    # than whatever termination path replaces it).
    q = (sessions.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name)
