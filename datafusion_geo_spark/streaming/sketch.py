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
    return run_bounded_complete(agg, "stream_hll_",
                                source_paths=(f"{sf_dir}/events.parquet",))


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
    return run_bounded_complete(agg, "stream_cms_",
                                source_paths=(f"{sf_dir}/events.parquet",))


def kmv_state_step(prev, batch: list, k: int):
    """One micro-batch of KMV state: merge ``batch`` rows
    [(h, value, user_hash)] into ``prev`` state
    (hs, vs, user_hashes, n), keep the min-k of each sketch, and
    compute the estimate row. Pure function (tested directly for
    batch-split insensitivity: any partition of the rows into batches
    folds to the same state — min-k union is associative and
    commutative). Returns ((hs, vs, uhs, n),
    (n_sample, p50, p90, p99, ndv)); every arithmetic op replicates
    the batch kmv_quantile_sketch exactly."""
    import math
    pairs, uhashes, n = [], set(), 0
    if prev is not None:
        hs, vs, uhs, n = prev
        pairs = list(zip(hs, vs))
        uhashes = set(uhs)
    n += len(batch)
    pairs.extend((h, v) for h, v, _ in batch)
    uhashes.update(hv for _, _, hv in batch)
    pairs = sorted(pairs)[:k]
    ukeep = sorted(uhashes)[:k]
    vals = sorted(v for _, v in pairs)
    ns = len(vals)

    def q(p: float) -> float:
        return vals[max(1, math.ceil(p * ns)) - 1]

    if len(ukeep) < k:
        ndv = float(len(ukeep))
    else:
        hk = ukeep[k - 1]
        ndv = ((2_000_000 * ((k - 1) * 4294967296) + hk)
               // (2 * hk)) / 1_000_000.0
    state = ([h for h, _ in pairs], [v for _, v in pairs], ukeep, n)
    return state, (ns, q(0.5), q(0.9), q(0.99), ndv)


def streaming_kmv(spark: SparkSession, sf_dir: str, k: int = 64) -> DataFrame:
    """Streaming KMV bottom-k quantile + distinct sketch per event_type
    — the custom-stateful-operator spelling of operators/sketch.py
    kmv_quantile_sketch, and the third constant-state streaming sketch
    (next to streaming_hll's MAX and streaming_cms's SUM, whose states
    are plain associative aggregates; min-k is NOT one Spark aggregate,
    so this one carries its state through applyInPandasWithState).

    State per group: the k smallest (h64(event_id), value) pairs, the
    k smallest distinct user hashes, and the exact event count —
    <= 2k+1 entries forever, no watermark, no TTL (the sketch IS the
    eviction policy). Each micro-batch merges its rows into the state
    (min-k union — order-insensitive, so any batch split yields the
    same final state) and emits the current estimate row; on the
    bounded single-file availableNow replay that equals the batch
    kmv_quantile_sketch, so the oracle is SHARED with kmv_quantiles.

    Hashes and all estimate arithmetic (ceil-rank sample quantiles,
    the scaled-integer (k-1)/h_k distinct estimate) replicate the
    batch operator exactly — Python ints/doubles perform the identical
    IEEE/integer ops."""
    import math
    from typing import Iterator, Tuple

    import pandas as pd
    from pyspark.sql.types import (ArrayType, DoubleType, IntegerType,
                                   LongType, StringType, StructField,
                                   StructType)

    from ..operators.dedup import h64
    from ..sources.fixtures import load_events_stream

    out_schema = StructType([
        StructField("event_type", StringType()),
        StructField("n_events", LongType()),
        StructField("n_sample", IntegerType()),
        StructField("p50", DoubleType()),
        StructField("p90", DoubleType()),
        StructField("p99", DoubleType()),
        StructField("ndv_users", DoubleType()),
    ])
    state_schema = StructType([
        StructField("hs", ArrayType(LongType())),
        StructField("vs", ArrayType(DoubleType())),
        StructField("uhs", ArrayType(LongType())),
        StructField("n", LongType()),
    ])

    def fn(key: Tuple, pdfs: Iterator[pd.DataFrame], state) \
            -> Iterator[pd.DataFrame]:
        (etype,) = key
        prev = state.get if state.exists else None
        batch = [(int(h), float(v), int(hv))
                 for pdf in pdfs
                 for h, v, hv in zip(pdf["h"], pdf["v"], pdf["hv"])]
        new_state, est = kmv_state_step(prev, batch, k)
        state.update(new_state)
        yield pd.DataFrame({
            "event_type": [etype], "n_events": [new_state[3]],
            "n_sample": [est[0]], "p50": [est[1]], "p90": [est[2]],
            "p99": [est[3]], "ndv_users": [est[4]],
        })

    ev = (load_events_stream(spark, sf_dir)
          .where(F.col("value").isNotNull())
          .select("event_type",
                  h64(F.col("event_id").cast("string")).alias("h"),
                  F.col("value").alias("v"),
                  h64(F.col("user_id").cast("string")).alias("hv")))
    sk = ev.groupBy("event_type").applyInPandasWithState(
        fn, outputStructType=out_schema, stateStructType=state_schema,
        outputMode="append", timeoutConf="NoTimeout")
    import uuid
    name = "stream_kmv_" + uuid.uuid4().hex[:8]
    # r12 measured and left alone: the replay confs that help the JVM
    # stateful paths HURT applyInPandasWithState (see sessionize.py)
    q = (sk.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name)


def streaming_reservoir(spark: SparkSession, sf_dir: str, k: int = 64,
                        salts: int = 32, docs: DataFrame = None) -> DataFrame:
    """Streaming fixed-k uniform sample — the unbounded-stream twin of
    operators/sampling.py reservoir_sample: keep the k documents with
    the smallest (md5(doc_id), doc_id) coin seen so far, with BOUNDED
    state and no watermark/TTL (like the sketches above, the sample IS
    the eviction policy).

    Scale shape: a single global bottom-k state would funnel every
    stream row through one stateful task, so the state is SALTED —
    ``salts`` groups each hold their own bottom-k (doc_id % salts
    partitions the stateful shuffle; state <= salts×k rows forever) and
    the batch tail merges them with one TakeOrdered over <= salts×k
    emitted rows. Correctness of the tail does not depend on batch
    boundaries: a row in the global bottom-k is in its salt group's
    bottom-k from arrival on (a group's rows are a subset of the
    stream), so the union of ALL per-batch emissions contains the
    global bottom-k and contains only real stream rows — min-k over
    the union is exactly the global bottom-k, whatever the micro-batch
    split. On the bounded availableNow replay the result therefore
    equals the batch reservoir_sample and the oracle is SHARED.

    The coin replicates the batch/Spark/DuckDB convention exactly:
    Python's md5 hex of the decimal id string, ordered as ASCII —
    identical to Spark md5(CAST(id AS STRING)) ordering.

    ``docs`` overrides the stream source (any streaming DataFrame with
    doc_id/lang/source) — the multi-batch split-insensitivity test
    injects a maxFilesPerTrigger=1 source through it."""
    import hashlib
    from typing import Iterator, Tuple

    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql.types import (ArrayType, LongType, StringType,
                                   StructField, StructType)

    from ..sources.fixtures import load_documents_stream

    out_schema = StructType([
        StructField("coin", StringType()),
        StructField("doc_id", LongType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
    ])
    state_schema = StructType([
        StructField("coins", ArrayType(StringType())),
        StructField("ids", ArrayType(LongType())),
        StructField("langs", ArrayType(StringType())),
        StructField("srcs", ArrayType(StringType())),
    ])

    def fn(key: Tuple, pdfs: Iterator[pd.DataFrame], state) \
            -> Iterator[pd.DataFrame]:
        cur = (list(zip(*state.get)) if state.exists else [])
        batch = [
            (hashlib.md5(str(int(d)).encode()).hexdigest(), int(d),
             None if lg is None else str(lg),
             None if sc is None else str(sc))
            for pdf in pdfs
            for d, lg, sc in zip(pdf["doc_id"], pdf["lang"], pdf["source"])]
        # min-k union: order-insensitive, so any batch split yields the
        # same state; (coin, doc_id) is a total order (ids are unique)
        merged = sorted(cur + batch, key=lambda r: (r[0], r[1]))[:k]
        state.update((
            [r[0] for r in merged], [r[1] for r in merged],
            [r[2] for r in merged], [r[3] for r in merged]))
        yield pd.DataFrame(merged,
                           columns=["coin", "doc_id", "lang", "source"])

    if docs is None:
        docs = load_documents_stream(spark, sf_dir)
    docs = docs.select("doc_id", "lang", "source",
                       (F.col("doc_id") % salts).alias("salt"))
    sk = docs.groupBy("salt").applyInPandasWithState(
        fn, outputStructType=out_schema, stateStructType=state_schema,
        outputMode="append", timeoutConf="NoTimeout")
    import uuid
    name = "stream_rsv_" + uuid.uuid4().hex[:8]
    # r12 measured and left alone (see the kmv sketch above)
    q = (sk.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    # bounded tail: distinct over <= salts×k×batches emitted rows, ONE
    # TakeOrdered to the global bottom-k, rank window over k rows
    won = (spark.table(name).distinct()
           .orderBy(F.col("coin").asc(), F.col("doc_id").asc()).limit(k))
    w = Window.partitionBy().orderBy(F.col("coin").asc(),
                                     F.col("doc_id").asc())
    return (won.withColumn("sample_rank",
                           F.row_number().over(w).cast("int"))
            .select("doc_id", "lang", "source", "sample_rank"))
