"""Unit tests for the streaming continuous aggregate
(streaming/rollup.py). The oracle-level check (final table state ==
one-shot GROUP BY) lives in test_entry_oracle.py; these pin the upsert
semantics the oracle can't see: per-key directory replacement on
update, idempotent re-runs."""

import os
import sys

import pyspark.sql.functions as F

sys.path.insert(0, "/root/repo")

from datafusion_geo_spark.streaming.rollup import streaming_hourly_rollup

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_rollup_rerun_idempotent(spark, tmp_path):
    p = str(tmp_path / "roll")
    a = streaming_hourly_rollup(spark, SF_DIR, p).orderBy(
        "hour", "event_type").collect()
    b = streaming_hourly_rollup(spark, SF_DIR, p).orderBy(
        "hour", "event_type").collect()
    assert a == b and len(a) > 0


def test_streaming_rollup_update_replaces_only_its_key(spark, tmp_path):
    """A later cumulative update for one (hour, event_type) key must
    replace exactly that directory, leaving sibling keys' totals
    untouched — the foreachBatch contract."""
    p = str(tmp_path / "roll2")
    cols = "hour long, event_type string, n_events long, sum_cents long, " \
           "min_value double, max_value double"

    def upsert(batch):
        (batch.repartition("hour", "event_type")
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("hour", "event_type").parquet(p))

    upsert(spark.createDataFrame(
        [(1, "click", 5, 500, 1.0, 9.0), (1, "view", 2, 200, 2.0, 3.0)],
        cols))
    # cumulative update for (1, click) only
    upsert(spark.createDataFrame([(1, "click", 8, 800, 0.5, 9.0)], cols))
    got = {(r["hour"], r["event_type"]): r["n_events"]
           for r in spark.read.parquet(p).collect()}
    assert got == {(1, "click"): 8, (1, "view"): 2}


def test_streaming_rollup_drops_null_ts(spark, tmp_path):
    """Event-time windows drop NULL-timestamp rows; no NULL hour
    partition appears (unlike the batch rollup, which carries one)."""
    p = str(tmp_path / "roll3")
    out = streaming_hourly_rollup(spark, SF_DIR, p)
    assert out.where(F.col("hour").isNull()).count() == 0
