"""Incremental hourly rollup (operators/rollup.py): hour-sliced batches
compose to the one-shot answer, re-application is idempotent, and only
touched hours are rewritten."""

import os
import shutil
import sys

import pyspark.sql.functions as F
import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".cache", "rollup_test")


@pytest.fixture(scope="module", autouse=True)
def clean_dir():
    shutil.rmtree(CACHE, ignore_errors=True)
    os.makedirs(CACHE, exist_ok=True)
    yield
    shutil.rmtree(CACHE, ignore_errors=True)


def _events(spark):
    from datafusion_geo_spark.sources.fixtures import load_events
    return load_events(spark, SF_DIR)


def _hour():
    # THE bucketing formula (rollup.hour_col) — slicing with a drifted
    # copy would violate the hour-completeness contract under test
    from datafusion_geo_spark.operators.rollup import hour_col
    return hour_col("ts")


def _rows(df):
    return sorted(map(tuple, df.select(
        "hour", "event_type", "n_events", "n_users", "sum_cents").collect()))


def test_incremental_batches_equal_one_shot(spark):
    from datafusion_geo_spark.operators.rollup import (apply_rollup_batch,
                                                       hourly_rollup,
                                                       read_rollup)
    ev = _events(spark)
    path = os.path.join(CACHE, "ds")
    # two batches sliced BY HOUR (each carries its hours completely)
    even = ev.where(_hour() % 2 == 0)
    odd = ev.where(_hour() % 2 == 1)
    apply_rollup_batch(even, path)
    apply_rollup_batch(odd, path)
    assert _rows(read_rollup(spark, path)) == _rows(hourly_rollup(ev))


def test_reapply_is_idempotent_and_touches_only_its_hours(spark):
    from datafusion_geo_spark.operators.rollup import (apply_rollup_batch,
                                                       hourly_rollup,
                                                       read_rollup)
    ev = _events(spark)
    path = os.path.join(CACHE, "ds2")
    apply_rollup_batch(ev, path)
    before = _rows(read_rollup(spark, path))
    # record other-hour file mtimes, re-apply ONE hour's full slice
    hours = [r["hour"] for r in
             read_rollup(spark, path).select("hour").distinct().collect()]
    target = min(hours)
    import glob
    other_files = {f: os.path.getmtime(f) for f in
                   glob.glob(os.path.join(path, "hour=*", "*.parquet"))
                   if f"hour={target}" + os.sep not in f}
    one_hour = ev.where(_hour() == target)
    apply_rollup_batch(one_hour, path)
    after = _rows(read_rollup(spark, path))
    assert after == before                       # idempotent
    for f, m in other_files.items():             # untouched directories
        assert os.path.getmtime(f) == m, f


def test_partition_pruning_on_hour_range(spark):
    from datafusion_geo_spark.operators.rollup import (apply_rollup_batch,
                                                       read_rollup)
    ev = _events(spark)
    path = os.path.join(CACHE, "ds3")
    apply_rollup_batch(ev, path)
    hours = sorted(r["hour"] for r in
                   read_rollup(spark, path).select("hour").distinct().collect())
    lo = hours[len(hours) // 2]
    q = read_rollup(spark, path).where(F.col("hour") >= lo)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(hour" in plan \
        or "PartitionFilters: [(hour" in plan
