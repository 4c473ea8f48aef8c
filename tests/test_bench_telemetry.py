"""bench.py telemetry contract (r7 verdict item 2): the counters the
bench JSON's per-query deltas and session block are built from must
populate in a live local session — if a Spark upgrade breaks the
management-bean or status-store reflection, this catches it at test
time instead of silently degrading the r8+ bench telemetry to None."""

import sys

sys.path.insert(0, "/root/repo")
import bench


def test_jvm_counters_populate(spark):
    c = bench.jvm_counters(spark)
    assert c["gc_ms"] is not None and c["gc_ms"] >= 0
    assert c["uptime_ms"] is not None and c["uptime_ms"] > 0
    assert c["heap_used_mb"] is not None and c["heap_used_mb"] > 0
    # task_ms comes from the app status store; run one job so the
    # executor summary exists, then the counter must be readable
    spark.range(10).count()
    c2 = bench.jvm_counters(spark)
    assert c2["task_ms"] is not None and c2["task_ms"] >= 0
    # counters are cumulative: a later read never goes backwards
    assert c2["gc_ms"] >= c["gc_ms"]
    assert c2["uptime_ms"] >= c["uptime_ms"]


def test_force_counts_rows(spark):
    df = spark.range(0, 123).toDF("x")
    assert bench.force(df) == 123
