#!/usr/bin/env python
"""Benchmark harness (driver contract, BASELINE.md).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

The flagship workload mirrors the reference's criterion bench — a full
scan evaluating ST_Intersects(geom, literal point) over the large table
(/root/reference/benches/geo_lib.rs:22, 3M rows in-memory there;
~600k lineitem-derived points at sf0.1 here, BASELINE.md).

Each query is forced to full evaluation with a JVM-side hash-sum over all
output columns (prevents column-pruning from skipping Python UDFs).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
# Steal-aware retry (r10 verdict item 1): a per-query timed window
# whose hypervisor steal exceeds this many ticks (100 Hz × all cores;
# 800 ≈ 8 stolen core-seconds) is re-run — up to MAX_ATTEMPTS total —
# and the attempt with the LEAST steal is kept. r9/r10 evidence: clean
# whole-bench sweeps carry 0.2–7k total ticks across 8 windows while
# polluted ones carry 39k concentrated in 2–3 windows, so a per-window
# threshold of 800 separates them. 0 disables.
STEAL_RETRY_TICKS = int(os.environ.get("SPARK_GRAFT_STEAL_RETRY", "800"))
MAX_ATTEMPTS = 3


def build_spark():
    from pyspark.sql import SparkSession
    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("datafusion-geo-spark-bench")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        # UTC-everywhere contract, pinned at session build (see
        # sources/fixtures.py:_events_conf for the rationale).
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def force(df) -> int:
    """Fully evaluate df JVM-side; returns row count."""
    import pyspark.sql.functions as F
    row = df.select(F.xxhash64(*df.columns).cast("double").alias("h")).agg(
        F.count("h").alias("n"), F.sum("h").alias("s")).collect()[0]
    return row["n"]


def jvm_counters(spark):
    """Cumulative JVM-side counters for per-query telemetry deltas.

    Round-8 bench instrumentation (r7 verdict item 2): three rounds of
    driver-vs-builder bench splits that same-tree A/Bs could not
    reproduce mean the instrument must carry its own diagnosis. In
    local[N] mode driver == executor == one JVM, so the management
    beans cover everything: cumulative GC ms across all collectors,
    executor task-time totals from the app status store, JVM uptime
    (fresh-JVM vs benched-late-in-a-long-session is the leading
    hypothesis for the driver's out-of-band numbers), and heap in use.
    All reads are cheap (no Spark job) and failure-isolated: telemetry
    must never fail the bench, so any reflective miss degrades to None.
    """
    out = {"gc_ms": None, "task_ms": None, "uptime_ms": None,
           "heap_used_mb": None}
    try:
        mf = spark.sparkContext._jvm.java.lang.management.ManagementFactory
        # getCollectionTime() is specified to return -1 when a
        # collector does not support it — clamp so one such bean can't
        # understate the sum and corrupt per-query gc_ms deltas
        out["gc_ms"] = sum(max(b.getCollectionTime(), 0)
                           for b in mf.getGarbageCollectorMXBeans())
        out["uptime_ms"] = mf.getRuntimeMXBean().getUptime()
        out["heap_used_mb"] = round(
            mf.getMemoryMXBean().getHeapMemoryUsage().getUsed() / 2**20)
    except Exception:
        pass
    try:
        execs = spark.sparkContext._jsc.sc().statusStore().executorList(True)
        out["task_ms"] = sum(execs.apply(i).totalDuration()
                             for i in range(execs.size()))
    except Exception:
        pass
    return out


def steal_ticks():
    """Cumulative hypervisor STEAL ticks from /proc/stat (field 8 of
    the aggregate cpu line) — the one contention signal loadavg cannot
    see: on a virtualized host, CPU taken by OTHER guests shows up
    only here. Session-2 evidence: two 14 s bench attempts between
    9.5 s ones carried +41k steal ticks (~0.7 cores continuously
    stolen) at guest loadavg ~0. None when unreadable — telemetry
    never fails the bench."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[8]) if parts[0] == "cpu" and len(parts) > 8 \
            else None
    except Exception:
        return None


def retry_needed(win_steal, n_attempts: int) -> bool:
    """Re-run a timed window? Only when steal is measurable, the
    threshold is enabled, the window tripped it, and the attempt
    budget (MAX_ATTEMPTS) is not exhausted."""
    return (win_steal is not None and STEAL_RETRY_TICKS > 0
            and win_steal > STEAL_RETRY_TICKS
            and n_attempts < MAX_ATTEMPTS)


def cleanest(attempts):
    """The attempt to publish: least hypervisor steal, ties broken by
    fastest median (None steal sorts as 0 — nothing to rank on)."""
    return min(attempts,
               key=lambda a: (a["steal_ticks"]
                              if a["steal_ticks"] is not None else 0,
                              a["median"]))


def bench_queries(spark):
    """name -> zero-arg callable returning a DataFrame."""
    import pyspark.sql.functions as F
    from datafusion_geo_spark.functions import (box2d, st_extent_agg,
                                                st_intersects)
    from datafusion_geo_spark.sources.fixtures import (boxes_nation,
                                                       lines_orders,
                                                       points_customer,
                                                       points_lineitem)
    import __spark_entry__ as entrymod

    qmap = entrymod.queries()

    def flagship():
        # reference bench shape: predicate full-scan over the big table
        df = points_lineitem(spark, SF_DIR, with_nulls=False)
        return df.select(
            "l_orderkey",
            st_intersects(F.col("geom"), "POINT(10 11)").alias("hit"))

    def q(name):
        return lambda: qmap[name](spark, SF_DIR)

    # ordered light -> heavy: the big-shuffle queries go last so their
    # memory churn doesn't tax the sub-second queries' timed runs
    return {
        "intersects_scan": flagship,
        "intersects_lines": q("intersects_lines"),
        "extent_by_mktsegment": q("extent_by_mktsegment"),
        "cosine_topk": q("cosine_topk"),
        "wkt_roundtrip_points": q("wkt_roundtrip_points"),
        "spatial_join": q("spatial_join"),
        # breadth: MinHash-LSH dedup and the big×big grid-partitioned
        # spatial join (the scale-critical beyond-reference operators)
        "minhash_pairs": q("minhash_pairs"),
        "grid_spatial_join": q("grid_spatial_join"),
    }


def main() -> None:
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    # Reference bench shape: the geometry MemTable is built OUTSIDE the
    # timed loop (/root/reference/benches/util.rs:45-62). Persist derived
    # fixture tables so iterations time operators, not re-derivation.
    from datafusion_geo_spark.sources import fixtures
    fixtures.enable_cache()

    queries = bench_queries(spark)

    timings = {}
    spread = {}
    runs_all = {}
    telemetry = {}
    bench_start = jvm_counters(spark)
    retried = 0
    for name, make in queries.items():
        # two warmups: codegen/python-worker spin-up on the first, AQE
        # plan stabilization on the second; GC between queries so one
        # query's garbage doesn't tax the next one's timed runs
        spark.sparkContext._jvm.System.gc()
        force(make())
        force(make())
        # Steal-aware attempts (r10 verdict item 1: two consecutive
        # rounds shipped contention-polluted headlines that needed
        # manual adjudication). Each attempt is a full timed window of
        # RUNS runs with its own counter deltas; when the window's
        # hypervisor steal exceeds STEAL_RETRY_TICKS the window is
        # re-run (≤ MAX_ATTEMPTS), and the LEAST-stolen attempt is
        # what lands in the compact line — every attempt is reported
        # on the telemetry line so nothing is hidden.
        attempts = []
        while True:
            load0 = os.getloadavg()
            ctr0 = jvm_counters(spark)
            st0 = steal_ticks()
            runs = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                force(make())
                runs.append(time.perf_counter() - t0)
            ctr1 = jvm_counters(spark)
            st1 = steal_ticks()
            load1 = os.getloadavg()
            win_steal = st1 - st0 if None not in (st0, st1) else None
            attempts.append({
                "runs": [round(r, 4) for r in runs],
                "median": round(statistics.median(runs), 4),
                "steal_ticks": win_steal,
                "loadavg_before": [round(x, 2) for x in load0],
                "loadavg_after": [round(x, 2) for x in load1],
                "gc_ms": (ctr1["gc_ms"] - ctr0["gc_ms"]
                          if None not in (ctr0["gc_ms"], ctr1["gc_ms"])
                          else None),
                "task_ms": (ctr1["task_ms"] - ctr0["task_ms"]
                            if None not in (ctr0["task_ms"],
                                            ctr1["task_ms"]) else None),
                "heap_used_mb": ctr1["heap_used_mb"],
            })
            if not retry_needed(win_steal, len(attempts)):
                break
        if len(attempts) > 1:
            retried += 1
        # cleanest attempt = least steal (tie: fastest median); all
        # attempts stay on the diagnostics line
        best = cleanest(attempts)
        runs = best["runs"]
        timings[name] = best["median"]
        # min..max over the timed runs: sub-second queries on a shared
        # box can swing ±3× run-to-run, so a single number without its
        # spread reads as a regression when it is noise (BASELINE.md §4)
        spread[name] = [round(min(runs), 4), round(max(runs), 4)]
        # r7 verdict item 2: an out-of-band number must arrive with its
        # own diagnosis — all timed runs (not just median/spread), host
        # load around the timed window, and GC/task-time deltas over it
        runs_all[name] = runs
        telemetry[name] = {
            "loadavg_before": best["loadavg_before"],
            "loadavg_after": best["loadavg_after"],
            "gc_ms": best["gc_ms"],
            "task_ms": best["task_ms"],
            "heap_used_mb": best["heap_used_mb"],
            "steal_ticks": best["steal_ticks"],
            "attempts": [{"median": a["median"],
                          "steal_ticks": a["steal_ticks"]}
                         for a in attempts],
        }

    # rotation-debt dashboard (r10 verdict item 8): once per round —
    # the driver runs bench.py per round — append the gate-staleness
    # histogram to PROGRESS.jsonl and echo it on a telemetry line.
    # Telemetry never fails the bench.
    try:
        import __spark_entry__ as entrymod
        rep = entrymod.rotation_report()
        rep["ts"] = time.time()
        print(json.dumps(rep))
        with open(os.path.join(os.path.dirname(os.path.abspath(
                __file__)), "PROGRESS.jsonl"), "a") as fh:
            fh.write(json.dumps(rep) + "\n")
    except Exception:
        pass

    bench_end = jvm_counters(spark)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # Two lines, deliberately: the driver machine-reads the LAST stdout
    # line, and round 8 proved the full telemetry object (~3 KB) blows
    # its tail-capture window (BENCH_r08 "parsed": null). The diagnosis
    # payload goes on its own earlier line; the compact summary — the
    # driver's contract — is printed last and stays well under ~1.5 KB.
    print(json.dumps({
        "diagnostics": True,
        "runs_all": runs_all,
        "telemetry": telemetry,
        # session shape: a fresh-JVM bench shows uptime of a few tens of
        # seconds; the driver benching after a 50-query gate sweep in
        # the same JVM shows minutes — directly adjudicates the
        # long-session hypothesis for driver-vs-builder bench splits
        "session": {
            "jvm_uptime_ms_at_start": bench_start["uptime_ms"],
            "jvm_uptime_ms_at_end": bench_end["uptime_ms"],
            "gc_ms_total": bench_end["gc_ms"],
            "task_ms_total": bench_end["task_ms"],
            "heap_used_mb_at_end": bench_end["heap_used_mb"],
        },
    }))
    print(json.dumps({
        "metric": "spatial_queries_total_sec",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": int(CPUS),
        "runs": RUNS,
        "loadavg_max": round(max(
            (x for t in telemetry.values()
             for x in (t["loadavg_before"] + t["loadavg_after"])),
            default=0.0), 2),
        # hypervisor steal over all timed windows: the contention
        # signal guest loadavg cannot see (None when /proc/stat steal
        # is unreadable) — one integer, so the compact line stays
        # under the driver's tail-capture budget
        "steal_ticks": (sum(t["steal_ticks"] for t in telemetry.values())
                        if all(t["steal_ticks"] is not None
                               for t in telemetry.values()) else None),
        # windows that tripped the steal-retry and were re-run (their
        # kept number is the least-stolen of ≤3 attempts; every
        # attempt is on the diagnostics line)
        "steal_retries": retried,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
