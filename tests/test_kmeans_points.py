"""kmeans_points (ST_ClusterKMeans parity): coverage, determinism,
and Lloyd-improvement invariants."""

import pyspark.sql.functions as F

from datafusion_geo_spark.operators.cluster import kmeans_points


def _pts(spark, rows):
    return spark.createDataFrame(rows, "id long, x double, y double")


def _toy_rows():
    # two well-separated blobs plus a stray
    rows = []
    for i in range(20):
        rows.append((i, float(i % 5), float(i % 4)))
        rows.append((100 + i, 50.0 + i % 5, 50.0 + i % 4))
    rows.append((999, 25.0, 25.0))
    return rows


def test_total_assignment_and_range(spark):
    rows = _toy_rows()
    out = kmeans_points(_pts(spark, rows), k=3, iters=2).collect()
    assert len(out) == len(rows)
    assert {r["cid"] for r in out} <= {0, 1, 2}


def test_partition_invariant(spark):
    rows = _toy_rows()
    a = sorted(map(tuple, kmeans_points(
        _pts(spark, rows), k=3, iters=2).collect()))
    b = sorted(map(tuple, kmeans_points(
        _pts(spark, rows).repartition(7), k=3, iters=2).collect()))
    assert a == b


def test_separated_blobs_split(spark):
    rows = _toy_rows()
    out = kmeans_points(_pts(spark, rows), k=2, iters=3).collect()
    lo = {r["cid"] for r in out if r["id"] < 100}
    hi = {r["cid"] for r in out if 100 <= r["id"] < 200}
    assert len(lo) == 1 and len(hi) == 1 and lo != hi


def test_null_coords_dropped(spark):
    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, None, None), (3, 1.0, 1.0)],
        "id long, x double, y double")
    out = kmeans_points(df, k=2, iters=1).collect()
    assert sorted(r["id"] for r in out) == [1, 3]
