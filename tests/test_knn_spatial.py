"""Spatial kNN join: brute-force equivalence, round-resolution
behavior, determinism, and straggler fallback."""

import pyspark.sql.functions as F
import pytest

from datafusion_geo_spark.operators.spatial_join import knn_point_join


def _points(spark, rows):
    from datafusion_geo_spark.functions import st_point
    df = spark.createDataFrame(rows, "id int, x double, y double")
    return df.withColumn("geom", st_point(F.col("x"), F.col("y")))


def _brute(spark, left_rows, right_rows, k):
    out = {}
    for lid, lx, ly in left_rows:
        cands = sorted(((lx - rx) ** 2 + (ly - ry) ** 2, rid)
                       for rid, rx, ry in right_rows)
        out[lid] = [(rid, d2) for d2, rid in cands[:k]]
    return out


@pytest.fixture()
def clustered_rows():
    left = [(i, float(i % 13), float(i % 7)) for i in range(1, 21)]
    right = [(100 + i, float((i * 3) % 17), float((i * 5) % 11))
             for i in range(60)]
    return left, right


def test_matches_brute_force(spark, clustered_rows):
    left_rows, right_rows = clustered_rows
    got = (knn_point_join(_points(spark, left_rows),
                          _points(spark, right_rows), 3, "id", "id",
                          cell=2.0)
           .select(F.col("la.id").alias("lid"), "rk", "rn", "dist")
           .collect())
    want = _brute(spark, left_rows, right_rows, 3)
    by_left = {}
    for r in got:
        by_left.setdefault(r["lid"], []).append((r["rn"], r["rk"], r["dist"]))
    assert set(by_left) == set(want)
    for lid, rows in by_left.items():
        rows.sort()
        assert len(rows) == 3
        for (rn, rk, dist), (wrid, wd2) in zip(rows, want[lid]):
            assert dist ** 2 == pytest.approx(wd2, abs=1e-9)
            # ids must match except where equal distances tie; ties
            # break on right id ascending = brute force sort order
            assert rk == wrid, (lid, rows, want[lid])


def test_straggler_fallback(spark):
    # an isolated left point far outside every round's radius still
    # resolves via the brute-force tail
    left = [(1, 0.0, 0.0), (2, 100000.0, 100000.0)]
    right = [(10, 1.0, 0.0), (11, 2.0, 0.0), (12, 3.0, 0.0)]
    got = (knn_point_join(_points(spark, left), _points(spark, right),
                          2, "id", "id", cell=1.0, max_rounds=2)
           .select(F.col("la.id").alias("lid"), "rk", "rn")
           .collect())
    by_left = {}
    for r in got:
        by_left.setdefault(r["lid"], []).append((r["rn"], r["rk"]))
    assert sorted(by_left[1]) == [(1, 10), (2, 11)]
    assert sorted(by_left[2]) == [(1, 12), (2, 11)]


def test_null_geometry_left_dropped(spark):
    from datafusion_geo_spark.functions import st_point
    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, None, None)], "id int, x double, y double")
    left = df.withColumn(
        "geom", F.when(F.col("x").isNotNull(),
                       st_point(F.col("x"), F.col("y"))))
    right = _points(spark, [(10, 1.0, 1.0)])
    got = knn_point_join(left, right, 1, "id", "id", cell=4.0).collect()
    assert [r["la"]["id"] for r in got] == [1]


def test_deterministic_ties(spark):
    # four right points all at distance 1: ranks follow right id
    left = [(1, 0.0, 0.0)]
    right = [(13, 1.0, 0.0), (11, -1.0, 0.0), (12, 0.0, 1.0),
             (14, 0.0, -1.0)]
    got = (knn_point_join(_points(spark, left), _points(spark, right),
                          3, "id", "id", cell=2.0)
           .orderBy("rn").select("rk").collect())
    assert [r["rk"] for r in got] == [11, 12, 13]
