"""Z-order layout: Morton keys + file-clustering write arrangement."""

import pyspark.sql.functions as F

from datafusion_geo_spark.operators.layout import morton_key, zorder_layout


def _ref_morton(x, y, bounds, bits=16):
    xmin, ymin, xmax, ymax = bounds
    n = 1 << bits

    def cell(v, lo, hi):
        q = int(((v - lo) / (hi - lo)) * n // 1)
        return max(0, min(n - 1, q))

    qx, qy = cell(x, xmin, xmax), cell(y, ymin, ymax)
    z = 0
    for i in range(bits):
        z |= ((qx >> i) & 1) << (2 * i)
        z |= ((qy >> i) & 1) << (2 * i + 1)
    return z


def test_morton_matches_reference_interleave(spark):
    pts = [(1, -170.0, -80.0), (2, 0.0, 0.0), (3, 169.9, 79.9),
           (4, -180.0, -90.0), (5, 179.999, 89.999),
           (6, 1234.5, -999.0),            # out of bounds: clamps
           (7, None, 5.0)]                 # null passes through
    df = spark.createDataFrame(pts, "id int, x double, y double")
    b = (-180.0, -90.0, 180.0, 90.0)
    got = {r["id"]: r["m"] for r in df.select(
        "id", morton_key(F.col("x"), F.col("y"), b).alias("m")).collect()}
    for i, x, y in pts:
        if x is None:
            assert got[i] is None
        else:
            assert got[i] == _ref_morton(min(max(x, -180.0), 180.0),
                                         min(max(y, -90.0), 90.0), b), i


def test_zorder_locality(spark):
    # after layout, consecutive rows are spatial neighbors: the mean
    # jump between successive rows must beat a shuffled order by a lot
    import math
    rows = [(i, float((i * 7919) % 500), float((i * 104729) % 500))
            for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    b = (0.0, 0.0, 500.0, 500.0)
    laid = zorder_layout(df, "x", "y", b, num_files=4).collect()
    assert sorted(r["id"] for r in laid) == list(range(2000))

    def mean_jump(seq):
        return sum(math.hypot(a["x"] - c["x"], a["y"] - c["y"])
                   for a, c in zip(seq, seq[1:])) / (len(seq) - 1)

    assert mean_jump(laid) < mean_jump(sorted(laid, key=lambda r: r["id"])) / 4


def test_zorder_plan_is_range_partitioning(spark):
    df = spark.createDataFrame([(1, 0.0, 0.0)], "id int, x double, y double")
    out = zorder_layout(df, "x", "y", (0.0, 0.0, 1.0, 1.0), num_files=2)
    plan = out._jdf.queryExecution().toString()
    assert "rangepartitioning" in plan.lower()
    assert "_zkey" not in out.columns
