"""Hilbert-curve layout keys: reference-walk equality, SQL-twin
equality, NULL handling, and the locality advantage over Morton."""

import pytest

import duckdb
import pyspark.sql.functions as F

from datafusion_geo_spark.operators.layout import (hilbert_key,
                                                   hilbert_key_sql_query,
                                                   morton_key,
                                                   with_hilbert_key)


def _xy2d(order, x, y):
    d = 0
    s = order // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


@pytest.mark.slow
def test_matches_reference_walk(spark):
    bits = 4
    rows = [(float(x), float(y)) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x double, y double")
    got = df.select("x", "y",
                    hilbert_key(F.col("x"), F.col("y"),
                                (0.0, 0.0, 16.0, 16.0), bits).alias("h")
                    ).collect()
    for r in got:
        assert r["h"] == _xy2d(16, int(r["x"]), int(r["y"])), r


def test_sql_twin_matches(spark):
    bits = 8
    rows = [(i, float((i * 7) % 251), float((i * 13) % 241))
            for i in range(300)]
    df = spark.createDataFrame(rows, "id int, x double, y double")
    got = {r["id"]: r["hkey"] for r in with_hilbert_key(
        df, "x", "y", (0.0, 0.0, 256.0, 256.0), bits).collect()}
    con = duckdb.connect()
    q = hilbert_key_sql_query("id", "x", "y", (0.0, 0.0, 256.0, 256.0),
                              bits, "t", key_name="id")
    con.execute("CREATE TABLE t(id INT, x DOUBLE, y DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = dict(con.execute(q).fetchall())
    assert got == want


@pytest.mark.slow
def test_null_and_clamp(spark):
    df = spark.createDataFrame(
        [(1, 5.0, 5.0), (2, None, 5.0), (3, -99.0, 999.0)],
        "id int, x double, y double")
    got = {r["id"]: r["h"] for r in df.select(
        "id", hilbert_key(F.col("x"), F.col("y"),
                          (0.0, 0.0, 16.0, 16.0), 4).alias("h")).collect()}
    assert got[2] is None
    assert got[3] is not None  # clamped, not corrupted


@pytest.mark.slow
def test_consecutive_keys_are_adjacent_cells(spark):
    # the Hilbert guarantee Morton lacks: walking keys in order never
    # long-jumps — every consecutive key pair is grid-adjacent, so
    # key-range buckets (files) cover contiguous regions
    bits = 5
    n = 1 << bits
    rows = [(float(x), float(y)) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "x double, y double")
    out = df.select(
        "x", "y",
        hilbert_key(F.col("x"), F.col("y"),
                    (0.0, 0.0, float(n), float(n)), bits).alias("h"),
        morton_key(F.col("x"), F.col("y"),
                   (0.0, 0.0, float(n), float(n)), bits).alias("m")
    ).collect()
    by_h = {r["h"]: (int(r["x"]), int(r["y"])) for r in out}
    by_m = {r["m"]: (int(r["x"]), int(r["y"])) for r in out}

    def jumps(pos):
        return [abs(pos[i][0] - pos[i + 1][0])
                + abs(pos[i][1] - pos[i + 1][1])
                for i in range(n * n - 1)]

    hj = jumps(by_h)
    assert max(hj) == 1               # perfect adjacency
    assert max(jumps(by_m)) > 1       # Z-order's diagonal seams jump


def test_frame_and_scalar_forms_agree(spark):
    rows = [(i, float(i % 13), float(i % 11)) for i in range(100)]
    df = spark.createDataFrame(rows, "id int, x double, y double")
    a = {r["id"]: r["hkey"] for r in with_hilbert_key(
        df, "x", "y", (0.0, 0.0, 16.0, 16.0), 4).collect()}
    b = {r["id"]: r["h"] for r in df.select(
        "id", hilbert_key(F.col("x"), F.col("y"),
                          (0.0, 0.0, 16.0, 16.0), 4).alias("h")).collect()}
    assert a == b


def test_hilbert_bijective_and_unit_adjacent(spark):
    """The defining Hilbert properties, exhaustively at 3 orders: keys
    are a bijection onto 0..n²-1, and consecutive keys map to
    GRID-ADJACENT cells (Manhattan distance exactly 1 — the locality
    guarantee the layout exists for; Z-order deliberately fails
    this)."""
    import pyspark.sql.functions as F

    from datafusion_geo_spark.operators.layout import hilbert_key
    for bits in (2, 3, 4):
        n = 1 << bits
        cells = [(float(i), float(j)) for i in range(n) for j in range(n)]
        df = spark.createDataFrame(cells, ["x", "y"])
        out = df.select(
            "x", "y",
            hilbert_key(F.col("x") + F.lit(0.5), F.col("y") + F.lit(0.5),
                        (0.0, 0.0, float(n), float(n)), bits)
            .alias("d")).collect()
        assert {r.d for r in out} == set(range(n * n))
        bykey = sorted(out, key=lambda r: r.d)
        for a, b in zip(bykey, bykey[1:]):
            assert abs(a.x - b.x) + abs(a.y - b.y) == 1, \
                (bits, a.d, (a.x, a.y), (b.x, b.y))


def test_morton_bijective_exhaustive(spark):
    """Z-order keys are a bijection onto 0..n²-1 at 3 orders (Morton
    deliberately has no unit-adjacency guarantee — that's Hilbert's
    selling point — but key collisions would corrupt file layout)."""
    import pyspark.sql.functions as F

    from datafusion_geo_spark.operators.layout import morton_key
    for bits in (2, 3, 4):
        n = 1 << bits
        cells = [(float(i), float(j)) for i in range(n) for j in range(n)]
        df = spark.createDataFrame(cells, ["x", "y"])
        out = df.select(
            morton_key(F.col("x") + F.lit(0.5), F.col("y") + F.lit(0.5),
                       (0.0, 0.0, float(n), float(n)), bits)
            .alias("d")).collect()
        assert {r.d for r in out} == set(range(n * n))
