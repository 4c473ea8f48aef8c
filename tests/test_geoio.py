"""Sources/sinks: WKT CSV ingestion and spatially-partitioned parquet
round-trip, including the partition-pruning contract (PartitionFilters
must appear in the pruned scan's plan)."""

import math
import os
import shutil
import sys

import pyspark.sql.functions as F
import pytest

sys.path.insert(0, "/root/repo")

from datafusion_geo_spark.functions import st_astext, st_intersects
from datafusion_geo_spark.sources.geoio import (read_geo_parquet,
                                                read_wkt_csv,
                                                write_geo_parquet)

CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".cache", "geoio_test")


@pytest.fixture(scope="module", autouse=True)
def clean_dir():
    shutil.rmtree(CACHE, ignore_errors=True)
    os.makedirs(CACHE, exist_ok=True)
    yield
    shutil.rmtree(CACHE, ignore_errors=True)


def test_wkt_csv_roundtrip(spark):
    csv_dir = os.path.join(CACHE, "csv_in")
    pdf_rows = [(i, f"POINT({i} {i+1})") for i in range(50)]
    spark.createDataFrame(pdf_rows, "id long, wkt string") \
        .coalesce(1).write.mode("overwrite").option("header", True).csv(csv_dir)
    df = read_wkt_csv(spark, csv_dir)
    got = {r.id: r.wkt for r in
           df.select("id", st_astext(F.col("geom")).alias("wkt")).collect()}
    assert got == {str(i): f"POINT({i} {i+1})" for i in range(50)} or \
           got == {i: f"POINT({i} {i+1})" for i in range(50)}


def test_spatial_partitioned_write_and_pruned_read(spark):
    out = os.path.join(CACHE, "geo_pq")
    rows = [(i, f"POINT({(i % 40) * 5} {(i // 40) * 5})") for i in range(200)]
    src = spark.createDataFrame(rows, "id long, wkt string") \
        .select("id", F.col("wkt"))
    from datafusion_geo_spark.functions import st_geomfromtext
    src = src.withColumn("geom", st_geomfromtext(F.col("wkt"))).drop("wkt")
    write_geo_parquet(src, out, cell=8.0)

    # full read preserves all rows
    assert read_geo_parquet(spark, out).count() == 200

    # pruned read: only cells overlapping the query bbox are scanned
    pruned = read_geo_parquet(spark, out, bbox=(0, 0, 10, 10), cell=8.0)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell_x" in plan
    exact = pruned.where(st_intersects(
        F.col("geom"), "POLYGON((0 0,10 0,10 10,0 10,0 0))"))
    ids = {r.id for r in exact.select("id").collect()}
    expected = {i for i in range(200)
                if (i % 40) * 5 <= 10 and (i // 40) * 5 <= 10}
    assert ids == expected
    # pruning really skipped partitions: fewer input rows than full scan
    assert pruned.count() < 200


def test_geojsonl_roundtrip(spark):
    from datafusion_geo_spark.sources.geoio import (read_geojsonl,
                                                    write_geojsonl)
    from datafusion_geo_spark.functions import st_geomfromtext
    path = os.path.join(CACHE, "features")
    src = spark.createDataFrame(
        [(1, "alpha", "POINT(1 2)"),
         (2, "beta", "LINESTRING(0 0,3 4)"),
         (3, "gamma", None)],
        "id long, name string, wkt string")
    df = src.select("id", "name",
                    st_geomfromtext(F.col("wkt")).alias("geom"))
    write_geojsonl(df, path)

    back = read_geojsonl(spark, path, properties_schema="id long, name string")
    got = {r["id"]: r for r in back.select(
        "id", "name",
        st_astext(F.col("geom")).alias("wkt")).collect()}
    assert got[1]["wkt"] == "POINT(1 2)" and got[1]["name"] == "alpha"
    assert got[2]["wkt"] == "LINESTRING(0 0,3 4)"
    assert got[3]["wkt"] is None  # null geometry preserved, not dropped

    # without a schema: properties ride along as JSON text
    raw = read_geojsonl(spark, path)
    assert set(raw.columns) == {"geom", "properties_json"}
    assert raw.where(F.col("properties_json").contains('"name":"beta"')) \
              .count() == 1


def test_geojsonl_bare_geometry_lines(spark):
    path = os.path.join(CACHE, "bare")
    from datafusion_geo_spark.sources.geoio import read_geojsonl
    lines = ['{"type":"Point","coordinates":[7,8]}',
             '',  # blank lines skipped
             '{"type":"Polygon","coordinates":[[[0,0],[2,0],[2,2],[0,0]]]}']
    spark.createDataFrame([(l,) for l in lines], "value string") \
        .coalesce(1).write.mode("overwrite").text(path)
    got = sorted(r["wkt"] for r in read_geojsonl(spark, path).select(
        st_astext(F.col("geom")).alias("wkt")).collect())
    assert got == ["POINT(7 8)", "POLYGON((0 0,2 0,2 2,0 0))"]


def _py_morton(cx, cy):
    def spread(v):
        v &= 0xFFFF
        v = (v | v << 8) & 0x00FF00FF
        v = (v | v << 4) & 0x0F0F0F0F
        v = (v | v << 2) & 0x33333333
        v = (v | v << 1) & 0x55555555
        return v
    return spread(cx) | (spread(cy) << 1)


def test_morton_key_matches_reference_bit_interleave(spark):
    from datafusion_geo_spark.sources.geoio import morton_key
    pts = [(float(x), float(y))
           for x in (-300, -1, 0, 1, 7, 255, 32000)
           for y in (-17, 0, 3, 1023)]
    df = spark.createDataFrame(pts, "x double, y double")
    got = {(r["x"], r["y"]): r["m"] for r in df.select(
        "x", "y", morton_key(F.col("x"), F.col("y")).alias("m")).collect()}
    for x, y in pts:
        cx = (int(math.floor(x)) + (1 << 15)) & 0xFFFF
        cy = (int(math.floor(y)) + (1 << 15)) & 0xFFFF
        assert got[(x, y)] == _py_morton(cx, cy), (x, y)


def test_morton_locality(spark):
    """Points in the same small square sort closer to each other than to
    far-away points — the property that makes row-group stats tight."""
    from datafusion_geo_spark.sources.geoio import morton_key
    import itertools
    near = [(float(x), float(y)) for x, y in
            itertools.product(range(0, 4), range(0, 4))]
    far = [(1000.0, 1000.0)]
    df = spark.createDataFrame(near + far, "x double, y double")
    rows = df.select("x", "y",
                     morton_key(F.col("x"), F.col("y")).alias("m")).collect()
    near_keys = sorted(r["m"] for r in rows if r["x"] < 100)
    far_key = [r["m"] for r in rows if r["x"] == 1000.0][0]
    assert near_keys[-1] - near_keys[0] < 64   # 4x4 block: tight range
    assert far_key > near_keys[-1] + 10_000    # far point far in key space


def test_zorder_write_keeps_read_contract(spark):
    from datafusion_geo_spark.functions import st_geomfromtext
    path = os.path.join(CACHE, "zordered")
    rows = [(i, f"POINT({i % 50} {(i * 7) % 50})") for i in range(500)]
    df = spark.createDataFrame(rows, "id long, wkt string") \
        .select("id", st_geomfromtext(F.col("wkt")).alias("geom"))
    write_geo_parquet(df, path, cell=8.0, zorder=True)
    win = read_geo_parquet(spark, path, bbox=(10.0, 10.0, 20.0, 20.0))
    expect = {i for i in range(500)
              if 10 <= i % 50 <= 20 and 10 <= (i * 7) % 50 <= 20}
    assert {r["id"] for r in win.collect()} == expect


def test_zorder_files_are_morton_sorted(spark):
    """The Morton sort must SURVIVE the partitioned write (review
    finding: without the partition-column sort prefix, V1Writes inserts
    its own sort and scrambles the Morton order inside files)."""
    import glob
    import pyarrow.parquet as pq
    from datafusion_geo_spark.functions import st_geomfromtext
    path = os.path.join(CACHE, "zsorted")
    rows = [(i, f"POINT({(i * 13) % 64} {(i * 29) % 64})") for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, wkt string") \
        .select("id", st_geomfromtext(F.col("wkt")).alias("geom"))
    write_geo_parquet(df, path, cell=32.0, zorder=True)
    checked = 0
    for f in glob.glob(os.path.join(path, "cell_x=*", "cell_y=*", "*.parquet")):
        t = pq.read_table(f, columns=["xmin", "ymin", "xmax", "ymax"]).to_pandas()
        if len(t) < 3:
            continue
        cx = ((t["xmin"] + t["xmax"]) / 2 // 2.0).astype(int) + (1 << 15)
        cy = ((t["ymin"] + t["ymax"]) / 2 // 2.0).astype(int) + (1 << 15)
        keys = [_py_morton(int(a) & 0xFFFF, int(b) & 0xFFFF)
                for a, b in zip(cx, cy)]
        assert keys == sorted(keys), f
        checked += 1
    assert checked >= 2  # the assertion actually ran on real files
