"""Sources/sinks: WKT CSV ingestion and spatially-partitioned parquet
round-trip, including the partition-pruning contract (PartitionFilters
must appear in the pruned scan's plan)."""

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
