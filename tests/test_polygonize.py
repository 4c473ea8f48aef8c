"""ST_Polygonize: face assembly from noded linework."""

import pyspark.sql.functions as F

from datafusion_geo_spark.geo.polygonize import polygonize
from datafusion_geo_spark.geo.wkt import from_wkt, to_wkt


def _pz(*wkts):
    return to_wkt(polygonize([from_wkt(w) for w in wkts]))


def test_goldens():
    # closed triangle from three separate segments
    assert _pz("LINESTRING(0 0,2 0)", "LINESTRING(2 0,1 2)",
               "LINESTRING(1 2,0 0)") == "POLYGON((0 0,2 0,1 2,0 0))"
    # square split by a chord -> two faces, smallest-first determinism
    assert _pz("LINESTRING(0 0,4 0,4 4,0 4,0 0)",
               "LINESTRING(0 0,4 4)") == \
        "MULTIPOLYGON(((0 0,4 0,4 4,0 0)),((0 0,4 4,0 4,0 0)))"
    # nested rings: inner face + annulus-with-hole
    assert _pz("LINESTRING(0 0,10 0,10 10,0 10,0 0)",
               "LINESTRING(4 4,6 4,6 6,4 6,4 4)") == \
        ("MULTIPOLYGON(((4 4,6 4,6 6,4 6,4 4)),"
         "((0 0,10 0,10 10,0 10,0 0),(4 4,4 6,6 6,6 4,4 4)))")
    # dangling linework ignored; open linework closes nothing
    assert _pz("LINESTRING(0 0,1 0,1 1,0 1,0 0)",
               "LINESTRING(5 5,9 9)") == "POLYGON((0 0,1 0,1 1,0 1,0 0))"
    assert _pz("LINESTRING(0 0,1 0)",
               "LINESTRING(1 0,1 1)") == "GEOMETRYCOLLECTION EMPTY"
    # duplicate segments (both directions) collapse before tracing
    assert _pz("LINESTRING(0 0,1 0,1 1,0 1,0 0)",
               "LINESTRING(1 0,0 0)") == "POLYGON((0 0,1 0,1 1,0 1,0 0))"


def test_spark_surface(spark):
    from datafusion_geo_spark.functions import (register_all, st_astext,
                                                st_geomfromtext,
                                                st_polygonize,
                                                st_polygonize_agg)
    df = spark.createDataFrame(
        [(1, "LINESTRING(0 0,2 0)"), (1, "LINESTRING(2 0,1 2)"),
         (1, "LINESTRING(1 2,0 0)"), (2, "LINESTRING(0 0,1 0)")],
        "gid int, w string")
    agg = (df.groupBy("gid")
           .agg(st_astext(st_polygonize_agg(
               st_geomfromtext(F.col("w")))).alias("p")))
    got = {r["gid"]: r["p"] for r in agg.collect()}
    assert got == {1: "POLYGON((0 0,2 0,1 2,0 0))",
                   2: "GEOMETRYCOLLECTION EMPTY"}
    register_all(spark)
    row = spark.sql(
        "SELECT ST_AsText(ST_Polygonize(ST_GeomFromText("
        "'MULTILINESTRING((0 0,1 0),(1 0,1 1),(1 1,0 0))'))) AS p"
    ).collect()[0]
    assert row["p"] == "POLYGON((0 0,1 0,1 1,0 0))"
