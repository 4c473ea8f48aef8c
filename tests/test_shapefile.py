"""Shapefile source/sink (sources/shapefile.py): binary layout round
trips, ring orientation, dBASE typed attributes, split reads."""

import os
import struct

import pyspark.sql.functions as F
import pytest

from datafusion_geo_spark.functions import st_astext, st_geomfromtext
from datafusion_geo_spark.sources.shapefile import (read_shapefile,
                                                    write_shapefile)


def _frame(spark, rows):
    df = spark.createDataFrame(
        rows, "fid long, score double, name string, wkt string")
    return df.select("fid", "score", "name",
                     st_geomfromtext(F.col("wkt")).alias("geom"))


def _roundtrip(spark, tmp_path, rows, **kw):
    path = os.path.join(str(tmp_path), "ds")
    write_shapefile(_frame(spark, rows), path)
    back = read_shapefile(spark, path, **kw)
    return {r.fid: (r.score, r.name, r.wkt_out) for r in back.select(
        "fid", "score", "name",
        st_astext(F.col("geom")).alias("wkt_out")).collect()}


def test_point_roundtrip_with_attrs(spark, tmp_path):
    rows = [(1, 1.5, "alpha", "POINT(10 20)"),
            (2, -2.25, "beta", "POINT(-180 89.5)"),
            (3, None, None, None)]
    got = _roundtrip(spark, tmp_path, rows)
    assert got[1] == (1.5, "alpha", "POINT(10 20)")
    assert got[2] == (-2.25, "beta", "POINT(-180 89.5)")
    assert got[3] == (None, "", None)  # dBASE C NULL reads as ''


def test_polygon_hole_orientation_roundtrip(spark, tmp_path):
    # shell + hole; writer must emit shell CW / hole CCW and the
    # reader must reassemble the hole onto its shell
    wkt = ("POLYGON((0 0,10 0,10 10,0 10,0 0),"
           "(2 2,2 4,4 4,4 2,2 2))")
    got = _roundtrip(spark, tmp_path, [(1, 0.0, "p", wkt)])
    out = got[1][2]
    assert out.startswith("POLYGON((")
    # same point sets per ring regardless of start vertex/direction
    import re
    rings = re.findall(r"\(([^()]+)\)", out)
    pts = [set(r.split(",")) for r in rings]
    assert {"0 0", "10 0", "10 10", "0 10"} <= pts[0]
    assert {"2 2", "2 4", "4 4", "4 2"} <= pts[1]


def test_multitypes_roundtrip(spark, tmp_path):
    for wkt in ("MULTILINESTRING((0 0,1 1),(2 2,3 3,4 4))",
                "MULTIPOINT(1 1,2 2,3 3)",
                "LINESTRING(0 0,5 5,10 0)",
                "MULTIPOLYGON(((0 0,4 0,4 4,0 4,0 0)),"
                "((10 10,14 10,14 14,10 14,10 10)))"):
        got = _roundtrip(spark, tmp_path, [(1, 0.0, "g", wkt)])
        # engine WKT canonicalization aside, type + vertex set survive
        out = got[1][2]
        assert out.split("(")[0].strip() == wkt.split("(")[0].strip()


def test_mixed_classes_error(spark, tmp_path):
    df = _frame(spark, [(1, 0.0, "a", "POINT(0 0)"),
                        (2, 0.0, "b", "LINESTRING(0 0,1 1)")]) \
        .coalesce(1)
    with pytest.raises(Exception, match="mixed shape classes"):
        write_shapefile(df, os.path.join(str(tmp_path), "bad"))


def test_split_read_matches_whole(spark, tmp_path):
    rows = [(i, float(i), f"n{i}", f"POINT({i} {i % 7})")
            for i in range(23)]
    path = os.path.join(str(tmp_path), "many")
    write_shapefile(_frame(spark, rows).coalesce(1), path)
    whole = read_shapefile(spark, path).count()
    split = read_shapefile(spark, path, records_per_split=5)
    assert whole == 23 and split.count() == 23
    got = {r.fid: r.score for r in split.collect()}
    assert got == {i: float(i) for i in range(23)}


def test_single_shp_path_and_deleted_skip(spark, tmp_path):
    rows = [(1, 0.0, "a", "POINT(0 0)"), (2, 0.0, "b", "POINT(1 1)")]
    path = os.path.join(str(tmp_path), "one")
    write_shapefile(_frame(spark, rows).coalesce(1), path)
    shp = [f for f in sorted(os.listdir(path)) if f.endswith(".shp")]
    assert shp == ["part-00000.shp"]
    direct = read_shapefile(spark, os.path.join(path, shp[0]))
    assert direct.count() == 2
    # flag record 0 deleted in the .dbf -> skipped on read
    dbf = os.path.join(path, "part-00000.dbf")
    with open(dbf, "rb") as fh:
        buf = bytearray(fh.read())
    _, hdr = struct.unpack_from("<IH", buf, 4)[0], \
        struct.unpack_from("<H", buf, 8)[0]
    buf[hdr] = 0x2A  # '*'
    with open(dbf, "wb") as fh:
        fh.write(bytes(buf))
    assert read_shapefile(spark, path).count() == 1


def test_empty_frame_keeps_schema(spark, tmp_path):
    path = os.path.join(str(tmp_path), "empty")
    write_shapefile(_frame(spark, []).limit(0), path)
    back = read_shapefile(spark, path)
    assert back.count() == 0
    assert set(back.columns) == {"fid", "score", "name", "geom"}


def test_validation_errors(spark, tmp_path):
    long_name = spark.createDataFrame(
        [(1,)], "a_very_long_column long").withColumn(
        "geom", st_geomfromtext(F.lit("POINT(0 0)")))
    with pytest.raises(Exception, match="10-byte"):
        write_shapefile(long_name, os.path.join(str(tmp_path), "x"))
    arr = spark.createDataFrame([([1, 2],)], "a array<int>") \
        .withColumn("geom", st_geomfromtext(F.lit("POINT(0 0)")))
    with pytest.raises(Exception, match="unsupported attribute"):
        write_shapefile(arr, os.path.join(str(tmp_path), "y"))
    path = os.path.join(str(tmp_path), "z")
    write_shapefile(_frame(spark, [(1, 0.0, "a", "POINT(0 0)")]), path)
    with pytest.raises(Exception, match="path exists"):
        write_shapefile(_frame(spark, [(1, 0.0, "a", "POINT(0 0)")]),
                        path, mode="error")


def test_prj_srid_roundtrip(spark, tmp_path):
    from datafusion_geo_spark.functions import st_setsrid, st_srid
    from datafusion_geo_spark.geo.proj import esri_wkt
    path = os.path.join(str(tmp_path), "crs")
    df = _frame(spark, [(1, 0.0, "a", "POINT(300000 60000)"),
                        (2, 0.0, "b", None)]) \
        .withColumn("geom", st_setsrid(F.col("geom"), 32118))
    write_shapefile(df, path)
    prjs = [f for f in sorted(os.listdir(path)) if f.endswith(".prj")]
    assert prjs, "no .prj written for a single registered SRID"
    assert open(os.path.join(path, prjs[0])).read() == esri_wkt(32118)
    back = read_shapefile(spark, path).select(
        "fid", st_srid(F.col("geom")).alias("srid")).collect()
    got = {r.fid: r.srid for r in back}
    assert got[1] == 32118
    assert got[2] is None  # NULL geometry stays NULL


def test_prj_absent_for_mixed_or_zero_srid(spark, tmp_path):
    p1 = os.path.join(str(tmp_path), "nosrid")
    write_shapefile(_frame(spark, [(1, 0.0, "a", "POINT(0 0)")]), p1)
    assert not [f for f in os.listdir(p1) if f.endswith(".prj")]
    from datafusion_geo_spark.functions import st_srid
    r = read_shapefile(spark, p1).select(
        st_srid(F.col("geom")).alias("s")).collect()[0]
    assert r.s is None  # no-.prj WKB has no EWKB header (srid.rs)


def test_empty_parts_become_null_shape(spark, tmp_path):
    # POLYGON EMPTY / LINESTRING EMPTY-ish inputs must not crash the
    # writer: they encode as Null shape records and read back NULL
    path = os.path.join(str(tmp_path), "nullish")
    rows = [(1, 0.0, "a", "POLYGON EMPTY"),
            (2, 0.0, "b", "POINT(1 1)")]
    write_shapefile(_frame(spark, rows).coalesce(1), path)
    got = _roundtrip_read(spark, path)
    assert got[1] is None and got[2] == "POINT(1 1)"


def _roundtrip_read(spark, path):
    back = read_shapefile(spark, path)
    return {r.fid: r.wkt_out for r in back.select(
        "fid", st_astext(F.col("geom")).alias("wkt_out")).collect()}
