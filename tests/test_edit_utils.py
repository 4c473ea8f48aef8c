"""Editing utilities added in r5 tail: ST_Affine / ST_Expand /
ST_Angle / ST_RemoveRepeatedPoints / ST_SnapToGrid / ST_AddPoint /
ST_SetPoint / ST_RemovePoint / ST_Multi / ST_CollectionExtract /
ST_CollectionHomogenize / ST_Dump(Points)."""

import math

import pytest

from datafusion_geo_spark.geo import edit
from datafusion_geo_spark.geo.wkt import from_wkt, to_wkt


def W(s):
    return from_wkt(s)


def T(g):
    return to_wkt(g)


def test_affine_composes_rotate_translate():
    g = W("LINESTRING(0 0,1 1)")
    # 90° CCW rotation is affine(0,-1,1,0, 0,0)
    assert T(edit.affine(g, 0, -1, 1, 0, 0, 0)) == "LINESTRING(0 0,-1 1)"
    assert T(edit.affine(g, 1, 0, 0, 1, 10, 20)) == "LINESTRING(10 20,11 21)"


def test_expand():
    assert T(edit.expand(W("POINT(1 2)"), 0.5)) == \
        "POLYGON((0.5 1.5,1.5 1.5,1.5 2.5,0.5 2.5,0.5 1.5))"
    assert T(edit.expand(W("LINESTRING(0 0,2 1)"), 1, 2)) == \
        "POLYGON((-1 -2,3 -2,3 3,-1 3,-1 -2))"
    assert T(edit.expand(W("POINT EMPTY"), 1)) == "POLYGON EMPTY"
    # negative delta inverting the box -> empty (documented deviation)
    assert T(edit.expand(W("POINT(0 0)"), -1)) == "POLYGON EMPTY"


def test_angle_three_and_four_point():
    # right angle at (1,0) between west and north directions, clockwise
    assert edit.angle((0, 0), (1, 0), (1, 1)) == pytest.approx(math.pi / 2)
    # 4-point: from east to north = 3π/2 clockwise... az(E)=π/2, az(N)=0
    a = edit.angle((0, 0), (1, 0), (0, 0), (0, 1))
    assert a == pytest.approx(3 * math.pi / 2)
    assert edit.angle((0, 0), (0, 0), (1, 1)) is None  # degenerate


def test_remove_repeated_points():
    assert T(edit.remove_repeated_points(
        W("LINESTRING(0 0,0 0,1 1,1 1,2 2)"))) == "LINESTRING(0 0,1 1,2 2)"
    # tolerance merges near-duplicates
    assert T(edit.remove_repeated_points(
        W("LINESTRING(0 0,0.1 0,5 5)"), 0.5)) == "LINESTRING(0 0,5 5)"
    # ring that would collapse keeps its original coordinates
    keep = edit.remove_repeated_points(
        W("POLYGON((0 0,0.1 0,0.1 0.1,0 0))"), 1.0)
    assert T(keep) == "POLYGON((0 0,0.1 0,0.1 0.1,0 0))"
    assert T(edit.remove_repeated_points(
        W("MULTIPOINT(1 1,1 1,2 2)"))) == "MULTIPOINT(1 1,2 2)"


def test_snap_to_grid():
    assert T(edit.snap_to_grid(
        W("LINESTRING(0.4 0.4,0.6 0.6,1.4 1.4)"), 1.0)) == \
        "LINESTRING(0 0,1 1)"
    # collapsing polygon -> empty
    assert T(edit.snap_to_grid(
        W("POLYGON((0 0,0.2 0,0.2 0.2,0 0.2,0 0))"), 1.0)) == "POLYGON EMPTY"
    # surviving polygon with collapsing hole -> hole dropped
    g = W("POLYGON((0 0,10 0,10 10,0 10,0 0),"
          "(4.9 4.9,5.1 4.9,5.1 5.1,4.9 4.9))")
    assert T(edit.snap_to_grid(g, 1.0)) == \
        "POLYGON((0 0,10 0,10 10,0 10,0 0))"
    with pytest.raises(ValueError):
        edit.snap_to_grid(W("POINT(0 0)"), 0.0)


def test_point_editors():
    ln = W("LINESTRING(0 0,2 2)")
    assert T(edit.add_point(ln, (1.0, 1.0), 1)) == "LINESTRING(0 0,1 1,2 2)"
    assert T(edit.add_point(ln, (3.0, 3.0))) == "LINESTRING(0 0,2 2,3 3)"
    assert edit.add_point(ln, (0.0, 0.0), 7) is None
    assert T(edit.set_point(ln, -1, (5.0, 5.0))) == "LINESTRING(0 0,5 5)"
    assert edit.set_point(W("POINT(0 0)"), 0, (1.0, 1.0)) is None
    assert T(edit.remove_point(
        W("LINESTRING(0 0,1 1,2 2)"), 1)) == "LINESTRING(0 0,2 2)"
    assert edit.remove_point(ln, 0) is None  # would drop below 2 points


def test_multi_and_collections():
    assert T(edit.multi(W("POINT(1 2)"))) == "MULTIPOINT(1 2)"
    assert T(edit.multi(W("POLYGON((0 0,1 0,1 1,0 0))"))) == \
        "MULTIPOLYGON(((0 0,1 0,1 1,0 0)))"
    gc = W("GEOMETRYCOLLECTION(POINT(1 2),LINESTRING(0 0,1 1),POINT(3 4))")
    assert T(edit.collection_extract(gc, 1)) == "MULTIPOINT(1 2,3 4)"
    assert T(edit.collection_extract(gc, 2)) == "MULTILINESTRING((0 0,1 1))"
    assert T(edit.collection_extract(gc, 3)) == "MULTIPOLYGON EMPTY"
    assert T(edit.collection_homogenize(
        W("GEOMETRYCOLLECTION(POINT(1 2),POINT(3 4))"))) == \
        "MULTIPOINT(1 2,3 4)"
    assert T(edit.collection_homogenize(
        W("GEOMETRYCOLLECTION(POINT(1 2))"))) == "POINT(1 2)"


def test_sql_surface(spark):
    from datafusion_geo_spark.functions import register_all
    register_all(spark)
    row = spark.sql("""
      SELECT st_astext(st_affine(st_geomfromtext('POINT(1 2)'),
                                 2, 0, 0, 3, 10, 20)) AS aff,
             st_astext(st_expand(st_geomfromtext('POINT(1 1)'), 1)) AS exp,
             st_angle(st_point(0,0), st_point(1,0), st_point(1,1)) AS ang,
             st_astext(st_snaptogrid(
               st_geomfromtext('LINESTRING(0.4 0.4,1.4 1.6)'), 1.0)) AS snp,
             st_astext(st_addpoint(st_geomfromtext('LINESTRING(0 0,2 2)'),
                                   st_point(1,1), 1)) AS addp,
             st_astext(st_multi(st_geomfromtext('POINT(5 6)'))) AS mlt,
             size(st_dump(st_geomfromtext('MULTIPOINT(1 1,2 2,3 3)'))) AS nd,
             size(st_dumppoints(
               st_geomfromtext('POLYGON((0 0,1 0,1 1,0 0))'))) AS np
    """).collect()[0]
    assert row["aff"] == "POINT(12 26)"
    assert row["exp"] == "POLYGON((0 0,2 0,2 2,0 2,0 0))"
    assert row["ang"] == pytest.approx(math.pi / 2)
    assert row["snp"] == "LINESTRING(0 0,1 2)"
    assert row["addp"] == "LINESTRING(0 0,1 1,2 2)"
    assert row["mlt"] == "MULTIPOINT(5 6)"
    assert row["nd"] == 3
    assert row["np"] == 4


def test_dataframe_dump_explode(spark):
    import pyspark.sql.functions as F
    from datafusion_geo_spark.functions import (st_astext, st_dump,
                                                st_geomfromtext)
    df = spark.createDataFrame(
        [("MULTILINESTRING((0 0,1 1),(2 2,3 3))",)], "wkt string")
    out = (df.select(
               F.explode(st_dump(st_geomfromtext(F.col("wkt")))).alias("m"))
             .select(st_astext(F.col("m")).alias("w")).collect())
    assert sorted(r["w"] for r in out) == \
        ["LINESTRING(0 0,1 1)", "LINESTRING(2 2,3 3)"]
