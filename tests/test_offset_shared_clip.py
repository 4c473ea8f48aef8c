"""ST_OffsetCurve / ST_SharedPaths / ST_ClipByBox2D."""

import math

import pytest

from datafusion_geo_spark.geo.offset import offset_polyline
from datafusion_geo_spark.geo.overlay import clip_by_box, shared_paths
from datafusion_geo_spark.geo.wkt import from_wkt, to_wkt

W = from_wkt


class TestOffsetCurve:
    def test_straight_left_right(self):
        assert offset_polyline([(0, 0), (10, 0)], 1.0) == \
            [(0.0, 1.0), (10.0, 1.0)]
        # right side offsets below AND reverses direction (PostGIS)
        assert offset_polyline([(0, 0), (10, 0)], -1.0) == \
            [(10.0, -1.0), (0.0, -1.0)]

    def test_outward_round_join(self):
        r = offset_polyline([(0, 0), (10, 0), (10, -10)], 1.0, 2)
        assert r[0] == (0.0, 1.0) and r[1] == (10.0, 1.0)
        assert r[-1] == (11.0, -10.0)
        # every arc point stays at distance 1 from the corner
        for p in r[2:-1]:
            d = math.hypot(p[0] - 10.0, p[1] - 0.0)
            assert d == pytest.approx(1.0, abs=1e-9)

    def test_inward_trim(self):
        assert offset_polyline([(0, 0), (10, 0), (10, 10)], 1.0, 2) == \
            [(0.0, 1.0), (9.0, 1.0), (9.0, 10.0)]

    def test_offset_distance_preserved(self):
        # sampled points on the offset of a zigzag stay >= d-eps from it
        from datafusion_geo_spark.geo.algos import distance
        src = W("LINESTRING(0 0,4 0,6 3,10 3)")
        out = offset_polyline(list(src.parts), 0.5, 8)
        from datafusion_geo_spark.geo.geom import Geometry
        for p in out:
            d = distance(Geometry("Point", p, None), src)
            assert d == pytest.approx(0.5, abs=0.01)


class TestSharedPaths:
    def test_direction_split(self):
        g = shared_paths(W("LINESTRING(0 0,10 0)"), W("LINESTRING(2 0,6 0)"))
        assert to_wkt(g) == ("GEOMETRYCOLLECTION(MULTILINESTRING((2 0,6 0)),"
                             "MULTILINESTRING EMPTY)")
        g = shared_paths(W("LINESTRING(0 0,10 0)"), W("LINESTRING(6 0,2 0)"))
        assert to_wkt(g) == ("GEOMETRYCOLLECTION(MULTILINESTRING EMPTY,"
                             "MULTILINESTRING((2 0,6 0)))")

    def test_mixed_directions(self):
        g = shared_paths(W("MULTILINESTRING((0 0,10 0))"),
                         W("MULTILINESTRING((2 0,4 0),(8 0,6 0))"))
        assert to_wkt(g) == ("GEOMETRYCOLLECTION(MULTILINESTRING((2 0,4 0)),"
                             "MULTILINESTRING((6 0,8 0)))")

    def test_non_lineal_none(self):
        assert shared_paths(W("POINT(0 0)"), W("LINESTRING(0 0,1 1)")) is None


class TestClipByBox:
    def test_polygon_clip(self):
        assert to_wkt(clip_by_box(
            W("POLYGON((0 0,10 0,10 10,0 10,0 0))"), 5, 5, 20, 20)) == \
            "POLYGON((5 5,10 5,10 10,5 10,5 5))"

    def test_line_clip(self):
        assert to_wkt(clip_by_box(
            W("LINESTRING(-5 1,15 1)"), 0, 0, 10, 10)) == \
            "LINESTRING(0 1,10 1)"

    def test_inverted_box_empty(self):
        assert to_wkt(clip_by_box(
            W("POINT(1 1)"), 5, 5, 0, 0)) == "POLYGON EMPTY"


def test_sql_surface(spark):
    from datafusion_geo_spark.functions import register_all
    register_all(spark)
    row = spark.sql("""
      SELECT st_astext(st_offsetcurve(
               st_geomfromtext('LINESTRING(0 0,10 0)'), 1.0)) AS oc,
             st_astext(st_sharedpaths(
               st_geomfromtext('LINESTRING(0 0,10 0)'),
               st_geomfromtext('LINESTRING(6 0,2 0)'))) AS sp,
             st_astext(st_clipbybox2d(
               st_geomfromtext('POLYGON((0 0,10 0,10 10,0 10,0 0))'),
               5, 5, 20, 20)) AS cl
    """).collect()[0]
    assert row["oc"] == "LINESTRING(0 1,10 1)"
    assert row["sp"] == ("GEOMETRYCOLLECTION(MULTILINESTRING EMPTY,"
                         "MULTILINESTRING((2 0,6 0)))")
    assert row["cl"] == "POLYGON((5 5,10 5,10 10,5 10,5 5))"
