"""ST_MaximumInscribedCircle (polylabel) and ST_Snap."""

import math

import pytest

from datafusion_geo_spark.geo.bounding import max_inscribed_circle
from datafusion_geo_spark.geo.edit import snap
from datafusion_geo_spark.geo.wkt import from_wkt, to_wkt

W = from_wkt


class TestMaxInscribedCircle:
    def test_square(self):
        c, r = max_inscribed_circle(W("POLYGON((0 0,10 0,10 10,0 10,0 0))"))
        assert c == (5.0, 5.0) and r == 5.0

    def test_rectangle(self):
        c, r = max_inscribed_circle(W("POLYGON((0 0,20 0,20 4,0 4,0 0))"))
        assert r == pytest.approx(2.0, abs=1e-9)
        assert c[1] == pytest.approx(2.0, abs=1e-9)

    def test_holed_corner_pocket(self):
        # shell 10x10 with hole 2..8: biggest disc sits in a corner
        # pocket with r = 2*sqrt(2)/(1+sqrt(2)), beating the width-2
        # corridor disc (r=1)
        c, r = max_inscribed_circle(W(
            "POLYGON((0 0,10 0,10 10,0 10,0 0),(2 2,8 2,8 8,2 8,2 2))"))
        want = 2.0 * math.sqrt(2.0) / (1.0 + math.sqrt(2.0))
        assert r == pytest.approx(want, abs=0.02)

    def test_l_shape_center_inside(self):
        from datafusion_geo_spark.geo.algos import covers
        from datafusion_geo_spark.geo.geom import Geometry
        g = W("POLYGON((0 0,10 0,10 2,2 2,2 10,0 10,0 0))")
        c, r = max_inscribed_circle(g)
        assert covers(g, Geometry("Point", c, None))
        # the elbow pocket at the inner corner (2,2) admits a disc of
        # r = 2*sqrt(2)/(1+sqrt(2)) — larger than the width-2 arms' r=1
        want = 2.0 * math.sqrt(2.0) / (1.0 + math.sqrt(2.0))
        assert r == pytest.approx(want, abs=0.02)

    def test_non_areal(self):
        assert max_inscribed_circle(W("LINESTRING(0 0,1 1)")) is None


class TestSnap:
    def test_vertex_snap(self):
        assert to_wkt(snap(W("LINESTRING(0.1 0,5 5)"),
                           W("POINT(0 0)"), 0.5)) == "LINESTRING(0 0,5 5)"

    def test_segment_insertion(self):
        assert to_wkt(snap(W("LINESTRING(0 0,10 0)"),
                           W("POINT(5 0.2)"), 0.5)) == \
            "LINESTRING(0 0,5 0.2,10 0)"

    def test_ring_stays_closed(self):
        out = snap(W("POLYGON((0 0,10 0,10 10,0 10,0 0))"),
                   W("MULTIPOINT(0.2 0.1,5 -0.3)"), 0.5)
        ring = out.parts[0]
        assert ring[0] == ring[-1]
        assert to_wkt(out) == \
            "POLYGON((0.2 0.1,5 -0.3,10 0,10 10,0 10,0.2 0.1))"

    def test_outside_tolerance_untouched(self):
        src = "LINESTRING(0 0,10 0)"
        assert to_wkt(snap(W(src), W("POINT(5 3)"), 0.5)) == src
        assert to_wkt(snap(W(src), W("POINT(5 3)"), 0.0)) == src


def test_sql_surface(spark):
    from datafusion_geo_spark.functions import register_all
    register_all(spark)
    row = spark.sql("""
      SELECT st_astext(st_maxinscribedcenter(st_geomfromtext(
               'POLYGON((0 0,10 0,10 10,0 10,0 0))'))) AS c,
             st_maxinscribedradius(st_geomfromtext(
               'POLYGON((0 0,10 0,10 10,0 10,0 0))')) AS r,
             st_astext(st_snap(st_geomfromtext('LINESTRING(0 0,10 0)'),
                               st_geomfromtext('POINT(5 0.2)'),
                               0.5)) AS s
    """).collect()[0]
    assert row["c"] == "POINT(5 5)"
    assert row["r"] == 5.0
    assert row["s"] == "LINESTRING(0 0,5 0.2,10 0)"
