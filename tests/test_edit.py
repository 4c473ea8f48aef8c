"""Editing utilities (geo/edit.py) + ST_SymDifference (geo/overlay.py)."""

import math

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_geo_spark.geo.algos import area, length
from datafusion_geo_spark.geo.edit import (flip_coordinates, line_substring,
                                           reduce_precision, reverse, rotate,
                                           scale, segmentize)
from datafusion_geo_spark.geo.overlay import (difference, intersection,
                                              symdifference, union)
from datafusion_geo_spark.geo.wkt import from_wkt as W
from datafusion_geo_spark.geo.wkt import to_wkt as T


def test_reverse_flip_scale():
    assert T(reverse(W("LINESTRING(0 0,1 0,2 5)"))) == "LINESTRING(2 5,1 0,0 0)"
    assert T(reverse(W("POLYGON((0 0,2 0,2 2,0 0))"))) == \
        "POLYGON((0 0,2 2,2 0,0 0))"
    assert T(flip_coordinates(W("POINT(3 7)"))) == "POINT(7 3)"
    assert T(scale(W("LINESTRING(1 2,3 4)"), 2, 3)) == "LINESTRING(2 6,6 12)"


def test_rotate():
    g = rotate(W("POINT(1 0)"), math.pi / 2)
    assert g.parts[0] == pytest.approx(0.0, abs=1e-15)
    assert g.parts[1] == pytest.approx(1.0, abs=1e-15)
    g = rotate(W("POINT(2 1)"), math.pi, 1.0, 1.0)
    assert g.parts[0] == pytest.approx(0.0, abs=1e-12)
    assert g.parts[1] == pytest.approx(1.0, abs=1e-12)


def test_segmentize():
    assert T(segmentize(W("LINESTRING(0 0,10 0)"), 4)) == \
        "LINESTRING(0 0,3.333333333333333 0,6.666666666666666 0,10 0)"
    # already short enough: unchanged
    assert T(segmentize(W("LINESTRING(0 0,3 0)"), 4)) == "LINESTRING(0 0,3 0)"
    # length preserved, every edge <= max_len
    g = segmentize(W("LINESTRING(0 0,10 0,10 7)"), 2.5)
    assert length(g) == pytest.approx(17.0)
    cs = g.parts
    assert all(math.dist(a, b) <= 2.5 + 1e-12 for a, b in zip(cs, cs[1:]))
    with pytest.raises(ValueError):
        segmentize(W("LINESTRING(0 0,1 0)"), 0.0)


def test_line_substring():
    L = "LINESTRING(0 0,10 0,10 10)"
    assert T(line_substring(W(L), 0.25, 0.75)) == "LINESTRING(5 0,10 0,10 5)"
    assert T(line_substring(W(L), 0.0, 1.0)) == L
    assert T(line_substring(W(L), 0.5, 0.5)) == "POINT(10 0)"
    assert line_substring(W("POINT(1 1)"), 0.2, 0.8) is None
    assert length(line_substring(W(L), 0.1, 0.9)) == pytest.approx(16.0)
    with pytest.raises(ValueError):
        line_substring(W(L), 0.8, 0.2)


def test_reduce_precision():
    assert T(reduce_precision(W("POINT(1.26 -3.74)"), 0.5)) == \
        "POINT(1.5 -3.5)"
    # binary-value convention: 2.05/0.1 is 20.4999…96 in IEEE, so it
    # snaps DOWN — consistent with round6_binary, not decimal intuition
    assert T(reduce_precision(W("LINESTRING(0.04 0.05,1.96 2.05)"), 0.1)) == \
        "LINESTRING(0 0.1,2 2)"
    with pytest.raises(ValueError):
        reduce_precision(W("POINT(1 1)"), 0.0)


def test_symdifference_golden():
    A = W("POLYGON((0 0,2 0,2 2,0 2,0 0))")
    B = W("POLYGON((1 1,3 1,3 3,1 3,1 1))")
    sd = symdifference(A, B)
    assert area(sd) == pytest.approx(6.0)
    assert sd.typ == "MultiPolygon" and len(sd.parts) == 2
    C = W("POLYGON((0.5 0.5,1.5 0.5,1.5 1.5,0.5 1.5,0.5 0.5))")
    assert T(symdifference(A, C)) == T(difference(A, C))  # contained
    assert T(symdifference(W("MULTIPOINT(0 0,1 1)"),
                           W("MULTIPOINT(1 1,2 2)"))) == "MULTIPOINT(0 0,2 2)"
    assert T(symdifference(W("LINESTRING(0 0,10 0)"),
                           W("LINESTRING(4 0,12 0)"))) == \
        "MULTILINESTRING((0 0,4 0),(10 0,12 0))"


boxes = st.tuples(st.integers(-15, 15), st.integers(-15, 15),
                  st.integers(1, 12), st.integers(1, 12))


def _box(x0, y0, w, h):
    return W(f"POLYGON(({x0} {y0},{x0 + w} {y0},{x0 + w} {y0 + h},"
             f"{x0} {y0 + h},{x0} {y0}))")


@settings(max_examples=100, deadline=None)
@given(boxes, boxes)
def test_symdifference_area_identity(ba, bb):
    a, b = _box(*ba), _box(*bb)
    sd = area(symdifference(a, b))
    ai = area(intersection(a, b))
    assert sd == pytest.approx(area(a) + area(b) - 2 * ai, abs=1e-6)
    assert sd == pytest.approx(area(symdifference(b, a)), abs=1e-6)
    # one-pass overlay equals the composed form
    assert sd == pytest.approx(
        area(union(difference(a, b), difference(b, a))), abs=1e-6)


def test_spark_sql_surface(spark):
    from datafusion_geo_spark.functions import register_all
    register_all(spark)
    r = spark.sql("""
        SELECT ST_AsText(ST_Reverse(ST_GeomFromText('LINESTRING(0 0,2 5)')))
                 AS rev,
               ST_AsText(ST_Scale(ST_GeomFromText('POINT(2 3)'), 2.0, 3.0))
                 AS sc,
               ST_AsText(ST_LineSubstring(
                 ST_GeomFromText('LINESTRING(0 0,10 0,10 10)'), 0.25, 0.75))
                 AS sub,
               ST_AsText(ST_SymDifference(
                 ST_GeomFromText('POLYGON((0 0,2 0,2 2,0 2,0 0))'),
                 ST_GeomFromText('POLYGON((1 1,3 1,3 3,1 3,1 1))'))) AS sd
    """).collect()[0]
    assert r["rev"] == "LINESTRING(2 5,0 0)"
    assert r["sc"] == "POINT(4 9)"
    assert r["sub"] == "LINESTRING(5 0,10 0,10 5)"
    assert r["sd"].startswith("MULTIPOLYGON")


class TestLineMerge:
    def _m(self, wkt):
        from datafusion_geo_spark.geo.edit import line_merge
        from datafusion_geo_spark.geo.wkt import from_wkt, to_wkt
        return to_wkt(line_merge(from_wkt(wkt)))

    def test_goldens(self):
        cases = {
            # simple chain
            "MULTILINESTRING((0 0,1 1),(1 1,2 2))": "LINESTRING(0 0,1 1,2 2)",
            # middle piece listed first; start is the input-order
            # junction-free endpoint
            "MULTILINESTRING((1 1,2 2),(0 0,1 1),(2 2,3 2))":
                "LINESTRING(0 0,1 1,2 2,3 2)",
            # reversal required to sew
            "MULTILINESTRING((0 0,1 0),(2 0,1 0),(2 0,3 0))":
                "LINESTRING(0 0,1 0,2 0,3 0)",
            # degree-3 junction: nothing merges
            "MULTILINESTRING((0 0,1 0),(1 0,2 0),(1 0,1 1))":
                "MULTILINESTRING((0 0,1 0),(1 0,2 0),(1 0,1 1))",
            # pure cycle closes into one ring-shaped linestring
            "MULTILINESTRING((0 0,1 0),(1 0,1 1),(1 1,0 1),(0 1,0 0))":
                "LINESTRING(0 0,1 0,1 1,0 1,0 0)",
            # two disjoint chains
            "MULTILINESTRING((0 0,1 0),(1 0,2 0),(10 0,11 0),(11 0,12 0))":
                "MULTILINESTRING((0 0,1 0,2 0),(10 0,11 0,12 0))",
            # single member unwraps
            "MULTILINESTRING((0 0,1 1))": "LINESTRING(0 0,1 1)",
            # non-lineal input: empty collection (PostGIS)
            "POINT(1 2)": "GEOMETRYCOLLECTION EMPTY",
            "POLYGON((0 0,1 0,1 1,0 1,0 0))": "GEOMETRYCOLLECTION EMPTY",
        }
        for src, want in cases.items():
            assert self._m(src) == want, src

    def test_length_preserved_and_no_internal_deg2(self):
        from datafusion_geo_spark.geo.algos import length as glen
        from datafusion_geo_spark.geo.edit import line_merge
        from datafusion_geo_spark.geo.wkt import from_wkt
        import itertools, random
        rng = random.Random(4)
        # random path shuffled + randomly reversed: must always re-sew
        # into a single linestring of identical length
        pts = [(i, rng.randint(-3, 3)) for i in range(12)]
        segs = [[a, b] for a, b in zip(pts, pts[1:])]
        for _ in range(25):
            rng.shuffle(segs)
            parts = [list(reversed(s)) if rng.random() < 0.5 else list(s)
                     for s in segs]
            from datafusion_geo_spark.geo.geom import Geometry
            g = Geometry("MultiLineString", parts)
            m = line_merge(g)
            assert m.typ == "LineString"
            assert abs(glen(m) - glen(g)) < 1e-9
