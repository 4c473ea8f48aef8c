"""Validity predicates (ST_IsClosed/IsRing/IsSimple/IsValid[Reason]),
ST_PointOnSurface, and the discrete Hausdorff / Fréchet distances."""

import pytest

from datafusion_geo_spark.geo import metrics as M
from datafusion_geo_spark.geo import validity as V
from datafusion_geo_spark.geo.algos import covers, intersects
from datafusion_geo_spark.geo.wkt import from_wkt, to_wkt

W = from_wkt


class TestClosedRingSimple:
    def test_closed(self):
        assert V.is_closed(W("LINESTRING(0 0,1 0,1 1,0 0)")) is True
        assert V.is_closed(W("LINESTRING(0 0,1 1)")) is False
        assert V.is_closed(
            W("MULTILINESTRING((0 0,1 0,0 0),(2 2,3 3,2 2))")) is True
        assert V.is_closed(
            W("MULTILINESTRING((0 0,1 0,0 0),(2 2,3 3))")) is False
        assert V.is_closed(W("POINT(1 1)")) is True

    def test_simple(self):
        assert V.is_simple(W("LINESTRING(0 0,10 0,5 5,5 -5)")) is False
        assert V.is_simple(W("LINESTRING(0 0,1 0,1 1,0 1,0 0)")) is True
        assert V.is_simple(W("LINESTRING(0 0,1 0,1 1,0 0,0 -1)")) is False
        assert V.is_simple(W("MULTIPOINT(1 1,2 2)")) is True
        assert V.is_simple(W("MULTIPOINT(1 1,1 1)")) is False
        # members touching at interior points -> not simple
        assert V.is_simple(
            W("MULTILINESTRING((0 0,10 0),(5 -1,5 1))")) is False
        # members sharing only endpoints -> simple
        assert V.is_simple(
            W("MULTILINESTRING((0 0,10 0),(10 0,12 5))")) is True
        assert V.is_simple(W("POLYGON((0 0,10 0,0 10,10 10,0 0))")) is True

    def test_ring(self):
        assert V.is_ring(W("LINESTRING(0 0,1 0,1 1,0 1,0 0)")) is True
        assert V.is_ring(W("LINESTRING(0 0,1 1)")) is False
        # closed but self-crossing (figure 8) -> not a ring
        assert V.is_ring(
            W("LINESTRING(0 0,2 2,0 2,2 0,0 0)")) is False
        assert V.is_ring(W("POLYGON((0 0,1 0,1 1,0 0))")) is None


class TestValidity:
    def test_valid_cases(self):
        assert V.is_valid(W("POLYGON((0 0,10 0,10 10,0 10,0 0))"))
        assert V.is_valid(W(
            "POLYGON((0 0,10 0,10 10,0 10,0 0),(2 2,8 2,8 8,2 8,2 2))"))
        # self-crossing LINE is valid (just not simple)
        assert V.is_valid(W("LINESTRING(0 0,10 0,5 5,5 -5)"))
        assert V.is_valid(W("POINT(1 1)"))
        # hole touching shell at ONE point stays valid
        assert V.is_valid(W(
            "POLYGON((0 0,10 0,10 10,0 10,0 0),(0 0,4 2,2 4,0 0))"))

    def test_invalid_cases(self):
        assert V.is_valid_reason(
            W("POLYGON((0 0,10 0,0 10,10 10,0 0))")).startswith(
            "Ring Self-intersection")
        assert V.is_valid_reason(W(
            "POLYGON((0 0,10 0,10 10,0 10,0 0),(20 20,21 20,21 21,20 20))"
        )).startswith("Hole lies outside shell")
        assert V.is_valid_reason(W(
            "POLYGON((0 0,10 0,10 10,0 10,0 0),"
            "(2 2,8 2,8 8,2 8,2 2),(3 3,4 3,4 4,3 4,3 3))"
        )).startswith("Holes are nested")
        assert V.is_valid_reason(
            W("POLYGON((0 0,1 0,0 0))")).startswith("Too few points")
        # hole crossing the shell
        assert V.is_valid_reason(W(
            "POLYGON((0 0,10 0,10 10,0 10,0 0),(5 5,15 5,15 6,5 6,5 5))"
        )).startswith("Self-intersection")
        # overlapping multipolygon members
        assert V.is_valid_reason(W(
            "MULTIPOLYGON(((0 0,4 0,4 4,0 4,0 0)),((2 2,6 2,6 6,2 6,2 2)))"
        )).startswith("Self-intersection")
        assert V.is_valid_reason(W(
            "MULTIPOLYGON(((0 0,10 0,10 10,0 10,0 0)),((2 2,4 2,4 4,2 4,2 2)))"
        )).startswith("Nested shells")


class TestPointOnSurface:
    @pytest.mark.parametrize("wkt", [
        "POLYGON((0 0,10 0,10 10,0 10,0 0))",
        "POLYGON((0 0,10 0,10 10,0 10,0 0),(2 2,8 2,8 8,2 8,2 2))",
        # concave C-shape whose centroid is outside
        "POLYGON((0 0,10 0,10 2,2 2,2 8,10 8,10 10,0 10,0 0))",
        "LINESTRING(0 0,5 5,10 0)",
        "MULTIPOINT(0 0,10 0,5 1)",
    ])
    def test_point_is_on_geometry(self, wkt):
        g = W(wkt)
        p = M.point_on_surface(g)
        assert p.typ == "Point" and p.parts is not None
        if g.typ.endswith("Polygon"):
            assert covers(g, p)
        else:
            assert intersects(g, p)

    def test_known_values(self):
        assert to_wkt(M.point_on_surface(
            W("POLYGON((0 0,10 0,10 10,0 10,0 0))"))) == "POINT(5 5)"
        # holed square: widest scanline interval is left of the hole
        assert to_wkt(M.point_on_surface(W(
            "POLYGON((0 0,10 0,10 10,0 10,0 0),(2 2,8 2,8 8,2 8,2 2))"
        ))) == "POINT(1 5)"
        # interior vertex nearest the centroid for lines
        assert to_wkt(M.point_on_surface(
            W("LINESTRING(0 0,5 5,10 0)"))) == "POINT(5 5)"

    def test_empty(self):
        assert to_wkt(M.point_on_surface(W("POINT EMPTY"))) == "POINT EMPTY"


class TestDiscreteDistances:
    def test_hausdorff(self):
        a, b = W("LINESTRING(0 0,10 0)"), W("LINESTRING(0 1,10 1)")
        assert M.hausdorff_distance(a, b) == pytest.approx(1.0)
        # direction-insensitive
        assert M.hausdorff_distance(
            a, W("LINESTRING(10 0,0 0)")) == pytest.approx(0.0)
        assert M.hausdorff_distance(
            W("POINT(0 0)"), W("LINESTRING(2 0,4 0)")) == pytest.approx(4.0)
        assert M.hausdorff_distance(a, W("LINESTRING EMPTY")) is None

    def test_frechet(self):
        a = W("LINESTRING(0 0,10 0)")
        assert M.frechet_distance(
            a, W("LINESTRING(0 1,10 1)")) == pytest.approx(1.0)
        # reversed direction forces the leash across the whole span
        assert M.frechet_distance(
            a, W("LINESTRING(10 0,0 0)")) == pytest.approx(10.0)
        # frechet >= hausdorff always
        for bw in ("LINESTRING(0 2,5 3,10 2)", "LINESTRING(1 1,9 -1)"):
            b = W(bw)
            assert M.frechet_distance(a, b) >= \
                M.hausdorff_distance(a, b) - 1e-12


def test_sql_surface(spark):
    from datafusion_geo_spark.functions import register_all
    register_all(spark)
    row = spark.sql("""
      SELECT st_isvalid(st_geomfromtext(
               'POLYGON((0 0,10 0,0 10,10 10,0 0))')) AS v,
             st_isvalidreason(st_geomfromtext(
               'POLYGON((0 0,1 0,1 1,0 1,0 0))')) AS r,
             st_issimple(st_geomfromtext(
               'LINESTRING(0 0,10 0,5 5,5 -5)')) AS s,
             st_isring(st_geomfromtext(
               'LINESTRING(0 0,1 0,1 1,0 1,0 0)')) AS rg,
             st_astext(st_pointonsurface(st_geomfromtext(
               'POLYGON((0 0,2 0,2 2,0 2,0 0))'))) AS pos,
             st_hausdorffdistance(
               st_geomfromtext('LINESTRING(0 0,10 0)'),
               st_geomfromtext('LINESTRING(0 1,10 1)')) AS hd,
             st_frechetdistance(
               st_geomfromtext('LINESTRING(0 0,10 0)'),
               st_geomfromtext('LINESTRING(10 0,0 0)')) AS fd
    """).collect()[0]
    assert row["v"] is False
    assert row["r"] == "Valid Geometry"
    assert row["s"] is False
    assert row["rg"] is True
    assert row["pos"] == "POINT(1 1)"
    assert row["hd"] == pytest.approx(1.0)
    assert row["fd"] == pytest.approx(10.0)


def test_ring_collinear_overlap_is_invalid():
    """Rings sharing a SEGMENT (not just a point) are invalid — GEOS
    Self-intersection. The point-touch variants stay valid."""
    from datafusion_geo_spark.geo.validity import is_valid, is_valid_reason
    from datafusion_geo_spark.geo.wkt import from_wkt
    # hole edge lies ON the shell edge
    g = from_wkt("POLYGON((0 0,4 0,4 4,0 4,0 0),"
                 "(3 3,4 3,4 4,3 4,3 3))")
    assert not is_valid(g)
    assert is_valid_reason(g).startswith("Self-intersection")
    # two holes sharing an edge
    g2 = from_wkt("POLYGON((0 0,6 0,6 6,0 6,0 0),"
                  "(1 1,2 1,2 2,1 2,1 1),(2 1,3 1,3 2,2 2,2 1))")
    assert not is_valid(g2)
    # member shells glued along a border
    g3 = from_wkt("MULTIPOLYGON(((0 0,2 0,2 2,0 2,0 0)),"
                  "((2 0,4 0,4 2,2 2,2 0)))")
    assert not is_valid(g3)
    # hole touching the shell at ONE POINT only: still valid
    ok = from_wkt("POLYGON((0 0,4 0,4 4,0 4,0 0),"
                  "(2 2,4 2,2 3,2 2))")
    # ring touches shell at the single point (4 2)
    assert is_valid(ok)


def test_interior_disconnected_hole_chain():
    """The connected-interior rule (GEOS ConnectedInteriorTester,
    specialized to point-touches): a hole chain spanning shell to
    shell pinches the interior; sub-cycle configurations stay valid."""
    shell = "(0 0,10 0,10 10,0 10,0 0)"
    # chain: h1 touches left shell, h2 touches h1 and the right shell
    pinched = W(f"POLYGON({shell},(0 5,5 4,5 6,0 5),"
                f"(5 5,10 5,7 6,5 5))")
    assert V.is_valid_reason(pinched).startswith(
        "Interior is disconnected")
    assert not V.is_valid(pinched)
    # same chain, h2 stops short of the shell: tree, interior connected
    open_chain = W(f"POLYGON({shell},(0 5,5 4,5 6,0 5),"
                   f"(5 5,9 5,7 6,5 5))")
    assert V.is_valid(open_chain)


def test_interior_disconnected_lens_double_touch():
    """ONE hole touching the shell at TWO distinct points splits the
    disk into two lunes meeting only at points — disconnected; a
    single-touch hole stays valid."""
    shell = "(0 0,10 0,10 10,0 10,0 0)"
    lens = W(f"POLYGON({shell},(0 5,5 4,10 5,5 6,0 5))")
    assert V.is_valid_reason(lens).startswith("Interior is disconnected")
    single = W(f"POLYGON({shell},(5 0,7 2,3 2,5 0))")
    assert V.is_valid(single)


def test_interior_connected_star_touches_stay_valid():
    """Three or more rings meeting at ONE coincident point form a STAR
    in the bipartite ring/touch-point graph — a tree, so the interior
    stays connected (GEOS/JTS treat these as valid). The r8 ADVICE
    counterexamples: the pre-fix pair-edge formulation reported both
    as 'Interior is disconnected'."""
    shell = "(0 0,10 0,10 10,0 10,0 0)"
    # three holes sharing vertex (5,5), otherwise disjoint
    three_holes = W(f"POLYGON({shell},(5 5,3 4,3 3,5 5),"
                    f"(5 5,7 4,7 3,5 5),(5 5,6 7,4 7,5 5))")
    assert V.is_valid_reason(three_holes) == "Valid Geometry"
    # two holes plus the shell all touching at (5,0)
    two_plus_shell = W(f"POLYGON({shell},(5 0,3 2,2 1,5 0),"
                       f"(5 0,8 1,7 2,5 0))")
    assert V.is_valid_reason(two_plus_shell) == "Valid Geometry"
    # control: two dart holes meeting at TWO isolated points (5,1) and
    # (5,5) enclose a pocket of interior between them — a genuine
    # cycle through both point nodes, still reported as disconnected
    pinched = W(f"POLYGON({shell},(5 1,3 3,5 5,4 3,5 1),"
                f"(5 1,6 3,5 5,7 3,5 1))")
    assert V.is_valid_reason(pinched).startswith(
        "Interior is disconnected")


def test_interior_connected_hole_pair_off_shell():
    """Two holes touching each other once but never the shell form a
    tree in the touch graph — the interior wraps around and stays
    connected."""
    g = W("POLYGON((0 0,10 0,10 10,0 10,0 0),"
          "(2 5,4 4,4 6,2 5),(4 5,6 4,6 6,4 5))")
    assert V.is_valid(g)
    # and the reason ordering is stable: shared-segment contact is
    # still reported as Self-intersection, not as disconnection
    glued = W("POLYGON((0 0,10 0,10 10,0 10,0 0),"
              "(0 5,5 4,5 6,0 5),(5 5,10 4,10 6,5 5))")
    assert V.is_valid_reason(glued).startswith("Self-intersection")
