"""Generalized ST_Split: any polygon (concave, holed, multi) by any
polyline blade, via planar-arrangement face tracing (geo/algos.py).

PostGIS semantics — blade SEGMENTS cut (not the infinite line through
the endpoints), a dead-ending blade splits nothing — deliberately NOT
the reference's author-flagged-broken kernel
(/root/reference/src/function/split.rs:148).
"""

import random

import pytest

from datafusion_geo_spark.geo import algos
from datafusion_geo_spark.geo.wkt import from_wkt as P, to_wkt


def wkt_split(g, blade):
    return to_wkt(algos.split(P(g), P(blade)))


def areas(g, blade):
    r = algos.split(P(g), P(blade))
    return [algos.area(p) for p in r.parts]


def test_convex_square_vertical():
    assert wkt_split("POLYGON((0 0,10 0,10 10,0 10,0 0))",
                     "LINESTRING(5 -1,5 11)") == \
        ("GEOMETRYCOLLECTION(POLYGON((0 0,5 0,5 10,0 10,0 0)),"
         "POLYGON((5 0,10 0,10 10,5 10,5 0)))")


def test_concave_u_three_pieces():
    got = areas("POLYGON((0 0,9 0,9 6,6 6,6 2,3 2,3 6,0 6,0 0))",
                "LINESTRING(-1 4,10 4)")
    assert sorted(got) == [6.0, 6.0, 30.0]
    assert sum(got) == pytest.approx(42.0)


def test_holed_polygon_blade_misses_hole():
    got = wkt_split(
        "POLYGON((0 0,20 0,20 20,0 20,0 0),(6 6,6 14,14 14,14 6,6 6))",
        "LINESTRING(3 -1,3 21)")
    # hole stays intact inside the right piece
    assert got == ("GEOMETRYCOLLECTION(POLYGON((0 0,3 0,3 20,0 20,0 0)),"
                   "POLYGON((3 0,20 0,20 20,3 20,3 0),"
                   "(6 6,6 14,14 14,14 6,6 6)))")


def test_holed_polygon_blade_through_hole():
    got = areas("POLYGON((0 0,20 0,20 20,0 20,0 0),(6 6,6 14,14 14,14 6,6 6))",
                "LINESTRING(10 -1,10 21)")
    assert len(got) == 2
    assert sum(got) == pytest.approx(336.0)
    assert got[0] == pytest.approx(168.0)


def test_bent_multisegment_blade():
    got = areas("POLYGON((0 0,10 0,10 10,0 10,0 0))",
                "LINESTRING(-1 3,5 3,5 11)")
    assert sorted(got) == [35.0, 65.0]


def test_partial_blade_no_split():
    # blade dead-ends inside: PostGIS returns the input uncut
    got = wkt_split("POLYGON((0 0,10 0,10 10,0 10,0 0))",
                    "LINESTRING(5 -1,5 5)")
    assert got == "GEOMETRYCOLLECTION(POLYGON((0 0,10 0,10 10,0 10,0 0)))"


def test_blade_segments_not_infinite_line():
    # a short blade nowhere near the polygon must not split it (the old
    # convex implementation extended the infinite line through a,b)
    got = wkt_split("POLYGON((0 0,10 0,10 10,0 10,0 0))",
                    "LINESTRING(5 20,5 30)")
    assert got == "GEOMETRYCOLLECTION(POLYGON((0 0,10 0,10 10,0 10,0 0)))"


def test_closed_blade_ring_island():
    got = wkt_split("POLYGON((0 0,10 0,10 10,0 10,0 0))",
                    "LINESTRING(3 3,7 3,7 7,3 7,3 3)")
    assert got == ("GEOMETRYCOLLECTION("
                   "POLYGON((0 0,10 0,10 10,0 10,0 0),"
                   "(3 3,3 7,7 7,7 3,3 3)),"
                   "POLYGON((3 3,7 3,7 7,3 7,3 3)))")


def test_diagonal_blade():
    got = areas("POLYGON((0 0,10 0,10 10,0 10,0 0))",
                "LINESTRING(-1 -1,11 11)")
    assert sorted(got) == [50.0, 50.0]


def test_multipolygon_input():
    g = ("MULTIPOLYGON(((0 0,4 0,4 4,0 4,0 0)),((10 0,14 0,14 4,10 4,10 0)))")
    got = areas(g, "LINESTRING(2 -1,2 5)")
    # first part splits 8+8, second part untouched (16)
    assert sorted(got) == [8.0, 8.0, 16.0]


def test_multilinestring_blade():
    got = areas("POLYGON((0 0,10 0,10 10,0 10,0 0))",
                "MULTILINESTRING((3 -1,3 11),(7 -1,7 11))")
    assert sorted(got) == [30.0, 30.0, 40.0]


def test_blade_riding_boundary_no_split():
    got = wkt_split("POLYGON((0 0,10 0,10 10,0 10,0 0))",
                    "LINESTRING(0 -1,0 11)")
    assert got == "GEOMETRYCOLLECTION(POLYGON((0 0,10 0,10 10,0 10,0 0)))"


def test_line_by_point_regression():
    assert wkt_split("LINESTRING(0 0,10 10)", "POINT(5 5)") == \
        "GEOMETRYCOLLECTION(LINESTRING(0 0,5 5),LINESTRING(5 5,10 10))"


def test_radial_cut_into_hole_merges_ring():
    """Blade from outside, ending INSIDE the hole: the annulus is cut
    open into one C-shaped face — the hole merges into the outer
    boundary, area is conserved, and no hole ring remains."""
    donut = "POLYGON((0 0,20 0,20 20,0 20,0 0),(6 6,6 14,14 14,14 6,6 6))"
    r = algos.split(P(donut), P("LINESTRING(-1 10,10 10)"))
    got = [algos.area(p) for p in r.parts]
    assert got == [336.0]
    # single outer ring only: the hole is now part of the boundary walk
    assert len(r.parts[0].parts) == 1


def test_blade_entirely_inside_hole_no_split():
    """A blade living in the hole's interior never touches the polygon's
    interior — no split, hole preserved as a hole."""
    donut = "POLYGON((0 0,20 0,20 20,0 20,0 0),(6 6,6 14,14 14,14 6,6 6))"
    r = algos.split(P(donut), P("LINESTRING(7 10,13 10)"))
    assert [algos.area(p) for p in r.parts] == [336.0]
    assert len(r.parts[0].parts) == 2  # shell + intact hole


def test_multipolygon_corner_touching_parts():
    """Parts touching at a single corner split independently; the
    touching point must not weld them into one face."""
    mp = "MULTIPOLYGON(((0 0,4 0,4 4,0 4,0 0)),((4 4,8 4,8 8,4 8,4 4)))"
    got = areas(mp, "LINESTRING(2 -1,2 9)")
    assert sorted(got) == [8.0, 8.0, 16.0]


def test_blade_collinear_with_edge_then_crossing():
    """Blade riding along part of the bottom edge (collinear overlap)
    before turning through the interior: the collinear stretch cuts
    nothing, the interior stretch splits normally."""
    got = areas("POLYGON((0 0,10 0,10 10,0 10,0 0))",
                "LINESTRING(-1 0,5 0,5 11)")
    assert sorted(got) == [50.0, 50.0]


def test_blade_collinear_with_full_edge_no_split():
    got = wkt_split("POLYGON((0 0,10 0,10 10,0 10,0 0))",
                    "LINESTRING(-1 10,11 10)")
    assert got == "GEOMETRYCOLLECTION(POLYGON((0 0,10 0,10 10,0 10,0 0)))"


def test_area_conservation_random():
    """Splitting never creates or destroys area."""
    rng = random.Random(5)
    poly = "POLYGON((0 0,12 0,12 6,10 6,10 2,7 2,7 6,5 6,5 2,2 2,2 6,0 6,0 0))"
    g = P(poly)
    base = algos.area(g)
    for _ in range(25):
        x = rng.uniform(0.5, 11.5)
        y0, y1 = -1.0, 7.0
        r = algos.split(g, P(f"LINESTRING({x} {y0},{x} {y1})"))
        total = sum(algos.area(p) for p in r.parts)
        assert total == pytest.approx(base, abs=1e-9), x


# ------------------------------------------------- polygonal blades (round 4)

def test_line_split_by_polygon_boundary():
    """PostGIS: splitting a line by a polygon cuts at the BOUNDARY
    crossings (the polygon interior plays no role)."""
    assert wkt_split("LINESTRING(-2 5,12 5)",
                     "POLYGON((0 0,10 0,10 10,0 10,0 0))") == \
        ("GEOMETRYCOLLECTION(LINESTRING(-2 5,0 5),LINESTRING(0 5,10 5),"
         "LINESTRING(10 5,12 5))")


def test_line_split_by_holed_polygon_all_rings_cut():
    """Both the shell and the hole ring cut the line."""
    got = wkt_split(
        "LINESTRING(-2 10,22 10)",
        "POLYGON((0 0,20 0,20 20,0 20,0 0),(6 6,6 14,14 14,14 6,6 6))")
    assert got == ("GEOMETRYCOLLECTION(LINESTRING(-2 10,0 10),"
                   "LINESTRING(0 10,6 10),LINESTRING(6 10,14 10),"
                   "LINESTRING(14 10,20 10),LINESTRING(20 10,22 10))")


def test_polygon_split_by_polygon_boundary():
    """Polygon ÷ polygon follows the boundary convention: equivalent to
    splitting by the blade's rings."""
    assert wkt_split("POLYGON((0 0,10 0,10 10,0 10,0 0))",
                     "POLYGON((5 -1,15 -1,15 11,5 11,5 -1))") == \
        ("GEOMETRYCOLLECTION(POLYGON((0 0,5 0,5 10,0 10,0 0)),"
         "POLYGON((5 0,10 0,10 10,5 10,5 0)))")


def test_polygon_split_by_multipolygon_blade():
    got = areas("POLYGON((0 0,10 0,10 10,0 10,0 0))",
                "MULTIPOLYGON(((2 -1,4 -1,4 11,2 11,2 -1)),"
                "((6 -1,8 -1,8 11,6 11,6 -1)))")
    assert sorted(got) == [20.0, 20.0, 20.0, 20.0, 20.0]


def test_line_split_by_disjoint_polygon_no_split():
    assert wkt_split("LINESTRING(0 0,1 1)",
                     "POLYGON((5 5,6 5,6 6,5 6,5 5))") == \
        "GEOMETRYCOLLECTION(LINESTRING(0 0,1 1))"


def test_polygon_split_by_contained_blade_polygon_cuts_hole():
    """A blade polygon strictly inside the target: its ring is a closed
    loop inside the face, which carves an island — piece count 2 and
    area conserved."""
    got = areas("POLYGON((0 0,10 0,10 10,0 10,0 0))",
                "POLYGON((3 3,7 3,7 7,3 7,3 3))")
    assert sorted(got) == [16.0, 84.0]


# ---- property: area conservation over random polygons × random blades


def test_split_area_conservation_property():
    """For ANY polygon (convex, concave, holed) split by ANY polyline,
    the pieces' areas must sum to the original's — the invariant that
    catches face-tracing errors no golden case pins."""
    from hypothesis import given, settings, strategies as st

    from datafusion_geo_spark.geo import algos
    from datafusion_geo_spark.geo.wkt import from_wkt

    coord = st.integers(-8, 18)  # integer grid: exact arithmetic

    @st.composite
    def polys(draw):
        kind = draw(st.integers(0, 2))
        x, y = draw(coord), draw(coord)
        if kind == 0:    # box
            return f"POLYGON(({x} {y},{x+10} {y},{x+10} {y+8},{x} {y+8},{x} {y}))"
        if kind == 1:    # concave U
            return (f"POLYGON(({x} {y},{x+9} {y},{x+9} {y+6},{x+6} {y+6},"
                    f"{x+6} {y+2},{x+3} {y+2},{x+3} {y+6},{x} {y+6},{x} {y}))")
        return (f"POLYGON(({x} {y},{x+12} {y},{x+12} {y+12},{x} {y+12},{x} {y}),"
                f"({x+4} {y+4},{x+4} {y+8},{x+8} {y+8},{x+8} {y+4},{x+4} {y+4}))")

    @st.composite
    def blades(draw):
        pts = [(draw(coord), draw(coord)) for _ in range(draw(st.integers(2, 4)))]
        if len({p for p in pts}) < 2:
            pts.append((pts[0][0] + 30, pts[0][1] + 1))
        return "LINESTRING(" + ",".join(f"{a} {b}" for a, b in pts) + ")"

    @given(polys(), blades())
    @settings(max_examples=120, deadline=None)
    def conserve(pw, bw):
        g = from_wkt(pw)
        total = algos.area(g)
        pieces = algos.split(g, from_wkt(bw))
        got = sum(algos.area(p) for p in pieces.parts)
        assert abs(got - total) < 1e-6, (pw, bw)

    conserve()
