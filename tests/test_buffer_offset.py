"""ST_Buffer over lines and polygons (geo/offset.py).

The reference buffers any geometry via GEOS
(/root/reference/src/function/buffer.rs:86-104); round 1 covered
Point/MultiPoint only. These tests pin the offset-curve implementation:
closed-form areas where they exist (capsule, Steiner formula for convex
polygons), point-sampling distance checks everywhere else (a point at
distance < w-tol from the input must be inside the buffer, > w+tol
outside — tol covers arc-discretization sag at quadsegs=8).
"""

import math
import random

import pytest

from datafusion_geo_spark.geo import algos
from datafusion_geo_spark.geo.geom import Geometry

Q = 8
# inscribed-arc area of all round joins/caps combined (full circle):
# 4*quadsegs triangles of 0.5*w^2*sin(pi/(2*quadsegs))
CIRCLE_POLY = lambda w: 2 * Q * w * w * math.sin(math.pi / (2 * Q))  # noqa: E731


def dist_to_rings(p, rings):
    best = float("inf")
    for cs in rings:
        for i in range(len(cs) - 1):
            ax, ay = cs[i]
            bx, by = cs[i + 1]
            ux, uy = bx - ax, by - ay
            ln = ux * ux + uy * uy
            t = max(0.0, min(1.0, ((p[0] - ax) * ux + (p[1] - ay) * uy) / ln)) \
                if ln > 0 else 0.0
            best = min(best, math.hypot(p[0] - (ax + t * ux), p[1] - (ay + t * uy)))
    return best


def sample_check(buf, w, region, boundary_rings, interior_fn=None,
                 n=2500, tol=0.08):
    """No point misclassified: inside input or within w-tol ⇒ in buffer;
    outside input and beyond w+eps ⇒ not in buffer."""
    rng = random.Random(7)
    interior_fn = interior_fn or (lambda p: False)
    for _ in range(n):
        p = (rng.uniform(*region[0]), rng.uniform(*region[1]))
        d = dist_to_rings(p, boundary_rings)
        ins = interior_fn(p)
        got = any(algos.point_in_polygon(p, poly.parts) >= 0
                  for poly in buf.geometries())
        assert not ((ins or d < w - tol) and not got), (p, d, ins)
        assert not ((not ins and d > w + 0.002) and got), (p, d)


def test_segment_capsule_exact():
    w = 2.0
    buf = algos.buffer(Geometry.linestring([(0, 0), (10, 0)]), w, Q)
    assert buf.typ == "Polygon" and len(buf.parts) == 1
    assert algos.area(buf) == pytest.approx(2 * w * 10 + CIRCLE_POLY(w), abs=1e-9)
    assert buf.bounds() == (-2.0, -2.0, 12.0, 2.0)
    sample_check(buf, w, ((-5, 15), (-5, 5)), [[(0, 0), (10, 0)]])


def test_collinear_fixture_line_capsule():
    # the lines_orders shape: 3 collinear points at 45 deg
    w = 2.0
    buf = algos.buffer(Geometry.linestring([(3, 4), (5, 6), (7, 8)]), w, Q)
    L = 4 * math.sqrt(2)
    assert algos.area(buf) == pytest.approx(2 * w * L + CIRCLE_POLY(w), abs=1e-9)
    assert buf.bounds() == (1.0, 2.0, 9.0, 10.0)  # exact: caps hit the axes
    assert len(buf.parts[0]) == 37  # deterministic layout, oracle-pinned


def test_right_angle_line():
    w = 2.0
    line = [(0, 0), (10, 0), (10, 10)]
    buf = algos.buffer(Geometry.linestring(line), w, Q)
    assert buf.typ == "Polygon"
    sample_check(buf, w, ((-5, 15), (-5, 15)), [line])


def test_square_polygon_steiner():
    w = 2.0
    sq = Geometry.polygon([[(0, 0), (10, 0), (10, 10), (0, 10)]])
    buf = algos.buffer(sq, w, Q)
    assert algos.area(buf) == pytest.approx(100 + 40 * w + CIRCLE_POLY(w), abs=1e-9)


def test_concave_polygon():
    ring = [(0, 0), (10, 0), (10, 4), (4, 4), (4, 10), (0, 10)]
    g = Geometry.polygon([ring])
    buf = algos.buffer(g, 1.0, Q)
    closed = ring + [ring[0]]
    sample_check(buf, 1.0, ((-3, 13), (-3, 13)), [closed],
                 lambda p: algos.point_in_polygon(p, [closed]) >= 0)


def test_polygon_hole_shrinks():
    shell = [(0, 0), (20, 0), (20, 20), (0, 20)]
    hole = [(6, 6), (6, 14), (14, 14), (14, 6)]
    g = Geometry.polygon([shell, hole])
    buf = algos.buffer(g, 1.0, Q)
    assert buf.typ == "Polygon" and len(buf.parts) == 2  # hole survives, shrunk
    sample_check(buf, 1.0, ((-3, 23), (-3, 23)),
                 [shell + [shell[0]], hole + [hole[0]]],
                 lambda p: algos.point_in_polygon(p, g.parts) >= 0)


def test_small_hole_erodes_away():
    shell = [(0, 0), (20, 0), (20, 20), (0, 20)]
    hole = [(9, 9), (9, 11), (11, 11), (11, 9)]  # 2x2 hole, w=2 -> gone
    buf = algos.buffer(Geometry.polygon([shell, hole]), 2.0, Q)
    assert len(buf.parts) == 1
    assert algos.area(buf) == pytest.approx(400 + 80 * 2 + CIRCLE_POLY(2.0),
                                            abs=1e-9)


def test_dumbbell_hole_splits():
    shell = [(0, 0), (30, 0), (30, 12), (0, 12)]
    dumb = [(2, 2), (2, 10), (12, 10), (12, 7), (18, 7), (18, 10), (28, 10),
            (28, 2), (18, 2), (18, 5), (12, 5), (12, 2)]
    g = Geometry.polygon([shell, dumb])
    buf = algos.buffer(g, 1.2, Q)  # neck is 2 wide < 2*1.2 -> two holes
    assert buf.typ == "Polygon" and len(buf.parts) == 3
    sample_check(buf, 1.2, ((-3, 33), (-3, 15)),
                 [shell + [shell[0]], dumb + [dumb[0]]],
                 lambda p: algos.point_in_polygon(p, g.parts) >= 0)


def test_width_exceeding_inradius():
    # round-1 style inversion bug: inner offset loop flips when w is
    # larger than the polygon; positive-winding rule must absorb it
    tiny = Geometry.polygon([[(0, 0), (1, 0), (1, 1), (0, 1)]])
    buf = algos.buffer(tiny, 5.0, Q)
    assert algos.area(buf) == pytest.approx(1 + 4 * 5 + CIRCLE_POLY(5.0),
                                            abs=1e-9)


def test_closed_linestring_annulus():
    ring = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
    buf = algos.buffer(Geometry.linestring(ring), 1.0, Q)
    assert buf.typ == "Polygon" and len(buf.parts) == 2
    assert algos.point_in_polygon((5.0, 5.0), buf.parts) < 0  # hole center
    sample_check(buf, 1.0, ((-3, 13), (-3, 13)), [ring])


def test_near_closing_u_creates_hole():
    u = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 1.5)]
    buf = algos.buffer(Geometry.linestring(u), 1.0, Q)
    assert len(buf.parts) == 2  # caps overlap across the 1.5 gap
    assert algos.point_in_polygon((5.0, 5.0), buf.parts) < 0
    sample_check(buf, 1.0, ((-3, 13), (-3, 13)), [u])


def test_open_u_no_hole():
    u = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 2.5)]
    buf = algos.buffer(Geometry.linestring(u), 1.0, Q)  # gap 2.5 > 2w
    assert len(buf.parts) == 1
    sample_check(buf, 1.0, ((-3, 13), (-3, 13)), [u])


def test_self_crossing_path():
    alpha = [(0, 0), (8, 8), (8, 0), (0, 8)]
    buf = algos.buffer(Geometry.linestring(alpha), 0.8, Q)
    assert buf.typ == "Polygon" and len(buf.parts) == 2  # loop -> hole
    sample_check(buf, 0.8, ((-3, 11), (-3, 11)), [alpha])


def test_multilinestring_union():
    m = [[(0, 0), (10, 10)], [(0, 10), (10, 0)]]
    buf = algos.buffer(Geometry("MultiLineString", m), 1.0, Q)
    assert buf.typ == "Polygon"  # crossing lines merge into one blob
    sample_check(buf, 1.0, ((-3, 13), (-3, 13)), m)


def test_disjoint_parts_multipolygon():
    m = [[(0, 0), (3, 0)], [(20, 0), (23, 0)]]
    buf = algos.buffer(Geometry("MultiLineString", m), 1.0, Q)
    assert buf.typ == "MultiPolygon" and len(buf.parts) == 2


def test_collection_buffer():
    gc = Geometry("GeometryCollection",
                  [Geometry.point(0, 0), Geometry.linestring([(5, 0), (8, 0)])])
    buf = algos.buffer(gc, 1.0, 4)
    assert buf.typ == "MultiPolygon" and len(buf.parts) == 2


def test_spike_reversal():
    spike = [(0, 0), (10, 0), (0, 0.5)]
    buf = algos.buffer(Geometry.linestring(spike), 1.0, Q)
    assert buf.typ == "Polygon"
    sample_check(buf, 1.0, ((-3, 13), (-4, 5)), [spike])


def test_srid_carries():
    g = Geometry.linestring([(0, 0), (5, 0)], srid=4326)
    assert algos.buffer(g, 1.0, Q).srid == 4326


def test_random_polylines_property():
    rng = random.Random(42)
    for trial in range(12):
        n = rng.randint(2, 6)
        line = [(rng.uniform(0, 20), rng.uniform(0, 20)) for _ in range(n)]
        w = rng.uniform(0.5, 3.0)
        buf = algos.buffer(Geometry.linestring(line), w, Q)
        assert algos.area(buf) > 0, (trial, line)
        sample_check(buf, w, ((-5, 25), (-5, 25)), [line], n=600)


# ---- degenerate-path robustness (fuzz-found round 4) ------------------

DEGEN_CASES = [
    # near-antiparallel double-back (turn within 1e-5 of -pi)
    [(0.0, 0.0), (1.0, 0.0), (0.0, -1e-05)],
    # microscopic first segment (1.2e-07) then a long leg
    [(-1.192092896e-07, 0.0), (0.0, 2.0), (0.0, 1.0), (0.0, 0.0)],
    # axis-aligned double-back overshooting by exactly 1/256 (arc points
    # landed bitwise on segment endpoints)
    [(0.0, 0.0), (0.0, 1.0), (0.0, -0.00390625)],
    # triangle path closing to within 2.4e-07 of its start (gap smaller
    # than the arrangement's side-probe offset)
    [(0.0, 2.3841857910156247e-07), (1.0, 0.0), (0.0, 1.0), (0.0, 0.0)],
]


@pytest.mark.parametrize("pts", DEGEN_CASES)
def test_degenerate_paths_buffer_nonempty_and_cover_vertices(pts):
    g = Geometry("LineString", list(pts))
    b = algos.buffer(g, 0.5, Q)
    assert algos.area(b) > 0.5  # a positive buffer is never empty
    for v in g.vertices():
        assert algos.covers(b, Geometry("Point", v)), v


def test_buffer_containment_property():
    """buffer(g, r>0) covers every vertex of g and strictly exceeds its
    area — the invariant the round-4 deep fuzz ran at 4000 examples; a
    smaller deterministic budget keeps it in CI."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    coord = st.floats(min_value=-50, max_value=50, allow_nan=False,
                      allow_infinity=False)

    @st.composite
    def lines(draw):
        pts = [(draw(coord), draw(coord))
               for _ in range(draw(st.integers(2, 5)))]
        if len(set(pts)) < 2:
            pts.append((pts[0][0] + 5, pts[0][1]))
        return Geometry("LineString", pts)

    @given(lines(), st.sampled_from([0.5, 1.0, 3.0]))
    @settings(max_examples=250, deadline=None,
              suppress_health_check=list(HealthCheck))
    def contains(g, r):
        b = algos.buffer(g, r, Q)
        for v in g.vertices():
            assert algos.covers(b, Geometry("Point", v)), (g, r, v)
        assert algos.area(b) > algos.area(g)

    contains()


def test_buffer_near_coincident_start_not_empty():
    """Deep-fuzz regression: a path start 6e-8 off a later joint/segment
    made both the arrangement and the single small-jitter retry empty;
    the escalating jitter ladder must recover a non-empty buffer
    covering every vertex."""
    from datafusion_geo_spark.geo import algos
    from datafusion_geo_spark.geo.geom import Geometry
    g = Geometry("LineString",
                 [(-5.960464477539063e-08, 0.0), (0.0, 2.0), (1.0, 0.0),
                  (0.0, 0.0), (0.0, 1.0)])
    b = algos.buffer(g, 0.5, 8)
    assert not b.is_empty() and algos.area(b) > 4.0
    for v in g.vertices():
        assert algos.covers(b, Geometry("Point", v))


class TestNegativeBuffer:
    def test_square_erodes_exact(self):
        from datafusion_geo_spark.geo.algos import area, buffer
        from datafusion_geo_spark.geo.wkt import from_wkt
        g = buffer(from_wkt("POLYGON((0 0,10 0,10 10,0 10,0 0))"), -2.0)
        assert g.typ == "Polygon" and g.parts
        assert area(g) == pytest.approx(36.0, abs=1e-9)

    def test_over_erosion_empties(self):
        from datafusion_geo_spark.geo.algos import buffer
        from datafusion_geo_spark.geo.wkt import from_wkt, to_wkt
        assert to_wkt(buffer(
            from_wkt("POLYGON((0 0,10 0,10 10,0 10,0 0))"), -6.0)) == \
            "POLYGON EMPTY"

    def test_hole_grows(self):
        from datafusion_geo_spark.geo.algos import area, buffer
        from datafusion_geo_spark.geo.wkt import from_wkt
        g = buffer(from_wkt(
            "POLYGON((0 0,20 0,20 4,0 4,0 0),(9 1,11 1,11 3,9 3,9 1))"),
            -1.0)
        # outer shrinks to 18x2=36, hole grows to 4x... clipped: two
        # rectangles 1..8 x 1..3 and 12..19 x 1..3 = 14 + 14
        assert area(g) == pytest.approx(28.0, abs=1e-9)
        assert g.typ == "MultiPolygon" and len(g.parts) == 2

    def test_waist_splits(self):
        from datafusion_geo_spark.geo.algos import buffer
        from datafusion_geo_spark.geo.wkt import from_wkt
        g = buffer(from_wkt(
            "POLYGON((0 0,8 0,8 1.8,12 1.8,12 0,20 0,20 6,12 6,"
            "12 4.2,8 4.2,8 6,0 6,0 0))"), -1.5)
        assert g.typ == "MultiPolygon" and len(g.parts) == 2

    def test_lines_points_empty(self):
        from datafusion_geo_spark.geo.algos import buffer
        from datafusion_geo_spark.geo.wkt import from_wkt, to_wkt
        assert to_wkt(buffer(from_wkt("LINESTRING(0 0,5 5)"), -1.0)) == \
            "POLYGON EMPTY"
        assert to_wkt(buffer(from_wkt("POINT(1 1)"), -1.0)) == \
            "POLYGON EMPTY"

    def test_dilate_then_erode_roundtrip_area(self):
        from datafusion_geo_spark.geo.algos import area, buffer
        from datafusion_geo_spark.geo.wkt import from_wkt
        g0 = from_wkt("POLYGON((0 0,10 0,10 10,0 10,0 0))")
        g = buffer(buffer(g0, 2.0, 8), -2.0, 8)
        # closing (dilate+erode) of a convex polygon ~ the original
        # (small excess from the arc chords)
        assert area(g) == pytest.approx(area(g0), rel=0.02)
