"""Geometry set operations (geo/overlay.py): golden PostGIS-parity
cases, hypothesis area identities, and the Spark/SQL surface."""

import math

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_geo_spark.geo.algos import area, covers, intersects
from datafusion_geo_spark.geo.overlay import (difference, intersection,
                                              union, union_all)
from datafusion_geo_spark.geo.wkt import from_wkt, to_wkt


def W(op, a, b):
    return to_wkt(op(from_wkt(a), from_wkt(b)))


A = "POLYGON((0 0,2 0,2 2,0 2,0 0))"
B = "POLYGON((1 1,3 1,3 3,1 3,1 1))"


def test_overlap_golden():
    assert W(intersection, A, B) == "POLYGON((1 1,2 1,2 2,1 2,1 1))"
    assert W(union, A, B) == \
        "POLYGON((0 0,2 0,2 1,3 1,3 3,1 3,1 2,0 2,0 0))"
    assert W(difference, A, B) == \
        "POLYGON((0 0,2 0,2 1,1 1,1 2,0 2,0 0))"


def test_containment_and_hole():
    C = "POLYGON((0.5 0.5,1.5 0.5,1.5 1.5,0.5 1.5,0.5 0.5))"
    # containment: difference punches a hole; union/intersection collapse
    assert W(difference, A, C) == ("POLYGON((0 0,2 0,2 2,0 2,0 0),"
                                   "(0.5 0.5,0.5 1.5,1.5 1.5,1.5 0.5,0.5 0.5))")
    assert W(union, A, C) == A
    assert W(intersection, A, C) == C


def test_disjoint_equal_touching():
    E = "POLYGON((5 5,6 5,6 6,5 6,5 5))"
    assert W(intersection, A, E) == "POLYGON EMPTY"
    assert W(difference, A, E) == A
    assert "MULTIPOLYGON" in W(union, A, E)
    assert W(intersection, A, A) == A
    assert W(union, A, A) == A
    assert W(difference, A, A) == "POLYGON EMPTY"
    # edge-touching: interiors disjoint; union dissolves the shared edge
    T = "POLYGON((2 0,4 0,4 2,2 2,2 0))"
    assert W(intersection, A, T) == "POLYGON EMPTY"  # documented deviation:
    # GEOS returns the shared LINESTRING; this overlay drops collapses
    assert W(union, A, T) == "POLYGON((0 0,2 0,4 0,4 2,2 2,0 2,0 0))"


def test_line_and_point_operands():
    L = "LINESTRING(-1 1,3 1)"
    assert W(intersection, L, A) == "LINESTRING(0 1,2 1)"
    assert W(intersection, A, L) == "LINESTRING(0 1,2 1)"
    assert W(difference, L, A) == "MULTILINESTRING((-1 1,0 1),(2 1,3 1))"
    assert W(difference, A, L) == A          # lower-dim b: a unchanged
    assert W(intersection, "POINT(1 1)", A) == "POINT(1 1)"
    assert W(intersection, "POINT(9 9)", A) == "POINT EMPTY"
    assert W(difference, "POINT(9 9)", A) == "POINT(9 9)"
    # line x line: crossing -> point; collinear overlap -> line
    assert W(intersection, "LINESTRING(0 0,10 0)",
             "LINESTRING(3 -1,5 3)") == "POINT(3.5 0)"
    assert W(intersection, "LINESTRING(0 0,10 0)",
             "LINESTRING(4 0,6 0)") == "LINESTRING(4 0,6 0)"
    assert W(difference, "LINESTRING(0 0,10 0)",
             "LINESTRING(4 0,6 0)") == \
        "MULTILINESTRING((0 0,4 0),(6 0,10 0))"


def test_union_all_fold():
    u = union_all([from_wkt(A), from_wkt(B),
                   from_wkt("POLYGON((10 10,11 10,11 11,10 11,10 10))")])
    assert abs(area(u) - (4 + 4 - 1 + 1)) < 1e-9
    assert u.typ == "MultiPolygon" and len(u.parts) == 2


def _box(x0, y0, w, h):
    return from_wkt(f"POLYGON(({x0} {y0},{x0 + w} {y0},{x0 + w} {y0 + h},"
                    f"{x0} {y0 + h},{x0} {y0}))")


boxes = st.tuples(st.integers(-20, 20), st.integers(-20, 20),
                  st.integers(1, 15), st.integers(1, 15))


@settings(max_examples=120, deadline=None)
@given(boxes, boxes)
def test_area_identities_boxes(ba, bb):
    """The inclusion–exclusion identities every overlay must satisfy,
    on integer boxes (any overlap topology: disjoint, touching,
    overlapping, nested, equal)."""
    a, b = _box(*ba), _box(*bb)
    ai, au, ad, adb = (area(intersection(a, b)), area(union(a, b)),
                       area(difference(a, b)), area(difference(b, a)))
    assert ai + ad == pytest.approx(area(a), abs=1e-6)
    assert ai + adb == pytest.approx(area(b), abs=1e-6)
    assert au == pytest.approx(area(a) + area(b) - ai, abs=1e-6)
    # symmetry of the dissolve
    assert area(union(b, a)) == pytest.approx(au, abs=1e-6)
    assert area(intersection(b, a)) == pytest.approx(ai, abs=1e-6)


pts = st.lists(st.tuples(st.integers(-15, 15), st.integers(-15, 15)),
               min_size=3, max_size=8)


@settings(max_examples=60, deadline=None)
@given(pts, pts)
def test_area_identities_convex(pa, pb):
    """Same identities on random convex polygons (non-axis-aligned
    edges, arbitrary crossing angles)."""
    from datafusion_geo_spark.geo.algos import convex_hull
    ga = convex_hull(from_wkt(
        "MULTIPOINT(" + ",".join(f"{x} {y}" for x, y in pa) + ")"))
    gb = convex_hull(from_wkt(
        "MULTIPOINT(" + ",".join(f"{x} {y}" for x, y in pb) + ")"))
    if ga.typ != "Polygon" or gb.typ != "Polygon":
        return  # degenerate hull (collinear points)
    ai = area(intersection(ga, gb))
    assert ai + area(difference(ga, gb)) == pytest.approx(
        area(ga), abs=1e-6)
    assert area(union(ga, gb)) == pytest.approx(
        area(ga) + area(gb) - ai, abs=1e-6)
    # the intersection must be covered by both operands
    gi = intersection(ga, gb)
    if gi.typ in ("Polygon", "MultiPolygon") and gi.parts:
        assert covers(ga, gi) and covers(gb, gi)


holed = st.tuples(st.integers(-10, 10), st.integers(-10, 10),
                  st.integers(4, 12),     # outer size
                  st.integers(1, 3),      # hole inset
                  st.integers(1, 3))      # hole size


def _holed_box(x0, y0, w, i, hw):
    # clamp inset FIRST so a >=1-unit hole stays STRICTLY interior:
    # the old clamp (hw floor alone) could emit a hole sharing an edge
    # with the shell (w=4, i=3 -> hole [3,4]^2) — an INVALID polygon
    # (rings may touch at points only; is_valid now flags it), on which
    # overlay results are undefined
    i = max(1, min(i, (w - 2) // 2))
    hw = min(hw, w - 2 * i - 1)
    if hw < 1:
        hw = 1
    hx, hy = x0 + i, y0 + i
    return from_wkt(
        f"POLYGON(({x0} {y0},{x0 + w} {y0},{x0 + w} {y0 + w},"
        f"{x0} {y0 + w},{x0} {y0}),"
        f"({hx} {hy},{hx + hw} {hy},{hx + hw} {hy + hw},"
        f"{hx} {hy + hw},{hx} {hy}))")


@settings(max_examples=80, deadline=None)
@given(holed, boxes)
def test_area_identities_holed_operand(ha, bb):
    """The inclusion–exclusion identities with a HOLED left operand —
    exercises hole-ring boundary pieces and hole-assignment in the
    face trace."""
    a, b = _holed_box(*ha), _box(*bb)
    ai, au, ad = (area(intersection(a, b)), area(union(a, b)),
                  area(difference(a, b)))
    assert ai + ad == pytest.approx(area(a), abs=1e-6)
    assert au == pytest.approx(area(a) + area(b) - ai, abs=1e-6)
    assert area(intersection(b, a)) == pytest.approx(ai, abs=1e-6)
    assert area(union(b, a)) == pytest.approx(au, abs=1e-6)
    gi = intersection(a, b)
    if gi.typ in ("Polygon", "MultiPolygon") and gi.parts:
        assert covers(a, gi) and covers(b, gi)


def test_spark_surface(spark):
    from datafusion_geo_spark.functions import (register_all, st_astext,
                                                st_difference,
                                                st_geomfromtext,
                                                st_intersection, st_union,
                                                st_union_agg)
    df = spark.createDataFrame([(1, A, B)], "id int, a string, b string")
    row = df.select(
        st_astext(st_intersection(st_geomfromtext(F.col("a")),
                                  st_geomfromtext(F.col("b")))).alias("i"),
        st_astext(st_union(st_geomfromtext(F.col("a")),
                           st_geomfromtext(F.col("b")))).alias("u"),
        st_astext(st_difference(st_geomfromtext(F.col("a")),
                                st_geomfromtext(F.col("b")))).alias("d"),
    ).collect()[0]
    assert row["i"] == "POLYGON((1 1,2 1,2 2,1 2,1 1))"
    assert row["u"] == "POLYGON((0 0,2 0,2 1,3 1,3 3,1 3,1 2,0 2,0 0))"
    assert row["d"] == "POLYGON((0 0,2 0,2 1,1 1,1 2,0 2,0 0))"
    # aggregate: two overlapping + one far box per group
    agg = spark.createDataFrame(
        [("g1", A), ("g1", B), ("g1", "POLYGON((10 10,11 10,11 11,10 11,10 10))"),
         ("g2", A), ("g2", A)],
        "grp string, wkt string")
    got = {r["grp"]: r for r in agg.select(
        "grp", st_geomfromtext(F.col("wkt")).alias("g"))
        .groupBy("grp").agg(st_union_agg(F.col("g")).alias("u"))
        .select("grp", st_astext(F.col("u")).alias("u")).collect()}
    assert got["g1"]["u"].startswith("MULTIPOLYGON")
    assert got["g2"]["u"] == A
    # SQL names
    register_all(spark)
    r = spark.sql(f"""
        SELECT ST_AsText(ST_Intersection(ST_GeomFromText('{A}'),
                                         ST_GeomFromText('{B}'))) AS i,
               ST_AsText(ST_Difference(ST_GeomFromText('{A}'),
                                       ST_GeomFromText('{B}'))) AS d
    """).collect()[0]
    assert r["i"] == "POLYGON((1 1,2 1,2 2,1 2,1 1))"
    assert r["d"] == "POLYGON((0 0,2 0,2 1,1 1,1 2,0 2,0 0))"


def test_null_and_empty(spark):
    from datafusion_geo_spark.functions import (st_astext, st_geomfromtext,
                                                st_intersection, st_union)
    df = spark.createDataFrame(
        [(1, A, None), (2, None, B), (3, A, "POLYGON EMPTY")],
        "id int, a string, b string")
    rows = {r["id"]: r for r in df.select(
        "id",
        st_astext(st_intersection(st_geomfromtext(F.col("a")),
                                  st_geomfromtext(F.col("b")))).alias("i"),
        st_astext(st_union(st_geomfromtext(F.col("a")),
                           st_geomfromtext(F.col("b")))).alias("u"),
    ).collect()}
    assert rows[1]["i"] is None and rows[1]["u"] is None
    assert rows[2]["i"] is None and rows[2]["u"] is None
    assert rows[3]["i"] == "POLYGON EMPTY"     # empty operand -> empty
    assert rows[3]["u"] == A                   # union with empty -> a


def test_difference_pinched_at_shared_vertex_is_valid():
    """Regression (r9 fuzz): subtracting a triangle whose apex sits ON
    the other polygon's boundary leaves a region pinched at that point.
    The overlay tracer walked it as ONE self-touching ring (invalid);
    faces are now unpinched into lobes touching at the point."""
    from datafusion_geo_spark.geo.overlay import difference, symdifference
    from datafusion_geo_spark.geo.validity import is_valid, is_valid_reason
    from datafusion_geo_spark.geo.algos import area
    a = from_wkt("POLYGON((-3 -4,2 -5,-5 3,-3 -4))")
    b = from_wkt("POLYGON((2 -5,-1 -2,-2 -2,2 -5))")
    d = difference(a, b)
    assert is_valid(d), is_valid_reason(d)
    assert abs(area(d) - (area(a) - 1.5)) < 1e-9  # the overlap triangle
    s = symdifference(a, b)
    assert is_valid(s), is_valid_reason(s)


def test_setops_fuzz_valid_and_area_identities():
    """r9 fuzz pinned: random valid boxes/triangles through all four
    set operations — outputs must be valid and the inclusion-exclusion
    area identities must hold."""
    import random

    from datafusion_geo_spark.geo.algos import area
    from datafusion_geo_spark.geo.geom import Geometry
    from datafusion_geo_spark.geo.overlay import (difference, intersection,
                                                  symdifference, union)
    from datafusion_geo_spark.geo.validity import is_valid

    def rand_poly(rng):
        if rng.random() < 0.5:
            x, y = rng.randint(-5, 3), rng.randint(-5, 3)
            w, h = rng.randint(1, 4), rng.randint(1, 4)
            ring = [(x, y), (x + w, y), (x + w, y + h), (x, y + h), (x, y)]
        else:
            while True:
                pts = [(rng.randint(-5, 5), rng.randint(-5, 5))
                       for _ in range(3)]
                (x1, y1), (x2, y2), (x3, y3) = pts
                a2 = (x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1)
                if a2 != 0:
                    if a2 < 0:
                        pts = pts[::-1]
                    break
            ring = pts + [pts[0]]
        return Geometry("Polygon",
                        [[(float(px), float(py)) for px, py in ring]])

    rng = random.Random(20260815)
    for _ in range(200):
        a, b = rand_poly(rng), rand_poly(rng)
        u, i = union(a, b), intersection(a, b)
        d, s = difference(a, b), symdifference(a, b)
        ai, bi = area(a), area(b)
        aint = (0.0 if i is None or i.typ not in ("Polygon", "MultiPolygon")
                else area(i))
        assert abs(area(u) - (ai + bi - aint)) < 1e-6
        assert abs(area(d) - (ai - aint)) < 1e-6
        assert abs(area(s) - (ai + bi - 2 * aint)) < 1e-6
        for g in (u, d, s):
            assert g.is_empty() or is_valid(g)
        if i is not None and i.typ in ("Polygon", "MultiPolygon"):
            assert i.is_empty() or is_valid(i)


# ---------------------------------------------------------------- r11
# rectangle fast paths (kernels._box_class_fast / geom_intersection):
# exhaustive Allen-relation coverage — a is fixed [0,4]x[0,4], b sweeps
# every integer interval in [-2,6] on each axis, so every one of the
# 13x13 interval-relation classes (touch, overlap, containment,
# equality, disjoint) occurs on both axes.

def _allen_box_pairs():
    import itertools
    from datafusion_geo_spark.geo.geom import Geometry
    from datafusion_geo_spark.geo.wkb import to_wkb
    pairs = []
    ivs = [(b0, b1) for b0 in range(-2, 6) for b1 in range(b0 + 1, 7)]
    for (bx0, bx1), (by0, by1) in itertools.product(ivs, ivs):
        pairs.append((to_wkb(Geometry.box(0, 0, 4, 4)),
                      to_wkb(Geometry.box(bx0, by0, bx1, by1))))
    return pairs


def test_box_class_predicates_match_object_path():
    import pandas as pd
    from datafusion_geo_spark.functions import kernels as K
    from datafusion_geo_spark.geo import de9im, relate
    from datafusion_geo_spark.geo.wkb import from_wkb

    pairs = _allen_box_pairs()
    a = pd.Series([p[0] for p in pairs] + [None, pairs[0][0]])
    b = pd.Series([p[1] for p in pairs] + [pairs[0][1], None])
    fns = {
        "contains": (K.st_contains, relate.contains),
        "within": (K.st_within, relate.within),
        "touches": (K.st_touches, relate.touches),
        "overlaps": (K.st_overlaps, relate.overlaps),
        "crosses": (K.st_crosses, relate.crosses),
        "relate": (K.st_relate, de9im.relate),
        "intersects": (K.intersects, K.algos.intersects),
        "equals": (K.equals, K.algos.equals),
    }
    for name, (kern, ref) in fns.items():
        got = kern(a, b).tolist()
        for i in range(len(pairs)):
            want = ref(from_wkb(pairs[i][0]), from_wkb(pairs[i][1]))
            if isinstance(want, bool) or want is None:
                pass
            elif not isinstance(want, str):
                want = bool(want)
            assert got[i] == want, (name, i, pairs[i], got[i], want)
        assert got[-2] is None and got[-1] is None, name


def test_box_intersection_fastpath_byte_parity():
    import pandas as pd
    from datafusion_geo_spark.functions import kernels as K
    from datafusion_geo_spark.geo.wkb import from_wkb, to_wkb

    pairs = _allen_box_pairs()
    a = pd.Series([p[0] for p in pairs] + [None])
    b = pd.Series([p[1] for p in pairs] + [pairs[0][1]])
    got = K.geom_intersection(a, b).tolist()
    for i in range(len(pairs)):
        want = to_wkb(intersection(from_wkb(pairs[i][0]),
                                   from_wkb(pairs[i][1])))
        assert bytes(got[i]) == want, (i, pairs[i])
    assert got[-1] is None


def test_box_fastpath_mixed_batch_falls_back():
    # a non-rectangle row in the batch must route the WHOLE batch to the
    # object path with identical results
    import pandas as pd
    from datafusion_geo_spark.functions import kernels as K
    from datafusion_geo_spark.geo.wkb import to_wkb

    tri = to_wkb(from_wkt("POLYGON((0 0,4 0,2 3,0 0))"))
    box = to_wkb(from_wkt("POLYGON((1 1,3 1,3 2,1 2,1 1))"))
    a = pd.Series([tri, box])
    b = pd.Series([box, box])
    got = K.geom_intersection(a, b).tolist()
    want0 = to_wkb(intersection(from_wkt("POLYGON((0 0,4 0,2 3,0 0))"),
                                from_wkt("POLYGON((1 1,3 1,3 2,1 2,1 1))")))
    assert bytes(got[0]) == want0
    assert bytes(got[1]) == box
    from datafusion_geo_spark.geo import relate as rel
    want_contains = [rel.contains(from_wkt("POLYGON((0 0,4 0,2 3,0 0))"),
                                  from_wkt("POLYGON((1 1,3 1,3 2,1 2,1 1))")),
                     True]
    assert K.st_contains(a, b).tolist() == want_contains
