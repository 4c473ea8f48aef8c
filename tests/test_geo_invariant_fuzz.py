"""Self-consistency invariant fuzz over the geometry kernels (the r9
campaign that caught the make_valid/overlay pinch bugs, pinned as
permanent fixed-seed tests for the targets that came back clean):

* DE-9IM: relate(a, b) must equal the transpose of relate(b, a).
* Delaunay: triangle areas sum to the convex hull's area; every
  triangle is valid and hull-covered; the hull covers every input.
* Buffer: positive/negative buffers of valid inputs are valid areal
  geometry.
"""

import random

from datafusion_geo_spark.geo.algos import area, buffer, convex_hull, covers
from datafusion_geo_spark.geo.de9im import relate
from datafusion_geo_spark.geo.geom import Geometry
from datafusion_geo_spark.geo.triangulate import delaunay_geometry
from datafusion_geo_spark.geo.validity import is_valid, is_valid_reason
from datafusion_geo_spark.geo.wkt import to_wkt


def _rand_line(rng):
    pts = [(float(rng.randint(-4, 4)), float(rng.randint(-4, 4)))
           for _ in range(rng.randint(2, 5))]
    out = [pts[0]]
    for c in pts[1:]:
        if c != out[-1]:
            out.append(c)
    if len(out) < 2:
        out.append((out[0][0] + 1.0, out[0][1]))
    return Geometry("LineString", out)


def _rand_valid_poly(rng):
    if rng.random() < 0.7:
        x, y = rng.randint(-4, 2), rng.randint(-4, 2)
        w, h = rng.randint(1, 3), rng.randint(1, 3)
        ring = [(x, y), (x + w, y), (x + w, y + h), (x, y + h), (x, y)]
    else:
        while True:
            pts = [(rng.randint(-4, 4), rng.randint(-4, 4))
                   for _ in range(3)]
            (x1, y1), (x2, y2), (x3, y3) = pts
            a2 = (x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1)
            if a2 != 0:
                if a2 < 0:
                    pts = pts[::-1]
                break
        ring = pts + [pts[0]]
    return Geometry("Polygon", [[(float(px), float(py)) for px, py in ring]])


def _rand_geom(rng):
    k = rng.random()
    if k < 0.3:
        return Geometry("Point", (float(rng.randint(-4, 4)),
                                  float(rng.randint(-4, 4))))
    if k < 0.6:
        return _rand_line(rng)
    return _rand_valid_poly(rng)


def _transpose(m):
    return "".join(m[3 * j + i] for i in range(3) for j in range(3))


def test_relate_transpose_symmetry_fuzz():
    rng = random.Random(77)
    for _ in range(300):
        a, b = _rand_geom(rng), _rand_geom(rng)
        mab, mba = relate(a, b), relate(b, a)
        if mab is None or mba is None:
            assert (mab is None) == (mba is None), (to_wkt(a), to_wkt(b))
            continue
        assert _transpose(mab) == mba, (to_wkt(a), to_wkt(b), mab, mba)


def test_delaunay_area_and_hull_fuzz():
    rng = random.Random(123)
    for _ in range(120):
        pts = list({(float(rng.randint(-6, 6)), float(rng.randint(-6, 6)))
                    for _ in range(rng.randint(3, 10))})
        if len(pts) < 3:
            continue
        g = Geometry("MultiPoint", pts)
        hull = convex_hull(g)
        if hull.typ != "Polygon":
            continue        # collinear input: no triangles to check
        tris = [t for t in delaunay_geometry(g).geometries()
                if not t.is_empty()]
        assert abs(sum(area(t) for t in tris) - area(hull)) < 1e-6, to_wkt(g)
        for t in tris:
            assert is_valid(t) and covers(hull, t), (to_wkt(g), to_wkt(t))
        for p in pts:
            assert covers(hull, Geometry("Point", p)), (to_wkt(g), p)


def test_buffer_output_is_valid_fuzz():
    rng = random.Random(321)
    for _ in range(120):
        g = _rand_geom(rng)
        d = rng.choice([0.5, 1.0, 1.5, -0.5])
        if d < 0 and g.typ != "Polygon":
            continue
        b = buffer(g, d)
        if b is None or b.is_empty():
            continue
        if b.typ in ("Polygon", "MultiPolygon"):
            assert is_valid(b), (to_wkt(g), d, is_valid_reason(b))
