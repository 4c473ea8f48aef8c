"""Delaunay / Voronoi / concave hull / generate-points — property
checks (empty-circumcircle, cell-tiling, nearest-site, hull-coverage)
plus SQL surface."""

import math

import pytest

from datafusion_geo_spark.geo import triangulate as T
from datafusion_geo_spark.geo.algos import area, convex_hull, covers
from datafusion_geo_spark.geo.geom import Geometry, dist
from datafusion_geo_spark.geo.wkt import from_wkt, to_wkt

W = from_wkt


def _grid_sites(n=5, jitter=0.37):
    pts = []
    for i in range(n):
        for j in range(n):
            # deterministic jitter breaks co-circular degeneracy
            pts.append((i * 10 + ((i * 7 + j * 3) % 5) * jitter,
                        j * 10 + ((i * 3 + j * 11) % 5) * jitter))
    return pts


def _mp(pts):
    return W("MULTIPOINT(" + ",".join(f"{x} {y}" for x, y in pts) + ")")


class TestDelaunay:
    def test_empty_circumcircle_property(self):
        pts = _grid_sites()
        tris = T.delaunay_triangles(_mp(pts))
        assert tris
        for t in tris:
            for p in pts:
                if p in t:
                    continue
                assert not T._circum_contains(t, p), (t, p)

    def test_triangle_count_euler(self):
        # n sites, h on the convex hull -> 2n - 2 - h triangles
        from datafusion_geo_spark.geo.algos import point_in_polygon
        pts = _grid_sites(4)
        tris = T.delaunay_triangles(_mp(pts))
        hull = convex_hull(_mp(pts))
        # h counts every site ON the hull boundary (collinear included)
        h = sum(1 for p in pts
                if point_in_polygon(p, [list(hull.parts[0])]) == 0)
        assert len(tris) == 2 * len(pts) - 2 - h

    def test_union_area_is_hull_area(self):
        pts = _grid_sites(4)
        tris = T.delaunay_triangles(_mp(pts))
        tri_area = sum(
            abs(T._ccw(*t)) / 2.0 for t in tris)
        hull_area = area(convex_hull(_mp(pts)))
        assert tri_area == pytest.approx(hull_area, rel=1e-9)

    def test_square_and_edges(self):
        g = W("MULTIPOINT(0 0,10 0,10 10,0 10)")
        gc = T.delaunay_geometry(g)
        assert gc.typ == "GeometryCollection" and len(gc.parts) == 2
        edges = T.delaunay_geometry(g, edges=True)
        assert edges.typ == "MultiLineString" and len(edges.parts) == 5

    def test_degenerate(self):
        assert T.delaunay_triangles(W("MULTIPOINT(0 0,1 1)")) == []
        assert T.delaunay_triangles(W("MULTIPOINT(0 0,1 1,2 2)")) == []


class TestVoronoi:
    def test_cells_contain_sites_and_tile(self):
        pts = _grid_sites(4)
        cells = T.voronoi_cells(_mp(pts))
        assert len(cells) == len(pts)
        total = 0.0
        for s, ring in cells:
            r = list(ring) + [ring[0]]
            poly = Geometry("Polygon", [r], None)
            assert covers(poly, Geometry("Point", s, None))
            total += area(poly)
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        mx = max(max(xs) - min(xs), max(ys) - min(ys), 1.0)
        box = (max(xs) - min(xs) + 2 * mx) * (max(ys) - min(ys) + 2 * mx)
        assert total == pytest.approx(box, rel=1e-9)

    def test_nearest_site_property(self):
        pts = [(0.0, 0.0), (10.0, 0.0), (5.0, 8.0), (2.0, 3.0)]
        for s, ring in T.voronoi_cells(_mp(pts)):
            # every cell vertex is (weakly) nearest to its own site
            for v in ring:
                d0 = dist(v, s)
                assert all(dist(v, o) >= d0 - 1e-9 for o in pts)

    def test_two_sites(self):
        gc = T.voronoi_geometry(W("MULTIPOINT(0 0,10 0)"))
        assert to_wkt(gc) == (
            "GEOMETRYCOLLECTION("
            "POLYGON((-10 -10,5 -10,5 10,-10 10,-10 -10)),"
            "POLYGON((5 -10,20 -10,20 10,5 10,5 -10)))")


class TestConcaveHull:
    def _c_points(self):
        pts = []
        for i in range(13):
            a = math.pi * i / 12
            pts.append((round(10 * math.cos(a), 3),
                        round(10 * math.sin(a), 3)))
            pts.append((round(5 * math.cos(a), 3),
                        round(5 * math.sin(a), 3)))
        return pts

    def test_covers_inputs_and_tighter_than_convex(self):
        pts = self._c_points()
        g = _mp(pts)
        ch = T.concave_hull(g, 0.2)
        assert ch.typ == "Polygon" and ch.parts
        for p in pts:
            assert covers(ch, Geometry("Point", p, None)), p
        assert area(ch) < area(convex_hull(g))

    def test_ratio_one_is_convex_hull_area(self):
        g = _mp(self._c_points())
        assert area(T.concave_hull(g, 1.0)) == \
            pytest.approx(area(convex_hull(g)), rel=1e-9)


class TestGeneratePoints:
    def test_deterministic_inside_and_count(self):
        g = W("POLYGON((0 0,10 0,10 10,0 10,0 0),(4 4,6 4,6 6,4 6,4 4))")
        a = T.generate_points(g, 50, 7)
        b = T.generate_points(g, 50, 7)
        c = T.generate_points(g, 50, 8)
        assert to_wkt(a) == to_wkt(b)
        assert to_wkt(a) != to_wkt(c)
        assert len(a.parts) == 50
        for p in a.parts:
            assert covers(g, Geometry("Point", p, None))
            assert not (4 < p[0] < 6 and 4 < p[1] < 6)  # hole excluded

    def test_empty(self):
        assert to_wkt(T.generate_points(W("LINESTRING(0 0,1 1)"), 5)) == \
            "MULTIPOINT EMPTY"


def test_sql_surface(spark):
    from datafusion_geo_spark.functions import register_all
    register_all(spark)
    row = spark.sql("""
      SELECT st_astext(st_delaunaytriangles(st_geomfromtext(
               'MULTIPOINT(0 0,10 0,10 10,0 10)'))) AS dt,
             st_astext(st_voronoipolygons(st_geomfromtext(
               'MULTIPOINT(0 0,10 0)'))) AS vp,
             st_numgeometries(st_generatepoints(st_geomfromtext(
               'POLYGON((0 0,10 0,10 10,0 10,0 0))'), 20, 3)) AS np,
             st_geometrytype(st_concavehull(st_geomfromtext(
               'MULTIPOINT(0 0,10 0,10 10,0 10,5 5)'), 1.0)) AS cht
    """).collect()[0]
    assert row["dt"].startswith("GEOMETRYCOLLECTION(POLYGON")
    assert row["vp"].startswith("GEOMETRYCOLLECTION(POLYGON")
    assert row["np"] == 20
    assert row["cht"] == "ST_Polygon"
