"""Geography measure twins: ST_AreaSphere / ST_LengthSphere /
ST_PerimeterSphere (geo/proj.py sphere_* on the PostGIS mean-radius
sphere). Analytic identities: a lon/lat rectangle's spherical area is
R²·Δλ·(sin φ₂ − sin φ₁), a meridian quarter is (π/2)·R."""

import math

import pytest

from datafusion_geo_spark.geo.proj import (R_SPHERE, sphere_area_m2,
                                           sphere_length_m,
                                           sphere_perimeter_m)
from datafusion_geo_spark.geo.wkt import from_wkt


def _rel(a, b):
    return abs(a - b) / max(abs(b), 1e-300)


def test_rect_area_matches_analytic():
    g = from_wkt("POLYGON((0 0,0 30,90 30,90 0,0 0))")
    exact = R_SPHERE * R_SPHERE * (math.pi / 2.0) * math.sin(math.radians(30))
    assert _rel(sphere_area_m2(g), exact) < 1e-12


def test_ring_orientation_irrelevant():
    cw = from_wkt("POLYGON((0 0,0 30,90 30,90 0,0 0))")
    ccw = from_wkt("POLYGON((0 0,90 0,90 30,0 30,0 0))")
    assert sphere_area_m2(cw) == sphere_area_m2(ccw)


def test_hole_subtracts():
    shell = from_wkt("POLYGON((0 0,0 30,90 30,90 0,0 0))")
    holed = from_wkt("POLYGON((0 0,0 30,90 30,90 0,0 0),"
                     "(10 10,20 10,20 20,10 20,10 10))")
    hole = from_wkt("POLYGON((10 10,10 20,20 20,20 10,10 10))")
    assert sphere_area_m2(holed) == pytest.approx(
        sphere_area_m2(shell) - sphere_area_m2(hole), rel=1e-12)


def test_nonareal_area_zero():
    assert sphere_area_m2(from_wkt("LINESTRING(0 0,10 10)")) == 0.0
    assert sphere_area_m2(from_wkt("POINT(3 4)")) == 0.0


def test_meridian_quarter_length():
    g = from_wkt("LINESTRING(0 0,0 90)")
    assert _rel(sphere_length_m(g), math.pi / 2.0 * R_SPHERE) < 1e-12


def test_length_sums_parts_and_ignores_areal():
    m = from_wkt("MULTILINESTRING((0 0,0 45),(0 45,0 90))")
    assert _rel(sphere_length_m(m), math.pi / 2.0 * R_SPHERE) < 1e-12
    assert sphere_length_m(
        from_wkt("POLYGON((0 0,0 1,1 1,1 0,0 0))")) == 0.0


def test_perimeter_rings_including_holes():
    shell = from_wkt("POLYGON((0 0,0 10,10 10,10 0,0 0))")
    holed = from_wkt("POLYGON((0 0,0 10,10 10,10 0,0 0),"
                     "(2 2,4 2,4 4,2 4,2 2))")
    assert sphere_perimeter_m(holed) > sphere_perimeter_m(shell)
    assert sphere_perimeter_m(from_wkt("LINESTRING(0 0,1 1)")) == 0.0


def test_equator_vs_high_lat_band():
    # the same Δλ×Δφ box shrinks with latitude on a sphere
    low = from_wkt("POLYGON((0 0,0 10,10 10,10 0,0 0))")
    high = from_wkt("POLYGON((0 60,0 70,10 70,10 60,0 60))")
    assert sphere_area_m2(high) < sphere_area_m2(low)


def test_sql_registration(spark):
    from datafusion_geo_spark.functions import register_all
    register_all(spark)
    row = spark.sql(
        "SELECT ST_AreaSphere(ST_GeomFromText("
        "'POLYGON((0 0,0 30,90 30,90 0,0 0))')) AS a, "
        "ST_LengthSphere(ST_GeomFromText("
        "'LINESTRING(0 0,0 90)')) AS l, "
        "ST_PerimeterSphere(ST_GeomFromText("
        "'POLYGON((0 0,0 1,1 1,1 0,0 0))')) AS p").collect()[0]
    exact = R_SPHERE * R_SPHERE * (math.pi / 2.0) * math.sin(math.radians(30))
    assert _rel(row.a, exact) < 1e-12
    assert _rel(row.l, math.pi / 2.0 * R_SPHERE) < 1e-12
    assert row.p > 0.0
