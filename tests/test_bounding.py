"""Bounding forms: minimum enclosing circle + oriented envelope."""

import math
import random

import pyspark.sql.functions as F

from datafusion_geo_spark.geo.bounding import (min_bounding_circle,
                                               oriented_envelope)
from datafusion_geo_spark.geo.wkt import from_wkt, to_wkt


def test_circle_goldens():
    cases = {
        "POLYGON((0 0,10 0,10 10,0 10,0 0))": ((5.0, 5.0), math.sqrt(50)),
        "LINESTRING(0 0,4 0)": ((2.0, 0.0), 2.0),
        "POINT(3 4)": ((3.0, 4.0), 0.0),
        # acute triangle: circumcircle
        "MULTIPOINT(0 0,4 0,2 3)": ((2.0, 5.0 / 6.0), 13.0 / 6.0),
        # obtuse triangle: diameter of the longest side
        "MULTIPOINT(0 0,10 0,1 1)": ((5.0, 0.0), 5.0),
    }
    for w, (c, r) in cases.items():
        (gc, gr) = min_bounding_circle(from_wkt(w))
        assert abs(gc[0] - c[0]) < 1e-9 and abs(gc[1] - c[1]) < 1e-9, w
        assert abs(gr - r) < 1e-9, w


def test_circle_contains_all_and_is_minimal():
    rng = random.Random(11)
    for _ in range(20):
        pts = [(rng.uniform(-50, 50), rng.uniform(-50, 50))
               for _ in range(rng.randint(2, 40))]
        w = "MULTIPOINT(" + ",".join(f"{x} {y}" for x, y in pts) + ")"
        (c, r) = min_bounding_circle(from_wkt(w))
        dmax = max(math.hypot(x - c[0], y - c[1]) for x, y in pts)
        assert dmax <= r + 1e-9                 # encloses everything
        # minimality: r can't beat half the diameter of the point set
        diam = max(math.hypot(ax - bx, ay - by)
                   for ax, ay in pts for bx, by in pts)
        assert r >= diam / 2.0 - 1e-9
        # support: some point sits on the boundary
        assert dmax >= r - 1e-6


def test_oriented_envelope():
    # axis-aligned box comes back unchanged
    assert oriented_envelope(
        from_wkt("POLYGON((0 0,10 0,10 10,0 10,0 0))")
    ) == from_wkt("POLYGON((0 0,10 0,10 10,0 10,0 0))")
    # degenerates
    assert to_wkt(oriented_envelope(from_wkt("POINT(3 4)"))) == "POINT(3 4)"
    assert to_wkt(oriented_envelope(
        from_wkt("MULTIPOINT(0 0,1 1,2 2)"))) == "LINESTRING(0 0,2 2)"
    # a 45-degree diamond's oriented envelope area is half its bbox's
    g = from_wkt("MULTIPOINT(0 2,2 0,4 2,2 4)")
    env = oriented_envelope(g)
    from datafusion_geo_spark.geo.algos import area
    assert abs(area(env) - 8.0) < 1e-9          # bbox would be 16
    # rotating a rectangle never changes the envelope area
    rng = random.Random(3)
    base = [(0.0, 0.0), (6.0, 0.0), (6.0, 2.0), (0.0, 2.0)]
    for _ in range(10):
        t = rng.uniform(0, math.pi)
        ct, st = math.cos(t), math.sin(t)
        pts = [(x * ct - y * st, x * st + y * ct) for x, y in base]
        w = "MULTIPOINT(" + ",".join(f"{x} {y}" for x, y in pts) + ")"
        env = oriented_envelope(from_wkt(w))
        assert abs(area(env) - 12.0) < 1e-6


def test_spark_surface(spark):
    from datafusion_geo_spark.functions import (register_all, st_astext,
                                                st_geomfromtext,
                                                st_minboundcenter,
                                                st_minimumboundingradius,
                                                st_orientedenvelope)
    df = spark.createDataFrame([("POLYGON((0 0,10 0,10 10,0 10,0 0))",)],
                               "w string")
    g = st_geomfromtext(F.col("w"))
    r = df.select(
        st_minimumboundingradius(g).alias("r"),
        st_astext(st_minboundcenter(g)).alias("c"),
        st_astext(st_orientedenvelope(g)).alias("e")).collect()[0]
    assert abs(r["r"] - math.sqrt(50)) < 1e-12
    assert r["c"] == "POINT(5 5)"
    assert r["e"] == "POLYGON((0 0,10 0,10 10,0 10,0 0))"
    register_all(spark)
    row = spark.sql("SELECT ST_MinimumBoundingRadius(ST_GeomFromText("
                    "'LINESTRING(0 0,4 0)')) AS r").collect()[0]
    assert row["r"] == 2.0
