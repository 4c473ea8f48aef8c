"""ST_Node + ST_MakeValid (linework / even-odd method)."""

import pyspark.sql.functions as F

from datafusion_geo_spark.geo.algos import area
from datafusion_geo_spark.geo.noding import make_valid, node_geometry
from datafusion_geo_spark.geo.wkt import from_wkt, to_wkt


def _n(w):
    return to_wkt(node_geometry(from_wkt(w)))


def _mv(w):
    return to_wkt(make_valid(from_wkt(w)))


def test_node_goldens():
    # plus-shaped crossing splits both lines at the crossing
    assert _n("MULTILINESTRING((0 0,10 0),(5 -5,5 5))") == \
        "MULTILINESTRING((0 0,5 0),(5 0,10 0),(5 -5,5 0),(5 0,5 5))"
    # self-intersection splits the single path
    assert _n("LINESTRING(0 0,4 4,4 0,0 4)") == \
        "MULTILINESTRING((0 0,2 2),(2 2,4 4,4 0,2 2),(2 2,0 4))"
    # collinear overlap dissolves the duplicate middle piece
    assert _n("MULTILINESTRING((0 0,10 0),(2 0,8 0))") == \
        "MULTILINESTRING((0 0,2 0),(2 0,8 0),(8 0,10 0))"
    # nothing to node: single piece unwraps to LINESTRING
    assert _n("LINESTRING(0 0,5 5)") == "LINESTRING(0 0,5 5)"


def test_makevalid_goldens():
    # bowtie splits into its two lobes
    assert _mv("POLYGON((0 0,2 2,2 0,0 2,0 0))") == \
        "MULTIPOLYGON(((0 0,1 1,0 2,0 0)),((1 1,2 0,2 2,1 1)))"
    # valid input round-trips (incl. a hole)
    for w in ("POLYGON((0 0,10 0,10 10,0 10,0 0))",
              "POLYGON((0 0,10 0,10 10,0 10,0 0),(4 4,4 6,6 6,6 4,4 4))"):
        assert _mv(w) == w
    # zero-area spike dropped from the repaired ring
    assert _mv("POLYGON((0 0,4 0,4 4,2 4,2 2,2 4,0 4,0 0))") == \
        "POLYGON((0 0,4 0,4 4,2 4,0 4,0 0))"
    # figure-8 pinch at a vertex -> two squares
    assert _mv("POLYGON((0 0,2 0,2 2,0 2,0 0,-2 0,-2 -2,0 -2,0 0))") == \
        "MULTIPOLYGON(((0 0,2 0,2 2,0 2,0 0)),((-2 -2,0 -2,0 0,-2 0,-2 -2)))"
    # non-areal passthrough
    assert _mv("LINESTRING(0 0,1 1)") == "LINESTRING(0 0,1 1)"


def test_makevalid_area_identities():
    # hole hanging over the shell edge: even-odd keeps the outside lobe
    g = make_valid(from_wkt(
        "POLYGON((0 0,10 0,10 10,0 10,0 0),(8 4,12 4,12 6,8 6,8 4))"))
    assert g.typ == "MultiPolygon" and abs(area(g) - 100.0) < 1e-9
    # overlapping multipolygon members XOR (linework-method behavior)
    g = make_valid(from_wkt(
        "MULTIPOLYGON(((0 0,4 0,4 4,0 4,0 0)),((2 2,6 2,6 6,2 6,2 2)))"))
    assert abs(area(g) - 24.0) < 1e-9


def test_spark_surface(spark):
    from datafusion_geo_spark.functions import (register_all, st_astext,
                                                st_geomfromtext,
                                                st_makevalid, st_node)
    df = spark.createDataFrame(
        [("POLYGON((0 0,2 2,2 0,0 2,0 0))",
          "MULTILINESTRING((0 0,10 0),(5 -5,5 5))")], "p string, l string")
    r = df.select(
        st_astext(st_makevalid(st_geomfromtext(F.col("p")))).alias("mv"),
        st_astext(st_node(st_geomfromtext(F.col("l")))).alias("nd")
    ).collect()[0]
    assert r["mv"].startswith("MULTIPOLYGON")
    assert r["nd"].count("LINESTRING") == 1 and r["nd"].count("(5 0") >= 2
    register_all(spark)
    row = spark.sql("SELECT ST_AsText(ST_MakeValid(ST_GeomFromText("
                    "'POLYGON((0 0,1 0,1 1,0 1,0 0))'))) AS v").collect()[0]
    assert row["v"] == "POLYGON((0 0,1 0,1 1,0 1,0 0))"


def test_makevalid_output_is_always_valid_fuzz():
    """r9 fuzz finding: ~3.5% of random garbage polygons produced
    INVALID make_valid output — kept faces could share boundary
    segments (MultiPolygon members may only touch at points) and
    traced face rings could revisit a vertex (point-pinched ring).
    make_valid now dissolves even-multiplicity segments and splits
    pinched rings into point-touching lobes. Fixed-seed fuzz (500
    cases) + the three recorded counterexample classes."""
    import random

    from datafusion_geo_spark.geo.noding import make_valid
    from datafusion_geo_spark.geo.geom import Geometry
    from datafusion_geo_spark.geo.validity import is_valid, is_valid_reason
    from datafusion_geo_spark.geo.wkt import from_wkt, to_wkt

    for wkt in (
        # adjacent kept faces shared a segment (needed DISSOLVE)
        "POLYGON((4 2,-2 -2,-1 3,-1 -2,-1 -1,4 2))",
        "POLYGON((-5 -4,0 -1,-2 -5,-2 4,-4 -4,2 -4,-5 -4))",
        # pinched shell ring (needed UNPINCH)
        "POLYGON((-1 2,-5 4,-5 -5,1 -2,-2 0,-2 -2,-1 2))",
        # both repairs + a hole ring
        "POLYGON((-3 -1,-3 -2,3 3,-1 4,1 4,1 0,-3 -1),"
        "(-3 3,2 -4,-5 -4,-3 5,-3 3))",
    ):
        mv = make_valid(from_wkt(wkt))
        assert mv.is_empty() or is_valid(mv), \
            (wkt, to_wkt(mv), is_valid_reason(mv))

    rng = random.Random(20260815)
    for _ in range(500):
        rings = []
        for _ in range(rng.choice([1, 1, 1, 2])):
            pts = [(float(rng.randint(-5, 5)), float(rng.randint(-5, 5)))
                   for _ in range(rng.randint(3, 6))]
            rings.append(pts + [pts[0]])
        g = Geometry("Polygon", rings)
        mv = make_valid(g)
        assert mv.is_empty() or is_valid(mv), \
            (to_wkt(g), to_wkt(mv), is_valid_reason(mv))
