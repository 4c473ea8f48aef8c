"""DE-9IM matrix (ST_Relate / ST_RelateMatch) — golden matrices derived
by hand from the OGC point-set definitions (and matching PostGIS on the
classic textbook pairs), consistency with the boolean predicate family,
and the SQL surface."""

import pytest

from datafusion_geo_spark.geo import relate as relmod
from datafusion_geo_spark.geo.algos import covers, equals, intersects
from datafusion_geo_spark.geo.de9im import relate, relate_match
from datafusion_geo_spark.geo.wkt import from_wkt

A = "POLYGON((0 0,2 0,2 2,0 2,0 0))"

GOLDEN = [
    # polygon vs point: boundary / interior / outside
    (A, "POINT(2 1)", "FF20F1FF2"),
    (A, "POINT(1 1)", "0F2FF1FF2"),
    (A, "POINT(5 5)", "FF2FF10F2"),
    # polygon vs line: edge ride, crossing, inside
    (A, "LINESTRING(0 0,2 0)", "FF2101FF2"),
    ("LINESTRING(-1 1,3 1)", A, "101FF0212"),
    ("LINESTRING(0.5 0.5,1.5 1.5)", A, "1FF0FF212"),
    # polygon vs polygon: overlap, equal, touch, disjoint, containment
    (A, "POLYGON((1 1,3 1,3 3,1 3,1 1))", "212101212"),
    (A, A, "2FFF1FFF2"),
    (A, "POLYGON((2 0,4 0,4 2,2 2,2 0))", "FF2F11212"),
    (A, "POLYGON((5 5,6 5,6 6,5 6,5 5))", "FF2FF1212"),
    (A, "POLYGON((0.5 0.5,1.5 0.5,1.5 1.5,0.5 1.5,0.5 0.5))", "212FF1FF2"),
    # line vs line: cross, endpoint kiss, collinear overlap, disjoint
    ("LINESTRING(0 0,10 0)", "LINESTRING(3 -1,5 3)", "0F1FF0102"),
    ("LINESTRING(0 0,10 0)", "LINESTRING(10 0,12 5)", "FF1F00102"),
    ("LINESTRING(0 0,10 0)", "LINESTRING(4 0,12 0)", "1010F0102"),
    ("LINESTRING(0 0,10 0)", "LINESTRING(0 5,10 5)", "FF1FF0102"),
    ("LINESTRING(0 0,10 0)", "LINESTRING(2 0,5 0)", "101FF0FF2"),
    # point vs point / line
    ("POINT(1 2)", "POINT(1 2)", "0FFFFFFF2"),
    ("POINT(1 2)", "POINT(3 4)", "FF0FFF0F2"),
    ("POINT(5 0)", "LINESTRING(0 0,10 0)", "0FFFFF102"),
    ("POINT(0 0)", "LINESTRING(0 0,10 0)", "F0FFFF102"),
    # closed ring line: mod-2 rule -> no boundary
    ("LINESTRING(0 0,1 0,1 1,0 1,0 0)", "POINT(0 0)", "0F1FFFFF2"),
]


@pytest.mark.parametrize("a,b,want", GOLDEN)
def test_golden_matrices(a, b, want):
    assert relate(from_wkt(a), from_wkt(b)) == want


def test_transpose_symmetry():
    for a, b, want in GOLDEN:
        m = relate(from_wkt(b), from_wkt(a))
        t = "".join(want[3 * c + r] for r in range(3) for c in range(3))
        assert m == t, (a, b)


def test_mod2_boundary_multiline():
    # two members sharing an endpoint: the shared node is INTERIOR
    # (even count), the far ends are boundary
    ml = from_wkt("MULTILINESTRING((0 0,1 0),(1 0,2 0))")
    assert relate(ml, from_wkt("POINT(1 0)")) == "0F1FF0FF2"
    assert relate(ml, from_wkt("POINT(0 0)")) == "FF10F0FF2"


def test_predicate_consistency():
    """relate-derived pattern answers match the boolean family."""
    pairs = [(a, b) for a, b, _ in GOLDEN]
    for aw, bw in pairs:
        a, b = from_wkt(aw), from_wkt(bw)
        m = relate(a, b)
        # disjoint pattern is the definitional intersects complement
        assert relate_match(m, "FF*FF****") == (not intersects(a, b)), (aw, bw)
        # covers: no part of b touches a's exterior
        assert relate_match(m, "******FF*") == bool(covers(a, b)), (aw, bw)
        assert relate_match(m, "T*F**FFF*") == equals(a, b), (aw, bw)
        assert relate_match(m, "T*****FF*") == relmod.contains(a, b), (aw, bw)


def test_unsupported_inputs():
    gc = from_wkt("GEOMETRYCOLLECTION(POINT(0 0),LINESTRING(0 0,1 1))")
    assert relate(gc, from_wkt("POINT(0 0)")) is None
    assert relate(from_wkt("POINT(0 0)"), gc) is None


def test_empty_operand():
    e = from_wkt("LINESTRING EMPTY")
    assert relate(from_wkt(A), e) == "FF2FF1FF2"
    assert relate(e, from_wkt(A)) == "FFFFFF212"


def test_relate_match_edges():
    assert relate_match("212101212", "T*T***T**") is True
    assert relate_match("212101212", "FF*FF****") is False
    assert relate_match("FF2FF1212", "FF*FF****") is True
    assert relate_match("212101212", "212101212") is True
    assert relate_match("bad", "T********") is None
    assert relate_match("212101212", "T*******") is None  # 8 chars


def test_sql_surface(spark):
    from datafusion_geo_spark.functions import register_all
    register_all(spark)
    row = spark.sql(
        "SELECT st_relate(st_geomfromtext('%s'), st_geomfromtext('%s')) m, "
        "st_relatematch(st_relate(st_geomfromtext('%s'), "
        "st_geomfromtext('POINT(1 1)')), '0F2FF1FF2') ok" % (A, A, A)
    ).collect()[0]
    assert row["m"] == "2FFF1FFF2"
    assert row["ok"] is True


def test_dataframe_pattern_form(spark):
    import pyspark.sql.functions as F
    from datafusion_geo_spark.functions import st_geomfromtext, st_relate
    df = spark.createDataFrame(
        [(A, "POINT(1 1)"), (A, "POINT(5 5)")], "a string, b string")
    out = df.select(
        st_relate(st_geomfromtext(F.col("a")),
                  st_geomfromtext(F.col("b")), "0F2FF1FF2").alias("hit")
    ).collect()
    assert [r["hit"] for r in out] == [True, False]
