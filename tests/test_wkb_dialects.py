"""Foreign WKB dialect ingest (geo/dialect.py + st_geomfromwkb dialect=).

Round-trips per dialect mirror the reference's tagged decode surface
(/root/reference/src/geo/dialect.rs:5-29). Python-level tests construct
each dialect's framing from its public spec and verify decode → internal
model → canonical EWKB; one Spark test drives the column function.
"""

import struct

import pytest

from datafusion_geo_spark.geo.dialect import (from_dialect, from_geopackage,
                                              from_mysql, from_spatialite,
                                              to_dialect)
from datafusion_geo_spark.geo.wkb import from_wkb, to_wkb
from datafusion_geo_spark.geo.wkt import from_wkt, to_wkt

SAMPLES = [
    "POINT(10 20)",
    "LINESTRING(0 0,1 1,2 0)",
    "POLYGON((0 0,4 0,4 4,0 4,0 0),(1 1,2 1,2 2,1 2,1 1))",
    "MULTIPOINT(0 0,1 2)",
    "MULTILINESTRING((0 0,1 1),(2 2,3 3))",
    "MULTIPOLYGON(((0 0,1 0,1 1,0 1,0 0)),((5 5,6 5,6 6,5 6,5 5)))",
    "GEOMETRYCOLLECTION(POINT(1 2),LINESTRING(0 0,1 1))",
]


@pytest.mark.parametrize("dialect", ["wkb", "ewkb", "geopackage", "mysql",
                                     "spatialite", "tagged"])
@pytest.mark.parametrize("wkt", SAMPLES)
def test_roundtrip(dialect, wkt):
    g = from_wkt(wkt)
    blob = to_dialect(g, dialect)
    back = from_dialect(blob, dialect)
    assert to_wkt(back) == to_wkt(g)
    assert back.srid is None


@pytest.mark.parametrize("dialect", ["geopackage", "mysql", "spatialite",
                                     "tagged"])
def test_roundtrip_srid(dialect):
    g = from_wkt("POINT(3 4)").with_srid(4326)
    back = from_dialect(to_dialect(g, dialect), dialect)
    assert back.srid == 4326
    assert to_wkt(back) == "POINT(3 4)"


def test_auto_sniff():
    g = from_wkt("LINESTRING(0 0,5 5)")
    for d in ("wkb", "geopackage", "spatialite"):
        assert to_wkt(from_dialect(to_dialect(g, d), "auto")) == to_wkt(g)


def test_geopackage_envelope_contents():
    # envelope written as [minx, maxx, miny, maxy] (OGC 12-128r17 §2.1.3)
    g = from_wkt("LINESTRING(1 10,3 40)")
    blob = to_dialect(g, "geopackage")
    assert blob[:2] == b"GP"
    env = struct.unpack_from("<4d", blob, 8)
    assert env == (1.0, 3.0, 10.0, 40.0)
    assert from_geopackage(blob).bounds() == (1.0, 10.0, 3.0, 40.0)


def test_geopackage_big_endian_header():
    # flags bit0=0 → header ints big-endian; body is standard WKB
    inner = to_wkb(from_wkt("POINT(7 8)"))
    blob = b"GP" + bytes([0]) + bytes([0x00]) + struct.pack(">i", 27700) + inner
    g = from_geopackage(blob)
    assert g.srid == 27700 and to_wkt(g) == "POINT(7 8)"


def test_spatialite_framing():
    blob = to_dialect(from_wkt("POINT(1 2)").with_srid(4326), "spatialite")
    assert blob[0] == 0x00 and blob[-1] == 0xFE and blob[38] == 0x7C
    assert struct.unpack_from("<i", blob, 2)[0] == 4326
    # MBR is minx,miny,maxx,maxy
    assert struct.unpack_from("<4d", blob, 6) == (1.0, 2.0, 1.0, 2.0)


def test_spatialite_entity_markers():
    blob = to_dialect(from_wkt("MULTIPOINT(0 0,1 1)"), "spatialite")
    # two 0x69 entity markers, one per sub-geometry
    assert blob[43 + 4] == 0x69
    g = from_spatialite(blob)
    assert to_wkt(g) == "MULTIPOINT(0 0,1 1)"


def test_mysql_prefix():
    blob = to_dialect(from_wkt("POINT(9 9)").with_srid(3857), "mysql")
    assert struct.unpack_from("<I", blob, 0)[0] == 3857
    assert blob[4] == 1  # inner standard WKB, little-endian marker
    assert from_mysql(blob).srid == 3857


def test_tagged_matches_reference_tag_values():
    # reference tag bytes: 1 WKB, 2 EWKB, 3 GPKG, 4 MySQL, 5 SpatiaLite
    g = from_wkt("POINT(5 6)")
    assert to_dialect(g, "tagged")[0] == 2  # canonical write = EWKB
    for tag, d in [(1, "wkb"), (3, "geopackage"), (4, "mysql"),
                   (5, "spatialite")]:
        blob = bytes([tag]) + to_dialect(g, d)
        assert to_wkt(from_dialect(blob, "tagged")) == "POINT(5 6)"


def test_spatialite_empty_geometry_decodes():
    # 48-byte minimum well-formed blob: empty LINESTRING (zero count)
    blob = (struct.pack("<BBi", 0x00, 1, 4326) + struct.pack("<4d", 0, 0, 0, 0)
            + bytes([0x7C]) + struct.pack("<II", 2, 0) + bytes([0xFE]))
    assert len(blob) == 48
    g = from_spatialite(blob)
    assert g.typ == "LineString" and g.is_empty() and g.srid == 4326
    # truncated body past framing still raises ValueError, not struct.error
    bad = (struct.pack("<BBi", 0x00, 1, 0) + struct.pack("<4d", 0, 0, 0, 0)
           + bytes([0x7C]) + struct.pack("<II", 2, 5) + bytes([0xFE]))
    with pytest.raises(ValueError):
        from_spatialite(bad)


def test_malformed_blobs_raise():
    with pytest.raises(ValueError):
        from_geopackage(b"XX" + b"\x00" * 10)
    with pytest.raises(ValueError):
        from_spatialite(b"\x00" + b"\x01" * 50)  # no 0xFE end
    with pytest.raises(ValueError):
        from_mysql(b"\x00\x00")
    with pytest.raises(ValueError):
        from_dialect(b"\x09" + to_wkb(from_wkt("POINT(0 0)")), "tagged")


def test_spark_column_function(spark):
    import pyspark.sql.functions as F
    from datafusion_geo_spark.functions import st_astext, st_geomfromwkb, st_srid

    rows = [(to_dialect(from_wkt(w).with_srid(4326), "geopackage"),)
            for w in SAMPLES]
    df = spark.createDataFrame(rows, "blob binary")
    out = (df.select(
        st_astext(st_geomfromwkb(F.col("blob"), dialect="geopackage"))
        .alias("wkt"),
        st_srid(st_geomfromwkb(F.col("blob"), dialect="geopackage"))
        .alias("srid"))
        .collect())
    assert [r["wkt"] for r in out] == [to_wkt(from_wkt(w)) for w in SAMPLES]
    assert all(r["srid"] == 4326 for r in out)


def test_sql_udf(spark):
    from datafusion_geo_spark.functions import register_all
    register_all(spark)
    blob = to_dialect(from_wkt("POINT(2 3)").with_srid(31370), "spatialite")
    spark.createDataFrame([(blob,)], "b binary").createOrReplaceTempView(
        "dialect_blobs")
    row = spark.sql(
        "SELECT ST_AsEWKT(ST_GeomFromWKBDialect(b, 'spatialite')) AS e "
        "FROM dialect_blobs").collect()[0]
    assert row["e"] == "SRID=31370;POINT(2 3)"
