"""RFC-4180 CSV and ORC round-trip unit tests (sources/rowio.py):
hostile characters, whitespace preservation, nested-array identity."""

import os

from datafusion_geo_spark.sources.rowio import (read_csv_rfc4180,
                                                read_orc,
                                                write_csv_rfc4180,
                                                write_orc)

_BASE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".cache", "rowio_tests")


def test_csv_roundtrip_hostile_chars(spark):
    rows = [
        (1, 'plain'),
        (2, 'comma,inside'),
        (3, 'quote"inside'),
        (4, 'doubled""quotes'),
        (5, 'line\nbreak'),
        (6, '  padded  '),
        (7, ''),
    ]
    df = spark.createDataFrame(rows, "k long, s string")
    path = os.path.join(_BASE, "hostile")
    write_csv_rfc4180(df, path)
    back = read_csv_rfc4180(spark, path, "k long, s string")
    got = {r.k: r.s for r in back.collect()}
    want = dict(rows)
    # '' is written as "" but read back as NULL (the documented
    # NULL-vs-empty CSV ambiguity) — assert the documented behavior
    want[7] = None
    assert got == want


def test_csv_roundtrip_preserves_types(spark):
    df = spark.createDataFrame([(1, 2.5, "x"), (-3, -0.125, "y")],
                               "a long, b double, c string")
    path = os.path.join(_BASE, "types")
    write_csv_rfc4180(df, path)
    back = read_csv_rfc4180(spark, path, "a long, b double, c string")
    assert sorted((r.a, r.b, r.c) for r in back.collect()) == \
        [(-3, -0.125, "y"), (1, 2.5, "x")]
    assert [f.dataType.simpleString() for f in back.schema.fields] == \
        ["bigint", "double", "string"]


def test_orc_roundtrip_nested_array(spark):
    rows = [(1, [1.5, -2.25], "a"), (2, [], "b"), (3, None, "c")]
    df = spark.createDataFrame(rows, "k long, v array<double>, s string")
    path = os.path.join(_BASE, "orc")
    write_orc(df, path)
    back = read_orc(spark, path)
    got = sorted(((r.k, r.v, r.s) for r in back.collect()))
    assert got == [(1, [1.5, -2.25], "a"), (2, [], "b"), (3, None, "c")]
