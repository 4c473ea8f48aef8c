"""phonetic_code_col / phonetic_blocks (operators/linkage.py):
standard-example pins + fuzz against a direct Python reference of
the documented simplified-Soundex variant."""

import re

import pyspark.sql.functions as F

from datafusion_geo_spark.operators.linkage import (
    phonetic_blocks, phonetic_code_col)

_MAP = "01230120022455012623010202"


def _ref_code(s):
    if s is None:
        return None
    m = re.search(r"[A-Za-z]+", s)
    if not m:
        return None
    w = m.group(0).upper()
    mapped = "".join(_MAP[ord(ch) - 65] for ch in w)
    for d in "123456":
        mapped = re.sub(d + d + "+", d, mapped)
    digits = mapped[1:].replace("0", "")
    return w[0] + (digits[:3] + "000")[:3]


def _codes(spark, names):
    df = spark.createDataFrame([(n,) for n in names], "nm string")
    return [r.c for r in
            df.select(phonetic_code_col("nm").alias("c")).collect()]


def test_standard_examples(spark):
    names = ["Robert", "Rupert", "Pfister", "Tymczak", "Jackson",
             "washington", "Lee"]
    assert _codes(spark, names) == ["R163", "R163", "P236", "T522",
                                    "J250", "W252", "L000"]


def test_documented_deviation_and_edges(spark):
    # H/W act as vowels here (ANSI Soundex would give A261);
    # non-letter strings and NULL are uncodable
    names = ["Ashcraft", "4242", "", None, "O'Brien"]
    assert _codes(spark, names) == ["A226", None, None, None, "O000"]
    assert [_ref_code(n) for n in names] == \
        ["A226", None, None, None, "O000"]


def test_phonetic_fuzz(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    name = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyzAEIOUWHY '-0123456789",
        min_size=0, max_size=14)

    @settings(max_examples=10, deadline=None)
    @given(st.lists(name, min_size=1, max_size=30))
    def run(names):
        assert _codes(spark, names) == [_ref_code(n) for n in names]

    run()


def test_phonetic_blocks(spark):
    rows = [(1, "Robert"), (2, "Rupert"), (3, "Robert"),
            (4, "Jackson"), (5, "  !!  "), (6, None)]
    df = spark.createDataFrame(rows, "id long, nm string")
    got = {r.code: (r.n, r.n_distinct_names, r.n_pairs)
           for r in phonetic_blocks(df, "nm", "id").collect()}
    assert got == {"R163": (3, 2, 3), "J250": (1, 1, 0)}


def test_phonetic_blocks_feed_fs(spark):
    """The code works as a Fellegi-Sunter block key end-to-end."""
    from datafusion_geo_spark.operators.linkage import (
        fs_score_histogram)
    rows = [(i, nm, i % 3) for i, nm in enumerate(
        ["Robert", "Rupert", "Roberts", "Jackson", "Jakson",
         "Pfister", "Fister"])]
    df = (spark.createDataFrame(rows, "id long, nm string, f long")
          .withColumn("blk", phonetic_code_col("nm")))
    out = fs_score_histogram(df, "blk", ["f"], "id").collect()
    assert sum(r.n_pairs for r in out) >= 2
