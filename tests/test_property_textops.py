"""Property tests for the round-6 text hygiene operators:
split_sentences against a pure-Python reference of the same
inject/split/trim semantics, normalize_text invariants (idempotence,
NFC-ness, collapsed whitespace) on adversarial unicode."""

import re
import unicodedata

from hypothesis import given, settings, strategies as st

from datafusion_geo_spark.operators.normalize import normalize_text
from datafusion_geo_spark.operators.text import split_sentences
import pytest

_SENT_ALPHABET = "ab .!?"


def _ref_split(text):
    marked = re.sub(r"([.!?]) +", "\\1\x1f", text)
    out = []
    for idx, raw in enumerate(marked.split("\x1f")):
        sent = raw.strip(" ")
        if sent != "":
            words = [w for w in re.split(r"\s+", sent.strip()) if w != ""]
            out.append((idx, sent, len(words)))
    return out


@pytest.mark.slow
@given(st.text(alphabet=_SENT_ALPHABET, min_size=1, max_size=60))
@settings(max_examples=25, deadline=None)
def test_split_sentences_matches_reference(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = sorted((r.sent_idx, r.sentence, r.n_words)
                 for r in split_sentences(df).collect())
    assert got == sorted(_ref_split(text))


# combining marks, precomposed chars, tabs/newlines/runs, case
_NORM_ALPHABET = "aA zZ\t\n\u00e9e\u0301\u00dc\u0308 ."


@pytest.mark.slow
@given(st.text(alphabet=_NORM_ALPHABET, min_size=0, max_size=40))
@settings(max_examples=25, deadline=None)
def test_normalize_text_invariants(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = normalize_text(df).collect()[0]
    norm = row.norm_text
    # idempotence: normalizing the output changes nothing
    df2 = spark.createDataFrame([(1, norm)], "doc_id long, text string")
    row2 = normalize_text(df2).collect()[0]
    assert row2.norm_text == norm and row2.changed == 0
    # invariants of the normal form
    assert norm == norm.strip()
    assert "  " not in norm and "\t" not in norm and "\n" not in norm
    assert unicodedata.is_normalized("NFC", norm)
    assert norm == norm.lower()
    assert row.n_after == len(norm)


# CSV-hostile alphabet: quotes, commas, newlines, spaces, padding
_CSV_ALPHABET = 'ab,"\n x'


@given(st.lists(st.text(alphabet=_CSV_ALPHABET, min_size=1,
                        max_size=20)
                .filter(lambda s: s.strip(" ") != ""),
                min_size=1, max_size=8))
@settings(max_examples=10, deadline=None)
def test_csv_roundtrip_hostile_property(spark, texts):
    import os
    from datafusion_geo_spark.sources.rowio import (read_csv_rfc4180,
                                                    write_csv_rfc4180)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache", "rowio_tests", "prop")
    rows = [(i, s) for i, s in enumerate(texts)]
    df = spark.createDataFrame(rows, "k long, s string")
    write_csv_rfc4180(df, path)
    back = read_csv_rfc4180(spark, path, "k long, s string")
    assert sorted((r.k, r.s) for r in back.collect()) == sorted(rows)


@given(st.lists(st.text(alphabet="abc ", min_size=0, max_size=200),
                min_size=1, max_size=4))
@settings(max_examples=10, deadline=None)
def test_chunk_udtf_equals_array_chunker(spark, texts):
    """The @udtf chunker and the higher-order-array chunker must agree
    on arbitrary word streams (the gate proves it on the fixture; this
    generalizes it), including >1-chunk and whitespace-run inputs."""
    from datafusion_geo_spark.operators.dedup import chunk_documents
    from datafusion_geo_spark.operators.udtfs import ChunkUDTF
    rows = [(i, t) for i, t in enumerate(texts) if t.split()]
    if not rows:
        return
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fast = sorted((r.doc_id, r.chunk_idx, r.chunk_text, r.n_tokens)
                  for r in chunk_documents(df).collect())
    spark.udtf.register("chunk_udtf_p", ChunkUDTF)
    df.createOrReplaceTempView("_cu_prop")
    slow = sorted((r.doc_id, r.chunk_idx, r.chunk_text, r.n_tokens)
                  for r in spark.sql("""
        SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens
        FROM _cu_prop d, LATERAL chunk_udtf_p(d.text) c""").collect())
    assert fast == slow


def test_wrs_topn_is_weight_proportional_and_deterministic(spark):
    """A-ES sanity: (a) two runs agree exactly; (b) with one stratum
    where a few rows carry overwhelming weight, those rows win the
    race (weight-proportionality in the regime where it is nearly
    deterministic); (c) ranks are 1..n with unique keys."""
    import pyspark.sql.functions as F

    from datafusion_geo_spark.operators.sampling import wrs_topn
    rows = [(i, "s", 1_000_000 if i < 3 else 1) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w long")
    a = wrs_topn(df, "source", "doc_id", F.col("w"), n=3).collect()
    b = wrs_topn(df, "source", "doc_id", F.col("w"), n=3).collect()
    assert a == b
    winners = {r["doc_id"] for r in a}
    assert winners == {0, 1, 2}
    assert sorted(r["rank"] for r in a) == [1, 2, 3]


def test_zipf_fit_orders_natural_vs_uniform(spark):
    """Zipf sanity: a 1/r-frequency corpus fits slope near -1; a
    uniform-frequency corpus fits slope ~0 — the fit must separate
    them (natural text vs templated boilerplate)."""
    import pyspark.sql.functions as F  # noqa: F401

    from datafusion_geo_spark.operators.text import zipf_fit
    zipfy = " ".join(f"w{r}" for r in range(1, 40) for _ in range(40 // r))
    flat = " ".join(f"u{r}" for r in range(1, 40) for _ in range(5))
    df = spark.createDataFrame(
        [(1, zipfy, "zipf"), (2, flat, "flat")],
        "doc_id long, text string, source string")
    got = {r["source"]: r for r in zipf_fit(df, top_n=30).collect()}
    assert got["zipf"]["slope"] < -0.8
    assert abs(got["flat"]["slope"]) < 0.05
