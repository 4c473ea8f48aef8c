"""Property tests for the round-6 text hygiene operators:
split_sentences against a pure-Python reference of the same
inject/split/trim semantics, normalize_text invariants (idempotence,
NFC-ness, collapsed whitespace) on adversarial unicode."""

import re
import unicodedata

from hypothesis import given, settings, strategies as st

from datafusion_geo_spark.operators.normalize import normalize_text
from datafusion_geo_spark.operators.text import split_sentences

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


@given(st.text(alphabet=_SENT_ALPHABET, min_size=1, max_size=60))
@settings(max_examples=25, deadline=None)
def test_split_sentences_matches_reference(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = sorted((r.sent_idx, r.sentence, r.n_words)
                 for r in split_sentences(df).collect())
    assert got == sorted(_ref_split(text))


# combining marks, precomposed chars, tabs/newlines/runs, case
_NORM_ALPHABET = "aA zZ\t\n\u00e9e\u0301\u00dc\u0308 ."


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
