"""Positional phrase search (operators/text.py phrase_search):
consecutive-token semantics, overlap counting, no substring lies."""

import pytest

from datafusion_geo_spark.operators.text import phrase_search


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_phrase_basics(spark):
    rows = [
        (1, "the table scan is a table scan indeed"),   # 2 matches
        (2, "table   scan\nwith odd   whitespace"),     # 1 (any \s+)
        (3, "a scatter table scanner"),                 # 0: no substring
        (4, "table alone and scan alone"),              # 0: not adjacent
        (5, "scan table"),                              # 0: wrong order
    ]
    got = {r.doc_id: r.n_matches
           for r in phrase_search(_docs(spark, rows),
                                  "table scan").collect()}
    assert got == {1: 2, 2: 1}


def test_phrase_overlapping_and_single(spark):
    rows = [(1, "go go go go"), (2, "go stop go")]
    got = {r.doc_id: r.n_matches
           for r in phrase_search(_docs(spark, rows), "go go")
           .collect()}
    assert got == {1: 3}  # overlapping starts 0,1,2
    one = {r.doc_id: r.n_matches
           for r in phrase_search(_docs(spark, rows), "go").collect()}
    assert one == {1: 4, 2: 2}


def test_phrase_topk_order(spark):
    rows = [(i, " ".join(["hit hit"] * i)) for i in range(1, 6)]
    out = phrase_search(_docs(spark, rows), "hit hit", k=3).collect()
    assert [(r.doc_id, r.n_matches) for r in out] == \
        [(5, 9), (4, 7), (3, 5)]  # 2i words -> 2i-1 overlapping starts


def test_phrase_empty_raises(spark):
    with pytest.raises(ValueError, match="empty phrase"):
        phrase_search(_docs(spark, [(1, "x")]), "   ").collect()


def test_phrase_search_fuzz(spark):
    """Property: positional-intersection counts equal the sliding-
    window definition for random corpora and random phrases."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    VOCAB = ["aa", "bb", "cc", "dd"]

    @settings(max_examples=8, deadline=None)
    @given(st.data())
    def run(data):
        docs = []
        for i in range(data.draw(st.integers(1, 6), label="docs")):
            toks = data.draw(st.lists(st.sampled_from(VOCAB),
                                      min_size=0, max_size=12),
                             label=f"doc{i}")
            docs.append((i, " ".join(toks)))
        pw = data.draw(st.lists(st.sampled_from(VOCAB), min_size=1,
                                max_size=3), label="phrase")
        got = {r.doc_id: r.n_matches
               for r in phrase_search(_docs(spark, docs),
                                      " ".join(pw), k=100).collect()}
        want = {}
        for i, text in docs:
            toks = [t for t in text.split() if t]
            n = sum(1 for s in range(len(toks) - len(pw) + 1)
                    if toks[s:s + len(pw)] == pw)
            if n:
                want[i] = n
        assert got == want

    run()
