"""Sliding-window document chunking (operators/text.py
chunk_documents): window/stride arithmetic, truncation, short and
empty documents, coverage, and validation.
"""

import pytest

from datafusion_geo_spark.operators.text import chunk_documents


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_window_stride_and_truncation(spark):
    df = _docs(spark, [(1, "t0 t1 t2 t3 t4 t5 t6")])  # 7 tokens
    out = sorted(chunk_documents(df, size=3, stride=2).collect(),
                 key=lambda r: r.chunk_id)
    got = [(r.chunk_id, r.n_tokens, r.chunk_text) for r in out]
    assert got == [(0, 3, "t0 t1 t2"), (1, 3, "t2 t3 t4"),
                   (2, 3, "t4 t5 t6")]


def test_short_empty_and_whitespace_docs(spark):
    df = _docs(spark, [(1, "only two"), (2, ""), (3, "   "),
                       (4, "exactly three tokens")])
    out = chunk_documents(df, size=3, stride=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {1, 4}  # empty/whitespace docs emit nothing
    assert len(by_doc[1]) == 1 and by_doc[1][0].chunk_text == "only two"
    assert len(by_doc[4]) == 1 and by_doc[4][0].n_tokens == 3


def test_every_token_covered(spark):
    text = " ".join(f"w{i}" for i in range(101))
    df = _docs(spark, [(1, text)])
    out = chunk_documents(df, size=16, stride=11).collect()
    seen = set()
    for r in out:
        seen.update(r.chunk_text.split(" "))
    assert seen == {f"w{i}" for i in range(101)}
    # overlap: consecutive chunks share size - stride = 5 tokens
    chunks = {r.chunk_id: r.chunk_text.split(" ")
              for r in out}
    for i in range(len(chunks) - 1):
        assert chunks[i][11:] == chunks[i + 1][:5]


def test_validation(spark):
    df = _docs(spark, [(1, "a b")])
    for kw in (dict(size=0), dict(stride=0), dict(size=4, stride=5)):
        with pytest.raises(ValueError):
            chunk_documents(df, **kw)
