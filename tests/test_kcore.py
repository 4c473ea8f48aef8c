"""kcore_peel (operators/graph.py): hand graphs + fuzz against a
direct Python reference of the fixed-round peel."""

import pytest

from datafusion_geo_spark.operators.graph import kcore_peel


def _ref(pairs, k, rounds):
    e = {(min(a, b), max(a, b)) for a, b in pairs if a != b}

    def degs(edges):
        d = {}
        for u, v in edges:
            d[u] = d.get(u, 0) + 1
            d[v] = d.get(v, 0) + 1
        return d

    for _ in range(rounds):
        alive = {x for x, d in degs(e).items() if d >= k}
        e = {(u, v) for u, v in e if u in alive and v in alive}
    return degs(e)


def _run(spark, pairs, k, rounds):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    return {r.id: r.deg
            for r in kcore_peel(df, k, rounds).collect()}


def test_triangle_with_tail(spark):
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4)]
    got = _run(spark, pairs, 2, 2)
    assert got == {1: 2, 2: 2, 3: 2} == _ref(pairs, 2, 2)


def test_cascade_needs_rounds(spark):
    # path 1-2-3-4-5 under k=2 peels from both ends, one hop/round
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5)]
    assert _run(spark, pairs, 2, 1) == _ref(pairs, 2, 1)
    assert _run(spark, pairs, 2, 3) == {} == _ref(pairs, 2, 3)


def test_self_loops_dupes_validation(spark):
    pairs = [(1, 1), (1, 2), (2, 1), (1, 2), (2, 3), (1, 3)]
    got = _run(spark, pairs, 2, 2)
    assert got == {1: 2, 2: 2, 3: 2} == _ref(pairs, 2, 2)
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    with pytest.raises(ValueError, match="kcore_peel"):
        kcore_peel(df, 0, 1)


def test_kcore_fuzz(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    pair = st.tuples(st.integers(0, 12), st.integers(0, 12))

    @settings(max_examples=5, deadline=None)
    @given(st.lists(pair, min_size=1, max_size=40),
           st.integers(1, 3), st.integers(1, 2))
    def run(pairs, k, rounds):
        if all(a == b for a, b in pairs):
            return
        assert _run(spark, pairs, k, rounds) == \
            _ref(pairs, k, rounds)

    run()
