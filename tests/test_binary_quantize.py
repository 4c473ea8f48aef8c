"""Binary (1-bit) embedding quantization + Hamming top-k
(operators/similarity.py binary_quantize / hamming_topk): exact bit
packing (32 dims per int64 word), integer Hamming distances, and
deterministic ranking.
"""

import pytest
import pyspark.sql.functions as F

from datafusion_geo_spark.operators.similarity import (binary_quantize,
                                                       hamming_topk)


def _emb(spark, rows):
    return spark.createDataFrame(rows,
                                 "vec_id long, embedding array<double>")


def test_pack_bits_exact(spark):
    # dims 0, 2, 33 positive -> word0 bits 0,2 = 5; word1 bit 1 = 2
    v = [0.0] * 64
    v[0] = 1.0
    v[2] = 0.5
    v[33] = 3.0
    out = binary_quantize(_emb(spark, [(1, v)])).collect()[0]
    assert out.b == [5, 2]
    assert out.n_dims == 64
    # zero and negative dims never set bits
    neg = binary_quantize(_emb(spark, [(1, [-1.0, 0.0, -0.5])])) \
        .collect()[0]
    assert neg.b == [0]
    assert neg.n_dims == 3


def test_pack_high_bit_31(spark):
    v = [0.0] * 32
    v[31] = 1.0
    out = binary_quantize(_emb(spark, [(1, v)])).collect()[0]
    assert out.b == [2 ** 31]  # positive long, both engines shift it


def test_hamming_topk_exact(spark):
    # 3 corpus vectors around query 0: distances 0-free ordering
    rows = [
        (0, [1.0, -1.0, 1.0, -1.0]),   # query
        (1, [1.0, -1.0, 1.0, -1.0]),   # identical -> hamming 0
        (2, [1.0, 1.0, 1.0, -1.0]),    # 1 bit differs
        (3, [-1.0, 1.0, -1.0, 1.0]),   # 2 bits differ (only positive
                                       # bits count: q has bits {0,2},
                                       # 3 has bits {1,3} -> xor 4 bits)
    ]
    out = hamming_topk(_emb(spark, rows), k=3, max_query_id=1).collect()
    got = [(r.neighbor_id, r.hamming, r.rank) for r in
           sorted(out, key=lambda r: r.rank)]
    assert got == [(1, 0, 1), (2, 1, 2), (3, 4, 3)]


def test_hamming_tie_breaks_by_neighbor_id(spark):
    rows = [(0, [1.0, 1.0]), (5, [1.0, -1.0]), (4, [-1.0, 1.0])]
    out = hamming_topk(_emb(spark, rows), k=2, max_query_id=1).collect()
    got = [(r.neighbor_id, r.hamming) for r in
           sorted(out, key=lambda r: r.rank)]
    assert got == [(4, 1), (5, 1)]  # equal distance -> id ascending


# ---------------------------------------------------------------- join

def _brute_pairs(rows, radius):
    sign = {i: [x > 0 for x in v] for i, v in rows}
    ids = sorted(sign)
    out = set()
    for i in ids:
        for j in ids:
            if i < j:
                d = sum(a != b for a, b in zip(sign[i], sign[j]))
                if d <= radius:
                    out.add((i, j, d))
    return out


def test_hamming_join_matches_brute_force(spark):
    from datafusion_geo_spark.operators.similarity import hamming_join
    import random
    rng = random.Random(11)
    base = [[rng.choice((-1.0, 1.0)) for _ in range(16)]
            for _ in range(12)]
    rows = [(i, v) for i, v in enumerate(base)]
    # planted near-dups: flip i%4 leading dims of each vector
    for i, v in enumerate(base):
        w = list(v)
        for j in range(i % 4):
            w[j] = -w[j]
        rows.append((i + 100, w))
    got = {(r.a_id, r.b_id, r.hamming)
           for r in hamming_join(_emb(spark, rows), radius=3).collect()}
    assert got == _brute_pairs(rows, 3)
    # every planted pair with <= 3 flips is present
    for i in range(12):
        if i % 4 <= 3:
            assert any(a == i and b == i + 100 for a, b, _ in got)


def test_hamming_join_radius_zero_is_exact_dup(spark):
    from datafusion_geo_spark.operators.similarity import hamming_join
    rows = [(1, [1.0, -1.0, 1.0]), (2, [1.0, -1.0, 1.0]),
            (3, [2.0, -5.0, 0.5]),  # same SIGNS as 1/2 -> dup code
            (4, [-1.0, 1.0, 1.0])]
    got = {(r.a_id, r.b_id, r.hamming)
           for r in hamming_join(_emb(spark, rows), radius=0).collect()}
    assert got == {(1, 2, 0), (1, 3, 0), (2, 3, 0)}


def test_hamming_join_uneven_bands(spark):
    from datafusion_geo_spark.operators.similarity import hamming_join
    # d=10, radius=2 -> 3 bands of widths 3/3/4 (floor-even split);
    # a pair at EXACTLY the radius must still be found
    a = [1.0] * 10
    b = list(a)
    b[0], b[9] = -1.0, -1.0  # one flip in band 0, one in band 2
    rows = [(1, a), (2, b)]
    got = hamming_join(_emb(spark, rows), radius=2).collect()
    assert [(r.a_id, r.b_id, r.hamming) for r in got] == [(1, 2, 2)]


def test_hamming_join_validations(spark):
    from datafusion_geo_spark.operators.similarity import hamming_join
    import pytest
    df = _emb(spark, [(1, [1.0, -1.0, 1.0, -1.0])])
    with pytest.raises(ValueError, match="radius"):
        hamming_join(df, radius=-1)
    with pytest.raises(ValueError, match="pigeonhole"):
        hamming_join(df, radius=3, bands=2)
    with pytest.raises(ValueError, match="empty"):
        hamming_join(df, radius=7)  # 8 bands over 4 dims


@pytest.mark.slow
def test_hamming_join_exactness_fuzz(spark):
    """Property: for random sign corpora, dims, and radius, the
    banded join equals the brute-force radius join exactly (the
    operator's completeness + no-false-positive claim)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from datafusion_geo_spark.operators.similarity import hamming_join

    @settings(max_examples=8, deadline=None)
    @given(st.data())
    def run(data):
        d = data.draw(st.integers(4, 20), label="dims")
        radius = data.draw(st.integers(0, max(0, d - 2)),
                           label="radius")
        n = data.draw(st.integers(2, 10), label="rows")
        rows = []
        for i in range(n):
            v = [data.draw(st.sampled_from((-1.0, 0.0, 1.0)))
                 for _ in range(d)]
            rows.append((i, v))
        got = {(r.a_id, r.b_id, r.hamming)
               for r in hamming_join(_emb(spark, rows),
                                     radius=radius).collect()}
        assert got == _brute_pairs(rows, radius)

    run()
