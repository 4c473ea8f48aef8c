"""Binary (1-bit) embedding quantization + Hamming top-k
(operators/similarity.py binary_quantize / hamming_topk): exact bit
packing (32 dims per int64 word), integer Hamming distances, and
deterministic ranking.
"""

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
