"""mauve_eval (operators/similarity.py): divergence-frontier AUC over
a shared k-means quantization — identical samples score exactly 1,
disjoint supports collapse toward 0, and the doubled scaled AUC is an
exact int64 (the oracle-hashable output).
"""

import math

import pytest

from datafusion_geo_spark.operators.similarity import (mauve_eval,
                                                       prenorm)

# two orthogonal "clusters" as a hand-fitted quantizer
FITTED = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]


def _vecs(spark, rows):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rows)],
        "vec_id long, embedding array<double>")
    return prenorm(df)


def test_identical_samples_score_one(spark):
    rows = [[1.0, 0.1], [0.9, 0.2], [0.1, 1.0], [0.2, 0.8]]
    p = _vecs(spark, rows)
    r = mauve_eval(p, p, FITTED).collect()[0]
    assert r.mauve == 1.0
    assert r.area2_scaled == 2 * 10 ** 12
    assert r.n_p == r.n_q == 4 and r.k_clusters == 2


def test_disjoint_supports_score_near_zero(spark):
    p = _vecs(spark, [[1.0, 0.0], [0.9, 0.1], [1.0, 0.2]])
    q = _vecs(spark, [[0.0, 1.0], [0.1, 0.9], [0.2, 1.0]])
    r = mauve_eval(p, q, FITTED).collect()[0]
    # disjoint: KL(P||R)=ln(1/lam), x=(1-lam)^c, y=lam^c — tiny AUC
    assert 0.0 < r.mauve < 0.05
    # replay the closed form in python ints (same micro discipline)
    def m(v):
        return int(math.copysign(
            math.floor(abs(v) * 1e6 + 0.5), v))
    pts = []
    for j in range(1, 20):
        lam = j / 20.0
        klp = m(1.0 * math.log(1.0 / (lam * 1.0)))
        klq = m(1.0 * math.log(1.0 / ((1.0 - lam) * 1.0)))
        x = math.floor(math.exp(-5.0 * klq / 1e6) * 1e6 + 0.5)
        y = math.floor(math.exp(-5.0 * klp / 1e6) * 1e6 + 0.5)
        pts.append((x, y))
    area2 = (10 ** 6 - pts[0][0]) * pts[0][1]
    for a, b in zip(pts, pts[1:]):
        area2 += (a[0] - b[0]) * (a[1] + b[1])
    area2 += pts[-1][0] * (pts[-1][1] + 10 ** 6)
    assert r.area2_scaled == area2


def test_partial_overlap_in_between(spark):
    p = _vecs(spark, [[1.0, 0.0]] * 6 + [[0.0, 1.0]] * 2)
    q = _vecs(spark, [[1.0, 0.0]] * 2 + [[0.0, 1.0]] * 6)
    r = mauve_eval(p, q, FITTED).collect()[0]
    assert 0.05 < r.mauve < 1.0
    # symmetric construction -> swapping P and Q gives the same score
    r2 = mauve_eval(q, p, FITTED).collect()[0]
    assert r2.mauve == r.mauve


def test_grid_validation(spark):
    p = _vecs(spark, [[1.0, 0.0]])
    with pytest.raises(ValueError, match="grid"):
        mauve_eval(p, p, FITTED, grid=1)
