"""corr_matrix (operators/profile.py): exact-moment Pearson matrix."""

import math

import pytest

from datafusion_geo_spark.operators.profile import corr_matrix


def test_matrix_matches_scalar_formula(spark):
    import random
    rng = random.Random(5)
    rows = [(rng.randint(0, 50), rng.randint(0, 10),
             rng.randint(-5, 5)) for _ in range(200)]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    got = {(r.col_x, r.col_y): r for r in
           corr_matrix(df, ["a", "b", "c"]).collect()}
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}

    def ref(i, j):
        n = len(rows)
        sx = sum(r[i] for r in rows); sy = sum(r[j] for r in rows)
        sxy = sum(r[i] * r[j] for r in rows)
        sxx = sum(r[i] ** 2 for r in rows)
        syy = sum(r[j] ** 2 for r in rows)
        cov = n * sxy - sx * sy
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        v = cov / math.sqrt(float(vx) * float(vy))
        s = -1.0 if v < 0 else 1.0
        return cov, vx, vy, s * math.floor(abs(v) * 1e6 + 0.5) / 1e6

    for (ci, cj), idx in ((("a", "b"), (0, 1)), (("a", "c"), (0, 2)),
                          (("b", "c"), (1, 2))):
        r = got[(ci, cj)]
        cov, vx, vy, corr = ref(*idx)
        assert (r.cov_num, r.varx_num, r.vary_num) == (cov, vx, vy)
        assert r.corr == corr
        assert r.n_rows == 200


def test_zero_variance_null_and_validation(spark):
    df = spark.createDataFrame([(1, 1), (1, 2), (1, 3)],
                               "a long, b long")
    out = corr_matrix(df, ["a", "b"]).collect()[0]
    assert out.corr is None and out.varx_num == 0
    with pytest.raises(ValueError, match="at least 2"):
        corr_matrix(df, ["a"])
