"""spearman_corr (operators/evals.py): hand cases + fuzz against a
direct Python reference of the tie-aware centered-even-rank form."""

import math
from collections import Counter

from datafusion_geo_spark.operators.evals import spearman_corr
import pytest


def _r6(x):
    if x is None:
        return None
    sign = -1.0 if x < 0 else 1.0
    return sign * math.floor(abs(x) * 1e6 + 0.5) / 1e6 + 0.0


def _ref(pairs):
    pairs = [(x, y) for x, y in pairs
             if x is not None and y is not None]
    n = len(pairs)

    def cranks(vals):
        cnt = Counter(vals)
        out, cum = {}, 0
        for v in sorted(cnt):
            out[v] = 2 * cum + cnt[v] - n
            cum += cnt[v]
        return out

    rx = cranks([x for x, _ in pairs])
    ry = cranks([y for _, y in pairs])
    suv = sum(rx[x] * ry[y] for x, y in pairs)
    suu = sum(rx[x] ** 2 for x, _ in pairs)
    svv = sum(ry[y] ** 2 for _, y in pairs)
    rho = (suv / math.sqrt(float(suu) * float(svv))
           if suu > 0 and svv > 0 else None)
    return (n, suv, suu, svv, _r6(rho))


def _run(spark, pairs):
    df = spark.createDataFrame(pairs, "x long, y long")
    r = spearman_corr(df, "x", "y").collect()[0]
    return (r.n_rows, r.suv_num, r.suu_num, r.svv_num, r.rho)


def test_perfect_monotone(spark):
    pairs = [(i, i * i) for i in range(10)]
    got = _run(spark, pairs)
    assert got == _ref(pairs) and got[4] == 1.0
    rev = [(i, -i * i) for i in range(10)]
    assert _run(spark, rev)[4] == -1.0


def test_ties_and_nulls(spark):
    pairs = [(1, 5), (1, 7), (2, 5), (2, 9), (3, 9),
             (None, 1), (4, None)]
    assert _run(spark, pairs) == _ref(pairs)


def test_zero_variance_is_null(spark):
    pairs = [(1, 3), (1, 4), (1, 5)]
    got = _run(spark, pairs)
    assert got[4] is None and got[2] == 0


@pytest.mark.slow
def test_spearman_fuzz(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    pair = st.tuples(st.integers(-8, 8), st.integers(-8, 8))

    @settings(max_examples=12, deadline=None)
    @given(st.lists(pair, min_size=1, max_size=60))
    def run(pairs):
        got = _run(spark, pairs)
        ref = _ref(pairs)
        assert got == ref
        if got[4] is not None:
            assert -1.0 <= got[4] <= 1.0

    run()
