"""cuped_ttest (operators/evals.py): hand cases + fuzz against a
direct Python reference mirroring the fixed double expressions."""

import math

from datafusion_geo_spark.operators.evals import cuped_ttest
import pytest


def _r6(x):
    sign = -1.0 if x < 0 else 1.0
    return sign * math.floor(abs(x) * 1e6 + 0.5) / 1e6 + 0.0


def _ref(rows_a, rows_b):
    """rows_*: (y, x) int pairs."""
    def moments(rows):
        n = len(rows)
        return (n, sum(y for y, _ in rows), sum(x for _, x in rows),
                sum(x * y for y, x in rows),
                sum(x * x for _, x in rows),
                sum(y * y for y, _ in rows))

    na, sya, sxa, sxya, sxxa, syya = moments(rows_a)
    nb, syb, sxb, sxyb, sxxb, syyb = moments(rows_b)
    n = float(na + nb)
    sy, sx = float(sya + syb), float(sxa + sxb)
    sxy, sxx = float(sxya + sxyb), float(sxxa + sxxb)
    syy = float(syya + syyb)
    cov_n = n * sxy - sx * sy
    varx_n = n * sxx - sx * sx
    vary_n = n * syy - sy * sy
    ok = na > 1 and nb > 1 and varx_n > 0 and vary_n > 0
    if not ok:
        return (na, nb, None, None, None, None, None)
    theta = cov_n / varx_n
    xbar = sx / n

    def adj(nn, syi, sxi, sxyi, sxxi, syyi):
        ns = float(nn)
        mean_adj = (syi / ns) - theta * (sxi / ns - xbar)
        vy = (ns * syyi - float(syi) * float(syi)) / (ns * (ns - 1))
        vx = (ns * sxxi - float(sxi) * float(sxi)) / (ns * (ns - 1))
        cv = (ns * sxyi - float(sxi) * float(syi)) / (ns * (ns - 1))
        return mean_adj, vy + theta * theta * vx - 2.0 * theta * cv

    ma, va = adj(na, float(sya), float(sxa), float(sxya),
                 float(sxxa), float(syya))
    mb, vb = adj(nb, float(syb), float(sxb), float(sxyb),
                 float(sxxb), float(syyb))
    se2 = va / na + vb / nb
    t = _r6((ma - mb) / math.sqrt(se2)) if se2 > 0 else None
    v_adj_pool = vary_n + theta * theta * varx_n - 2.0 * theta * cov_n
    vr = 1.0 - v_adj_pool / vary_n
    return (na, nb, _r6(theta), _r6(ma), _r6(mb), t, _r6(vr))


def _run(spark, rows_a, rows_b):
    rows = [("a", y, x) for y, x in rows_a] + \
           [("b", y, x) for y, x in rows_b] + \
           [("other", 1, 1), ("a", None, 3), ("b", 3, None)]
    df = spark.createDataFrame(rows, "g string, y long, x long")
    r = cuped_ttest(df, "y", "x", "g", "a", "b").collect()[0]
    return (r.n_a, r.n_b, r.theta, r.mean_adj_a, r.mean_adj_b,
            r.t_cuped, r.var_reduction)


def test_covariate_removes_variance(spark):
    # y = x + noise + small lift in b: CUPED should strip x's share
    rows_a = [(x + (x % 3), x) for x in range(1, 21)]
    rows_b = [(x + (x % 3) + 2, x) for x in range(1, 21)]
    got = _run(spark, rows_a, rows_b)
    assert got == _ref(rows_a, rows_b)
    assert got[6] > 0.9          # >90% variance from the covariate
    assert got[5] is not None and got[5] < 0  # b lifted


def test_degenerate_covariate(spark):
    rows_a = [(1, 5), (2, 5)]
    rows_b = [(3, 5), (4, 5)]
    got = _run(spark, rows_a, rows_b)
    assert got == _ref(rows_a, rows_b)
    assert got[2] is None        # var(x) == 0 -> no theta


@pytest.mark.slow
def test_cuped_fuzz(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    pair = st.tuples(st.integers(-20, 20), st.integers(-10, 10))
    vals = st.lists(pair, min_size=1, max_size=25)

    @settings(max_examples=12, deadline=None)
    @given(vals, vals)
    def run(a, b):
        assert _run(spark, a, b) == _ref(a, b)

    run()
