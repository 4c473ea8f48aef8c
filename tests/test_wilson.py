"""wilson_ci (operators/evals.py): hand intervals + fuzz against a
direct Python reference of the Wilson score formula."""

import math

from datafusion_geo_spark.operators.evals import wilson_ci


def _r6(x):
    sign = -1.0 if x < 0 else 1.0
    return sign * math.floor(abs(x) * 1e6 + 0.5) / 1e6 + 0.0


def _ref(flags):
    flags = [f for f in flags if f is not None]
    n, k = len(flags), sum(flags)
    if n == 0:
        return (0, 0, None, None, None)
    z = 196.0 / 100.0
    p = k / n
    denom = 1.0 + z * z / n
    center = (p + z * z / (2.0 * n)) / denom
    half = (z * math.sqrt(p * (1.0 - p) / n
                          + z * z / (4.0 * n * n)) / denom)
    return (n, k, _r6(p), _r6(center - half), _r6(center + half))


def _run(spark, flags):
    df = spark.createDataFrame([(f,) for f in flags], "f int")
    r = wilson_ci(df, "f").collect()[0]
    return (r.n, r.k, r.p, r.ci_lo, r.ci_hi)


def test_bounds_stay_in_unit_interval(spark):
    got = _run(spark, [1] * 10)          # k == n
    assert got == _ref([1] * 10)
    assert got[4] <= 1.0 and got[3] > 0.7
    got0 = _run(spark, [0] * 10)         # k == 0
    assert got0 == _ref([0] * 10)
    assert got0[3] == 0.0 and got0[4] < 0.3


def test_nulls_and_empty(spark):
    flags = [1, 0, None, 1]
    assert _run(spark, flags) == _ref(flags)
    r = wilson_ci(spark.createDataFrame([], "f int"), "f") \
        .collect()[0]
    assert (r.n, r.k, r.p, r.ci_lo, r.ci_hi) == (0, 0, None,
                                                 None, None)


def test_grouped(spark):
    rows = [("a", 1), ("a", 0), ("b", 1), ("b", 1)]
    df = spark.createDataFrame(rows, "g string, f int")
    got = {r.g: (r.n, r.k, r.p, r.ci_lo, r.ci_hi)
           for r in wilson_ci(df, "f", ("g",)).collect()}
    assert got == {"a": _ref([1, 0]), "b": _ref([1, 1])}


def test_wilson_fuzz(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=12, deadline=None)
    @given(st.lists(st.integers(0, 1), min_size=1, max_size=60))
    def run(flags):
        got = _run(spark, flags)
        assert got == _ref(flags)
        assert 0.0 <= got[3] <= got[2] <= got[4] <= 1.0

    run()
