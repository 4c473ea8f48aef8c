"""logrank_test (operators/evals.py): hand cases + fuzz against a
direct Python reference of the per-time micro-rounded O-E/V sums."""

import math

from datafusion_geo_spark.operators.evals import logrank_test
import pytest


def _r6(x):
    sign = -1.0 if x < 0 else 1.0
    return sign * math.floor(abs(x) * 1e6 + 0.5) / 1e6 + 0.0


def _micro(x):
    sign = -1 if x < 0 else (0 if x == 0 else 1)
    return sign * int(math.floor(abs(x) * 1e6 + 0.5))


def _ref(rows_a, rows_b):
    """rows_*: (duration, event)."""
    hist = {}
    for grp, rows in (("a", rows_a), ("b", rows_b)):
        for t, e in rows:
            h = hist.setdefault(t, {"da": 0, "ca": 0,
                                    "db": 0, "cb": 0})
            h[("d" if e else "c") + grp] += 1
    na = len(rows_a)
    nb = len(rows_b)
    rem_a = rem_b = 0
    oem = vm = dda = ddb = 0
    for t in sorted(hist):
        h = hist[t]
        ra, rb = na - rem_a, nb - rem_b
        n, d = ra + rb, h["da"] + h["db"]
        oem += _micro((h["da"] * n - d * ra) / n)
        if n > 1:
            vm += _micro(d * (ra / n) * (rb / n)
                         * ((n - d) / (n - 1)))
        dda += h["da"]
        ddb += h["db"]
        rem_a += h["da"] + h["ca"]
        rem_b += h["db"] + h["cb"]
    chi2 = (_r6((oem / 1e6) * (oem / 1e6) / (vm / 1e6))
            if vm > 0 else None)
    return (na, nb, dda, ddb, oem, vm, chi2)


def _run(spark, rows_a, rows_b):
    rows = [("a", t, e) for t, e in rows_a] + \
           [("b", t, e) for t, e in rows_b] + \
           [("x", 1, 1), ("a", None, 1), ("b", 2, None)]
    df = spark.createDataFrame(rows, "g string, t long, e int")
    r = logrank_test(df, "t", "e", "g", "a", "b").collect()[0]
    return (r.n_a, r.n_b, r.d_a, r.d_b, r.oe_micro, r.v_micro,
            r.chi2)


def test_identical_curves_zero(spark):
    rows = [(1, 1), (2, 0), (3, 1)]
    got = _run(spark, rows, rows)
    assert got == _ref(rows, rows)
    assert got[6] == 0.0         # symmetric -> O-E exactly 0


def test_clearly_separated(spark):
    rows_a = [(t, 1) for t in range(1, 8)]
    rows_b = [(t + 10, 1) for t in range(1, 8)]
    got = _run(spark, rows_a, rows_b)
    assert got == _ref(rows_a, rows_b)
    assert got[6] > 8            # strongly significant


def test_censoring_and_singleton_risk(spark):
    rows_a = [(1, 1), (5, 0)]
    rows_b = [(2, 0), (9, 1)]    # t=9: risk set of one
    got = _run(spark, rows_a, rows_b)
    assert got == _ref(rows_a, rows_b)


@pytest.mark.slow
def test_logrank_fuzz(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    row = st.tuples(st.integers(1, 8), st.integers(0, 1))
    vals = st.lists(row, min_size=1, max_size=25)

    @settings(max_examples=12, deadline=None)
    @given(vals, vals)
    def run(a, b):
        assert _run(spark, a, b) == _ref(a, b)

    run()
