"""kaplan_meier (operators/evals.py): hand curves + fuzz against a
direct Python reference of the micro-ln folded product."""

import math

from datafusion_geo_spark.operators.evals import kaplan_meier
import pytest


def _r6(x):
    sign = -1.0 if x < 0 else 1.0
    return sign * math.floor(abs(x) * 1e6 + 0.5) / 1e6 + 0.0


def _ref(rows):
    """rows: (duration, event) with event 1=died 0=censored.
    Returns {t: (n_risk, d, c, survival)}."""
    rows = [(t, e) for t, e in rows
            if t is not None and e is not None]
    hist = {}
    for t, e in rows:
        d0, c0 = hist.get(t, (0, 0))
        hist[t] = (d0 + e, c0 + (1 - e))
    n = len(rows)
    removed = 0
    cum = 0
    cum_h = 0
    dead = False
    out = {}
    for t in sorted(hist):
        d, c = hist[t]
        n_risk = n - removed
        if d == n_risk:
            dead = True
        elif d > 0:
            ln = math.log((n_risk - d) / n_risk)
            sign = -1 if ln < 0 else (0 if ln == 0 else 1)
            cum += sign * int(math.floor(abs(ln) * 1e6 + 0.5))
        surv = 0.0 if dead else _r6(math.exp(cum / 1e6))
        cum_h += int(math.floor(d / n_risk * 1e6 + 0.5)) if d > 0 \
            else 0
        out[t] = (n_risk, d, c, surv, cum_h / 1e6)
        removed += d + c
    return out


def _run(spark, rows):
    df = spark.createDataFrame(rows, "t long, e int")
    return {r.t: (r.n_risk, r.d_events, r.n_censored, r.survival,
                  r.cum_hazard)
            for r in kaplan_meier(df, "t", "e").collect()}


def test_textbook_curve(spark):
    # classic: deaths at 1 and 3, censor at 2 — S(3) uses risk set 2
    rows = [(1, 1), (2, 0), (3, 1), (4, 0)]
    got = _run(spark, rows)
    assert got == _ref(rows)
    assert got[1][3] == 0.75
    # after censor, risk set at t=3 is 2 -> factor 1/2 -> S = 0.375
    assert abs(got[3][3] - 0.375) < 1e-6


def test_total_death_hits_zero(spark):
    rows = [(1, 1), (2, 1), (2, 1)]
    got = _run(spark, rows)
    assert got == _ref(rows)
    assert got[2][3] == 0.0


def test_censor_only_stays_flat(spark):
    rows = [(5, 0), (9, 0), (None, 1), (3, None)]
    got = _run(spark, rows)
    assert got == _ref(rows)
    assert all(v[3] == 1.0 for v in got.values())


@pytest.mark.slow
def test_km_fuzz(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    row = st.tuples(st.integers(1, 10), st.integers(0, 1))

    @settings(max_examples=12, deadline=None)
    @given(st.lists(row, min_size=1, max_size=50))
    def run(rows):
        got = _run(spark, rows)
        ref = _ref(rows)
        assert got == ref
        # survival is non-increasing over time
        ts = sorted(got)
        assert all(got[a][3] >= got[b][3]
                   for a, b in zip(ts, ts[1:]))

    run()
