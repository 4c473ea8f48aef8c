"""Isotonic calibration (operators/evals.py isotonic_calibrate): PAV
block structure vs the minimax definition, monotonicity, exactness."""

from fractions import Fraction

import pytest

from datafusion_geo_spark.operators.evals import isotonic_calibrate


def _scored(spark, rows):
    return spark.createDataFrame(rows, "score long, y int")


def _minimax(buckets):
    """Reference: iso[i] = max_{j<=i} min_{k>=i} weighted avg(j..k),
    in exact rationals."""
    B = len(buckets)
    out = []
    for i in range(B):
        best = None
        for j in range(i + 1):
            worst = None
            for k in range(i, B):
                n = sum(b[0] for b in buckets[j:k + 1])
                p = sum(b[1] for b in buckets[j:k + 1])
                v = Fraction(p, n)
                worst = v if worst is None else min(worst, v)
            best = worst if best is None else max(best, worst)
        out.append(best)
    return out


def test_pav_matches_minimax_on_random(spark):
    import random
    rng = random.Random(3)
    rows = []
    for s in range(12):
        for _ in range(rng.randint(1, 6)):
            rows.append((s, rng.randint(0, 1)))
    got = sorted(isotonic_calibrate(_scored(spark, rows), "score", "y")
                 .collect(), key=lambda r: r.score)
    buckets = []
    for s in sorted({r[0] for r in rows}):
        grp = [y for sc, y in rows if sc == s]
        buckets.append((len(grp), sum(grp)))
    want = _minimax(buckets)
    for r, w in zip(got, want):
        assert Fraction(r.blk_pos, r.blk_n) == w, (r.score, r, w)
    # monotone nondecreasing calibrated values
    cals = [r.cal for r in got]
    assert cals == sorted(cals)


def test_pav_pools_a_violation(spark):
    # rates 0.0, 1.0, 0.0 -> middle+last pool to 0.5
    rows = [(1, 0), (1, 0), (2, 1), (2, 1), (3, 0), (3, 0)]
    got = {r.score: (r.blk_n, r.blk_pos, r.cal)
           for r in isotonic_calibrate(_scored(spark, rows),
                                       "score", "y").collect()}
    assert got[1] == (2, 0, 0.0)
    assert got[2] == (4, 2, 0.5) and got[3] == (4, 2, 0.5)


def test_pav_already_monotone_identity(spark):
    rows = [(1, 0), (2, 1), (2, 0), (3, 1)]
    got = {r.score: r.cal
           for r in isotonic_calibrate(_scored(spark, rows),
                                       "score", "y").collect()}
    assert got == {1: 0.0, 2: 0.5, 3: 1.0}


def test_bucket_cap(spark):
    rows = [(s, 0) for s in range(10)]
    with pytest.raises(ValueError, match="max_buckets"):
        isotonic_calibrate(_scored(spark, rows), "score", "y",
                           max_buckets=5)


def test_pav_minimax_fuzz(spark):
    """Property: the PAV block rates equal the exact-rational minimax
    definition for random histograms (including all-0/all-1 runs and
    long tie plateaus)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=8, deadline=None)
    @given(st.data())
    def run(data):
        nb = data.draw(st.integers(1, 9), label="buckets")
        rows = []
        buckets = []
        for s in range(nb):
            n = data.draw(st.integers(1, 4), label=f"n{s}")
            p = data.draw(st.integers(0, n), label=f"p{s}")
            buckets.append((n, p))
            rows += [(s, 1)] * p + [(s, 0)] * (n - p)
        got = sorted(isotonic_calibrate(_scored(spark, rows),
                                        "score", "y").collect(),
                     key=lambda r: r.score)
        want = _minimax(buckets)
        for r, w in zip(got, want):
            assert Fraction(r.blk_pos, r.blk_n) == w, (buckets, r, w)

    run()
