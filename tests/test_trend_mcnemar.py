"""trend_by_key (operators/timeseries.py) and mcnemar_test
(operators/evals.py): exact-moment arithmetic."""

from fractions import Fraction

from datafusion_geo_spark.operators.evals import mcnemar_test
from datafusion_geo_spark.operators.timeseries import trend_by_key


def test_trend_exact_slopes(spark):
    rows = ([("a", x, 3 * x + 7) for x in range(10)]      # slope 3
            + [("b", x, 100 - 2 * x) for x in range(5)]    # slope -2
            + [("c", 4, 9)])                               # 1 point
    df = spark.createDataFrame(rows, "k string, x long, y long")
    got = {r.k: r for r in trend_by_key(df, "k", "x", "y").collect()}
    assert Fraction(got["a"].slope_num, got["a"].slope_den) == 3
    assert got["a"].slope == 3.0
    assert Fraction(got["b"].slope_num, got["b"].slope_den) == -2
    assert got["b"].slope == -2.0
    assert got["c"].slope is None and got["c"].slope_den == 0


def test_trend_noisy_matches_reference(spark):
    import random
    rng = random.Random(4)
    pts = [(x, 5 * x + rng.randint(-10, 10)) for x in range(30)]
    df = spark.createDataFrame([("k", x, y) for x, y in pts],
                               "k string, x long, y long")
    r = trend_by_key(df, "k", "x", "y").collect()[0]
    n = len(pts)
    sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts); sxx = sum(x * x for x, _ in pts)
    assert (r.slope_num, r.slope_den) == (n * sxy - sx * sy,
                                          n * sxx - sx * sx)


def test_mcnemar_counts_and_statistic(spark):
    # labels all 1; A right on 6, B right on 3; discordant b=4, c=1
    rows = ([(1, 1, 1)] * 2        # both right
            + [(1, 1, 0)] * 4      # A right only  -> b
            + [(1, 0, 1)] * 1      # B right only  -> c
            + [(1, 0, 0)] * 3)     # both wrong
    df = spark.createDataFrame(rows, "y int, pa int, pb int")
    r = mcnemar_test(df, "y", "pa", "pb").collect()[0]
    assert (r.n, r.n_correct_a, r.n_correct_b) == (10, 6, 3)
    assert (r.b_discordant, r.c_discordant) == (4, 1)
    # (|4-1|-1)^2 / 5 = 4/5
    assert (r.chi2_num, r.chi2_den, r.chi2) == (4, 5, 0.8)


def test_mcnemar_degenerate(spark):
    rows = [(1, 1, 1), (0, 0, 0)]  # fully concordant
    df = spark.createDataFrame(rows, "y int, pa int, pb int")
    r = mcnemar_test(df, "y", "pa", "pb").collect()[0]
    assert r.chi2 is None and r.chi2_den == 0
    # |b-c| <= 1 -> continuity correction clamps numerator to 0
    rows2 = [(1, 1, 0), (1, 0, 1)]
    r2 = mcnemar_test(spark.createDataFrame(
        rows2, "y int, pa int, pb int"), "y", "pa", "pb").collect()[0]
    assert (r2.chi2_num, r2.chi2) == (0, 0.0)
