"""ttest_welch (operators/evals.py): hand cases + fuzz against a
direct Python reference of Welch's t with Welch–Satterthwaite df."""

import math

from datafusion_geo_spark.operators.evals import ttest_welch


def _r6(x):
    sign = -1.0 if x < 0 else 1.0
    return sign * math.floor(abs(x) * 1e6 + 0.5) / 1e6 + 0.0


def _sr6(num, den):
    if den <= 0:
        return None
    sign = -1 if num < 0 else (0 if num == 0 else 1)
    return sign * ((2_000_000 * abs(num) + den) // (2 * den)) / 1e6


def _ref(ys_a, ys_b):
    na, nb = len(ys_a), len(ys_b)
    sa, sb = sum(ys_a), sum(ys_b)
    ssa = sum(y * y for y in ys_a)
    ssb = sum(y * y for y in ys_b)
    vna, vnb = na * ssa - sa * sa, nb * ssb - sb * sb
    mean_a = _sr6(sa, na) if na > 0 else None
    mean_b = _sr6(sb, nb) if nb > 0 else None
    if na < 2 or nb < 2 or (vna == 0 and vnb == 0):
        return (na, nb, mean_a, mean_b, vna, vnb, None, None)
    va = float(vna) / float(na * (na - 1))
    vb = float(vnb) / float(nb * (nb - 1))
    sea, seb = va / na, vb / nb
    se2 = sea + seb
    t = (sa / na - sb / nb) / math.sqrt(se2)
    dof = se2 * se2 / (sea * sea / (na - 1) + seb * seb / (nb - 1))
    return (na, nb, mean_a, mean_b, vna, vnb, _r6(t), _r6(dof))


def _run(spark, ys_a, ys_b):
    rows = [("a", y) for y in ys_a] + [("b", y) for y in ys_b] + \
        [("zz", 999), ("a", None)]
    df = spark.createDataFrame(rows, "g string, y long")
    r = ttest_welch(df, "y", "g", "a", "b").collect()[0]
    return (r.n_a, r.n_b, r.mean_a, r.mean_b,
            r.var_num_a, r.var_num_b, r.t_stat, r.df)


def test_clear_shift(spark):
    a, b = [1, 2, 3, 4, 5], [11, 12, 13, 14, 15]
    got = _run(spark, a, b)
    assert got == _ref(a, b)
    assert got[6] < -5       # strongly negative shift
    # equal variances, equal n -> df == na + nb - 2
    assert got[7] == 8.0


def test_degenerate_sides(spark):
    assert _run(spark, [5], [1, 2, 3]) == _ref([5], [1, 2, 3])
    assert _run(spark, [7, 7], [7, 7, 7]) == _ref([7, 7], [7, 7, 7])
    got = _run(spark, [7, 7], [9, 9, 10])
    assert got == _ref([7, 7], [9, 9, 10])
    assert got[6] is not None   # one-sided zero variance still tests


def test_ttest_fuzz(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    vals = st.lists(st.integers(-30, 30), min_size=1, max_size=25)

    @settings(max_examples=12, deadline=None)
    @given(vals, vals)
    def run(a, b):
        assert _run(spark, a, b) == _ref(a, b)

    run()
