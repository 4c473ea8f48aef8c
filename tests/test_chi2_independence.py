"""chi2_independence / chi2_independence_stat
(operators/profile.py): hand contingency cases + fuzz against a
direct Python reference."""

import pytest

import math

from datafusion_geo_spark.operators.profile import (
    chi2_independence, chi2_independence_stat)


def _ref_cells(rows):
    """rows: (a, b) pairs (post NULL-filter). Returns the FULL grid
    {(a, b): (o, r, c, expected6, term_micro)} including empty
    cells."""
    from collections import Counter
    cells = Counter((str(a), str(b)) for a, b in rows)
    rt = Counter()
    ct = Counter()
    for (a, b), o in cells.items():
        rt[a] += o
        ct[b] += o
    n = sum(cells.values())
    out = {}
    for a, r in rt.items():
        for b, c in ct.items():
            o = cells.get((a, b), 0)
            e = float(r) * float(c) / float(n)
            diff = float(o * n - r * c)
            term = diff * diff / (float(n) * float(r) * float(c))
            out[(a, b)] = (o, r, c,
                           math.floor(e * 1e6 + 0.5) / 1e6,
                           int(math.floor(term * 1e6 + 0.5)))
    return out


def _df(spark, rows):
    return spark.createDataFrame(rows, "a string, b long")


def test_chi2_cells_hand(spark):
    rows = [("x", 0)] * 10 + [("x", 1)] * 20 + \
           [("y", 0)] * 30 + [("y", 1)] * 40
    got = {(r.val_a, r.val_b): (r.observed, r.row_tot, r.col_tot,
                                r.expected, r.term_micro)
           for r in chi2_independence(_df(spark, rows), "a", "b")
           .collect()}
    assert got == _ref_cells(rows)


def test_chi2_null_excluded_and_stat(spark):
    rows = [("x", 0), ("x", 1), ("y", 0), ("y", 1),
            (None, 0), ("x", None)]
    stat = chi2_independence_stat(_df(spark, rows), "a", "b") \
        .collect()[0]
    assert (stat.n, stat.n_cells, stat.dof) == (4, 4, 1)
    # perfectly independent 1:1:1:1 table -> chi2 (and V) exactly 0
    assert stat.chi2 == 0.0 and stat.cramers_v == 0.0


def test_chi2_perfect_association(spark):
    rows = [("x", 0)] * 25 + [("y", 1)] * 25
    stat = chi2_independence_stat(_df(spark, rows), "a", "b") \
        .collect()[0]
    # 2x2 with perfect association: chi2 == n, V == 1; 2 empty cells
    assert stat.chi2 == 50.0 and stat.dof == 1 and stat.n_cells == 4
    assert stat.cramers_v == 1.0


@pytest.mark.slow
def test_chi2_fuzz(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    row = st.tuples(st.sampled_from(["p", "q", "r"]),
                    st.integers(0, 3))

    @settings(max_examples=12, deadline=None)
    @given(st.lists(row, min_size=1, max_size=60))
    def run(rows):
        ref = _ref_cells(rows)
        got = {(r.val_a, r.val_b): (r.observed, r.row_tot,
                                    r.col_tot, r.expected,
                                    r.term_micro)
               for r in chi2_independence(_df(spark, rows), "a", "b")
               .collect()}
        assert got == ref
        stat = chi2_independence_stat(_df(spark, rows), "a", "b") \
            .collect()[0]
        assert stat.chi2 == sum(v[4] for v in ref.values()) / 1e6

    run()
