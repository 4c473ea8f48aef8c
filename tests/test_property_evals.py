"""Property tests for the eval statistics: auc_exact against the
O(P*N) pair-counting definition of ROC-AUC, ks_stat against a direct
two-CDF sweep — both as exact fractions, plus the 6-dp rounded output
replayed with the identical double op chain."""

import math
from fractions import Fraction

from hypothesis import assume, given, settings, strategies as st

from datafusion_geo_spark.operators.evals import auc_exact, ks_stat
import pytest


def _r6(x: float) -> float:
    s = -1.0 if x < 0 else (0.0 if x == 0 else 1.0)
    return s * math.floor(abs(x) * 1e6 + 0.5) / 1e6 + 0.0


def _brute_auc(pairs):
    """Pair-counting AUC: wins + half-ties over P*N, as (num2, 2*P*N)."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    num2 = sum(2 * (p > n) + (p == n) for p in pos for n in neg)
    return num2, 2 * len(pos) * len(neg), len(pos), len(neg)


@pytest.mark.slow
@given(st.lists(st.tuples(st.integers(-4, 4), st.integers(0, 1)),
                min_size=2, max_size=40))
@settings(max_examples=20, deadline=None)
def test_auc_matches_pair_counting(spark, pairs):
    num2, den2, p, n = _brute_auc(pairs)
    assume(p > 0 and n > 0)
    df = spark.createDataFrame(pairs, "score long, y int")
    out = auc_exact(df, "score", "y").collect()[0]
    assert out.p_total == p and out.n_total == n
    # rank-sum identity: 2*sum(rank of positives) = num2 + P*(P+1)
    assert out.rank2_pos == num2 + p * (p + 1)
    assert out.auc == _r6(num2 / den2)


def _brute_ks(vals_a, vals_b):
    """Direct CDF sweep: max |F_a - F_b| over all observed values."""
    na, nb = len(vals_a), len(vals_b)
    best = Fraction(0)
    for v in sorted(set(vals_a) | set(vals_b)):
        fa = Fraction(sum(1 for x in vals_a if x <= v), na)
        fb = Fraction(sum(1 for x in vals_b if x <= v), nb)
        best = max(best, abs(fa - fb))
    return best


@pytest.mark.slow
@given(st.lists(st.integers(-4, 4), min_size=1, max_size=25),
       st.lists(st.integers(-4, 4), min_size=1, max_size=25))
@settings(max_examples=20, deadline=None)
def test_ks_matches_cdf_sweep(spark, vals_a, vals_b):
    rows = [(v, "a") for v in vals_a] + [(v, "b") for v in vals_b]
    df = spark.createDataFrame(rows, "vq long, grp string")
    out = ks_stat(df, "vq", "grp", "a", "b").collect()[0]
    want = _brute_ks(vals_a, vals_b)
    assert Fraction(out.d_num, out.n_a * out.n_b) == want
    assert out.ks == _r6(out.d_num / (out.n_a * out.n_b))


def _brute_corr(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    cov = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    return cov, vx, vy


@pytest.mark.slow
@given(st.lists(st.tuples(st.integers(-1000, 1000),
                          st.integers(-1000, 1000)),
                min_size=2, max_size=30))
@settings(max_examples=20, deadline=None)
def test_pearson_matches_exact_moments(spark, pairs):
    from datafusion_geo_spark.operators.evals import pearson_corr
    xs = [p[0] for p in pairs]
    ys = [p[1] for p in pairs]
    cov, vx, vy = _brute_corr(xs, ys)
    assume(vx > 0 and vy > 0)  # degenerate (constant column) excluded
    df = spark.createDataFrame(pairs, "x long, y long")
    out = pearson_corr(df, "x", "y").collect()[0]
    assert (out.cov_num, out.varx_num, out.vary_num) == (cov, vx, vy)
    # identical double op order: cast-to-double product, sqrt, divide
    assert out.corr == _r6(cov / math.sqrt(float(vx) * float(vy)))
    assert abs(out.corr) <= 1.0


@given(st.lists(st.integers(-5, 5), min_size=1, max_size=40))
@settings(max_examples=15, deadline=None)
def test_hist_quantiles_match_sorted_indexing(spark, vals):
    from datafusion_geo_spark.operators.evals import hist_quantiles
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    r = hist_quantiles(df, "v", percents=(50, 90, 99)).collect()[0]
    s = sorted(vals)
    n = len(s)
    for p, got in ((50, r.p50), (90, r.p90), (99, r.p99)):
        rank = -(-p * n // 100)  # ceil(p*n/100)
        assert got == s[rank - 1]
    assert r.n_total == n


def _brute_gini(sizes):
    s = sorted(sizes)
    n, t = len(s), sum(s)
    r2 = 2 * sum((i + 1) * x for i, x in enumerate(s))
    return r2, (r2 - (n + 1) * t) / (n * t)


@pytest.mark.slow
@given(st.lists(st.integers(0, 25), min_size=1, max_size=60))
@settings(max_examples=15, deadline=None)
def test_skew_audit_gini_matches_brute_force(spark, key_sizes):
    from datafusion_geo_spark.operators.profile import skew_audit
    # materialize a frame with key i repeated size_i times (size 0 keys
    # simply don't exist — drop them from the expectation too)
    sizes = [z for z in key_sizes if z > 0]
    assume(len(sizes) > 0)
    rows = [(i,) for i, z in enumerate(sizes) for _ in range(z)]
    df = spark.createDataFrame(rows, "k long")
    out = skew_audit(df, "k").collect()[0]
    r2, g = _brute_gini(sizes)
    assert out.n_keys == len(sizes) and out.n_rows == sum(sizes)
    assert out.max_size == max(sizes)
    assert out.r2 == r2
    assert out.gini == _r6(g)
    # p99: size of the ceil(.99*n)-th smallest key
    s = sorted(sizes)
    rank = -(-99 * len(s) // 100)
    assert out.p99_size == s[rank - 1]


def _brute_ap(pairs):
    """sklearn-convention AP over distinct-score blocks descending, as
    the repo computes it: block precision fixed to micro int first."""
    from collections import defaultdict
    blocks = defaultdict(lambda: [0, 0])     # score -> [n, npos]
    for s, y in pairs:
        blocks[s][0] += 1
        blocks[s][1] += y
    cum_tp = cum_n = 0
    ap_sum = 0
    for s in sorted(blocks, reverse=True):
        n, npos = blocks[s]
        cum_tp += npos
        cum_n += n
        p_micro = (2_000_000 * cum_tp + cum_n) // (2 * cum_n)
        ap_sum += npos * p_micro
    p_total = sum(v[1] for v in blocks.values())
    return ap_sum, p_total


@pytest.mark.slow
@given(st.lists(st.tuples(st.integers(-4, 4), st.integers(0, 1)),
                min_size=1, max_size=40))
@settings(max_examples=20, deadline=None)
def test_average_precision_matches_block_sweep(spark, pairs):
    from datafusion_geo_spark.operators.evals import average_precision
    ap_sum, p = _brute_ap(pairs)
    df = spark.createDataFrame(pairs, "score long, y int")
    out = average_precision(df, "score", "y").collect()[0]
    assert out.ap_sum_micro == ap_sum and out.n_pos == p
    if p == 0:
        assert out.ap is None
    else:
        assert out.ap == ((2 * ap_sum + p) // (2 * p)) / 1e6
        # AP is a mean of precisions: stays in [0, 1] (+rounding slack)
        assert 0.0 <= out.ap <= 1.0


def _perm_lists(perm):
    """Two rankings over the same n neighbors: identity vs perm."""
    n = len(perm)
    a = [(1, j, j + 1) for j in range(n)]
    b = [(1, j, perm[j] + 1) for j in range(n)]
    return a, b


@pytest.mark.slow
@given(st.permutations(list(range(5))))
@settings(max_examples=20, deadline=None)
def test_spearman_kendall_match_direct_formulas(spark, perm):
    from datafusion_geo_spark.operators.evals import (kendall_overlap,
                                                      spearman_overlap)
    a_rows, b_rows = _perm_lists(list(perm))
    a = spark.createDataFrame(a_rows, "query_id long, neighbor_id long, rank int")
    b = spark.createDataFrame(b_rows, "query_id long, neighbor_id long, rank int")
    n = len(perm)
    d2 = sum((j - perm[j]) ** 2 for j in range(n))
    rho_num = n * (n * n - 1) - 6 * d2
    rho_den = n * (n * n - 1)
    srow = spearman_overlap(a, b).collect()[0]
    assert srow.d2_sum == d2
    assert srow.rho == _r6(rho_num / rho_den)
    conc = sum(1 for i in range(n) for j in range(i + 1, n)
               if perm[i] < perm[j])
    disc = n * (n - 1) // 2 - conc
    krow = kendall_overlap(a, b).collect()[0]
    assert (krow.n_concordant, krow.n_discordant) == (conc, disc)
    assert krow.tau == _r6((conc - disc) / (n * (n - 1) / 2))
