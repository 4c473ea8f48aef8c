"""bootstrap_mean_ci (operators/evals.py): deterministic Poisson
weights, exact replica means, rank-test interval."""

import pytest

from datafusion_geo_spark.operators.evals import (POISSON1_CDF_MICRO,
                                                  bootstrap_mean_ci)


def test_cdf_constants_pinned():
    import math
    c, want = 0.0, []
    for k in range(9):
        c += math.exp(-1.0) / math.factorial(k)
        want.append(int(math.floor(c * 1e6 + 0.5)))
    assert tuple(want) == POISSON1_CDF_MICRO


@pytest.mark.slow
def test_interval_brackets_mean_and_is_deterministic(spark):
    rows = [(i, 50 + (i * 17 % 21) - 10) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, v long")
    a = bootstrap_mean_ci(df, "v", "id", n_boot=60).collect()[0]
    b = bootstrap_mean_ci(df, "v", "id", n_boot=60).collect()[0]
    assert a == b  # same seed -> identical interval
    assert a.n_rows == 400
    assert a.ci_lo <= a.mean <= a.ci_hi
    # CI of a 400-row sample should be reasonably tight around 50
    assert a.ci_hi - a.ci_lo < 3.0
    c = bootstrap_mean_ci(df, "v", "id", n_boot=60,
                          seed="other").collect()[0]
    assert c.mean == a.mean  # the point estimate ignores the seed
    assert (c.ci_lo, c.ci_hi) != (a.ci_lo, a.ci_hi)


@pytest.mark.slow
def test_negative_values_and_empty(spark):
    rows = [(i, -100) for i in range(50)]
    df = spark.createDataFrame(rows, "id long, v long")
    r = bootstrap_mean_ci(df, "v", "id", n_boot=30).collect()[0]
    assert r.mean == -100.0 and r.ci_lo == -100.0 and r.ci_hi == -100.0
    empty = spark.createDataFrame([], "id long, v long")
    e = bootstrap_mean_ci(empty, "v", "id", n_boot=10).collect()[0]
    assert e.n_rows == 0 and e.mean is None
    assert e.ci_lo is None and e.ci_hi is None
