"""stump_fit (operators/mlfit.py): hand split cases + fuzz against a
direct Python reference of histogram split finding."""

import math

from datafusion_geo_spark.operators.mlfit import stump_fit
import pytest


def _r6(x):
    sign = -1.0 if x < 0 else 1.0
    return sign * math.floor(abs(x) * 1e6 + 0.5) / 1e6 + 0.0


def _ref(rows, feats):
    """rows: dicts with feature keys + 'y'. Returns
    {feature: (threshold, n_left, sum_left, n_right, sum_right,
    gain6)}."""
    out = {}
    for f in feats:
        pts = [(r[f], r["y"]) for r in rows
               if r[f] is not None and r["y"] is not None]
        bins = {}
        for v, yy in pts:
            n0, s0 = bins.get(v, (0, 0))
            bins[v] = (n0 + 1, s0 + yy)
        if len(bins) < 2:
            continue
        nt = sum(n for n, _ in bins.values())
        st = sum(s for _, s in bins.values())
        best = None
        nl = sl = 0
        for v in sorted(bins)[:-1]:
            n0, s0 = bins[v]
            nl, sl = nl + n0, sl + s0
            nr, sr = nt - nl, st - sl
            score = (float(sl) * float(sl) / float(nl)
                     + float(sr) * float(sr) / float(nr))
            key = (score, -v)
            if best is None or key > best[0]:
                best = (key, (v, nl, sl, nr, sr))
        (score, _), (v, nl, sl, nr, sr) = best
        gain = score - float(st) * float(st) / float(nt)
        out[f] = (v, nl, sl, nr, sr, _r6(gain))
    return out


def _run(spark, rows, feats):
    df = spark.createDataFrame(
        [tuple(r[f] for f in feats) + (r["y"],) for r in rows],
        ", ".join(f"{f} long" for f in feats) + ", y long")
    return {r.feature: (r.threshold, r.n_left, r.sum_left,
                        r.n_right, r.sum_right, r.gain)
            for r in stump_fit(df, feats, "y").collect()}


def test_obvious_split(spark):
    # y jumps at a > 4; b is noise
    rows = [{"a": i, "b": i % 3, "y": 0 if i <= 4 else 100}
            for i in range(10)]
    got = _run(spark, rows, ["a", "b"])
    assert got == _ref(rows, ["a", "b"])
    assert got["a"][0] == 4 and got["a"][5] > got["b"][5]


def test_single_bin_feature_dropped_and_nulls(spark):
    rows = [{"a": 1, "b": 0, "y": 3}, {"a": 1, "b": 1, "y": 9},
            {"a": 1, "b": None, "y": 5}, {"a": 1, "b": 2, "y": None}]
    got = _run(spark, rows, ["a", "b"])
    assert "a" not in got          # one distinct bin -> no split
    assert got == _ref(rows, ["a", "b"])


def test_tie_breaks_smallest_threshold(spark):
    # symmetric: splitting at 0 or at 1 gives the same score
    rows = [{"a": 0, "y": 0}, {"a": 1, "y": 5}, {"a": 2, "y": 10}]
    got = _run(spark, rows, ["a"])
    ref = _ref(rows, ["a"])
    assert got == ref


@pytest.mark.slow
def test_stump_fuzz(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    rec = st.tuples(st.integers(-4, 4), st.integers(0, 3),
                    st.integers(-20, 20))

    @settings(max_examples=12, deadline=None)
    @given(st.lists(rec, min_size=2, max_size=50))
    def run(recs):
        rows = [{"a": a, "b": b, "y": y} for a, b, y in recs]
        assert _run(spark, rows, ["a", "b"]) == _ref(rows, ["a", "b"])

    run()
