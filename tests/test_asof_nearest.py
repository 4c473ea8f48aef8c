"""asof_join_nearest vs a brute-force reference: smallest absolute
gap, exact ties to the backward match, NULL when the key has no right
rows at all."""

from hypothesis import given, settings, strategies as st

from datafusion_geo_spark.operators.asof_join import asof_join_nearest
import pytest


def _brute(left_rows, right_rows):
    out = {}
    for lid, key, lt in left_rows:
        best = None
        for rkey, rt, pay in right_rows:
            if rkey != key:
                continue
            gap = abs(lt - rt)
            # tie rule: smaller gap wins; equal gap -> backward
            # (rt <= lt); among equal rt the payload is unique here
            if best is None:
                best = (gap, rt, pay)
            else:
                bg, brt, _ = best
                if gap < bg or (gap == bg and rt <= lt < brt):
                    best = (gap, rt, pay)
        out[lid] = (best[2], best[1]) if best else (None, None)
    return out


def test_nearest_hand_cases(spark):
    left = spark.createDataFrame(
        [(1, "k", 10), (2, "k", 14), (3, "k", 30), (4, "solo", 5)],
        "event_id long, k string, t long")
    right = spark.createDataFrame(
        [("k", 8, 100), ("k", 12, 200), ("k", 18, 300)],
        "k string, rt long, pay long")
    out = {r.event_id: (r.pay, r.t_asof) for r in asof_join_nearest(
        left, right, on="k", left_time="t", right_time="rt",
        left_id="event_id", right_cols=["pay"], suffix="_asof"
    ).withColumnRenamed("rt_asof", "t_asof").collect()}
    # t=10: gaps 2 (rt=8, backward) vs 2 (rt=12, forward) -> backward
    assert out[1] == (100, 8)
    # t=14: gaps 2 (rt=12) vs 4 (rt=18) -> rt=12
    assert out[2] == (200, 12)
    # t=30: only backward candidates -> rt=18
    assert out[3] == (300, 18)
    # no right rows for key 'solo' -> NULLs
    assert out[4] == (None, None)


@pytest.mark.slow
@given(st.lists(st.tuples(st.sampled_from("ab"), st.integers(0, 20)),
                min_size=1, max_size=12),
       st.lists(st.tuples(st.sampled_from("ab"), st.integers(0, 20)),
                min_size=0, max_size=12))
@settings(max_examples=15, deadline=None)
def test_nearest_matches_brute_force(spark, lefts, rights):
    # unique (key, rt) on the right so the pick is well-defined
    rmap = {}
    for k, rt in rights:
        rmap[(k, rt)] = len(rmap)
    right_rows = [(k, rt, pay) for (k, rt), pay in rmap.items()]
    left_rows = [(i, k, t) for i, (k, t) in enumerate(lefts)]
    ldf = spark.createDataFrame(left_rows, "event_id long, k string, t long")
    if right_rows:
        rdf = spark.createDataFrame(right_rows,
                                    "k string, rt long, pay long")
    else:
        rdf = spark.createDataFrame([], "k string, rt long, pay long")
    got = {r.event_id: (r.pay, r.rt_asof) for r in asof_join_nearest(
        ldf, rdf, on="k", left_time="t", right_time="rt",
        left_id="event_id", right_cols=["pay"]).collect()}
    assert got == _brute(left_rows, right_rows)
