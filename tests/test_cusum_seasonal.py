"""cusum_changepoint / seasonal_profile (operators/timeseries.py):
hand cases + fuzz against direct Python references."""

from datetime import datetime, timedelta

import pytest

from datafusion_geo_spark.operators.timeseries import (
    cusum_changepoint, seasonal_profile)


def _sratio6(num, den):
    if num is None or den is None or den <= 0:
        return None
    sign = -1 if num < 0 else 1
    micro = (2_000_000 * abs(num) + den) // (2 * den)
    return sign * micro / 1e6


def _cusum_ref(rows):
    """rows: (key, x, y). Returns {key: (n, t, cp_x, num, den, cusum)}
    for keys with >= 2 distinct x."""
    per = {}
    for k, x, y in rows:
        per.setdefault(k, {}).setdefault(x, 0)
        per[k][x] += y
    out = {}
    for k, sy in per.items():
        xs = sorted(sy)
        n, t = len(xs), sum(sy.values())
        if n < 2:
            continue
        best = None
        s = 0
        for i, x in enumerate(xs[:-1], start=1):
            s += sy[x]
            d = abs(n * s - i * t)
            if best is None or d > best[0] or (d == best[0]
                                               and x < best[1]):
                best = (d, x)
        out[k] = (n, t, best[1], best[0], n,
                  _sratio6(best[0], n))
    return out


def _df(spark, rows):
    return spark.createDataFrame(rows, "key long, x long, y long")


def test_cusum_level_shift(spark):
    # key 1: flat 10 then flat 20 after x=4 -> cp at x=4
    rows = [(1, x, 10) for x in range(5)] + \
           [(1, x, 20) for x in range(5, 10)]
    got = {r.key: r for r in
           cusum_changepoint(_df(spark, rows), "key", "x", "y")
           .collect()}
    ref = _cusum_ref(rows)
    r = got[1]
    assert (r.n_slots, r.total_y, r.cp_x, r.cusum_num, r.cusum_den,
            r.cusum) == ref[1]
    assert r.cp_x == 4


def test_cusum_dedup_x_and_single_point_keys(spark):
    # duplicate x values aggregate; key 2 has one x -> no row
    rows = [(1, 0, 1), (1, 0, 2), (1, 1, 100), (2, 5, 7)]
    got = cusum_changepoint(_df(spark, rows), "key", "x", "y") \
        .collect()
    assert len(got) == 1 and got[0].key == 1
    ref = _cusum_ref(rows)
    r = got[0]
    assert (r.n_slots, r.total_y, r.cp_x, r.cusum_num,
            r.cusum_den, r.cusum) == ref[1]


def test_cusum_tie_breaks_smallest_x(spark):
    # symmetric saw: d is tied at both slopes -> smallest x wins
    rows = [(1, 0, 0), (1, 1, 10), (1, 2, 0)]
    got = cusum_changepoint(_df(spark, rows), "key", "x", "y") \
        .collect()[0]
    ref = _cusum_ref(rows)[1]
    assert got.cp_x == ref[2]


def test_cusum_fuzz(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    row = st.tuples(st.integers(0, 3), st.integers(-5, 12),
                    st.integers(-50, 50))

    @settings(max_examples=12, deadline=None)
    @given(st.lists(row, min_size=1, max_size=40))
    def run(rows):
        got = {r.key: (r.n_slots, r.total_y, r.cp_x, r.cusum_num,
                       r.cusum_den, r.cusum)
               for r in cusum_changepoint(
                   _df(spark, [(k, x, y) for k, x, y in rows]),
                   "key", "x", "y").collect()}
        assert got == _cusum_ref(rows)

    run()


def _smicro(num, den):
    sign = -1 if num < 0 else (0 if num == 0 else 1)
    return sign * ((2_000_000 * abs(num) + den) // (2 * den))


def _seasonal_ref(rows, period, step_minutes):
    """rows: (ts, y) with ts datetime; returns {pos: (n, sum, mean,
    idx)}. idx = exact micro-mean difference (the operator's
    documented definition)."""
    step = step_minutes * 60_000_000
    epoch = datetime(1970, 1, 1)
    obs = [((int((ts - epoch).total_seconds() * 1_000_000) // step)
            % period, y)
           for ts, y in rows if ts is not None and y is not None]
    if not obs:
        return {}
    big_n = len(obs)
    big_s = sum(y for _, y in obs)
    m_all = _smicro(big_s, big_n)
    out = {}
    for pos in {p for p, _ in obs}:
        ys = [y for p, y in obs if p == pos]
        n, s = len(ys), sum(ys)
        m_pos = _smicro(s, n)
        out[pos] = (n, s, m_pos / 1e6, (m_pos - m_all) / 1e6)
    return out


def _tsdf(spark, rows):
    return spark.createDataFrame(rows, "ts timestamp, y long")


def test_seasonal_hour_of_day(spark):
    base = datetime(2024, 3, 1)
    rows = []
    for day in range(3):
        for hour in range(4):
            rows.append((base + timedelta(days=day, hours=hour),
                         (hour + 1) * 100 + day))
    got = {r.pos: (r.n, r.sum_y, r.mean, r.seasonal_idx)
           for r in seasonal_profile(_tsdf(spark, rows), "ts", "y",
                                     period=24).collect()}
    assert got == _seasonal_ref(rows, 24, 60)
    # hour 3 is the hottest slot -> positive index; hour 0 negative
    assert got[3][3] > 0 > got[0][3]


def test_seasonal_null_excluded_and_validation(spark):
    rows = [(datetime(2024, 1, 1), 5), (None, 9),
            (datetime(2024, 1, 1, 1), None)]
    got = seasonal_profile(_tsdf(spark, rows), "ts", "y",
                           period=24).collect()
    assert len(got) == 1 and got[0].n == 1 and got[0].sum_y == 5
    with pytest.raises(ValueError, match="seasonal_profile"):
        seasonal_profile(_tsdf(spark, rows), "ts", "y", period=0)


def test_seasonal_fuzz(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    row = st.tuples(st.integers(0, 200), st.integers(-100, 100))

    @settings(max_examples=10, deadline=None)
    @given(st.lists(row, min_size=1, max_size=60),
           st.sampled_from([3, 7, 24]),
           st.sampled_from([15, 60]))
    def run(rows, period, step):
        base = datetime(2024, 1, 1)
        trows = [(base + timedelta(minutes=37 * m), y)
                 for m, y in rows]
        got = {r.pos: (r.n, r.sum_y, r.mean, r.seasonal_idx)
               for r in seasonal_profile(
                   _tsdf(spark, trows), "ts", "y", period=period,
                   step_minutes=step).collect()}
        assert got == _seasonal_ref(trows, period, step)

    run()


def test_streaming_seasonal_equals_batch(spark):
    """The bounded availableNow replay of streaming_seasonal must
    equal the batch profile of the same frame (shared row-cols +
    tail). Queries()-gating deferred to r12 (the r11 gate is full —
    see the _FIRST50 comment); this equality test is the interim
    pin."""
    import pyspark.sql.functions as F

    from datafusion_geo_spark.sources.fixtures import load_events
    from datafusion_geo_spark.streaming.drift import (
        streaming_seasonal)
    sf = "/root/testdata/sf0.001"
    got = sorted(streaming_seasonal(spark, sf).collect())
    ev = (load_events(spark, sf)
          .where(F.col("value").isNotNull() & F.col("ts").isNotNull())
          .select("ts", F.floor(F.col("value") * F.lit(100.0)
                                + F.lit(0.5)).cast("long")
                  .alias("cents")))
    want = sorted(seasonal_profile(ev, "ts", "cents",
                                   period=24).collect())
    assert got == want


def test_cusum_nulls_excluded(spark):
    df = spark.createDataFrame(
        [(1, 0, 5), (1, None, 9), (1, 1, None), (1, 2, 7)],
        "key long, x long, y long")
    got = cusum_changepoint(df, "key", "x", "y").collect()
    ref = _cusum_ref([(1, 0, 5), (1, 2, 7)])
    assert len(got) == 1
    r = got[0]
    assert (r.n_slots, r.total_y, r.cp_x, r.cusum_num,
            r.cusum_den, r.cusum) == ref[1]
