"""resample_locf (operators/timeseries.py): grid construction, LOCF
carry, per-slot last-by-(ts,id), NULL handling."""

from datetime import datetime

import pytest

from datafusion_geo_spark.operators.timeseries import resample_locf


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double")


def _t(minute, second=0):
    return datetime(2024, 1, 1, 0, minute, second)


def test_grid_and_locf(spark):
    rows = [
        (1, _t(0), 7, 10.0),     # slot 0
        (2, _t(0, 30), 7, 20.0),  # slot 0 (later -> wins)
        (3, _t(4), 7, 99.0),     # slot 4; slots 1-3 are gaps
    ]
    out = {r.slot_ts.minute: (r.n_obs, r.value, r.filled)
           for r in resample_locf(_ev(spark, rows), step_minutes=1)
           .collect()}
    assert out == {
        0: (2, 20.0, False),
        1: (0, 20.0, True),
        2: (0, 20.0, True),
        3: (0, 20.0, True),
        4: (1, 99.0, False),
    }


def test_tie_breaks_by_id_then_null_value_carries(spark):
    rows = [
        (5, _t(0, 30), 1, 1.0),
        (9, _t(0, 30), 1, 2.0),   # same ts -> higher id wins
        (10, _t(1), 1, None),     # NULL obs: counted, carries nothing
    ]
    out = sorted(resample_locf(_ev(spark, rows), step_minutes=1)
                 .collect(), key=lambda r: r.slot_ts)
    assert (out[0].n_obs, out[0].value) == (2, 2.0)
    assert (out[1].n_obs, out[1].value, out[1].filled) == (1, 2.0,
                                                           False)


def test_leading_gap_stays_null_and_keys_isolated(spark):
    rows = [
        (1, _t(0), 1, None),     # key 1 starts with a NULL value
        (2, _t(2), 1, 5.0),
        (3, _t(1), 2, 42.0),     # key 2: single slot
    ]
    got = {(r.user_id, r.slot_ts.minute): (r.value, r.filled)
           for r in resample_locf(_ev(spark, rows), step_minutes=1)
           .collect()}
    assert got == {
        (1, 0): (None, False),
        (1, 1): (None, True),
        (1, 2): (5.0, False),
        (2, 1): (42.0, False),
    }


def test_null_ts_dropped_and_validation(spark):
    rows = [(1, None, 1, 1.0), (2, _t(3), 1, 2.0)]
    out = resample_locf(_ev(spark, rows), step_minutes=1).collect()
    assert len(out) == 1 and out[0].value == 2.0
    with pytest.raises(ValueError, match="step_minutes"):
        resample_locf(_ev(spark, rows), step_minutes=0)
