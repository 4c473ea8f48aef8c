"""expectations_check (operators/profile.py): per-rule violation
counts, NULL-as-violation, exact pass rates."""

import pyspark.sql.functions as F
import pytest

from datafusion_geo_spark.operators.profile import expectations_check


def test_rules_counted_exactly(spark):
    df = spark.createDataFrame(
        [(1, 10, "a@x.io"), (2, -3, "bad"), (3, None, None),
         (4, 7, "c@y.io")],
        "id long, qty int, email string")
    rules = [
        ("qty_nonneg", F.col("qty") >= 0),
        ("email_at", F.col("email").contains("@")),
        ("id_positive", F.col("id") > 0),
    ]
    got = {r.rule: r for r in expectations_check(df, rules).collect()}
    assert got["qty_nonneg"].n_violations == 2   # -3 and NULL
    assert got["email_at"].n_violations == 2     # "bad" and NULL
    assert got["id_positive"].n_violations == 0
    assert got["id_positive"].passed is True
    assert got["qty_nonneg"].passed is False
    assert got["qty_nonneg"].pass_rate == 0.5
    assert all(r.n_rows == 4 for r in got.values())


def test_empty_frame_and_duplicate_names(spark):
    df = spark.createDataFrame([], "id long")
    out = expectations_check(df, [("r", F.col("id") > 0)]).collect()[0]
    assert (out.n_rows, out.n_violations, out.pass_rate,
            out.passed) == (0, 0, None, True)
    with pytest.raises(ValueError, match="duplicate"):
        expectations_check(df, [("r", F.col("id") > 0),
                                ("r", F.col("id") < 9)])
