"""Fellegi-Sunter linkage (operators/linkage.py): exact u estimation,
micro weight arithmetic, blocked pair scoring."""

import math

import pytest

from datafusion_geo_spark.operators.linkage import (_sm,
                                                    fs_field_weights,
                                                    fs_score_histogram,
                                                    fs_score_pairs)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "id long, blk int, seg string, bal long")


ROWS = [
    (1, 0, "A", 10), (2, 0, "A", 10),   # agree on both
    (3, 0, "B", 10), (4, 0, "B", 20),   # mixed
    (5, 1, "A", 20), (6, 1, None, 20),  # NULL field
]


def test_u_and_weights_exact(spark):
    w = {r.field: r for r in
         fs_field_weights(_df(spark, ROWS), ["seg", "bal"]).collect()}
    # seg: counts A=3, B=2 over n=5 -> u = 13/25
    assert (w["seg"].n, w["seg"].u_num, w["seg"].u_den) == (5, 13, 25)
    assert w["seg"].w_agree_micro == _sm(math.log(0.9)) \
        - _sm(math.log(13 / 25))
    assert w["seg"].w_dis_micro == _sm(math.log(0.1)) \
        - _sm(math.log(1 - 13 / 25))
    # bal: counts 10->3, 20->3 over 6 -> u = 18/36
    assert (w["bal"].u_num, w["bal"].u_den) == (18, 36)


def test_pair_scores_and_null_disagrees(spark):
    w = {r.field: (r.w_agree_micro, r.w_dis_micro) for r in
         fs_field_weights(_df(spark, ROWS), ["seg", "bal"]).collect()}
    got = {(r.a_id, r.b_id): r.score_micro for r in
           fs_score_pairs(_df(spark, ROWS), "blk", ["seg", "bal"],
                          "id").collect()}
    # block 0 has C(4,2)=6 pairs, block 1 has 1
    assert len(got) == 7
    assert got[(1, 2)] == w["seg"][0] + w["bal"][0]  # agree both
    assert got[(3, 4)] == w["seg"][0] + w["bal"][1]  # seg only
    assert got[(1, 3)] == w["seg"][1] + w["bal"][0]  # bal only
    assert got[(5, 6)] == w["seg"][1] + w["bal"][0]  # NULL -> disagree


def test_histogram_and_validation(spark):
    hist = {r.score_micro: r.n_pairs for r in
            fs_score_histogram(_df(spark, ROWS), "blk",
                               ["seg", "bal"], "id").collect()}
    assert sum(hist.values()) == 7
    assert len(hist) <= 4  # 2^2 possible scores
    const = spark.createDataFrame([(1, 0, "X"), (2, 0, "X")],
                                  "id long, blk int, seg string")
    with pytest.raises(ValueError, match="constant"):
        fs_field_weights(const, ["seg"]).collect()
