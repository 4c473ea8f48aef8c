"""dsir_select (operators/sampling.py): hashed-ngram importance
weights are exact int64 micro sums, a target-identical corpus scores
uniformly zero, a strong domain signal dominates the Gumbel noise,
and the race is deterministic.
"""

import pytest

import pyspark.sql.functions as F

from datafusion_geo_spark.operators.sampling import dsir_select


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_target_equals_source_gives_zero_weights(spark):
    docs = _docs(spark, [(i, f"w{i % 5} common text") for i in range(20)])
    out = dsir_select(docs, F.lit(True), k=20).collect()
    assert all(r.logw_micro == 0 for r in out)
    assert len(out) == 20
    # keys are then pure Gumbel: all distinct, rank ordering matches
    ks = [r.key_micro for r in sorted(out, key=lambda r: r.rank)]
    assert ks == sorted(ks, reverse=True)


def test_domain_signal_dominates(spark):
    # target docs speak 'xx', the rest 'yy'; held-out docs of each
    # style exist — the xx-style held-out docs must outrank yy-style
    target_style = " ".join(["xx"] * 40)
    other_style = " ".join(["yy"] * 40)
    rows = ([(i, target_style) for i in range(10)]          # target
            + [(i, other_style) for i in range(100, 130)]  # source-only
            + [(i, target_style) for i in range(200, 205)])  # held-out xx
    docs = _docs(spark, rows)
    out = dsir_select(docs, F.col("doc_id") < 100, k=15).collect()
    picked = {r.doc_id for r in out}
    # every xx-style doc (target + held-out) beats every yy-style doc
    assert picked == set(range(10)) | set(range(200, 205))
    xx_w = {r.logw_micro for r in out}
    assert min(xx_w) > 0


def test_weights_deterministic(spark):
    docs = _docs(spark, [(i, f"alpha beta w{i % 7}") for i in range(30)])
    a = sorted(map(tuple, dsir_select(docs, F.col("doc_id") % 3 == 0,
                                      k=10).collect()))
    b = sorted(map(tuple, dsir_select(docs, F.col("doc_id") % 3 == 0,
                                      k=10).collect()))
    assert a == b


def test_empty_text_scores_zero_not_dropped(spark):
    docs = _docs(spark, [(1, "aa bb"), (2, ""), (3, "aa bb")])
    out = {r.doc_id: r.logw_micro
           for r in dsir_select(docs, F.col("doc_id") == 1, k=3)
           .collect()}
    assert set(out) == {1, 2, 3}
    assert out[2] == 0


def test_null_target_counts_as_not_target(spark):
    # ADVICE r10: a bucket whose every row has a NULL target must get
    # ct=0 (matching the oracle's CASE...ELSE 0), not a NULL sum that
    # nulls lr_micro and drops the bucket from every doc's log-weight.
    docs = _docs(spark, [(1, "aa aa aa"), (2, "bb bb bb"),
                         (3, "aa aa aa")])
    # target is NULL for every row: all buckets have ct=0, so every
    # lr_micro = ln((1*(ts+B)) / ((B)*(cs+1))) is still defined and
    # every doc keeps a finite (non-NULL) log-weight
    tgt = F.when(F.col("doc_id") < 0, True).otherwise(F.lit(None)
                                                      .cast("boolean"))
    out = {r.doc_id: r.logw_micro
           for r in dsir_select(docs, tgt, k=3).collect()}
    assert set(out) == {1, 2, 3}
    assert all(v is not None for v in out.values())
    # the buggy NULL-sum path coalesced every doc to exactly 0; the
    # fixed path yields real (negative) smoothed log-ratios
    assert any(v != 0 for v in out.values())
    assert out[1] == out[3]


def test_gumbel_u_strictly_interior():
    # ADVICE r10: u = (h+1)/(2^32+1) stays in (0,1) even at the hash
    # extremes, so -ln(-ln(u)) is always finite
    import math
    for h in (0, 1, 2**32 - 2, 2**32 - 1):
        u = (h + 1) / 4294967297.0
        assert 0.0 < u < 1.0
        g = -math.log(-math.log(u))
        assert math.isfinite(g)


def test_validation(spark):
    docs = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError):
        dsir_select(docs, F.lit(True), k=0)
    with pytest.raises(ValueError):
        dsir_select(docs, F.lit(True), n_buckets=1)
