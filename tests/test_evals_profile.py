"""Unit tests for the round-6 tail operators: exact AUC / KS drift
(hand-computed small cases with ties), table profiling (null/distinct
accounting), unicode normalization (NFC + case + whitespace), sentence
segmentation (indices, empty filtering), and grouped HLL (per-group
sketch == global sketch of the group's keys)."""

import pyspark.sql.functions as F

from datafusion_geo_spark.operators.evals import auc_exact, ks_stat
from datafusion_geo_spark.operators.normalize import normalize_text
from datafusion_geo_spark.operators.profile import table_profile
from datafusion_geo_spark.operators.sketch import (hll_by_group,
                                                   hll_registers,
                                                   regs_estimate)
from datafusion_geo_spark.operators.text import split_sentences


def test_auc_perfect_separation(spark):
    # scores: positives all above negatives -> AUC = 1
    rows = [(1, 0), (2, 0), (3, 1), (4, 1)]
    df = spark.createDataFrame(rows, "score long, y int")
    out = auc_exact(df, "score", "y").collect()[0]
    assert out.p_total == 2 and out.n_total == 2
    assert out.auc == 1.0


def test_auc_with_ties_hand_computed(spark):
    # one tied bucket mixing classes: scores [1-, 1+, 2-, 2+]
    # ranks: bucket 1 -> avg 1.5 (x2), bucket 2 -> avg 3.5 (x2)
    # rank-sum of positives = 1.5 + 3.5 = 5 -> AUC = (5 - 3) / 4 = 0.5
    rows = [(1, 0), (1, 1), (2, 0), (2, 1)]
    df = spark.createDataFrame(rows, "score long, y int")
    out = auc_exact(df, "score", "y").collect()[0]
    assert out.rank2_pos == 10  # 2 * 5
    assert out.auc == 0.5


def test_auc_all_reversed(spark):
    # positives all BELOW negatives -> AUC = 0
    rows = [(1, 1), (2, 1), (3, 0), (4, 0)]
    df = spark.createDataFrame(rows, "score long, y int")
    assert auc_exact(df, "score", "y").collect()[0].auc == 0.0


def test_ks_identical_and_disjoint(spark):
    same = [(v, g) for v in (1, 2, 3) for g in ("a", "b")]
    df = spark.createDataFrame(same, "vq long, grp string")
    out = ks_stat(df, "vq", "grp", "a", "b").collect()[0]
    assert out.d_num == 0 and out.ks == 0.0

    disjoint = [(1, "a"), (2, "a"), (3, "b"), (4, "b")]
    df2 = spark.createDataFrame(disjoint, "vq long, grp string")
    out2 = ks_stat(df2, "vq", "grp", "a", "b").collect()[0]
    # after vq=2: F_a=1, F_b=0 -> D=1
    assert out2.ks == 1.0 and out2.n_a == 2 and out2.n_b == 2


def test_ks_hand_computed_fraction(spark):
    # a: [1, 2]; b: [1, 3] -> max gap at vq=2: |2*2 - 1*2| = 2 of 4
    rows = [(1, "a"), (2, "a"), (1, "b"), (3, "b")]
    df = spark.createDataFrame(rows, "vq long, grp string")
    out = ks_stat(df, "vq", "grp", "a", "b").collect()[0]
    assert out.d_num == 2 and out.ks == 0.5


def test_table_profile_nulls_distinct(spark):
    rows = [(1, "x"), (2, None), (3, "x")]
    df = spark.createDataFrame(rows, "k long, s string")
    prof = {r.col_name: r for r in table_profile(df, ["k", "s"]).collect()}
    assert prof["k"].n_rows == 3 and prof["k"].n_null == 0
    assert prof["k"].n_distinct == 3
    assert prof["k"].min_val == "1" and prof["k"].max_val == "3"
    assert prof["s"].n_null == 1 and prof["s"].n_distinct == 1
    assert prof["s"].sum_len == 2  # two non-null 'x'


def test_normalize_text_nfc_case_ws(spark):
    # decomposed e + U+0301 must NFC-fold to precomposed é; tabs and
    # runs collapse; ends strip; NULL passes through
    rows = [(1, "A  Café\tB "), (2, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in normalize_text(df).collect()}
    assert out[1].norm_text == "a café b"
    # 'é' here is the DECOMPOSED e+U+0301 (2 code points pre-NFC):
    # A,sp,sp,C,a,f,e,U+0301,tab,B,sp = 11
    assert out[1].n_before == 11
    assert out[1].n_after == 8
    assert out[1].changed == 1
    assert out[2].norm_text is None


def test_normalize_text_identity_row(spark):
    df = spark.createDataFrame([(1, "already clean")],
                               "doc_id long, text string")
    r = normalize_text(df).collect()[0]
    assert r.changed == 0 and r.n_before == r.n_after


def test_split_sentences_indices_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "one two. three!  four? "), (2, "no terminator here")],
        "doc_id long, text string")
    rows = sorted(split_sentences(df).collect(),
                  key=lambda r: (r.doc_id, r.sent_idx))
    got = [(r.doc_id, r.sent_idx, r.sentence, r.n_words) for r in rows]
    # doc 1: trailing ' ' after 'four?' becomes an empty segment ->
    # filtered, but earlier indices keep their pre-filter positions
    assert got == [(1, 0, "one two.", 2), (1, 1, "three!", 1),
                   (1, 2, "four?", 1),
                   (2, 0, "no terminator here", 3)]


def test_hll_by_group_matches_per_group_global(spark):
    rows = [(g, f"u{g}{i % 7}") for g in ("x", "y") for i in range(40)]
    df = spark.createDataFrame(rows, "grp string, key string")
    grouped = {r.grp: r for r in
               hll_by_group(df, "grp", "key", b=8).collect()}
    for g in ("x", "y"):
        solo = regs_estimate(
            hll_registers(df.where(F.col("grp") == g), "key", 8),
            8).collect()[0]
        assert grouped[g].n_registers == solo.n_registers
        assert grouped[g].z_scaled == solo.z_scaled
        assert grouped[g].est == solo.est


def test_auc_grouped_and_degenerate(spark):
    rows = [("g1", 1, 0), ("g1", 2, 1),     # perfect separation
            ("g2", 1, 1), ("g2", 2, 1)]     # degenerate: no negatives
    df = spark.createDataFrame(rows, "grp string, score long, y int")
    from datafusion_geo_spark.operators.evals import auc_exact
    out = {r.grp: r for r in
           auc_exact(df, "score", "y", group_cols=("grp",)).collect()}
    assert out["g1"].auc == 1.0
    assert out["g2"].auc is None and out["g2"].n_total == 0


def test_hist_quantiles_hand_computed(spark):
    from datafusion_geo_spark.operators.evals import hist_quantiles
    # 10 values 1..10: rank(p50)=ceil(5)=5 -> 5, p90 -> 9, p99 -> 10
    df = spark.createDataFrame([(i,) for i in range(1, 11)], "v long")
    r = hist_quantiles(df, "v", percents=(50, 90, 99)).collect()[0]
    assert (r.n_total, r.p50, r.p90, r.p99) == (10, 5, 9, 10)
    # heavy ties: 9x value 1, 1x value 2 -> p90 hits 1, p99 needs 2
    df2 = spark.createDataFrame([(1,)] * 9 + [(2,)], "v long")
    r2 = hist_quantiles(df2, "v", percents=(50, 90, 99)).collect()[0]
    assert (r2.p50, r2.p90, r2.p99) == (1, 1, 2)


def test_domain_entropy_uniform_and_skewed(spark):
    import math
    from datafusion_geo_spark.operators.text import domain_entropy
    rows = [(1, "a b c d", "u"),            # uniform over 4 words
            (2, "x x x x x x x y", "s")]    # skewed 7:1
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.domain: r for r in domain_entropy(df).collect()}
    assert out["u"].n_tokens == 4 and out["u"].vocab == 4
    # uniform: H = ln(4); replay the operator's exact chain
    s_micro_u = 0  # every cnt = 1 -> cnt*ln(cnt) = 0
    assert out["u"].s_micro == s_micro_u
    want_u = math.floor(abs(math.log(4.0)) * 1e6 + 0.5) / 1e6
    assert out["u"].entropy == want_u
    # skewed: s_micro = round(7*ln(7)*1e6); H = ln(8) - s/1e6/8
    s7 = math.floor(7.0 * math.log(7.0) * 1e6 + 0.5)
    assert out["s"].s_micro == s7
    h = math.log(8.0) - (s7 / 1e6) / 8.0
    assert out["s"].entropy == math.floor(abs(h) * 1e6 + 0.5) / 1e6
    assert out["s"].entropy < out["u"].entropy  # skew lowers diversity


def test_scd2_history_collapse_and_ties(spark):
    from datafusion_geo_spark.operators.scd import scd2_history
    rows = [
        ("u", 10, 1, "a"),
        ("u", 20, 2, "a"),   # unchanged -> collapses into version 1
        ("u", 30, 3, "b"),   # change -> version 2
        ("u", 30, 4, "a"),   # same instant, higher tiebreak -> version 3
        ("v", 5, 9, "x"),    # single-version key
    ]
    df = spark.createDataFrame(
        rows, "k string, ts long, eid long, attr string")
    out = sorted(((r.k, r.version, r.attr, r.valid_from, r.valid_to,
                   r.is_current)
                  for r in scd2_history(df, "k", "ts", "eid",
                                        ["attr"]).collect()))
    assert out == [
        ("u", 1, "a", 10, 30, 0),
        ("u", 2, "b", 30, 30, 0),   # closed by the same-instant change
        ("u", 3, "a", 30, None, 1),
        ("v", 1, "x", 5, None, 1),
    ]


def test_categorical_drift_orders_mixes(spark):
    """Identical category mixes score ~0 on both statistics; a shifted
    mix scores strictly higher on chi2 AND PSI — and the chi2 of the
    identical-mix case is exactly 0 (d_i = 0 for every category)."""
    from datafusion_geo_spark.operators.evals import categorical_drift
    same = spark.createDataFrame(
        [(c, s) for c in ("x", "y", "z") for s in (1, 0)
         for _ in range(50)], "cat string, side int")
    r_same = categorical_drift(same, "cat", "side").collect()[0]
    assert r_same["chi2_micro"] == 0
    assert r_same["psi_micro"] == 0
    shifted = spark.createDataFrame(
        [("x", 1)] * 90 + [("y", 1)] * 10 + [("z", 1)] * 50
        + [("x", 0)] * 10 + [("y", 0)] * 90 + [("z", 0)] * 50,
        "cat string, side int")
    r_sh = categorical_drift(shifted, "cat", "side").collect()[0]
    assert r_sh["n_cats"] == 3 and r_sh["n_a"] == 150 and r_sh["n_b"] == 150
    assert r_sh["chi2_micro"] > r_same["chi2_micro"]
    assert r_sh["psi_micro"] > r_same["psi_micro"]


def test_cohen_kappa_bounds_and_degenerate(spark):
    """Perfect agreement -> kappa 1; independent marginals -> ~0;
    a single-cell matrix (N^2 == PE) -> NULL, not a crash."""
    from datafusion_geo_spark.operators.evals import cohen_kappa
    perfect = spark.createDataFrame(
        [("a", "a", 50), ("b", "b", 50)], "t string, p string, n long")
    r = cohen_kappa(perfect, "t", "p", "n").collect()[0]
    assert r["kappa"] == 1.0 and r["trace"] == 100
    indep = spark.createDataFrame(
        [("a", "a", 25), ("a", "b", 25), ("b", "a", 25), ("b", "b", 25)],
        "t string, p string, n long")
    r2 = cohen_kappa(indep, "t", "p", "n").collect()[0]
    assert r2["kappa"] == 0.0
    one = spark.createDataFrame([("a", "a", 10)], "t string, p string, n long")
    assert cohen_kappa(one, "t", "p", "n").collect()[0]["kappa"] is None


def test_rbo_identical_and_disjoint_rankings(spark):
    """RBO sanity: identical top-k lists score the truncated-RBO@k
    maximum ((1-p)*sum(p^(d-1))); disjoint lists score 0; and a
    shared-prefix list scores strictly between."""
    import pyspark.sql.functions as F  # noqa: F401

    from datafusion_geo_spark.operators.evals import (rbo_overlap,
                                                      rbo_weights_micro)
    k, p = 10, 0.9
    base = [(1, 100 + r, r) for r in range(1, k + 1)]
    a = spark.createDataFrame(base, "query_id long, neighbor_id long, "
                                    "rank int")
    same = rbo_overlap(a, a, k=k, p=p).collect()[0]
    # identical lists score the truncated-RBO@k ceiling 1 - p^k
    # (~0.6513 at k=10, p=0.9 — truncated RBO has no extrapolation
    # term, so it never reaches 1); verify via the weight table
    wmax = sum(rbo_weights_micro(k, p))
    assert same["n_common"] == k
    assert abs(same["rbo"] - (1 - p) * wmax / 1e6) < 2e-6
    assert abs(same["rbo"] - (1 - p ** k)) < 1e-4
    disjoint = spark.createDataFrame(
        [(1, 900 + r, r) for r in range(1, k + 1)],
        "query_id long, neighbor_id long, rank int")
    d = rbo_overlap(a, disjoint, k=k, p=p).collect()[0]
    assert d["n_common"] == 0 and d["rbo"] == 0.0
    prefix = spark.createDataFrame(
        base[:5] + [(1, 900 + r, r) for r in range(6, k + 1)],
        "query_id long, neighbor_id long, rank int")
    m = rbo_overlap(a, prefix, k=k, p=p).collect()[0]
    assert 0.0 < m["rbo"] < same["rbo"]


def test_ndcg_identical_and_worst_orderings(spark):
    """nDCG sanity: the exact ranking scores 1.0 against itself; a
    reversed ranking of the same items scores strictly less but > 0;
    disjoint items score 0."""
    from datafusion_geo_spark.operators.evals import ndcg_overlap
    bf = spark.createDataFrame(
        [(1, 100 + r, 1.0 - 0.05 * r, r) for r in range(1, 11)],
        "query_id long, neighbor_id long, sim double, rank int")
    same = ndcg_overlap(bf, bf.select("query_id", "neighbor_id", "rank"),
                        k=10).collect()[0]
    assert same["ndcg"] == 1.0 and same["n_judged"] == 10
    rev = spark.createDataFrame(
        [(1, 100 + r, 11 - r) for r in range(1, 11)],
        "query_id long, neighbor_id long, rank int")
    r = ndcg_overlap(bf, rev, k=10).collect()[0]
    assert 0.0 < r["ndcg"] < 1.0
    disjoint = spark.createDataFrame(
        [(1, 900 + r, r) for r in range(1, 11)],
        "query_id long, neighbor_id long, rank int")
    d = ndcg_overlap(bf, disjoint, k=10).collect()[0]
    assert d["ndcg"] == 0.0 and d["dcg_num"] == 0
