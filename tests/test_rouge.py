"""ROUGE-L (operators/evals.py lcs_len_col / rouge_l_corpus): JVM
integer LCS DP vs a Python reference, micro-averaged corpus ratios."""

import pyspark.sql.functions as F

from datafusion_geo_spark.operators.evals import (lcs_len_col,
                                                  rouge_l_corpus)


def _lcs_py(a, b):
    old = [0] * (len(b) + 1)
    for h in a:
        new = [0]
        for j, w in enumerate(b, 1):
            new.append(old[j - 1] + 1 if h == w
                       else max(old[j], new[-1]))
        old = new
    return old[-1]


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, cand string, "
                                       "ref string")


def test_lcs_matches_python_reference(spark):
    import random
    rng = random.Random(7)
    vocab = list("abcde")
    rows = []
    for i in range(25):
        c = " ".join(rng.choices(vocab, k=rng.randint(0, 12)))
        r = " ".join(rng.choices(vocab, k=rng.randint(0, 12)))
        rows.append((i, c, r))
    df = _pairs(spark, rows).select(
        "doc_id",
        lcs_len_col(F.split(F.col("cand"), " "),
                    F.split(F.col("ref"), " ")).alias("lcs"))
    got = {r.doc_id: r.lcs for r in df.collect()}
    for i, c, r in rows:
        cw = [w for w in c.split(" ") if w]
        rw = [w for w in r.split(" ") if w]
        # split(" ") on "" gives [""] -> filtered != lcs input; rebuild
        # the exact arrays the operator saw (split keeps empties)
        want = _lcs_py(c.split(" "), r.split(" "))
        assert got[i] == want, (i, c, r, got[i], want)
        del cw, rw


def test_lcs_classic_cases(spark):
    rows = [(1, "a b c a", "b a c"),      # LCS 2
            (2, "x y z", "x y z"),        # identical -> 3
            (3, "a a a", "b b b"),        # disjoint -> 0
            (4, "", "a b"),               # empty cand -> 0
            (5, "a b", "")]               # empty ref -> 0
    out = rouge_l_corpus(_pairs(spark, rows), "cand", "ref") \
        .collect()[0]
    assert out.n_pairs == 5
    assert out.lcs_sum == 2 + 3 + 0 + 0 + 0
    assert out.cand_words == 4 + 3 + 3 + 0 + 2
    assert out.ref_words == 3 + 3 + 3 + 2 + 0
    # micro F1 = 2S/(H+M) = 10/23, 6-dp half-away
    assert out.rouge_f == 0.434783


def test_rouge_window_truncates(spark):
    # 40-token identical pair, window 32 -> lcs = 32 both sides
    t = " ".join(str(i) for i in range(40))
    out = rouge_l_corpus(_pairs(spark, [(1, t, t)]), "cand", "ref") \
        .collect()[0]
    assert (out.lcs_sum, out.cand_words, out.ref_words) == (32, 32, 32)
    assert out.rouge_p == 1.0 and out.rouge_r == 1.0


def test_rouge_zero_denominator_null(spark):
    out = rouge_l_corpus(_pairs(spark, [(1, "", "")]), "cand", "ref") \
        .collect()[0]
    assert out.rouge_p is None and out.rouge_r is None \
        and out.rouge_f is None


def test_lcs_bit_parallel_parity(spark):
    """r11 optimization: the Allison-Dix bit-parallel path (max_ref
    given, <= 52) must agree with the row-fold path and the Python
    reference on fuzz pairs, including empties and the max_ref
    boundary lengths."""
    import random
    rng = random.Random(11)
    vocab = list("abcdef")
    rows = []
    for i in range(60):
        c = " ".join(rng.choices(vocab, k=rng.randint(0, 52)))
        r = " ".join(rng.choices(vocab, k=rng.randint(0, 52)))
        rows.append((i, c, r))
    rows.append((100, "", ""))
    rows.append((101, "a b c", ""))
    rows.append((102, "", "a b c"))
    rows.append((103, " ".join(vocab * 8)[:1000],
                 " ".join(reversed(vocab * 8))[:1000]))
    df = _pairs(spark, rows).select(
        "doc_id",
        lcs_len_col(F.split(F.col("cand"), " "),
                    F.split(F.col("ref"), " "),
                    max_ref=52).alias("bits"),
        lcs_len_col(F.split(F.col("cand"), " "),
                    F.split(F.col("ref"), " ")).alias("fold"))
    for row in df.collect():
        assert row.bits == row.fold, (row.doc_id, row.bits, row.fold)


def test_lcs_bit_parallel_null_arrays(spark):
    """NULL token arrays (e.g. a NULL text column upstream) must take
    the same value through both paths (the when() guard routes NULL
    sizes to the otherwise(0) arm identically), not crash."""
    df = spark.createDataFrame(
        [(1, None, "a b"), (2, "a b", None)],
        "doc_id long, cand string, ref string").select(
        "doc_id",
        lcs_len_col(F.split(F.col("cand"), " "),
                    F.split(F.col("ref"), " "),
                    max_ref=52).alias("bits"),
        lcs_len_col(F.split(F.col("cand"), " "),
                    F.split(F.col("ref"), " ")).alias("fold"))
    for row in df.collect():
        assert row.bits == row.fold, row
