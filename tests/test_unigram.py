"""Unigram-LM tokenizer trainer (operators/unigram.py): hand-checked
Viterbi DP, the longest-piece tie rule, seed substring multiplicity,
EM-round pruning/flooring, determinism + cache identity, and encode
coverage invariants.
"""

import math

import pytest

import pyspark.sql.functions as F

from datafusion_geo_spark.operators.unigram import (MAX_WORD, NEG,
                                                    _score_map,
                                                    seed_vocab,
                                                    unigram_encode_stats,
                                                    unigram_round,
                                                    unigram_train,
                                                    unigram_vocab_frame,
                                                    viterbi_bests,
                                                    viterbi_pieces,
                                                    word_dict)


def _seg(spark, word, fitted):
    smap = _score_map(fitted)
    df = spark.createDataFrame([(word,)], ["w"])
    r = df.select(
        viterbi_bests(F.col("w"), smap).alias("b"),
        viterbi_pieces(F.col("w"),
                       viterbi_bests(F.col("w"), smap), smap).alias("p")
    ).collect()[0]
    return list(r.b), list(r.p)


# ---------------------------------------------------- DP correctness

def test_viterbi_hand_dp(spark):
    # vocab: a=-10, b=-20, ab=-25  (micro ints; cnt unused by the DP)
    fitted = [("a", 0, -10), ("b", 0, -20), ("ab", 0, -25)]
    bests, pieces = _seg(spark, "aab", fitted)
    # best: '' 0; 'a' -10; 'aa' -20; 'aab': max(a+a+b=-50, a+ab=-35)
    assert bests == [0, -10, -20, -35]
    assert pieces == ["ab", "a"]  # suffix-first order


def test_viterbi_longest_piece_wins_ties(spark):
    # 'ab' scored exactly a+b: tie -> the LONGER piece is chosen
    fitted = [("a", 0, -10), ("b", 0, -20), ("ab", 0, -30)]
    bests, pieces = _seg(spark, "ab", fitted)
    assert bests == [0, -10, -30]
    assert pieces == ["ab"]


def test_viterbi_missing_pieces_fall_back_to_chars(spark):
    fitted = [("x", 0, -5), ("y", 0, -7)]
    bests, pieces = _seg(spark, "yxy", fitted)
    assert bests == [0, -7, -12, -19]
    assert pieces == ["y", "x", "y"]
    # unknown char: NEG floods the path but stays deterministic — ONE
    # unknown piece ('xz', score NEG) beats char-path -5 + NEG, and
    # the longest-k tie rule picks it in the walk too
    bests, pieces = _seg(spark, "xz", fitted)
    assert bests[-1] == NEG
    assert pieces == ["xz"]


# ----------------------------------------------------- dict and seed

def test_word_dict_caps_length(spark):
    docs = spark.createDataFrame(
        [(1, "ok " + "x" * (MAX_WORD + 1) + " ok")],
        "doc_id long, text string")
    rows = {r.w: r.n for r in word_dict(docs).collect()}
    assert rows == {"ok": 2}


def test_seed_counts_per_occurrence(spark):
    docs = spark.createDataFrame([(1, "aaa aaa")],
                                 "doc_id long, text string")
    v = {r.piece: r.cnt for r in seed_vocab(docs).collect()}
    # per word 'aaa' (n=2): 'a' x3, 'aa' x2, 'aaa' x1 occurrences
    assert v["a"] == 6 and v["aa"] == 4 and v["aaa"] == 2


def test_seed_scores_are_micro_logprobs(spark):
    docs = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    rows = {r.piece: (r.cnt, r.score_micro)
            for r in seed_vocab(docs).collect()}
    # pieces: a, b, ab each cnt 1; total 3
    want = int(math.copysign(
        math.floor(abs(math.log(1 / 3)) * 1e6 + 0.5), math.log(1 / 3)))
    assert rows == {"a": (1, want), "b": (1, want), "ab": (1, want)}


# ------------------------------------------------------- EM rounds

def test_round_floors_chars_and_prunes_multi(spark):
    docs = spark.createDataFrame(
        [(1, "the the the cat")], "doc_id long, text string")
    fitted0 = unigram_train(docs, rounds=0)
    v1 = {r.piece: r.cnt for r in
          unigram_round(word_dict(docs), fitted0, 2).collect()}
    # 'the' segments as the whole-word piece (highest seed count)
    assert v1.get("the") == 3
    # chars not used by any Viterbi path keep the +1 floor
    assert v1["h"] == 1 and v1["e"] == 1
    # multi pruned to cap 2
    assert sum(1 for p in v1 if len(p) > 1) <= 2


@pytest.mark.slow
def test_train_deterministic_and_cached(spark):
    docs = spark.createDataFrame(
        [(1, "banana bandana banana"), (2, "ban dan ana")],
        "doc_id long, text string")
    a = unigram_train(docs, rounds=2, seed_multi_cap=16,
                      vocab_multi_cap=8)
    b = unigram_train(docs, rounds=2, seed_multi_cap=16,
                      vocab_multi_cap=8)
    assert a == b
    c = unigram_train(docs, rounds=2, seed_multi_cap=16,
                      vocab_multi_cap=8, cache_key="t")
    d = unigram_train(docs, rounds=2, seed_multi_cap=16,
                      vocab_multi_cap=8, cache_key="t")
    assert c is d and c == a
    # frame twin matches the collected model
    frame = unigram_vocab_frame(docs, rounds=2, seed_multi_cap=16,
                                vocab_multi_cap=8)
    from datafusion_geo_spark.operators.unigram import _collect_fitted
    assert _collect_fitted(frame) == a


def test_pieces_reassemble_words(spark):
    docs = spark.createDataFrame(
        [(1, "tokenizer tokens token izer"), (2, "ken to izer ize")],
        "doc_id long, text string")
    fitted = unigram_train(docs, rounds=2, seed_multi_cap=16,
                           vocab_multi_cap=8)
    smap = _score_map(fitted)
    dic = word_dict(docs)
    rows = dic.select(
        "w", viterbi_pieces(F.col("w"),
                            viterbi_bests(F.col("w"), smap),
                            smap).alias("p")).collect()
    for r in rows:
        # suffix-first: reversed concatenation reproduces the word
        assert "".join(reversed(r.p)) == r.w


def test_encode_stats_invariants(spark):
    docs = spark.createDataFrame(
        [(1, "en", "aa bb aa"), (2, "de", "ccc dd")],
        "doc_id long, lang string, text string")
    fitted = unigram_train(docs, rounds=1, seed_multi_cap=8,
                           vocab_multi_cap=4)
    r = {x.lang: x for x in
         unigram_encode_stats(docs, fitted).collect()}
    assert r["en"].n_words == 3 and r["en"].n_chars == 6
    assert r["de"].n_words == 2 and r["de"].n_chars == 5
    for x in r.values():
        assert x.n_words <= x.n_tokens <= x.n_chars
        assert x.fertility == round(x.n_tokens / x.n_words, 6)


def test_streaming_fertility_equals_batch(spark):
    # the bounded availableNow replay must reproduce the batch report
    # row-for-row (shared row cols + shared 6-dp tail)
    import os
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR",
                        "/root/testdata/sf0.001")
    import __spark_entry__ as entrymod
    b = {tuple(r) for r in
         entrymod.queries()["unigram_fertility"](spark, sf).collect()}
    s = {tuple(r) for r in
         entrymod.queries()["streaming_unigram_fertility"](spark, sf)
         .collect()}
    assert b == s and len(b) > 0
