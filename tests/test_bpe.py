"""BPE merge training: agreement with a pure-Python reference
implementation of dict-based BPE, greedy-fold semantics, and apply."""

import re
from collections import Counter

import pytest

from datafusion_geo_spark.operators.bpe import SEP, bpe_apply, bpe_train


def _python_bpe(texts, rounds):
    """Reference dict-based BPE with (count desc, pair asc) tie-break."""
    vocab = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.strip()):
            if w:
                vocab[w] += 1
    state = {w: list(w) for w in vocab}
    merges = []
    for r in range(rounds):
        pairs = Counter()
        for w, toks in state.items():
            for a, b in zip(toks, toks[1:]):
                pairs[a + SEP + b] += vocab[w]
        if not pairs:
            break
        top = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        left, right = top[0].split(SEP)
        merged = left + right
        merges.append((r, left, right, merged, top[1]))
        for w, toks in state.items():
            out = []
            for v in toks:
                if out and out[-1] == left and v == right:
                    out[-1] = merged
                else:
                    out.append(v)
            state[w] = out
    return merges, state


TEXTS = ["the cat sat on the mat",
         "the mats that the cats sat on",
         "a banana and a bandana",
         "then there the theory"]


def test_bpe_train_matches_python_reference(spark):
    docs = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
    got = [(r["merge_rank"], r["left_tok"], r["right_tok"], r["merged"],
            r["pair_count"])
           for r in bpe_train(docs, "text", rounds=6)
           .orderBy("merge_rank").collect()]
    want, _ = _python_bpe(TEXTS, 6)
    assert got == want


def test_bpe_first_merge_is_th(spark):
    # 'th' is the most frequent adjacent pair in TEXTS by construction
    docs = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
    first = bpe_train(docs, "text", rounds=1).collect()[0]
    assert (first["left_tok"], first["right_tok"]) == ("t", "h")


def test_bpe_apply_matches_python_state(spark):
    docs = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
    merges_df = bpe_train(docs, "text", rounds=5).orderBy("merge_rank")
    triples = [(r["left_tok"], r["right_tok"], r["merged"])
               for r in merges_df.collect()]
    _, state = _python_bpe(TEXTS, 5)
    out = bpe_apply(docs, "text", triples).collect()
    for row in out:
        words = [w for w in re.split(r"\s+", row["text"].strip()) if w]
        assert row["bpe_tokens"] == [state[w] for w in words]


def test_bpe_guards(spark):
    docs = spark.createDataFrame([("x",)], ["text"])
    with pytest.raises(ValueError):
        bpe_train(docs, "text", rounds=0)
    # fewer pairs than rounds: stops early without error
    got = bpe_train(docs, "text", rounds=3).collect()
    assert got == []


def test_merge_fold_property(spark):
    """F.aggregate greedy fold == the pure-Python greedy scan for
    random token sequences over a tiny alphabet (adversarial for
    overlapping pairs like (a,a) on 'a a a')."""
    import itertools
    import pyspark.sql.functions as F
    from datafusion_geo_spark.operators.bpe import merge_fold

    alpha = ["a", "b"]
    seqs = [list(t) for n in range(0, 6)
            for t in itertools.product(alpha, repeat=n)]
    df = spark.createDataFrame([(s,) for s in seqs], "toks: array<string>")
    for left, right in (("a", "a"), ("a", "b"), ("b", "a")):
        merged = left + right
        got = [r["m"] for r in
               df.select(merge_fold(F.col("toks"), left, right, merged)
                         .alias("m")).collect()]
        for s, g in zip(seqs, got):
            out = []
            for v in s:
                if out and out[-1] == left and v == right:
                    out[-1] = merged
                else:
                    out.append(v)
            assert g == out, (s, left, right, g, out)
