"""reservoir_sample (fixed-k uniform md5-coin draw) and
bpe.tokenizer_stats (per-language fertility / byte-coverage table):
brute-force agreement, determinism, and the exact-int64 ratio
identity."""

import re
from collections import Counter

import pytest

import pyspark.sql.functions as F

from datafusion_geo_spark.operators.bpe import bpe_apply, bpe_train, \
    tokenizer_stats
from datafusion_geo_spark.operators.sampling import reservoir_sample


def _docs_df(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "the rain in spain stays mainly in the plain", "en"),
        (2, "der schnelle braune fuchs springt", "de"),
        (3, "die ratte rennt durch die gasse", "de"),
        (4, "", "en"),          # empty text still counts as a doc
        (5, "le chat noir dort", None),  # NULL lang is excluded
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, "
                                       "lang string")


def test_reservoir_sample_matches_bruteforce(spark):
    import hashlib
    df = spark.range(0, 500).select(F.col("id").alias("k"),
                                    (F.col("id") * 7).alias("v"))
    got = {(r["k"], r["sample_rank"])
           for r in reservoir_sample(df, "k", 20).collect()}
    coins = sorted((hashlib.md5(str(i).encode()).hexdigest(), i)
                   for i in range(500))
    want = {(i, rank + 1) for rank, (_, i) in enumerate(coins[:20])}
    assert got == want


def test_reservoir_sample_deterministic_and_partition_invariant(spark):
    df = spark.range(0, 300).select(F.col("id").alias("k"))
    a = sorted(reservoir_sample(df, "k", 15).collect())
    b = sorted(reservoir_sample(df.repartition(7), "k", 15).collect())
    assert a == b
    assert len(a) == 15


def test_reservoir_sample_k_larger_than_input(spark):
    df = spark.range(0, 5).select(F.col("id").alias("k"))
    out = reservoir_sample(df, "k", 50).collect()
    assert len(out) == 5
    assert sorted(r["sample_rank"] for r in out) == [1, 2, 3, 4, 5]


def test_reservoir_sample_guards(spark):
    df = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        reservoir_sample(df, "k", 0)


def test_tokenizer_stats_matches_bruteforce(spark):
    docs = _docs_df(spark)
    merges_df = bpe_train(docs, "text", rounds=4)
    triples = [(r["left_tok"], r["right_tok"], r["merged"])
               for r in merges_df.orderBy("merge_rank").collect()]
    got = {r["lang"]: r.asDict()
           for r in tokenizer_stats(docs, triples).collect()}

    # brute force via bpe_apply (the already-verified encoder)
    enc = bpe_apply(docs.where(F.col("lang").isNotNull()),
                    "text", triples).collect()
    want = {}
    for row in enc:
        lang = row["lang"]
        st = want.setdefault(lang, Counter())
        st["n_docs"] += 1
        for toks in row["bpe_tokens"]:
            st["n_words"] += 1
            st["n_tokens"] += len(toks)
            st["n_chars"] += sum(len(t) for t in toks)
            st["covered"] += sum(len(t) for t in toks if len(t) >= 2)
    for lang, st in want.items():
        g = got[lang]
        assert g["n_docs"] == st["n_docs"]
        assert g["n_words"] == st["n_words"]
        assert g["n_tokens"] == st["n_tokens"]
        assert g["n_chars"] == st["n_chars"]
        # exact-int64 half-up micro identity
        assert g["fertility_micro"] == (
            2 * st["n_tokens"] * 1000000 + st["n_words"]) \
            // (2 * st["n_words"])
        assert g["coverage_micro"] == (
            2 * st["covered"] * 1000000 + st["n_chars"]) \
            // (2 * st["n_chars"])
    assert set(got) == set(want)  # NULL lang excluded, both langs in


def test_tokenizer_stats_ranges(spark):
    docs = _docs_df(spark)
    triples = [(r["left_tok"], r["right_tok"], r["merged"])
               for r in bpe_train(docs, "text", rounds=4)
               .orderBy("merge_rank").collect()]
    for r in tokenizer_stats(docs, triples).collect():
        # fertility: between 1 token/word and chars/word tokens/word
        assert 1_000_000 <= r["fertility_micro"]
        assert r["n_tokens"] <= r["n_chars"]
        # coverage is a share of bytes: [0, 1] in micro units
        assert 0 <= r["coverage_micro"] <= 1_000_000


def test_streaming_reservoir_split_insensitive(spark, tmp_path):
    """The union-of-emissions argument (streaming/sketch.py
    streaming_reservoir): a genuinely multi-batch run
    (maxFilesPerTrigger=1 over 3 files) must produce exactly the batch
    reservoir_sample of the same rows."""
    from datafusion_geo_spark.streaming.sketch import streaming_reservoir

    rows = [(i, f"l{i % 3}", f"s{i % 5}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, "
                                     "source string")
    d = str(tmp_path / "docs_stream")
    # 3 files -> 3 micro-batches with maxFilesPerTrigger=1
    for part in range(3):
        df.where(F.col("doc_id") % 3 == part).coalesce(1) \
          .write.mode("append").parquet(d)
    stream = (spark.readStream.schema(df.schema)
              .option("maxFilesPerTrigger", 1).parquet(d))
    got = sorted(streaming_reservoir(spark, sf_dir="unused", k=20,
                                     salts=4, docs=stream).collect())
    want = sorted(reservoir_sample(df, "doc_id", 20)
                  .select("doc_id", "lang", "source", "sample_rank")
                  .collect())
    assert got == want


def test_embedding_drift_matches_bruteforce(spark):
    """embedding_drift (operators/evals.py): per-label mean-vector
    cosine against a local numpy replay with the identical 6-dp
    rounding discipline."""
    import math

    from datafusion_geo_spark.operators.evals import embedding_drift

    def r6(x):
        s = 0.0 if x == 0.0 else (1.0 if x > 0.0 else -1.0)
        return s * math.floor(abs(x) * 1e6 + 0.5) / 1e6 + 0.0

    old_rows = [(i % 3, [float(i % 5), float((i * 3) % 7), 1.0])
                for i in range(60)]
    new_rows = [(i % 3, [float(i % 5) + 0.25, float((i * 3) % 7), 1.5])
                for i in range(45)]
    old = spark.createDataFrame(old_rows, "label int, v array<double>")
    new = spark.createDataFrame(new_rows, "label int, v array<double>")
    got = {r["label"]: r.asDict()
           for r in embedding_drift(old, new).collect()}

    for lbl in (0, 1, 2):
        ov = [v for l, v in old_rows if l == lbl]
        nv = [v for l, v in new_rows if l == lbl]
        mo = [r6(sum(col) / len(ov)) for col in zip(*ov)]
        mn = [r6(sum(col) / len(nv)) for col in zip(*nv)]
        dot = 0.0
        for a, b in zip(mo, mn):
            dot = dot + a * b
        no = math.sqrt(sum(a * a for a in mo))
        nn = math.sqrt(sum(b * b for b in mn))
        cs = r6(dot / (no * nn))
        want_micro = int(math.copysign(
            math.floor(abs(cs) * 1e6 + 0.5), cs))
        g = got[lbl]
        assert g["n_old"] == len(ov) and g["n_new"] == len(nv)
        assert g["cos_micro"] == want_micro


def test_tokenizer_selection_matches_per_variant_stats(spark):
    """tokenizer_selection_stats must equal tokenizer_stats run per
    merge-prefix — the one-corpus-pass sweep is a pure refactor of the
    per-variant union."""
    from datafusion_geo_spark.operators.bpe import tokenizer_selection_stats

    docs = _docs_df(spark)
    triples = [(r["left_tok"], r["right_tok"], r["merged"])
               for r in bpe_train(docs, "text", rounds=4)
               .orderBy("merge_rank").collect()]
    got = sorted(
        tuple(r) for r in
        tokenizer_selection_stats(docs, triples, variants=(1, 2, 4))
        .collect())
    want = []
    for n in (1, 2, 4):
        for r in tokenizer_stats(docs, triples[:n]).collect():
            want.append((n, r["lang"], r["n_tokens"],
                         r["fertility_micro"], r["coverage_micro"]))
    assert got == sorted(want)
