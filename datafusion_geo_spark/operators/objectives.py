"""Training-objective construction — the last pipeline stage before a
trainer sees the data.

span_corruption builds T5/UL2-style denoising examples: deterministic
hash-chosen spans of each document are replaced by sentinel tokens in
the ``inputs`` string, and the dropped tokens (each span prefixed by
its sentinel) become the ``targets`` string. Everything is md5-coin
deterministic and ordered-aggregate exact, so the DuckDB oracle
replays examples byte-for-byte.

Span selection: a word position p is a span CANDIDATE when
h64(seed|doc|p) % 1000 < round(1000 * density / mean_span); its length
is 2 + h64(seed|doc|p|L) % 3 (mean 3). Overlapping candidate spans are
MERGED into maximal islands by the same gaps-and-islands window
dedup.dup_span_stats uses (a well-defined deterministic variant of
T5's sequential greedy drawing — the union of candidate spans is the
corrupted region). Expected corruption ~= density, slightly above on
dense collisions.

Scale shape: one posexplode of words, a bounded explode of candidate
spans (len <= 4), windows PARTITIONED BY doc_id (parallelism grows
with the corpus), ordered per-doc aggregation — no shuffle wider than
(doc, pos) rows, no UDF anywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from .dedup import h64
from .text import words_col


def _ordered_join(col_struct_pos: Column) -> Column:
    """array of (ord, s) structs -> space-joined s in ord order."""
    return F.array_join(
        F.transform(F.array_sort(col_struct_pos), lambda x: x["s"]), " ")


def span_corruption(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", density_permille: int = 50,
                    seed: str = "sc1") -> DataFrame:
    """T5-style span-corruption examples per document. Returns
    (id, inputs, targets, n_spans, n_corrupt_tokens, n_words)."""
    toks = (df.select(F.col(id_col).alias("doc_id"),
                      words_col(F.col(text_col)).alias("w"))
            .select("doc_id", F.size("w").cast("long").alias("n_words"),
                    F.posexplode("w").alias("pos", "tok")))
    coin = h64(F.concat(F.lit(seed), F.lit("|"),
                        F.col("doc_id").cast("string"), F.lit("|"),
                        F.col("pos").cast("string")))
    slen = F.lit(2) + (h64(F.concat(
        F.lit(seed), F.lit("|"), F.col("doc_id").cast("string"),
        F.lit("|"), F.col("pos").cast("string"), F.lit("|L")))
        % F.lit(3)).cast("int")
    cand = (toks.where(coin % F.lit(1000) < F.lit(density_permille))
            .select("doc_id", "pos", slen.alias("slen")))
    wprev = (Window.partitionBy("doc_id").orderBy("pos")
             .rowsBetween(Window.unboundedPreceding, -1))
    wrun = (Window.partitionBy("doc_id").orderBy("pos")
            .rowsBetween(Window.unboundedPreceding, 0))
    cand = (cand
            .withColumn("prev_end",
                        F.coalesce(F.max(F.col("pos") + F.col("slen")
                                         - F.lit(1)).over(wprev),
                                   F.lit(-1)))
            .withColumn("new_isl",
                        (F.col("pos") > F.col("prev_end")).cast("long"))
            .withColumn("isl", F.sum("new_isl").over(wrun)))
    # candidate span -> covered positions (bounded explode, len <= 4);
    # distinct because same-island candidates may overlap
    cov = (cand.select("doc_id", "isl",
                       F.explode(F.sequence(
                           F.col("pos"),
                           F.col("pos") + F.col("slen") - F.lit(1)))
                       .alias("pos"))
           .distinct())
    # clip to the document (a span may run past the last word)
    tk = toks.join(cov, ["doc_id", "pos"], "left")
    first_cov = (Window.partitionBy("doc_id", "isl"))
    tk = tk.withColumn(
        "isl_first",
        F.when(F.col("isl").isNotNull(),
               F.min("pos").over(first_cov)))
    sentinel = F.concat(F.lit("<X_"), F.col("isl").cast("string"),
                        F.lit(">"))
    # inputs: plain token outside islands; sentinel at each island's
    # first covered position; nothing elsewhere inside an island
    in_piece = (F.when(F.col("isl").isNull(), F.col("tok"))
                .when(F.col("pos") == F.col("isl_first"), sentinel))
    # targets: every covered token, the island's first prefixed by its
    # sentinel — ordered by position, islands are position-ordered too
    tgt_piece = F.when(
        F.col("isl").isNotNull(),
        F.when(F.col("pos") == F.col("isl_first"),
               F.concat(sentinel, F.lit(" "), F.col("tok")))
        .otherwise(F.col("tok")))
    agg = (tk.groupBy("doc_id", "n_words").agg(
        _ordered_join(F.collect_list(
            F.when(in_piece.isNotNull(),
                   F.struct(F.col("pos").alias("ord"),
                            in_piece.alias("s"))))).alias("inputs"),
        _ordered_join(F.collect_list(
            F.when(tgt_piece.isNotNull(),
                   F.struct(F.col("pos").alias("ord"),
                            tgt_piece.alias("s"))))).alias("targets"),
        F.countDistinct("isl").alias("n_spans"),
        F.sum(F.col("isl").isNotNull().cast("long"))
        .alias("n_corrupt_tokens")))
    return (agg.select(F.col("doc_id").alias(id_col),
                       F.coalesce("inputs", F.lit("")).alias("inputs"),
                       F.coalesce("targets", F.lit("")).alias("targets"),
                       F.col("n_spans").cast("long").alias("n_spans"),
                       F.coalesce("n_corrupt_tokens", F.lit(0))
                       .cast("long").alias("n_corrupt_tokens"),
                       "n_words"))


def mlm_masking(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", density_permille: int = 150,
                seed: str = "mm1") -> DataFrame:
    """BERT-style MLM example construction: ~density/1000 of word
    positions are selected by md5 coin; of those, 8/10 become [MASK],
    1/10 are replaced by a RANDOM vocabulary word (hash-indexed into
    the alphabetically-ordered corpus vocabulary — deterministic in
    any engine), 1/10 keep the original token. Returns per doc the
    corrupted text, the ordered "pos:original" label string, and the
    mask/replace/keep counts — all byte-replayable.

    The replacement pool is the TOP-1024 most common tokens (selected
    with the vocab_encode distributed sort+limit — a partition-less
    window over the full vocabulary would single-task at 100 TB; a
    bounded pool broadcasts). The one-row pool-size frame rides a
    broadcast cross (the tfidf corpus-size pattern); windows again
    partition by doc_id."""
    toks = (df.select(F.col(id_col).alias("doc_id"),
                      words_col(F.col(text_col)).alias("w"))
            .select("doc_id", F.size("w").cast("long").alias("n_words"),
                    F.posexplode("w").alias("pos", "tok")))

    def coin(tag: str) -> Column:
        return h64(F.concat(F.lit(seed), F.lit("|"),
                            F.col("doc_id").cast("string"), F.lit("|"),
                            F.col("pos").cast("string"), F.lit(tag)))

    pool = (toks.groupBy("tok").agg(F.count(F.lit(1)).alias("_c"))
            .orderBy(F.col("_c").desc(), F.col("tok").asc())
            .limit(1024))
    wv = Window.orderBy(F.col("_c").desc(), F.col("tok").asc())
    vocab = F.broadcast(
        pool.withColumn("vidx", (F.row_number().over(wv) - F.lit(1))
                        .cast("long"))
        .select(F.col("tok").alias("vtok"), "vidx"))
    nv = F.broadcast(vocab.agg(F.count(F.lit(1)).alias("n_vocab")))
    sel = toks.crossJoin(nv).select(
        "doc_id", "n_words", "pos", "tok",
        (coin("") % F.lit(1000) < F.lit(density_permille)).alias("hit"),
        (coin("|A") % F.lit(10)).alias("act"),
        (coin("|R") % F.col("n_vocab")).alias("ridx"))
    sel = (sel.join(vocab, sel["ridx"] == vocab["vidx"], "left")
           .drop("vidx", "ridx"))
    piece = (F.when(~F.col("hit"), F.col("tok"))
             .when(F.col("act") < 8, F.lit("[MASK]"))
             .when(F.col("act") == 8, F.col("vtok"))
             .otherwise(F.col("tok")))
    lab = F.when(F.col("hit"),
                 F.concat(F.col("pos").cast("string"), F.lit(":"),
                          F.col("tok")))
    agg = (sel.groupBy("doc_id", "n_words").agg(
        _ordered_join(F.collect_list(
            F.struct(F.col("pos").alias("ord"),
                     piece.alias("s")))).alias("masked"),
        _ordered_join(F.collect_list(
            F.when(lab.isNotNull(),
                   F.struct(F.col("pos").alias("ord"),
                            lab.alias("s"))))).alias("labels"),
        F.sum((F.col("hit") & (F.col("act") < 8)).cast("long"))
        .alias("n_masked"),
        F.sum((F.col("hit") & (F.col("act") == 8)).cast("long"))
        .alias("n_replaced"),
        F.sum((F.col("hit") & (F.col("act") == 9)).cast("long"))
        .alias("n_kept")))
    return agg.select(F.col("doc_id").alias(id_col),
                      F.coalesce("masked", F.lit("")).alias("masked"),
                      F.coalesce("labels", F.lit("")).alias("labels"),
                      "n_masked", "n_replaced", "n_kept", "n_words")
