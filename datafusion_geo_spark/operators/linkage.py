"""Fellegi-Sunter record-linkage scoring — probabilistic match weights
over blocked candidate pairs (Fellegi & Sunter 1969; the Splink-style
workflow), completing the entity-resolution family next to the
edit-distance blocker (operators/edit_join.py) and the fuzzy-dedup
review table (fuzzy_title_dedup).

Model: for each comparison field f, a pair scores
``ln(m_f/u_f)`` on agreement and ``ln((1-m_f)/(1-u_f))`` on
disagreement; the pair's total is the sum over fields. ``u_f`` (the
chance two RANDOM records agree on f) is estimated EXACTLY from the
field's value histogram: u = sum_v n_v^2 / N^2 — two exact int64
aggregates per field, no sampling. ``m_f`` (the chance true duplicates
agree) is a per-field constant the caller asserts (the classic
unsupervised shortcut; EM refinement would slot in here).

Engine-exactness: every ln() factor is micro-int'ed independently
(w_agree = sm(ln m) - sm(ln u), w_dis = sm(ln(1-m)) - sm(ln(1-u)) —
the nbayes.py discipline), so pair scores are exact int64 sums and
histogram/ranking replays are bit-for-bit.

100 TB shape: u estimation is one grouped count per field (map-side
combined); the candidate generator is the caller's BLOCKER (an
equi-join on the block key — never all-pairs; audit the key with
profile.skew_audit first); weights are k tiny rows folded into the
join projection as literals (the mlfit bounded-driver-fold contract).
"""

from __future__ import annotations

import math
from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _sm(x: float) -> int:
    """Driver-side signed 6-dp micro-int (unigram._smicro twin —
    Python floats ARE IEEE doubles, so the value matches the engine
    expression bit-for-bit)."""
    s = -1.0 if x < 0 else 1.0
    return int(s * math.floor(abs(x) * 1e6 + 0.5))


def fs_field_weights(df: DataFrame, fields: Sequence[str],
                     m: float = 0.9) -> DataFrame:
    """Per-field u estimate and match weights: (field, n, u_num,
    u_den, w_agree_micro, w_dis_micro). u_num = sum of squared value
    counts, u_den = N^2, both exact int64 (NULL field values are
    excluded from both); the micro weights use the driver-side twin
    of the engine's signed micro-int, computed from the collected
    (u_num, u_den) pair — k tiny rows, the mlfit contract."""
    rows = []
    for f in fields:
        hist = (df.where(F.col(f).isNotNull())
                .groupBy(F.col(f).alias("_v"))
                .agg(F.count(F.lit(1)).cast("long").alias("_c")))
        r = hist.agg(
            F.sum("_c").cast("long").alias("n"),
            F.sum(F.col("_c") * F.col("_c")).cast("long")
            .alias("u_num")).collect()[0]
        n, u_num = r["n"] or 0, r["u_num"] or 0
        u_den = n * n
        if n == 0 or u_num >= u_den:
            raise ValueError(
                f"fs_field_weights: field '{f}' is empty or constant "
                "— it carries no linkage information; drop it")
        u = u_num / u_den  # one IEEE division of exact ints
        rows.append((f, n, u_num, u_den,
                     _sm(math.log(m)) - _sm(math.log(u)),
                     _sm(math.log(1.0 - m)) - _sm(math.log(1.0 - u))))
    return df.sparkSession.createDataFrame(
        rows, "field string, n long, u_num long, u_den long, "
              "w_agree_micro long, w_dis_micro long")


def fs_score_pairs(df: DataFrame, block_col: str,
                   fields: Sequence[str], id_col: str,
                   m: float = 0.9) -> DataFrame:
    """Score all same-block pairs: (a_id, b_id, score_micro). The
    self-join runs on the BLOCK key only (the caller's blocker —
    never all-pairs); the per-field agree/disagree weights fold into
    the join projection as literals. NULL-vs-anything on a field
    counts as disagreement (the conservative convention)."""
    w = {r["field"]: (r["w_agree_micro"], r["w_dis_micro"])
         for r in fs_field_weights(df, fields, m).collect()}
    a = df.select(F.col(id_col).alias("a_id"),
                  F.col(block_col).alias("_blk"),
                  *[F.col(f).alias(f"a_{f}") for f in fields])
    b = df.select(F.col(id_col).alias("b_id"),
                  F.col(block_col).alias("_blk"),
                  *[F.col(f).alias(f"b_{f}") for f in fields])
    pairs = a.join(b, "_blk").where(F.col("a_id") < F.col("b_id"))
    score = None
    for f in fields:
        wa, wd = w[f]
        t = F.when(F.col(f"a_{f}").eqNullSafe(F.col(f"b_{f}"))
                   & F.col(f"a_{f}").isNotNull(),
                   F.lit(wa)).otherwise(F.lit(wd)).cast("long")
        score = t if score is None else score + t
    return pairs.select("a_id", "b_id", score.alias("score_micro"))


def fs_score_histogram(df: DataFrame, block_col: str,
                       fields: Sequence[str], id_col: str,
                       m: float = 0.9) -> DataFrame:
    """The linkage review artifact: (score_micro, n_pairs) — the
    score distribution a match threshold is chosen from, bounded by
    2^|fields| distinct scores whatever the corpus size."""
    return (fs_score_pairs(df, block_col, fields, id_col, m)
            .groupBy("score_micro")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pairs")))


#: Soundex digit classes for A..Z (vowels + H/W/Y -> 0).
_SOUNDEX_MAP = "01230120022455012623010202"


def phonetic_code_col(name_col: str) -> F.Column:
    """Simplified-Soundex phonetic code of a name column — the
    classic blocking key for record linkage (group candidate pairs
    by how a name SOUNDS, so 'Pfister'/'Fister' land in one block).

    Variant semantics (documented, identical in Spark and any SQL
    replay): the first alphabetic run of the string is coded; codes
    are the standard Soundex digit classes; ADJACENT equal digits
    collapse (so same-class letters separated by a vowel code twice,
    the standard rule) but H and W act as vowels rather than
    transparent separators (the one deviation from ANSI Soundex —
    'ASHCRAFT' codes A226 here vs A261 there; 'ROBERT' R163,
    'PFISTER' P236, 'TYMCZAK' T522, 'JACKSON' J250 all match the
    standard). Built entirely from JVM string built-ins (translate +
    six fixed run-collapse regexes) — no UDF, and every step has a
    verbatim DuckDB twin (regexp_replace with the 'g' flag).

    Returns NULL for strings with no ASCII letter."""
    w = F.upper(F.regexp_extract(F.col(name_col), "[A-Za-z]+", 0))
    m = F.translate(w, "ABCDEFGHIJKLMNOPQRSTUVWXYZ", _SOUNDEX_MAP)
    for d in "123456":
        m = F.regexp_replace(m, f"{d}{d}+", d)
    digits = F.replace(F.substring(m, 2, 1_000_000),
                       F.lit("0"), F.lit(""))
    code = F.concat(F.substring(w, 1, 1),
                    F.rpad(F.substring(digits, 1, 3), 3, "0"))
    return F.when(F.length(w) > 0, code)


def phonetic_blocks(df: DataFrame, name_col: str,
                    id_col: str) -> DataFrame:
    """Phonetic blocking audit: one row per Soundex block with its
    size and candidate-pair count — the skew check run BEFORE
    feeding the code to fs_score_histogram as the block key (one
    grouped aggregate; n_pairs = n(n−1)/2 via the exact shiftright
    halving). Returns (code, n, n_distinct_names, n_pairs), rows
    with an uncodable name excluded."""
    code = phonetic_code_col(name_col)
    g = (df.select(code.alias("code"),
                   F.col(name_col).alias("_nm"),
                   F.col(id_col).alias("_id"))
         .where(F.col("code").isNotNull())
         .groupBy("code")
         .agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.count_distinct(F.col("_nm")).cast("long")
              .alias("n_distinct_names")))
    return g.select(
        "code", "n", "n_distinct_names",
        F.shiftright(F.col("n") * (F.col("n") - 1), 1)
        .alias("n_pairs"))
