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
