"""Slowly-changing-dimension (SCD type 2) history construction — the
warehouse-maintenance primitive next to the hourly rollup: turn an
event/change stream into versioned dimension rows with validity
intervals.

``scd2_history``: per key, ordered by (ts, tiebreak), emit one row per
VALUE CHANGE with [valid_from, valid_to) and an is_current flag —
consecutive duplicates collapse (a re-sent unchanged record must not
open a new version). Two windows over the same key partitioning (one
shuffle): change detection by lag, then valid_to by lead over the
SURVIVORS only, so a version's end is the next version's start, not
the next raw event.

Scale shape: both windows PARTITION BY the key — parallelism scales
with the key population; no global sort, no join. The deterministic
(ts, tiebreak) order makes the whole history a pure function of the
input, which is what lets the DuckDB oracle replay it row-for-row.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

__all__ = ["scd2_history"]


def scd2_history(df: DataFrame, key_col: str, ts_col: str,
                 tiebreak_col: str, attr_cols: Sequence[str]) -> DataFrame:
    """Versioned history of ``attr_cols`` per ``key_col``: one row per
    change, with valid_from = the change's (integer) timestamp,
    valid_to = the NEXT change's timestamp (NULL on the current row),
    version = 1-based change index, is_current. ``ts_col`` must be an
    integer timestamp (epoch micros by convention); ``tiebreak_col``
    makes same-instant events deterministic."""
    attrs = [F.col(c) for c in attr_cols]
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    sig = F.struct(*attrs)
    changed = (F.lag(sig).over(w).isNull()
               | (F.lag(sig).over(w) != sig))
    marked = df.select(key_col, ts_col, tiebreak_col, *attr_cols,
                       changed.alias("_chg"))
    surv = marked.where(F.col("_chg"))
    w2 = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    return (surv.select(
        key_col, *attr_cols,
        F.col(ts_col).cast("long").alias("valid_from"),
        F.lead(F.col(ts_col).cast("long")).over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("long").alias("version"))
        .withColumn("is_current",
                    F.col("valid_to").isNull().cast("int")))
