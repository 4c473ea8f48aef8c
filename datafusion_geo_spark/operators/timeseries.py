"""Regular-grid time-series resampling with gap filling.

The missing step between event logs and anything windowed/learned on
them: per key, snap observations to a fixed-width grid and fill the
empty slots by carrying the last observation forward (LOCF) — the
standard sensor/metrics "resample + pad" operation.

Spark-first shape, 100 TB adjudication:
- slot assignment is exact integer arithmetic on epoch MICROseconds
  (``unix_micros div step``) — never through a double (a 1.7e15 µs
  epoch would still fit a double today, but the div-then-floor form
  replays identically in any engine and at any future epoch);
- per-slot "last" is ``max(struct(us, id, value))`` — a plain
  partial+final aggregate with a total, deterministic tie order
  (timestamp, then id), no window;
- the grid is ``sequence(min_slot, max_slot)`` exploded PER KEY — grid
  size is bounded by time-range/step, independent of the event count,
  and inherits the key partitioning;
- the carry-forward is one ``last(value, ignorenulls)`` running window
  PARTITIONED BY KEY — distributed by the same key hash as the
  grid join, no global single-task window anywhere.

Values pass through untouched (no float arithmetic), so the result is
bit-exact in any engine. Slots before a key's first observation keep
NULL (there is nothing to carry); ``filled`` marks grid slots that had
no observation of their own.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

MICROS_PER_MINUTE = 60_000_000


def resample_locf(events: DataFrame, step_minutes: int = 60,
                  key_col: str = "user_id", ts_col: str = "ts",
                  value_col: str = "value",
                  id_col: str = "event_id") -> DataFrame:
    """Per-``key_col`` regular grid of ``step_minutes`` slots spanning
    each key's own [first, last] observation, with per-slot
    observation counts and the LOCF-padded value. Returns
    (key, slot_ts, n_obs, value, filled); ``slot_ts`` is the slot's
    START timestamp. Rows with NULL timestamp are ignored (they have
    no place on the axis); NULL values count as observations but
    carry nothing (the previous non-NULL keeps flowing — the LOCF
    convention)."""
    if step_minutes <= 0:
        raise ValueError("resample_locf: step_minutes must be > 0")
    step = step_minutes * MICROS_PER_MINUTE
    us = F.unix_micros(F.col(ts_col))
    obs = (events.where(F.col(ts_col).isNotNull())
           .select(F.col(key_col).alias("key"),
                   F.expr(f"unix_micros({ts_col}) div {step}")
                   .alias("slot"),
                   F.struct(us.alias("us"),
                            F.col(id_col).alias("id"),
                            F.col(value_col).alias("v")).alias("_o")))
    per_slot = (obs.groupBy("key", "slot")
                .agg(F.count(F.lit(1)).cast("long").alias("n_obs"),
                     F.max("_o").alias("_last")))
    spans = per_slot.groupBy("key").agg(
        F.min("slot").alias("_s0"), F.max("slot").alias("_s1"))
    grid = spans.select(
        "key", F.explode(F.sequence(F.col("_s0"), F.col("_s1")))
        .alias("slot"))
    j = grid.join(per_slot, ["key", "slot"], "left")
    w = (Window.partitionBy("key").orderBy("slot")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return j.select(
        F.col("key").alias(key_col),
        F.timestamp_micros(F.col("slot") * F.lit(step))
        .alias("slot_ts"),
        F.coalesce(F.col("n_obs"), F.lit(0).cast("long"))
        .alias("n_obs"),
        F.last(F.col("_last.v"), ignorenulls=True).over(w)
        .alias(value_col),
        F.col("n_obs").isNull().alias("filled"))


def trend_by_key(df: DataFrame, key_col: str, x_col: str,
                 y_col: str) -> DataFrame:
    """Per-key OLS trend of an integer-quantized series — the
    monitoring question ("is this metric drifting, per user /
    tenant / domain?") asked directly of event logs or of
    :func:`resample_locf` output. One grouped partial+final aggregate
    of the five exact int64 moments per key (n, Sx, Sy, Sxy, Sxx) is
    the only corpus pass; the slope is the closed form
    (n·Sxy − Sx·Sy) / (n·Sxx − Sx²) with EXACT integer numerator and
    denominator carried in the output (slope_num/slope_den) plus the
    house 6-dp double. Same overflow envelope as pearson_corr:
    n·Sxy must fit int64 — quantize x (e.g. slot index, epoch hours)
    and y (cents) accordingly.

    Returns one row per key: (key, n, slope_num, slope_den, slope);
    slope NULL for a single-point or zero-x-variance key."""
    from .evals import _r6

    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    g = (df.groupBy(F.col(key_col))
         .agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum(x).alias("sx"), F.sum(y).alias("sy"),
              F.sum(x * y).alias("sxy"), F.sum(x * x).alias("sxx")))
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    return g.select(
        F.col(key_col), "n",
        num.cast("long").alias("slope_num"),
        den.cast("long").alias("slope_den"),
        F.when(den > 0, _r6(num.cast("double") / den.cast("double")))
        .alias("slope"))
