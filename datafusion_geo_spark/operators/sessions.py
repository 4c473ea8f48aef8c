"""Batch gap-based sessionization — the window-function twin of the
streaming applyInPandasWithState sessionizer (streaming/sessionize.py).

The classic two-window shape, entirely JVM-side:
  1. ``lag(ts)`` per user (ordered by ts, id-tiebroken) marks a session
     START wherever the gap exceeds the threshold (or there is no
     predecessor);
  2. a running ``sum`` of the start flags numbers each user's sessions;
  3. one grouped aggregate per (user, session) emits the session rows.

Scale shape: both windows and the final aggregate share ONE hash
partitioning on user_id — Catalyst plans a single shuffle (plus the
per-partition sort the windows need). Skewed users cost a sort of their
own rows, never a cross product.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def gap_sessions(events: DataFrame, user_col: str = "user_id",
                 ts_col: str = "ts", id_col: str = "event_id",
                 value_col: str = "value",
                 gap_minutes: int = 30) -> DataFrame:
    """Sessions = maximal event runs per user with inter-event gaps
    <= ``gap_minutes``. Returns (user, session_idx, start/end as epoch
    micros, n_events, sum_cents) — timestamps in the oracle-comparable
    integer encoding, money in exact int64 cents."""
    gap_us = gap_minutes * 60 * 1_000_000
    order = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    us = F.unix_micros(F.col(ts_col))
    prev = F.lag(us).over(order)
    is_start = (prev.isNull() | ((us - prev) > gap_us)).cast("long")
    run = Window.partitionBy(user_col).orderBy(ts_col, id_col) \
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df = (events.where(F.col(ts_col).isNotNull())
          .withColumn("_us", us)
          .withColumn("_start", is_start)   # lag window materialized
          .withColumn("_sess", F.sum("_start").over(run)))
    return (df.groupBy(F.col(user_col),
                       F.col("_sess").cast("int").alias("session_idx"))
            .agg(F.min("_us").alias("start_us"),
                 F.max("_us").alias("end_us"),
                 F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.round(F.col(value_col) * 100).cast("long"))
                  .alias("sum_cents")))


def retention_cohorts(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """Classic retention triangle: users grouped by first-activity day
    (cohort), counted per day-offset of later activity. Two grouped
    aggregates sharing the user_id hash partitioning: first-day per
    user, then distinct (user, day) joined back — at 100 TB both
    shuffles move only (user, date) pairs, never event payloads."""
    act = (events.select(F.col(user_col).alias("uid"),
                         F.to_date(F.col(ts_col)).alias("d"))
           .where(F.col("uid").isNotNull() & F.col("d").isNotNull())
           .distinct())
    first = act.groupBy("uid").agg(F.min("d").alias("cohort_day"))
    return (act.join(first, "uid")
            .groupBy(F.date_format("cohort_day", "yyyy-MM-dd")
                     .alias("cohort"),
                     F.datediff(F.col("d"), F.col("cohort_day"))
                     .alias("day_offset"))
            .agg(F.countDistinct("uid").alias("users")))


def funnel_stages(events: DataFrame, stages: list,
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type") -> DataFrame:
    """Ordered funnel: a user reaches stage k when an event of
    stages[k] occurs AT OR AFTER their stage-(k-1) time (earliest
    qualifying event chains the dependency). Returns one row per stage
    with the surviving-user count — each hop is a user-keyed
    aggregate + equi-join, so the whole funnel shares one hash
    partitioning on the user."""
    if not stages:
        raise ValueError("funnel_stages: need at least one stage")
    ev = events.select(F.col(user_col).alias("uid"),
                       F.col(ts_col).alias("t"),
                       F.col(type_col).alias("et"))
    reached = (ev.where(F.col("et") == stages[0])
               .groupBy("uid").agg(F.min("t").alias("st")))
    parts = []
    for i, stage in enumerate(stages):
        if i > 0:
            reached = (ev.where(F.col("et") == stage)
                       .join(reached, "uid")
                       .where(F.col("t") >= F.col("st"))
                       .groupBy("uid").agg(F.min("t").alias("st")))
        parts.append(reached.agg(F.count("*").alias("users"))
                     .select(F.lit(i + 1).alias("stage_idx"),
                             F.lit(stage).alias("stage"),
                             F.col("users")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
