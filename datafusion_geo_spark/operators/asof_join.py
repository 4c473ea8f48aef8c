"""Distributed as-of join (point-in-time lookup).

The reference has no joins at all (SURVEY.md §2.2: Joins — ABSENT); this
is a beyond-reference operator every event/feature pipeline needs: for
each left row, attach the most recent right row with the same key whose
time is <= (backward) / >= (forward) the left row's time.

Spark has no native as-of join. The naive formulations both die at
scale: a range theta-join explodes to candidate pairs × history length,
and a per-key collect is driver-bound. The scalable shape used here is
the UNION-AND-SWEEP: tag both sides, union them (cheap — column-pruned
to key, time, and the carried payload), and run ONE window sweep
partitioned by key and ordered by (time, side): ``last(payload,
ignorenulls=True)`` over an unbounded-preceding frame fills each left
row with the latest preceding right payload. Cost = one shuffle + sort
of |L|+|R| narrow rows — the same profile as any windowed aggregation,
no pair explosion, skew bounded by the hottest key (salt upstream if a
single key exceeds an executor).

pandas.merge_asof runs the same sweep single-node; this is its
shuffle-partitioned twin.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(left: DataFrame, right: DataFrame, on: str, left_time: str,
              right_time: str, right_cols: Optional[Sequence[str]] = None,
              direction: str = "backward",
              allow_exact_matches: bool = True,
              suffix: str = "_asof") -> DataFrame:
    """Left as-of join: every left row, plus the payload columns of the
    matching right row (NULL when no right row precedes/follows it).

    ``right_cols`` defaults to every right column except the key and
    time. Matches pandas.merge_asof semantics: 'backward' takes the
    last right row with ``right_time <= left_time`` (strict < when
    ``allow_exact_matches=False``), 'forward' the first with ``>=``.
    Ties between right rows at the same time are broken by the LAST one
    in (time, payload) sort order — pre-aggregate the right side if a
    different rule is needed. Time columns must be NUMERIC (cast
    timestamps to epoch micros/days first) so 'forward' can run as the
    same sweep on the negated axis."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    right_cols = list(right_cols if right_cols is not None else
                      [c for c in right.columns if c not in (on, right_time)])
    out_cols = [c if c not in left.columns else c + suffix for c in right_cols]

    # sign-flip makes 'forward' the same descending sweep as 'backward'
    sgn = 1 if direction == "backward" else -1
    # at equal times the right row must sort BEFORE the left row to be
    # visible to it (inclusive match) — after it for exclusive
    l_tag, r_tag = (1, 0) if allow_exact_matches else (0, 1)

    # The whole right payload travels as ONE struct: the sweep's
    # last(ignorenulls) then picks the matching right row atomically, so
    # a NULL payload VALUE inside it is carried faithfully instead of
    # falling through to an older right row (per-column fills could even
    # stitch a chimera row from different right rows). The type is built
    # as a StructType OBJECT — a DDL string via simpleString() is not
    # round-trippable for UDTs or backticked names.
    from pyspark.sql.types import StructField, StructType
    pay_t = StructType([StructField(o, right.schema[c].dataType)
                        for c, o in zip(right_cols, out_cols)])
    l = left.select(
        *left.columns,
        (F.col(left_time) * sgn).alias("_t"),
        F.lit(l_tag).alias("_tag"),
        F.lit(None).cast(pay_t).alias("_pay"))
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          if c != on else F.col(on) for c in left.columns],
        (F.col(right_time) * sgn).alias("_t"),
        F.lit(r_tag).alias("_tag"),
        F.struct(*[F.col(c).alias(o)
                   for c, o in zip(right_cols, out_cols)]).alias("_pay"))

    w = (Window.partitionBy(on)
         .orderBy("_t", "_tag", "_pay")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = (l.unionByName(r)
              .withColumn("_pay", F.last("_pay", ignorenulls=True).over(w)))
    return (filled.where(F.col("_tag") == l_tag)
            .select(*left.columns,
                    *[F.col(f"_pay.`{o}`").alias(o) for o in out_cols]))
