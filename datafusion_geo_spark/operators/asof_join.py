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
no pair explosion, skew bounded by the hottest key; pass ``salt=N`` to
sub-partition a hot key's left rows with its right history replicated
per sub-partition (see :func:`asof_join`).

pandas.merge_asof runs the same sweep single-node; this is its
shuffle-partitioned twin.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


from .util import fresh_name as _fresh


def _unorderable(dt) -> bool:
    """True if a sort on this type would raise (MapType anywhere)."""
    from pyspark.sql.types import ArrayType, MapType, StructType
    if isinstance(dt, MapType):
        return True
    if isinstance(dt, ArrayType):
        return _unorderable(dt.elementType)
    if isinstance(dt, StructType):
        return any(_unorderable(f.dataType) for f in dt.fields)
    return False


def asof_join(left: DataFrame, right: DataFrame, on: str, left_time: str,
              right_time: str, right_cols: Optional[Sequence[str]] = None,
              direction: str = "backward",
              allow_exact_matches: bool = True,
              suffix: str = "_asof", salt: int = 1) -> DataFrame:
    """Left as-of join: every left row, plus the payload columns of the
    matching right row (NULL when no right row precedes/follows it).

    ``right_cols`` defaults to every right column except the key and
    time. Matches pandas.merge_asof semantics: 'backward' takes the
    last right row with ``right_time <= left_time`` (strict < when
    ``allow_exact_matches=False``), 'forward' the first with ``>=``.
    Ties between right rows at the same time are broken by the LAST one
    in (time, payload) sort order — a deterministic rule, which is why
    payload columns must be ORDERABLE types (a MapType payload raises
    up front with a clear error: drop it via ``right_cols`` or
    pre-aggregate the right side). Time columns must be NUMERIC (cast
    timestamps to epoch micros/days first) so 'forward' can run as the
    same sweep on the negated axis.

    ``salt``: the sweep's skew bound is the hottest key (one partition
    sorts all of that key's rows). With ``salt=N`` each left row lands
    in one of N sub-partitions of its key (deterministic xxhash64 of
    its time) while the key's FULL right history is replicated into
    every sub-partition, so each sweep sees all right rows but only
    ~1/N of the hot left rows — same matches, same tie rule, partition
    size |L_key|/N + |R_key|. The right trade: salting helps when the
    LEFT side is hot (one user owning half the events) and right
    history per key is modest (orders, price updates); a right side
    hot enough to dominate the sort needs pre-aggregation instead
    (it is replicated N times)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    right_cols = list(right_cols if right_cols is not None else
                      [c for c in right.columns if c not in (on, right_time)])
    out_cols = [c if c not in left.columns else c + suffix for c in right_cols]
    bad = [c for c in right_cols if _unorderable(right.schema[c].dataType)]
    if bad:
        raise ValueError(
            f"asof_join payload columns {bad} have unorderable types "
            f"(maps cannot participate in the deterministic tie order); "
            f"exclude them via right_cols or pre-aggregate the right side")
    taken = set(left.columns) | set(right.columns) | set(out_cols)
    c_t = _fresh("_t", taken)
    c_tag = _fresh("_tag", taken)
    c_pay = _fresh("_pay", taken)
    c_salt = _fresh("_salt", taken)

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
        (F.col(left_time) * sgn).alias(c_t),
        F.lit(l_tag).alias(c_tag),
        F.lit(None).cast(pay_t).alias(c_pay))
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          if c != on else F.col(on) for c in left.columns],
        (F.col(right_time) * sgn).alias(c_t),
        F.lit(r_tag).alias(c_tag),
        F.struct(*[F.col(c).alias(o)
                   for c, o in zip(right_cols, out_cols)]).alias(c_pay))

    part_cols = [on]
    if salt > 1:
        # left rows: deterministic sub-partition by time hash; right
        # rows: replicated into every sub-partition (1-row array
        # explode — narrow, no shuffle of its own)
        l = l.withColumn(c_salt, F.pmod(F.xxhash64(F.col(c_t)), F.lit(salt))
                         .cast("int"))
        r = r.withColumn(
            c_salt, F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
        part_cols.append(c_salt)
    else:
        l = l.withColumn(c_salt, F.lit(0))
        r = r.withColumn(c_salt, F.lit(0))

    w = (Window.partitionBy(*part_cols)
         .orderBy(c_t, c_tag, c_pay)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = (l.unionByName(r)
              .withColumn(c_pay, F.last(c_pay, ignorenulls=True).over(w)))
    return (filled.where(F.col(c_tag) == l_tag)
            .select(*left.columns,
                    *[F.col(f"`{c_pay}`.`{o}`").alias(o) for o in out_cols]))


def asof_join_nearest(left: DataFrame, right: DataFrame, on: str,
                      left_time: str, right_time: str, left_id: str,
                      right_cols: Optional[Sequence[str]] = None,
                      suffix: str = "_asof", salt: int = 1) -> DataFrame:
    """NEAREST as-of join (pandas merge_asof direction='nearest'
    parity, completing backward/forward): every left row takes the
    right row with the smallest absolute time gap; an exact tie
    (|backward gap| == |forward gap|) resolves to the BACKWARD match —
    a deterministic documented rule.

    Composition, not a third sweep: one backward and one forward
    asof_join (each the skew-hardened single sweep above) aligned by
    ``left_id`` — a UNIQUE left row key the caller must provide — with
    a row-level CASE picking the closer side. Both candidate payloads
    ride as whole per-side column sets chosen by one predicate, so the
    output can never mix columns of the two candidates. Output = left
    columns + payload columns + the matched right time as
    ``{right_time}{suffix}``. Cost: two sweeps + one equi-join on
    ``left_id`` — the honest price of nearest without a bespoke
    two-direction sweep."""
    right_cols = list(right_cols if right_cols is not None else
                      [c for c in right.columns if c not in (on, right_time)])
    rc = right_cols + ([right_time] if right_time not in right_cols
                       else [])
    clash = [c for c in rc if c in left.columns]
    if clash:
        raise ValueError(
            f"asof_join_nearest: right columns {clash} collide with left "
            f"column names — the per-side rename needs distinct names; "
            f"alias them on the right side first")
    out_time = right_time + suffix

    def _side(direction, tag):
        j = asof_join(left, right, on, left_time, right_time,
                      right_cols=rc, direction=direction, salt=salt)
        keep = [F.col(left_id)] if tag == "f" else \
            [F.col(c) for c in left.columns]
        return j.select(*keep,
                        *[F.col(c).alias(f"{c}__{tag}") for c in rc])

    b, f = _side("backward", "b"), _side("forward", "f")
    j = b.join(f, left_id)
    gap_b = F.col(left_time) - F.col(f"{right_time}__b")
    gap_f = F.col(f"{right_time}__f") - F.col(left_time)
    take_b = F.col(f"{right_time}__b").isNotNull() & (
        F.col(f"{right_time}__f").isNull() | (gap_b <= gap_f))
    pick = [F.when(take_b, F.col(f"{c}__b"))
             .otherwise(F.col(f"{c}__f")).alias(o)
            for c, o in zip(rc, right_cols + [out_time])]
    return j.select(*left.columns, *pick)
