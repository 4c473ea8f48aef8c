"""Bucketized range join: point-in-interval matching at scale.

The reference has no joins (SURVEY.md §2.2); Spark executes a raw
``p BETWEEN lo AND hi`` theta-join as BroadcastNestedLoopJoin — fine
for a broadcastable interval table, quadratic death for big×big. This
operator is the 1-D sibling of the grid spatial join: discretize the
axis into buckets, replicate each interval to the buckets it covers
(fan-out bounded by interval_width/bucket + 1), give each point its
single bucket, shuffle equi-join on the bucket id, and refine with the
exact containment predicate. Every pair appears exactly once — a point
lives in ONE bucket — so there is no post-join dedup. Classic uses in a
training pipeline: IP→ASN range tables, timestamp→maintenance-window
tagging, score binning.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .util import fresh_name


def _replicate(df: DataFrame, lo: str, hi: str, bucket: float,
               max_fanout: int, out_col: str, opname: str) -> DataFrame:
    """Explode each interval row into every bucket it covers, with the
    loud fan-out guard shared by range_join and interval_join. Inverted
    intervals (lo > hi) are dropped — they never match anything."""
    b_lo = F.floor(F.col(lo) / bucket).cast("long")
    b_hi = F.floor(F.col(hi) / bucket).cast("long")
    seq = F.when(
        b_hi - b_lo < F.lit(int(max_fanout)), F.sequence(b_lo, b_hi)
    ).otherwise(F.raise_error(F.concat(
        F.lit(f"{opname}: interval spans more than {max_fanout} buckets "
              f"(bucket={bucket}): ["),
        F.col(lo).cast("string"), F.lit(", "),
        F.col(hi).cast("string"),
        F.lit("] — raise `bucket` or split the interval"))))
    return (df.where(F.col(lo) <= F.col(hi))
            .withColumn(out_col, F.explode(seq)))


def range_join(points: DataFrame, intervals: DataFrame, point_col: str,
               lo_col: str, hi_col: str, bucket: float,
               closed: str = "both", max_fanout: int = 100_000) -> DataFrame:
    """Inner join of point rows to every interval containing them.

    ``closed``: 'both' ⇒ lo <= p <= hi, 'left' ⇒ lo <= p < hi,
    'right' ⇒ lo < p <= hi, 'neither' ⇒ strict both sides. Null points,
    null bounds, and inverted intervals (lo > hi) never match. Choose
    ``bucket`` near the typical interval width: fan-out stays O(1) and
    buckets stay selective. ``max_fanout`` bounds the per-interval
    replication — a catch-all interval (an IP range table's 0/0 row)
    spanning millions of buckets would otherwise materialize a
    million-element array per row (or overflow Spark's array limit);
    such a row fails loudly with the offending bounds so the caller can
    raise ``bucket`` or split the interval. A pathologically hot bucket
    (dense points under one wide interval) is AQE skew-join territory —
    the equi-join shape is what makes that machinery applicable at all."""
    if closed not in ("both", "left", "right", "neither"):
        raise ValueError(f"invalid closed={closed!r}")
    rb = fresh_name("_rb", set(points.columns) | set(intervals.columns))
    p = points.withColumn(
        rb, F.floor(F.col(point_col) / bucket).cast("long"))
    iv = _replicate(intervals, lo_col, hi_col, bucket, max_fanout, rb,
                    "range_join")
    lo_ok = (F.col(lo_col) <= F.col(point_col)) if closed in ("both", "left") \
        else (F.col(lo_col) < F.col(point_col))
    hi_ok = (F.col(point_col) <= F.col(hi_col)) if closed in ("both", "right") \
        else (F.col(point_col) < F.col(hi_col))
    return p.join(iv, rb).where(lo_ok & hi_ok).drop(rb)


def interval_join(left: DataFrame, right: DataFrame,
                  lo_left: str, hi_left: str, lo_right: str, hi_right: str,
                  bucket: float, keys: list = None,
                  max_fanout: int = 100_000) -> DataFrame:
    """Interval×interval overlap join ([a_lo,a_hi] ∩ [b_lo,b_hi] ≠ ∅,
    closed bounds): the big×big sibling of ``range_join``, same shape as
    the 2-D grid spatial join collapsed to one axis. Each side
    replicates its interval into every covering bucket (fan-out bounded
    by width/bucket + 1, guarded by ``max_fanout``), the join is a
    shuffle equi-join on (*keys, bucket), and the exact overlap
    predicate refines above it.

    De-dup without a shuffle: an overlapping pair shares every bucket in
    the overlap region — the join keeps only the FIRST one, the bucket
    containing max(a_lo, b_lo), so each pair emerges exactly once (the
    same first-covering-cell trick the grid join uses, spatial_join.py).

    ``keys``: equi-key columns present on BOTH sides (e.g. part key for
    per-part shipment-window overlap). With keys, bucketing bounds the
    per-key theta-join; without, it's what makes big×big feasible at
    all. Inverted intervals (lo > hi) and null bounds never match.
    Column collisions are the caller's to resolve (alias before
    joining), exactly as with DataFrame.join."""
    keys = list(keys or [])
    lcols, rcols = set(left.columns), set(right.columns)
    clash = (lcols & rcols) - set(keys)
    if clash:
        raise ValueError(
            f"interval_join: columns {sorted(clash)} exist on both sides; "
            f"rename/alias one side first (join keys {keys} are exempt)")
    ib = fresh_name("_ib", lcols | rcols)  # never shadow a user column
    l = _replicate(left, lo_left, hi_left, bucket, max_fanout, ib,
                   "interval_join")
    r = _replicate(right, lo_right, hi_right, bucket, max_fanout, ib,
                   "interval_join")
    overlap = ((F.col(lo_left) <= F.col(hi_right))
               & (F.col(lo_right) <= F.col(hi_left)))
    first_bucket = (F.col(ib) == F.floor(
        F.greatest(F.col(lo_left), F.col(lo_right)) / bucket).cast("long"))
    return (l.join(r, keys + [ib])
            .where(overlap & first_bucket)
            .drop(ib))
