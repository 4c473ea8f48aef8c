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
    p = points.withColumn(
        "_rb", F.floor(F.col(point_col) / bucket).cast("long"))
    b_lo = F.floor(F.col(lo_col) / bucket).cast("long")
    b_hi = F.floor(F.col(hi_col) / bucket).cast("long")
    seq = F.when(
        b_hi - b_lo < F.lit(int(max_fanout)),
        F.sequence(b_lo, b_hi)
    ).otherwise(F.raise_error(F.concat(
        F.lit(f"range_join: interval spans more than {max_fanout} buckets "
              f"(bucket={bucket}): ["),
        F.col(lo_col).cast("string"), F.lit(", "),
        F.col(hi_col).cast("string"),
        F.lit("] — raise `bucket` or split the interval"))))
    iv = (intervals
          .where(F.col(lo_col) <= F.col(hi_col))
          .withColumn("_rb", F.explode(seq)))
    lo_ok = (F.col(lo_col) <= F.col(point_col)) if closed in ("both", "left") \
        else (F.col(lo_col) < F.col(point_col))
    hi_ok = (F.col(point_col) <= F.col(hi_col)) if closed in ("both", "right") \
        else (F.col(point_col) < F.col(hi_col))
    return p.join(iv, "_rb").where(lo_ok & hi_ok).drop("_rb")
