"""Spatial join strategies.

The reference ships an R-tree utility that is never wired into a planner
(/root/reference/src/geo/index.rs:23-33 — SURVEY.md §2 calls this out);
its intended use is accelerating ``t1 JOIN t2 ON ST_Intersects(...)``.
Here both scale strategies are first-class operators:

1. ``broadcast_bbox_join`` — small×big: a NATIVE bbox-overlap range
   condition (JVM, no Python) prefilters the BroadcastNestedLoopJoin;
   the exact pandas-UDF predicate refines only surviving pairs. This is
   the Catalyst-friendly PostGIS ``&&``-then-exact pattern (SURVEY.md §4.2).
2. ``grid_join`` — big×big: both sides explode their bbox into covering
   grid cells, the join becomes a shuffle equi-join on (cx, cy), and a
   reported pair is counted only in the canonical cell of its bbox
   intersection (no post-join dedup shuffle needed at scale). Exact
   predicate refines per pair.

Both avoid evaluating the exact geometry predicate on the cross product —
the thing that cannot survive 100 TB.
"""

from __future__ import annotations

from typing import Optional

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..functions import box2d, st_intersects

BBOX_COLS = ("xmin", "ymin", "xmax", "ymax")


def ensure_bbox(df: DataFrame, geom_col: str = "geom") -> DataFrame:
    """Materialize bbox columns from the geometry once (single Python
    crossing) unless native xmin..ymax columns already exist."""
    if all(c in df.columns for c in BBOX_COLS):
        return df
    b = box2d(F.col(geom_col))
    out = df.withColumn("_bbox", b)
    for c in BBOX_COLS:
        out = out.withColumn(c, F.col(f"_bbox.{c}"))
    return out.drop("_bbox")


def _bbox_overlap(l: str, r: str) -> Column:
    """Null-TOLERANT bbox overlap: each conjunct coalesces the min side
    to +inf and the max side to -inf, so null bboxes simply never match.
    Deliberate: a null-intolerant condition makes Catalyst infer
    IsNotNull constraints on the UDF-derived bbox columns and DUPLICATE
    the box2d ArrowEvalPython node (one for the inferred filter, one for
    the projection) — two full Python passes over the big side."""
    def lo(c):  # min-side: null -> +inf (can never be <= anything real)
        return F.coalesce(F.col(c), F.lit(float("inf")))

    def hi(c):  # max-side: null -> -inf
        return F.coalesce(F.col(c), F.lit(float("-inf")))

    return ((lo(f"{l}.xmin") <= hi(f"{r}.xmax"))
            & (lo(f"{r}.xmin") <= hi(f"{l}.xmax"))
            & (lo(f"{l}.ymin") <= hi(f"{r}.ymax"))
            & (lo(f"{r}.ymin") <= hi(f"{l}.ymax")))


def broadcast_bbox_join(big: DataFrame, small: DataFrame,
                        geom_big: str = "geom", geom_small: str = "geom",
                        exact: bool = True,
                        snapshot_small: bool = True) -> DataFrame:
    """Inner spatial join (ST_Intersects semantics), small side broadcast.

    The bbox overlap runs as a native join condition inside the
    BroadcastNestedLoopJoin (WholeStageCodegen); only pairs passing it
    reach the Python predicate. Result carries all columns of both inputs
    (bbox helper columns suffixed).

    ``snapshot_small`` collects the small side once and rebuilds it as a
    local DataFrame. A broadcast plan containing a pandas UDF re-evaluates
    that UDF (fresh Python stage) on EVERY action that reuses the join —
    measured ~2-6 s per action for a 25-row side — whereas the snapshot is
    UDF-free and broadcasts in ms. Safe by construction: the small side
    must fit in the driver to be broadcast at all."""
    b = ensure_bbox(big, geom_big).alias("b")
    s_df = ensure_bbox(small, geom_small)
    if snapshot_small:
        s_df = s_df.sparkSession.createDataFrame(s_df.collect(), s_df.schema)
    s = F.broadcast(s_df).alias("s")
    cond = _bbox_overlap("b", "s")
    joined = b.join(s, cond)
    if exact:
        joined = joined.where(st_intersects(F.col(f"b.{geom_big}"),
                                            F.col(f"s.{geom_small}")))
    return joined


def _cells(prefix: str, cell: float) -> Column:
    """Covering grid cells of a bbox as array<struct<cx,cy>>."""
    cxs = F.sequence(F.floor(F.col(f"{prefix}xmin") / cell).cast("long"),
                     F.floor(F.col(f"{prefix}xmax") / cell).cast("long"))
    cys = F.sequence(F.floor(F.col(f"{prefix}ymin") / cell).cast("long"),
                     F.floor(F.col(f"{prefix}ymax") / cell).cast("long"))
    return F.flatten(F.transform(
        cxs, lambda cx: F.transform(cys, lambda cy: F.struct(
            cx.alias("cx"), cy.alias("cy")))))


def grid_join(a: DataFrame, b: DataFrame, cell: float = 8.0,
              geom_a: str = "geom", geom_b: str = "geom",
              exact: bool = True) -> DataFrame:
    """Big×big spatial join partitioned by grid cell.

    Each side replicates rows into every covering cell (bounded fan-out
    ~ (bbox/cell + 1)²), the join is a shuffle equi-join on (cx, cy), and
    duplicates across shared cells are eliminated *locally* by keeping a
    pair only in the canonical cell containing (max(xmin), max(ymin)) of
    the two bboxes — no distinct() shuffle afterwards. Skewed cells can be
    handled by AQE skew-join splitting (enabled in this engine's sessions).
    """
    ea = (ensure_bbox(a, geom_a)
          .withColumn("_cell", F.explode(_cells("", cell)))
          .select(F.col("_cell.cx").alias("cx"), F.col("_cell.cy").alias("cy"),
                  F.struct(*[F.col(c) for c in a.columns],
                           *[F.col(c) for c in BBOX_COLS if c not in a.columns])
                  .alias("la")))
    eb = (ensure_bbox(b, geom_b)
          .withColumn("_cell", F.explode(_cells("", cell)))
          .select(F.col("_cell.cx").alias("cx"), F.col("_cell.cy").alias("cy"),
                  F.struct(*[F.col(c) for c in b.columns],
                           *[F.col(c) for c in BBOX_COLS if c not in b.columns])
                  .alias("rb")))
    j = ea.join(eb, ["cx", "cy"])
    overlap = ((F.col("la.xmin") <= F.col("rb.xmax"))
               & (F.col("rb.xmin") <= F.col("la.xmax"))
               & (F.col("la.ymin") <= F.col("rb.ymax"))
               & (F.col("rb.ymin") <= F.col("la.ymax")))
    canonical = (
        (F.col("cx") == F.floor(F.greatest(F.col("la.xmin"), F.col("rb.xmin")) / cell))
        & (F.col("cy") == F.floor(F.greatest(F.col("la.ymin"), F.col("rb.ymin")) / cell)))
    j = j.where(overlap & canonical)
    if exact:
        j = j.where(st_intersects(F.col(f"la.{geom_a}"), F.col(f"rb.{geom_b}")))
    return j
