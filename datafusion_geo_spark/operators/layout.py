"""Space-filling-curve data layout (Z-order / Morton keys).

The 100-TB story: spatial predicate pushdown lives or dies on FILE
layout. Parquet keeps per-file/rowgroup min-max stats for plain
columns; if rows are written in random spatial order, every file's
bbox spans the world and no scan ever prunes. Sorting the write by a
Morton key makes each output file cover a compact spatial region, so a
query's bbox filter (or a bbox-covering column, geoio.py) prunes most
files at plan time — the same layout trick Delta/Iceberg Z-ORDER
clustering applies, built here from plain Spark primitives.

``morton_key`` is pure JVM bit arithmetic (the classic spread-bits
multiply-free interleave — 5 mask-shift steps per axis, whole-stage
codegen friendly, no UDF). ``zorder_layout`` range-partitions by the
key (Spark samples quantiles, so output files are balanced even for
skewed data) and sorts within partitions.
"""

from __future__ import annotations

from typing import Optional, Tuple

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..sources.geoio import _part1by1 as _spread16

__all__ = ["morton_key", "zorder_layout"]

# The bit-spreading ladder is shared with sources/geoio.py, whose
# cell-size-based morton_key serves the write_geo_parquet within-cell
# clustering; this module's bounds-quantized variant is the global
# layout key (fixed [0, 2^bits) grid over known bounds).


def morton_key(x: Column, y: Column,
               bounds: Tuple[float, float, float, float],
               bits: int = 16) -> Column:
    """Z-order key of (x, y): each coordinate quantized to ``bits``
    levels over ``bounds`` (xmin, ymin, xmax, ymax) and bit-interleaved
    (x on even bits). Out-of-bounds coordinates clamp to the edge cell
    rather than corrupting the key; NULL in → NULL out. bits <= 16
    (a 32-bit key is plenty for file-level clustering — finer grids
    only reshuffle rows within the same file)."""
    if not 1 <= bits <= 16:
        raise ValueError(f"morton_key: bits must be in [1, 16], got {bits}")
    xmin, ymin, xmax, ymax = (float(b) for b in bounds)
    if not (xmax > xmin and ymax > ymin):
        raise ValueError(f"morton_key: degenerate bounds {bounds}")
    n = float(1 << bits)

    def cell(v: Column, lo: float, hi: float) -> Column:
        q = F.floor((v.cast("double") - lo) / (hi - lo) * n).cast("long")
        return F.greatest(F.lit(0), F.least(F.lit((1 << bits) - 1), q))

    qx = cell(x, xmin, xmax)
    qy = cell(y, ymin, ymax)
    z = _spread16(qx).bitwiseOR(F.shiftleft(_spread16(qy), 1))
    # greatest/least IGNORE nulls (they'd clamp NULL to cell 0 and give
    # junk rows a real spatial key) — keep null-in/null-out explicit
    return F.when(x.isNull() | y.isNull(), F.lit(None).cast("long")) \
            .otherwise(z).alias("morton")


def zorder_layout(df: DataFrame, x_col: str, y_col: str,
                  bounds: Tuple[float, float, float, float],
                  num_files: Optional[int] = None,
                  bits: int = 16) -> DataFrame:
    """Rows arranged in Z-order for writing: range-partitioned on the
    Morton key (one shuffle; Spark's range partitioner samples the key
    distribution, so skewed data still yields balanced files) and
    sorted within partitions. Follow with ``.write.parquet(...)`` —
    each file then covers a compact spatial cell and min-max stats
    prune. The key column is dropped again: layout is a property of
    row order, not schema."""
    key = morton_key(F.col(x_col), F.col(y_col), bounds, bits)
    with_key = df.withColumn("_zkey", key)
    parted = (with_key.repartitionByRange(num_files, "_zkey")
              if num_files else with_key.repartitionByRange("_zkey"))
    return parted.sortWithinPartitions("_zkey").drop("_zkey")
