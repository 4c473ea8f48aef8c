"""Geometry I/O: sources and sinks beyond plain parquet reads.

The reference delegates all I/O to its host engine and only ever uses
in-memory tables (SURVEY.md §2 "Scans/sources/sinks — HOST"); the Spark
build inherits every Spark source/sink. This module adds the two
geo-specific shapes pipelines actually need:

* **WKT text ingestion** — CSV/JSONL land geometry as WKT strings;
  ``read_wkt_csv`` parses them into the engine's WKB Binary convention
  in one pass.
* **Spatially-partitioned parquet** — ``write_geo_parquet`` buckets
  rows by grid cell of their bbox centroid and writes
  ``PARTITIONED BY (cell_x, cell_y)``, so spatial-predicate readers get
  partition pruning from the directory layout: a bbox query reads only
  overlapping cells (the storage-side twin of the grid join's shuffle
  key). ``read_geo_parquet`` + ``cells_for_bbox`` does the pruned read.
"""

from __future__ import annotations

from typing import Optional, Tuple

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions import box2d, st_geomfromtext


def read_wkt_csv(spark: SparkSession, path: str, wkt_col: str = "wkt",
                 geom_col: str = "geom", header: bool = True,
                 drop_wkt: bool = True) -> DataFrame:
    """CSV with a WKT column → DataFrame with a parsed WKB geometry
    column (invalid WKT raises inside the kernel, mirroring the
    reference's eager validation, builder.rs:97-110)."""
    df = spark.read.option("header", header).csv(path)
    out = df.withColumn(geom_col, st_geomfromtext(F.col(wkt_col)))
    return out.drop(wkt_col) if drop_wkt else out


def write_geo_parquet(df: DataFrame, path: str, cell: float = 8.0,
                      geom_col: str = "geom",
                      mode: str = "overwrite") -> None:
    """Sink: parquet partitioned by the grid cell of each geometry's
    bbox centroid. At 100 TB this gives readers directory-level partition
    pruning for spatial predicates; rows with NULL geometry land in the
    NULL cell partitions and are never silently dropped."""
    b = box2d(F.col(geom_col))
    with_cells = (df
                  .withColumn("_bbox", b)
                  .withColumn("cell_x", F.floor(
                      (F.col("_bbox.xmin") + F.col("_bbox.xmax")) / (2 * cell))
                      .cast("long"))
                  .withColumn("cell_y", F.floor(
                      (F.col("_bbox.ymin") + F.col("_bbox.ymax")) / (2 * cell))
                      .cast("long"))
                  .drop("_bbox"))
    (with_cells.write.mode(mode)
     .partitionBy("cell_x", "cell_y").parquet(path))


def read_geo_parquet(spark: SparkSession, path: str,
                     bbox: Optional[Tuple[float, float, float, float]] = None,
                     cell: float = 8.0) -> DataFrame:
    """Read a spatially-partitioned dataset; with ``bbox`` set, restrict
    to overlapping cells via a NATIVE partition-column predicate — shows
    up as PartitionFilters in the scan, i.e. non-matching directories are
    never opened. The exact geometry predicate still applies downstream
    (cells over-approximate)."""
    df = spark.read.parquet(path)
    if bbox is None:
        return df
    xmin, ymin, xmax, ymax = bbox
    import math
    return df.where(
        (F.col("cell_x") >= math.floor(xmin / cell) - 1)
        & (F.col("cell_x") <= math.floor(xmax / cell) + 1)
        & (F.col("cell_y") >= math.floor(ymin / cell) - 1)
        & (F.col("cell_y") <= math.floor(ymax / cell) + 1))
