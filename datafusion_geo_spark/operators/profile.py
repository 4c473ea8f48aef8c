"""Table profiling — the per-column audit a pipeline runs before and
after every transformation at 100 TB (did a join drop nulls? did a
rewrite collapse distinct values? did a column silently truncate?).

``table_profile`` melts the chosen columns to (col_name, val) rows and
computes one profile row per column in a single grouped aggregate:
row count, null count, exact distinct count, lexicographic min/max of
the string form, and total string length. The melt multiplies the scan
k-fold for k columns — the same cost Catalyst's expand node pays for a
multi-column COUNT(DISTINCT) aggregate, and the honest price of exact
distincts; swap the count_distinct for the HLL sketch
(operators/sketch.py hll_by_group) when approximate is acceptable.

Everything is integer counts or string min/max — exact in both
engines, no float discipline needed.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["table_profile"]


def table_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One profile row per column of ``cols``: (col_name, n_rows,
    n_null, n_distinct, min_val, max_val, sum_len). Values are compared
    and measured in their canonical string form (CAST AS STRING), so
    min/max are lexicographic — identical in Spark and DuckDB for the
    ASCII fixtures — and sum_len is the total code-point length of
    non-null values."""
    melted = df.select(F.explode(F.array(*[
        F.struct(F.lit(c).alias("col_name"),
                 F.col(c).cast("string").alias("val"))
        for c in cols])).alias("kv")).select("kv.col_name", "kv.val")
    # distinct is counted on md5(val), not val: every other aggregate
    # here is a map-side partial (one min/max/sum per task crosses the
    # wire), but COUNT(DISTINCT) must ship each distinct value — hashing
    # first ships 32-byte digests instead of full document texts. Same
    # count modulo md5 collisions; the oracle hashes identically.
    return (melted.groupBy("col_name")
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                 F.sum(F.when(F.col("val").isNull(), 1).otherwise(0))
                  .cast("long").alias("n_null"),
                 F.count_distinct(F.md5(F.col("val"))).cast("long")
                  .alias("n_distinct"),
                 F.min("val").alias("min_val"),
                 F.max("val").alias("max_val"),
                 F.coalesce(F.sum(F.length("val")), F.lit(0))
                  .cast("long").alias("sum_len")))
