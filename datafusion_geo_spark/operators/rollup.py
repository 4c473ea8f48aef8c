"""Incremental time-bucketed rollups — the hypertable / continuous-
aggregate maintenance pattern (TimescaleDB-style), Spark-first.

A 100 TB event firehose is summarized into an hourly rollup table that
downstream dashboards read instead of the raw events. The rollup must be
MAINTAINABLE: applying a new micro-batch (or re-applying one after a
failure) updates only the hours it touches and is idempotent. Without a
lakehouse MERGE, stock Spark expresses this exactly with DYNAMIC
partition overwrite: aggregate the batch per hour partition, and the
partitioned write replaces ONLY the hour directories present in the
batch, leaving every other hour untouched.

Contract (documented, asserted by tests): each applied batch must carry
ALL events for every hour it contains — the standard re-aggregate-the-
bucket-from-source rule every continuous-aggregate system imposes (a
partial hour would overwrite a complete one). Late data is handled by
re-applying the affected hour's full slice.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession


def hour_col(ts_col: str = "ts") -> Column:
    """Epoch-hour bucket (long) — THE bucketing expression. Exported so
    batch-slicing callers (who must carry each hour completely, see
    module docstring) and tests slice with the exact formula the rollup
    buckets with; a drifted copy would let dynamic overwrite replace a
    complete hour with a partial aggregate."""
    return F.floor(F.unix_timestamp(F.col(ts_col).cast("timestamp"))
                   / 3600).cast("long")


def hourly_rollup(events: DataFrame, ts_col: str = "ts",
                  type_col: str = "event_type",
                  value_col: str = "value",
                  user_col: str = "user_id") -> DataFrame:
    """Per (hour, event_type) aggregate of an events frame: counts, user
    reach, and exact cent-sums (int64 — order-independent for the value
    hash). One partial+final hash aggregate; ``hour`` is epoch-hours
    (long) so it doubles as the partition column."""
    return (events
            .groupBy(hour_col(ts_col).alias("hour"),
                     F.col(type_col).alias("event_type"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.countDistinct(user_col).alias("n_users"),
                 F.sum(F.round(F.col(value_col) * 100).cast("long"))
                  .alias("sum_cents")))


def apply_rollup_batch(events_batch: DataFrame, path: str,
                       ts_col: str = "ts") -> None:
    """Aggregate one batch and upsert its hours into the rollup dataset
    at ``path``: dynamic partition overwrite replaces exactly the hour
    directories present in the batch (idempotent — re-applying the same
    batch rewrites identical partitions), never touching other hours.
    The batch must contain every event of each hour it covers (module
    docstring)."""
    spark = events_batch.sparkSession
    agg = hourly_rollup(events_batch, ts_col=ts_col)
    # repartition by the partition column: one writer per hour directory
    # (same tasks×partitions small-files guard as the geo sink)
    (agg.repartition("hour")
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("hour")
     .parquet(path))


def read_rollup(spark: SparkSession, path: str) -> DataFrame:
    """The rollup table; hour-range predicates prune at the directory
    level (partition column). ``hour`` is cast back to the LONG the
    aggregate produced — partition-column inference reads the directory
    values as INT, which would break strict-schema comparisons and
    ANSI unions with hourly_rollup output."""
    df = spark.read.parquet(path)
    return df.withColumn("hour", F.col("hour").cast("long"))
