"""Bucketed (co-located) table layout — the shuffle-elimination lever
for repeated equi-joins and aggregations on a stable key.

At 100 TB, joining two fact tables on the same key every day pays the
dominant cost in shuffle. Writing both sides bucketed (and sorted) by
that key with the SAME bucket count lets Spark's scan report the
required hash partitioning, so the join plans WITHOUT any Exchange —
each task zips bucket i of both tables. Aggregations on the bucket key
likewise skip their shuffle.

Caveats (documented contract):
  * bucket counts must match between join sides (or be multiples with
    spark.sql.bucketing.coalesceBucketsInJoin.enabled);
  * bucketing requires ``saveAsTable`` (metastore-backed), not a bare
    path write;
  * choose bucket counts for the TARGET cluster's task size (e.g.
    ~128-512 MB of post-compression data per bucket), not the test box.
"""

from __future__ import annotations

import os
import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int,
                   sort: bool = True) -> None:
    """Materialize ``df`` as a parquet table bucketed (and by default
    sorted) by ``key`` — sorted buckets additionally let sort-merge
    joins skip their per-task sort.

    ``table`` must be an UNQUALIFIED name in the default database
    (asserted): a qualified ``db.tbl`` maps to ``<wh>/db.db/tbl`` on
    disk, so the name-derived cleanup below would target the wrong path
    and ``saveAsTable`` would then refuse the orphan directory."""
    assert "." not in table, (
        "write_bucketed supports unqualified default-database table "
        f"names only, got {table!r}")
    spark = df.sparkSession
    # a previous JVM's managed-table directory survives the (in-memory)
    # catalog it was registered in; saveAsTable refuses to reuse the
    # orphan location, so drop both the entry and the directory.
    # Resolve the real location from the catalog when the table is still
    # registered (never guess a path for a live table); fall back to the
    # default-database layout <warehouse>/<name> only for the orphan-dir
    # case where no catalog entry exists.
    loc = None
    if spark.catalog.tableExists(table):
        try:
            detail = spark.sql(f"DESCRIBE TABLE EXTENDED {table}")
            for r in detail.collect():
                if r["col_name"] == "Location":
                    loc = urlparse(r["data_type"]).path
                    break
        except Exception:
            loc = None
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if loc:
        shutil.rmtree(loc, ignore_errors=True)
    else:
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", ""))
        if wh.path:
            shutil.rmtree(os.path.join(wh.path, table.lower()),
                          ignore_errors=True)
    w = (df.write.mode("overwrite").format("parquet")
         .bucketBy(buckets, key))
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str, how: str = "inner") -> DataFrame:
    """Equi-join two same-bucket-count tables on their bucket key; with
    matching layouts Catalyst plans this with NO Exchange on either
    side (pinned by tests/test_bucketed_join.py)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
