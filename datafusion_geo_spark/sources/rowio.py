"""Row-format I/O: RFC-4180 CSV and ORC round-trip helpers.

The reference delegates scans/sinks to its host engine (SURVEY.md §2
"Scans/sources/sinks — HOST"), so the Spark build's job is to pin the
OPTIONS that make interchange formats lossless, not to reimplement
codecs:

* **CSV** — Spark's writer defaults to backslash-escaping
  (``escape='\\'``), which most non-Spark CSV consumers (RFC 4180,
  DuckDB, Excel, Python csv) do not understand. ``write_csv_rfc4180``
  pins double-quote escaping (``escape='"'``) + ``quoteAll`` so
  embedded commas, quotes, and newlines survive any compliant reader;
  ``read_csv_rfc4180`` pins the matching reader options
  (``multiLine`` for quoted newlines — per-file parallelism instead of
  per-split, the honest cost of embedded newlines; files stay the unit
  of parallelism so a many-file dataset still scales out).
* **ORC** — option-free passthrough (Spark's native ORC handles nested
  arrays/structs); the helpers exist so the round-trip query reads as
  a pair.

Sinks write one shard per partition (no coalesce) — the layout a
1000-executor writer produces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_csv_rfc4180", "read_csv_rfc4180",
           "write_orc", "read_orc", "write_jsonl", "read_jsonl"]


def write_csv_rfc4180(df: DataFrame, path: str,
                      mode: str = "overwrite") -> None:
    """Write RFC-4180 CSV: header, every field quoted, embedded quotes
    doubled (NOT backslash-escaped). NULL round-trip is out of scope
    (CSV cannot distinguish NULL from '' without a side convention) —
    filter or fill nulls before writing."""
    # the writer TRIMS leading/trailing field whitespace by default
    # (ignore*WhiteSpace=true on write, unlike read) — pin both off or
    # ' padded ' comes back as 'padded'
    (df.write.mode(mode)
       .options(header="true", quote='"', escape='"', quoteAll="true",
                ignoreLeadingWhiteSpace="false",
                ignoreTrailingWhiteSpace="false")
       .csv(path))


def read_csv_rfc4180(spark: SparkSession, path: str,
                     schema: str) -> DataFrame:
    """Read RFC-4180 CSV written by write_csv_rfc4180 (or any compliant
    producer). ``multiLine`` is required for quoted embedded newlines;
    the schema is explicit — inference would re-scan and can drift.

    Known lossy edge (of the reader, not this wrapper): univocity
    normalizes line separators INSIDE quoted fields in multiLine mode,
    so a bare CR in a field comes back as LF. Data that must preserve
    exotic control bytes belongs in parquet/ORC, not CSV."""
    return (spark.read.schema(schema)
            .options(header="true", quote='"', escape='"',
                     multiLine="true")
            .csv(path))


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write JSON Lines — the de-facto LLM-pipeline interchange format
    (one object per line). Control characters and structural bytes in
    strings escape per the JSON spec (\\n, \\t, \\", \\\\), so embedded
    newlines never break the one-record-per-line contract and splits
    stay the unit of read parallelism (no CSV-style multiLine tax).
    NULL fields are dropped on write (Spark default) and restored as
    NULL by a schema'd read — unlike CSV, NULL vs '' round-trips."""
    df.write.mode(mode).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Read JSON Lines with an EXPLICIT schema — inference would
    re-scan the data and can drift (a column of all-null lines infers
    string; an integer column with one overflow line infers double).
    Missing fields (write_jsonl's dropped NULLs) come back NULL."""
    return spark.read.schema(schema).json(path)
