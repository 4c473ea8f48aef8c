"""Deterministic hash-based dataset splitting and sampling.

A training pipeline must split corpora into train/valid/test (and draw
reproducible samples) such that (a) membership is a pure function of a
stable key — re-running on new hardware, another engine, or tomorrow's
snapshot yields the SAME split; (b) no shuffle or global sort is needed
— the assignment is a map-side expression evaluated inside the scan
stage. ``rand()``-based splits fail (a); ``ORDER BY hash LIMIT n``
sampling fails (b) at 100 TB.

The hash is the repo-wide md5-prefix convention (operators/dedup.py):
``bigint(md5(key)[0:8])`` — 32 bits of the md5 as an int64 — so the
DuckDB oracle reproduces every assignment bit-for-bit.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

HASH_BUCKETS = 10_000


def hash_bucket(key: Column, buckets: int = HASH_BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets): the repo-wide md5-prefix
    hash (dedup.h64 — ONE definition, so the oracle mirror can never
    desynchronize) of the key's string form, mod buckets. Pure built-ins
    (md5/conv are JVM expressions) — whole-stage-codegen'd, no UDF."""
    from .dedup import h64
    return h64(key.cast("string")) % buckets


def with_split(df: DataFrame, key_col: str,
               weights: Mapping[str, int] = None,
               split_col: str = "split") -> DataFrame:
    """Assign each row a split label by hash-bucket range. ``weights``
    maps label → integer weight; ranges are cumulative over
    HASH_BUCKETS (default 98/1/1 train/valid/test). Assignment depends
    only on the key: adding rows later never moves an existing row
    between splits."""
    weights = dict(weights or {"train": 9800, "valid": 100, "test": 100})
    total = sum(weights.values())
    if total != HASH_BUCKETS:
        raise ValueError(
            f"weights must sum to {HASH_BUCKETS}, got {total}")
    b = hash_bucket(F.col(key_col))
    expr = None
    acc = 0
    for label, w in weights.items():
        acc += w
        cond = b < acc
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return df.withColumn(split_col, expr)


def deterministic_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Keep ~fraction of rows, chosen by key hash — reproducible across
    runs/engines and consistent for a given key across datasets (joins
    between same-key samples stay aligned, unlike df.sample)."""
    keep = int(round(fraction * HASH_BUCKETS))
    return df.where(hash_bucket(F.col(key_col)) < keep)
