"""Unicode text normalization — the canonicalization pass a web-scale
corpus runs before hashing/dedup (NFC so 'e' + COMBINING ACUTE and the
precomposed 'é' hash identically, case-fold via lower, whitespace-run
collapse, strip).

This is the ONE text operator that needs Python: Spark has no NFC
built-in, so the kernel is an Arrow-batched pandas UDF (unicodedata is
C-backed; the batch loop is per-string but allocation-light). Shape at
scale: pure map-side — no shuffle, no state; the UDF cost is linear and
embarrassingly parallel. The DuckDB oracle twin is
``trim(regexp_replace(lower(nfc_normalize(x)), '[ \\t\\r\\n]+', ' ',
'g'))`` — same op order, and whitespace is the explicit ASCII class
(NOT ``\\s``) because RE2's ``\\s`` is ASCII-only while Python's is
Unicode-wide; pinning the class keeps the engines identical even on
non-ASCII input.
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

__all__ = ["nfc_lower_collapse", "normalize_text"]

_WS_RUN = re.compile(r"[ \t\r\n]+")


# returnType is a DataType INSTANCE, not a DDL string: the string form
# parses via the active session at import time and breaks plain
# `import` without a SparkSession
@pandas_udf(StringType())
def nfc_lower_collapse(s: pd.Series) -> pd.Series:
    """NFC-normalize, lowercase, collapse ASCII whitespace runs to one
    space, strip. NULL in -> NULL out."""
    return pd.Series([
        None if v is None
        else _WS_RUN.sub(" ", unicodedata.normalize("NFC", v).lower()).strip()
        for v in s],
        dtype=object)


def normalize_text(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-document normalization audit: (id, norm_text, n_before,
    n_after, changed). Lengths are code-point counts (Python len ==
    Spark length == DuckDB length on the same string), so the columns
    are engine-exact."""
    t = F.col(text_col)
    norm = nfc_lower_collapse(t)
    return df.select(
        F.col(id_col),
        norm.alias("norm_text"),
        F.length(t).cast("long").alias("n_before"),
        F.length(norm).cast("long").alias("n_after"),
        (norm != t).cast("int").alias("changed"))
