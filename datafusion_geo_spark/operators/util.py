"""Small shared helpers for the operator modules."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

#: DuckDB-twin of :func:`round6_binary` — oracles embed this exact text so
#: both engines run the identical IEEE op sequence on the binary double.
ROUND6_SQL = ("((CASE WHEN ({x}) < 0 THEN -1 ELSE 1 END) * "
              "floor(abs({x}) * 1000000.0 + 0.5) / 1000000.0 + 0.0)")


def round_binary(col: Column, digits: int = 6) -> Column:
    """Half-away-from-zero rounding of the BINARY double value.

    ``F.round`` is HALF_UP on the *shortest decimal representation*
    (``BigDecimal.valueOf``), so a double sitting just below an exact
    half boundary in binary can round UP if its shortest repr prints as
    ``…5`` — while DuckDB/C round the binary value DOWN. Observed live:
    web-mercator x at lon=±159 is 17699799.0361305 (shortest repr on the
    6-dp half), Spark F.round → …036131, DuckDB ROUND → …036130
    (CORRECTNESS_r04 transform_points red row). This helper computes
    ``sign(x) * floor(|x|·10^d + 0.5) / 10^d`` — every step a plain IEEE
    double op both engines execute identically, so Spark and any oracle
    mirroring the formula (``ROUND6_SQL``) agree bit-for-bit whenever
    the pre-round input agrees. The trailing ``+ 0.0`` normalizes -0.0.
    """
    s = F.lit(float(10 ** digits))
    return F.signum(col) * F.floor(F.abs(col) * s + F.lit(0.5)) / s + F.lit(0.0)


def round6_binary(col: Column) -> Column:
    """:func:`round_binary` at 6 dp — the repo-wide convention for every
    oracle-compared double."""
    return round_binary(col, 6)


#: default bound for the process-level fit/table memos below — far
#: above anything one session legitimately fits (a handful of corpora x
#: a handful of hyper-parameter keys), yet it caps driver memory over a
#: 100 TB-session lifetime (r11 verdict: the memos were unbounded).
MEMO_CAP = 64


def memo_get(cache: dict, key, make, cap: int = MEMO_CAP):
    """Bounded process-level memo with LRU eviction. The memoized fits
    are deterministic (hit == refit bit-for-bit, the r4-verdict
    contract), so eviction only ever costs a refit, never changes a
    value. Python dicts iterate in insertion order; a hit re-inserts
    its key so ``next(iter(cache))`` is always the least recently USED
    entry."""
    if key in cache:
        val = cache.pop(key)
        cache[key] = val
        return val
    val = make()
    cache[key] = val
    while len(cache) > cap:
        cache.pop(next(iter(cache)))
    return val


def fresh_name(base: str, taken) -> str:
    """An internal column name guaranteed not to shadow a user column:
    prepend underscores until it collides with nothing in ``taken``.
    Every operator that adds-then-drops a helper column routes through
    this so a same-named user column is never silently overwritten
    (asof_join's _t/_tag/_pay, sampling's _rn/_pb, range_join's _ib)."""
    name = base
    while name in taken:
        name = "_" + name
    return name
