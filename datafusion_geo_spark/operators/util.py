"""Small shared helpers for the operator modules."""

from __future__ import annotations


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
