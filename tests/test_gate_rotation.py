"""Gate-rotation invariants: the driver checks EXACTLY the first 50
``queries()`` entries, so the explicit _FIRST50 list must stay a
well-formed permutation prefix — 50 unique declared names, returned in
that order — and every declared query must carry an oracle twin (the
driver's weaker rows-only path is opt-out by omission, which this repo
never uses)."""

import sys

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod


def test_first50_is_the_gate_prefix():
    names = list(entrymod.queries())
    assert len(entrymod._FIRST50) == 50
    assert len(set(entrymod._FIRST50)) == 50
    assert names[:50] == entrymod._FIRST50
    assert len(names) == len(set(names))


def test_every_query_has_an_oracle_and_vice_versa():
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert q == o, (sorted(q - o), sorted(o - q))
