#!/usr/bin/env python
"""Emit the OPTIMIZATION_r11.md per-query checklist table from the
sweep snapshots: every declared query, its round-start warm time
(sweep_before, first optimization session) and end-of-round warm time
(sweep_late, resumed session), steal ticks for both, and the delta.

    python tools/mk_checklist.py > /tmp/checklist.md
"""
from __future__ import annotations

import json
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(tag):
    with open(os.path.join(HERE, "tools", f"sweep_{tag}.json")) as fh:
        return json.load(fh)["queries"]


def main():
    import sys
    args = sys.argv[1:]
    before = load(args[0] if args else "before")
    late = load(args[1] if len(args) > 1 else "late")
    names = sorted(set(before) | set(late))
    rows = []
    for n in names:
        b = before.get(n, {})
        a = late.get(n, {})
        bw, aw = b.get("warm"), a.get("warm")
        rows.append((n, bw, b.get("steal"), aw, a.get("steal"),
                     (None if bw is None or aw is None else aw - bw)))
    rows.sort(key=lambda r: -(r[3] or 0))
    print("| query | warm@start s (steal) | warm@end s (steal) | Δ s |")
    print("|---|---|---|---|")
    tb = ta = 0.0
    for n, bw, bs, aw, as_, d in rows:
        tb += bw or 0
        ta += aw or 0
        print(f"| {n} | {bw} ({bs}) | {aw} ({as_}) | "
              f"{'' if d is None else round(d, 2)} |")
    print(f"| **total ({len(rows)} queries)** | **{tb:.1f}** | "
          f"**{ta:.1f}** | **{ta - tb:.1f}** |")


if __name__ == "__main__":
    main()
