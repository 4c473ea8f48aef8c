"""In-worker spatial index over a WKB batch.

The reference ships a bulk-loaded R-tree utility with AABB envelopes,
unwired into any operator (/root/reference/src/geo/index.rs:10-33,
query API :57-63 — SURVEY.md §2 calls out that it exists to accelerate
spatial joins). This is the Spark-side equivalent: a uniform-grid bucket
index built per task over the broadcast/local side of a join, queried by
envelope. Grid buckets beat a tree here because (a) construction is two
numpy passes (the index is rebuilt per batch, so build cost dominates),
and (b) query fan-out is a handful of bucket lookups.

Used inside pandas-UDF/mapInPandas operators; never crosses the wire.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .geom import Geometry
from .wkb import from_wkb


class GridIndex:
    """Bucket index over item envelopes.

    build: O(n) — every item lands in each grid cell its envelope
    covers. query(envelope): candidate item indexes whose envelopes
    intersect the query envelope (superset; caller refines exactly)."""

    __slots__ = ("cell", "_buckets", "_boxes")

    def __init__(self, boxes: Sequence[Tuple[float, float, float, float]],
                 cell: Optional[float] = None):
        boxes = list(boxes)
        if cell is None:
            # heuristic: median envelope width; for degenerate widths
            # (all-point batches → width 0) fall back to a data-extent-
            # derived cell, else query() over a realistic envelope would
            # iterate ~(extent/cell)² buckets — effectively unbounded
            real = [b for b in boxes if b]
            widths = [max(b[2] - b[0], b[3] - b[1]) for b in real] or [1.0]
            med = float(np.median(widths))
            if med < 1e-9 and real:
                ext = max(max(b[2] for b in real) - min(b[0] for b in real),
                          max(b[3] for b in real) - min(b[1] for b in real))
                med = max(ext / max(np.sqrt(len(real)), 1.0), 1e-3)
            cell = max(med, 1e-3) * 2
        self.cell = cell
        self._boxes: List[Optional[Tuple[float, float, float, float]]] = boxes
        self._buckets: Dict[Tuple[int, int], List[int]] = defaultdict(list)
        c = self.cell
        for i, b in enumerate(boxes):
            if b is None:
                continue
            x0, y0 = int(b[0] // c), int(b[1] // c)
            x1, y1 = int(b[2] // c), int(b[3] // c)
            for cx in range(x0, x1 + 1):
                for cy in range(y0, y1 + 1):
                    self._buckets[(cx, cy)].append(i)

    @classmethod
    def from_wkb_batch(cls, wkbs: Sequence[Optional[bytes]],
                       cell: Optional[float] = None) -> "GridIndex":
        """Bulk load from a WKB column batch (nulls keep their index but
        never match) — mirrors build_rtree_index(index.rs:23-33)."""
        boxes = []
        for v in wkbs:
            if v is None:
                boxes.append(None)
            else:
                g = from_wkb(bytes(v))
                boxes.append(g.bounds())
        return cls(boxes, cell)

    def query(self, xmin: float, ymin: float, xmax: float,
              ymax: float) -> List[int]:
        """Item indexes whose envelope intersects the query envelope
        (locate_in_envelope_intersecting, index.rs:57-63)."""
        c = self.cell
        x0, x1 = int(xmin // c), int(xmax // c)
        y0, y1 = int(ymin // c), int(ymax // c)
        seen = set()
        out = []
        # iterate whichever is smaller: the query's bucket range or the
        # populated buckets — bounds a huge envelope over a fine grid
        nrange = (x1 - x0 + 1) * (y1 - y0 + 1)
        if nrange > len(self._buckets):
            keys = [k for k in self._buckets
                    if x0 <= k[0] <= x1 and y0 <= k[1] <= y1]
        else:
            keys = [(cx, cy) for cx in range(x0, x1 + 1)
                    for cy in range(y0, y1 + 1)]
        for key in keys:
            for i in self._buckets.get(key, ()):
                if i in seen:
                    continue
                seen.add(i)
                b = self._boxes[i]
                if b and not (b[2] < xmin or xmax < b[0]
                              or b[3] < ymin or ymax < b[1]):
                    out.append(i)
        return sorted(out)
