"""Bounding forms (PostGIS parity; beyond-reference):
ST_MinimumBoundingRadius (smallest enclosing circle, Welzl) and
ST_OrientedEnvelope (minimum-area rotated rectangle, rotating
calipers over the convex hull).

Both are per-geometry kernels over small vertex sets; determinism
notes: Welzl runs in FIXED input order (no shuffle — randomization only
changes the expected runtime, never the unique answer: the minimum
enclosing circle of a point set is unique), and the oriented envelope
resolves area ties by the smallest edge angle, with the output ring
canonicalized to start at its lexicographically smallest corner.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

from .algos import _canon_start, convex_hull
from .geom import Coord, Geometry, dist

__all__ = ["min_bounding_circle", "oriented_envelope"]


def _circle_2(a: Coord, b: Coord) -> Tuple[Coord, float]:
    c = ((a[0] + b[0]) / 2.0, (a[1] + b[1]) / 2.0)
    return c, dist(a, b) / 2.0


def _circle_3(a: Coord, b: Coord, c: Coord) -> Optional[Tuple[Coord, float]]:
    """Circumcircle; None when (near-)collinear."""
    d = 2.0 * (a[0] * (b[1] - c[1]) + b[0] * (c[1] - a[1])
               + c[0] * (a[1] - b[1]))
    if d == 0.0:
        return None
    a2 = a[0] * a[0] + a[1] * a[1]
    b2 = b[0] * b[0] + b[1] * b[1]
    c2 = c[0] * c[0] + c[1] * c[1]
    ux = (a2 * (b[1] - c[1]) + b2 * (c[1] - a[1]) + c2 * (a[1] - b[1])) / d
    uy = (a2 * (c[0] - b[0]) + b2 * (a[0] - c[0]) + c2 * (b[0] - a[0])) / d
    ctr = (ux, uy)
    return ctr, dist(ctr, a)


def _in_circle(p: Coord, c: Tuple[Coord, float]) -> bool:
    return dist(p, c[0]) <= c[1] * (1.0 + 1e-12) + 1e-12


def min_bounding_circle(g: Geometry) -> Optional[Tuple[Coord, float]]:
    """Smallest enclosing circle of the geometry's vertices as
    ((cx, cy), r) — the ST_MinimumBoundingRadius record. None for
    empty input. Welzl's move-to-front algorithm in deterministic
    input order; the answer is the unique minimum circle regardless of
    order, and per-geometry vertex counts keep the worst case cheap."""
    pts: List[Coord] = []
    seen = set()
    for p in g.vertices():
        if p not in seen:
            seen.add(p)
            pts.append(p)
    if not pts:
        return None
    circ: Tuple[Coord, float] = (pts[0], 0.0)
    for i, p in enumerate(pts):
        if _in_circle(p, circ):
            continue
        circ = (p, 0.0)
        for j in range(i):
            q = pts[j]
            if _in_circle(q, circ):
                continue
            circ = _circle_2(p, q)
            for k in range(j):
                s = pts[k]
                if _in_circle(s, circ):
                    continue
                c3 = _circle_3(p, q, s)
                if c3 is not None:
                    circ = c3
    return circ


def oriented_envelope(g: Geometry) -> Geometry:
    """ST_OrientedEnvelope: the minimum-AREA rectangle (any rotation)
    containing the geometry. Degenerate inputs degrade like PostGIS:
    empty → POINT EMPTY, point → POINT, collinear → LINESTRING between
    the extremes. Rotating calipers: the optimal rectangle has one side
    collinear with a convex-hull edge; ties resolve to the smallest
    edge angle and the ring starts at its lexicographically smallest
    corner (deterministic output for an oracle to pin)."""
    hull = convex_hull(g)
    if hull.typ in ("Point", "LineString"):
        return hull
    ring = hull.parts[0][:-1]          # CCW shell, closing vertex dropped
    best = None
    for i in range(len(ring)):
        ex = ring[(i + 1) % len(ring)][0] - ring[i][0]
        ey = ring[(i + 1) % len(ring)][1] - ring[i][1]
        ln = math.hypot(ex, ey)
        if ln == 0.0:
            continue
        ux, uy = ex / ln, ey / ln      # edge frame: u along, v normal
        us = [p[0] * ux + p[1] * uy for p in ring]
        vs = [-p[0] * uy + p[1] * ux for p in ring]
        u0, u1, v0, v1 = min(us), max(us), min(vs), max(vs)
        area = (u1 - u0) * (v1 - v0)
        if best is None or area < best[0] - 1e-12:
            best = (area, ux, uy, u0, u1, v0, v1)
    _, ux, uy, u0, u1, v0, v1 = best
    corners = [(u * ux - v * uy, u * uy + v * ux)
               for u, v in ((u0, v0), (u1, v0), (u1, v1), (u0, v1))]
    shell = corners + [corners[0]]
    if ring_area_sign(shell) < 0:
        shell = list(reversed(shell))
    return Geometry("Polygon", [_canon_start(shell)], g.srid)


def ring_area_sign(ring: List[Coord]) -> float:
    s = 0.0
    for a, b in zip(ring, ring[1:]):
        s += a[0] * b[1] - b[0] * a[1]
    return s
