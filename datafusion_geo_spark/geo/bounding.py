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


# ------------------------------------------- maximum inscribed circle

def _seg_dist(p: Coord, a: Coord, b: Coord) -> float:
    ax, ay = b[0] - a[0], b[1] - a[1]
    px, py = p[0] - a[0], p[1] - a[1]
    L2 = ax * ax + ay * ay
    t = 0.0 if L2 <= 0.0 else max(0.0, min(1.0, (px * ax + py * ay) / L2))
    dx, dy = px - t * ax, py - t * ay
    return math.sqrt(dx * dx + dy * dy)


def max_inscribed_circle(g: Geometry, tol: Optional[float] = None
                         ) -> Optional[Tuple[Coord, float]]:
    """ST_MaximumInscribedCircle: (center, radius) of the largest
    circle inside a polygonal geometry — the quadtree refinement
    algorithm published as Mapbox "polylabel" (also what GEOS 3.9
    implements). Cells are explored best-first by their potential
    (signed center distance + cell radius); the search stops when no
    cell can beat the incumbent by more than ``tol`` (default: larger
    bbox dimension / 1000). Deterministic: the heap breaks ties on
    insertion order of a fixed traversal."""
    import heapq

    from .overlay import _member_polys, _poly_segs, _pt_in
    polys = _member_polys(g)
    if not polys:
        return None
    segs = _poly_segs(polys)
    bb = g.bounds()
    x0, y0, x1, y1 = bb
    w, h = x1 - x0, y1 - y0
    if w <= 0.0 or h <= 0.0:
        return None
    if tol is None:
        tol = max(w, h) / 1000.0

    def signed(p: Coord) -> float:
        d = min(_seg_dist(p, a, b) for a, b in segs)
        return d if _pt_in(p, polys) == 1 else -d

    size = min(w, h)
    half = size / 2.0
    seq = 0
    heap: List[Tuple[float, int, float, float, float]] = []

    def push(cx: float, cy: float, hf: float) -> None:
        nonlocal seq
        d = signed((cx, cy))
        potential = d + hf * math.sqrt(2.0)
        heapq.heappush(heap, (-potential, seq, cx, cy, hf))
        seq += 1

    yy = y0
    while yy < y1:
        xx = x0
        while xx < x1:
            push(xx + half, yy + half, half)
            xx += size
        yy += size
    # seed with the bbox centroid so convex shapes converge instantly
    best_p: Coord = ((x0 + x1) / 2.0, (y0 + y1) / 2.0)
    best_d = signed(best_p)
    while heap:
        npot, _, cx, cy, hf = heapq.heappop(heap)
        if -npot - best_d <= tol:
            break
        d = signed((cx, cy))
        if d > best_d:
            best_d, best_p = d, (cx, cy)
        q = hf / 2.0
        if q * math.sqrt(2.0) > tol / 4.0:
            for dx in (-q, q):
                for dy in (-q, q):
                    push(cx + dx, cy + dy, q)
    if best_d < 0.0:
        return None
    return best_p, best_d
