"""Interior points and discrete set distances (PostGIS parity;
beyond-reference): ST_PointOnSurface, ST_HausdorffDistance,
ST_FrechetDistance.

ST_PointOnSurface follows the GEOS InteriorPoint algorithms: areal
inputs use the widest horizontal-bisector interval (scanline nudged off
vertex rows so crossings are unambiguous), lineal inputs the interior
vertex nearest the centroid, puntal inputs the member nearest the
centroid — always a point OF the geometry, which is the whole point of
the function over ST_Centroid.

The distance metrics are the DISCRETE forms (GEOS
DiscreteHausdorffDistance / DiscreteFrechetDistance, what PostGIS ships
without densification): Hausdorff measures vertex-to-geometry
distances, Fréchet walks the vertex sequences with the classic O(n·m)
dynamic program."""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

from .algos import EPS, centroid, distance
from .geom import Coord, Geometry, dist

_BIG = float("inf")


# ------------------------------------------------------ point on surface

def _scanline_y(rings: List[List[Coord]], ymin: float, ymax: float) -> float:
    """A horizontal level near the bbox middle that avoids every vertex
    row (GEOS's interior-point bisector adjustment)."""
    mid = (ymin + ymax) / 2.0
    ys = sorted({c[1] for r in rings for c in r})
    if all(abs(y - mid) > EPS for y in ys):
        return mid
    lo = [y for y in ys if y < mid - EPS]
    hi = [y for y in ys if y > mid + EPS]
    if lo and hi:
        return (lo[-1] + hi[0]) / 2.0
    if lo:
        return (lo[-1] + mid) / 2.0
    if hi:
        return (mid + hi[0]) / 2.0
    return mid


def _crossings(rings: List[List[Coord]], y: float) -> List[float]:
    xs: List[float] = []
    for r in rings:
        for i in range(len(r) - 1):
            (x1, y1), (x2, y2) = r[i], r[i + 1]
            if (y1 > y) != (y2 > y):
                xs.append(x1 + (y - y1) * (x2 - x1) / (y2 - y1))
    return sorted(xs)


def point_on_surface(g: Geometry) -> Geometry:
    """A point guaranteed ON the geometry (PostGIS ST_PointOnSurface)."""
    parts = g.geometries()
    polys = [m for m in parts if m.typ == "Polygon" and m.parts]
    lines = [m for m in parts if m.typ == "LineString" and len(m.parts) > 1]
    pts = [m for m in parts if m.typ == "Point" and m.parts is not None]
    if polys:
        best: Optional[Tuple[float, float, float]] = None  # width, x, y
        for poly in polys:
            rings = [list(r) for r in poly.parts if len(r) >= 4]
            if not rings:
                continue
            ys = [c[1] for c in rings[0]]
            y = _scanline_y(rings, min(ys), max(ys))
            xs = _crossings(rings, y)
            for i in range(0, len(xs) - 1, 2):
                w = xs[i + 1] - xs[i]
                if best is None or w > best[0]:
                    best = (w, (xs[i] + xs[i + 1]) / 2.0, y)
        if best is not None:
            return Geometry("Point", (best[1], best[2]), g.srid)
    if lines:
        c = centroid(g)
        cx, cy = c.parts if c.parts is not None else (0.0, 0.0)
        interior: List[Coord] = []
        ends: List[Coord] = []
        for ln in lines:
            ends.extend((ln.parts[0], ln.parts[-1]))
            interior.extend(ln.parts[1:-1])
        pool = interior or ends
        return Geometry("Point",
                        min(pool, key=lambda p: (dist(p, (cx, cy)),
                                                 p[0], p[1])),
                        g.srid)
    if pts:
        c = centroid(g)
        cx, cy = c.parts if c.parts is not None else (0.0, 0.0)
        pool = [m.parts for m in pts]
        return Geometry("Point",
                        min(pool, key=lambda p: (dist(p, (cx, cy)),
                                                 p[0], p[1])),
                        g.srid)
    return Geometry("Point", None, g.srid)


# ------------------------------------------------------ discrete metrics

def _vertices(g: Geometry) -> List[Coord]:
    out: List[Coord] = []
    for m in g.geometries():
        if m.typ == "Point" and m.parts is not None:
            out.append(m.parts)
        elif m.typ == "LineString":
            out.extend(m.parts)
        elif m.typ == "Polygon":
            for r in m.parts:
                out.extend(r)
    return out


def _pt_to_geom(p: Coord, b: Geometry) -> Optional[float]:
    return distance(Geometry("Point", p, None), b)


def hausdorff_distance(a: Geometry, b: Geometry) -> Optional[float]:
    """Discrete Hausdorff: max over both directions of the farthest
    vertex-to-other-geometry distance. None when either side is
    empty."""
    va, vb = _vertices(a), _vertices(b)
    if not va or not vb:
        return None
    h1 = max(_pt_to_geom(p, b) for p in va)
    h2 = max(_pt_to_geom(p, a) for p in vb)
    return max(h1, h2)


def frechet_distance(a: Geometry, b: Geometry) -> Optional[float]:
    """Discrete Fréchet over the ordered vertex sequences (the
    dog-walking metric; order-sensitive unlike Hausdorff)."""
    P, Q = _vertices(a), _vertices(b)
    if not P or not Q:
        return None
    n, m = len(P), len(Q)
    prev = [0.0] * m
    for i in range(n):
        cur = [0.0] * m
        for j in range(m):
            d = dist(P[i], Q[j])
            if i == 0 and j == 0:
                cur[j] = d
            elif i == 0:
                cur[j] = max(cur[j - 1], d)
            elif j == 0:
                cur[j] = max(prev[j], d)
            else:
                cur[j] = max(min(prev[j], prev[j - 1], cur[j - 1]), d)
        prev = cur
    return prev[-1]


def geometric_median(g: Geometry, iters: int = 8) -> Geometry:
    """ST_GeometricMedian (PostGIS) over the points of ``g``: Weiszfeld
    iteration from the arithmetic mean, a FIXED ``iters`` rounds with
    each iterate rounded to 9 dp (half away from zero) — the fixed-
    round + rounding discipline that makes the result a pure function
    of the input point SEQUENCE (reruns, engines, and SQL replays
    agree; feed it canonically-sorted multipoints)."""
    pts = [m.parts for m in g.geometries()
           if m.typ == "Point" and m.parts is not None]
    if not pts:
        return Geometry("Point", None, g.srid)
    if len(pts) == 1:
        return Geometry("Point", pts[0], g.srid)

    def rnd(v: float) -> float:
        return math.copysign(math.floor(abs(v) * 1e9 + 0.5), v) / 1e9 + 0.0

    cx = rnd(sum(p[0] for p in pts) / len(pts))
    cy = rnd(sum(p[1] for p in pts) / len(pts))
    for _ in range(iters):
        num_x = num_y = den = 0.0
        for (px, py) in pts:
            dx, dy = cx - px, cy - py
            # branch-free Weiszfeld: the distance floor stands in for
            # the singular-at-a-data-point case (a 1e12 weight pins the
            # iterate to that point) and is exactly mirrorable in SQL
            # (1/GREATEST(d, 1e-12)); sqrt form, not hypot, for the
            # same reason (hypot is not bit-identical to sqrt(dx²+dy²))
            d = math.sqrt(dx * dx + dy * dy)
            w = 1.0 / (d if d > 1e-12 else 1e-12)
            num_x += px * w
            num_y += py * w
            den += w
        cx, cy = rnd(num_x / den), rnd(num_y / den)
    return Geometry("Point", (cx, cy), g.srid)


def max_distance(a: Geometry, b: Geometry) -> Optional[float]:
    """ST_MaxDistance (PostGIS): the largest distance between the two
    geometries — attained at a vertex pair (the farthest point of any
    segment from a fixed point is one of its endpoints), so the scan
    is over vertex pairs. None when either side has no vertices."""
    va, vb = _vertices(a), _vertices(b)
    if not va or not vb:
        return None
    return max(dist(p, q) for p in va for q in vb)


def longest_line(a: Geometry, b: Geometry) -> Optional[Geometry]:
    """ST_LongestLine: the witness vertex pair of max_distance as a
    LINESTRING from a to b (ties: lexicographically smallest pair, so
    the witness is deterministic)."""
    va, vb = _vertices(a), _vertices(b)
    if not va or not vb:
        return None
    best = max(((dist(p, q), p, q) for p in va for q in vb),
               key=lambda t: (t[0], [-c for c in t[1] + t[2]]))
    return Geometry("LineString", [best[1], best[2]], a.srid)
