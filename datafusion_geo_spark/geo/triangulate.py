"""Triangulations and their derivatives (PostGIS parity;
beyond-reference): ST_DelaunayTriangles, ST_VoronoiPolygons,
ST_ConcaveHull, ST_GeneratePoints.

Algorithms (all standard, public):

- Delaunay: Bowyer-Watson incremental insertion over a super-triangle,
  deduped lexicographically-sorted sites so the result is a pure
  function of the input point SET (GEOS likewise returns a
  GEOMETRYCOLLECTION of triangles).
- Voronoi: per-site half-plane intersection (each cell = clip envelope
  ∩ bisector half-planes against every other site). O(n²) but exact and
  immune to the circumcenter-topology edge cases; these kernels run on
  per-row geometries where n is small. The clip envelope is the input
  bbox expanded by its larger dimension (GEOS expands similarly;
  deterministic here, or caller-supplied via ``extend_to``).
- Concave hull: chi-shape — strip Delaunay boundary edges longer than
  ``lmin + ratio·(lmax−lmin)`` (ratio 1 = convex hull) while keeping
  the boundary regular (only ears whose interior vertex is not already
  on the boundary), then dissolve the surviving triangles.
- Generate points: deterministic xorshift64* rejection sampling in the
  bbox, seeded — same (geometry, n, seed) always yields the same
  multipoint, a promise a distributed engine must keep.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Set, Tuple

from .geom import Coord, Geometry, dist
from .overlay import _member_polys, _pt_in

Tri = Tuple[Coord, Coord, Coord]
Edge = Tuple[Coord, Coord]


def _sites(g: Geometry) -> List[Coord]:
    seen: Set[Coord] = set()
    out: List[Coord] = []
    for m in g.geometries():
        cs: List[Coord] = []
        if m.typ == "Point" and m.parts is not None:
            cs = [m.parts]
        elif m.typ == "LineString":
            cs = list(m.parts)
        elif m.typ == "Polygon":
            cs = [c for r in m.parts for c in r]
        for c in cs:
            if c not in seen:
                seen.add(c)
                out.append(c)
    return sorted(out)


def _circum_contains(t: Tri, p: Coord) -> bool:
    """p strictly inside the circumcircle of CCW triangle t (the
    incircle determinant)."""
    ax, ay = t[0][0] - p[0], t[0][1] - p[1]
    bx, by = t[1][0] - p[0], t[1][1] - p[1]
    cx, cy = t[2][0] - p[0], t[2][1] - p[1]
    det = ((ax * ax + ay * ay) * (bx * cy - cx * by)
           - (bx * bx + by * by) * (ax * cy - cx * ay)
           + (cx * cx + cy * cy) * (ax * by - bx * ay))
    return det > 1e-12


def _ccw(a: Coord, b: Coord, c: Coord) -> float:
    return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])


def _bowyer_watson(pts: List[Coord], mult: float) -> List[Tri]:
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    cx, cy = (min(xs) + max(xs)) / 2.0, (min(ys) + max(ys)) / 2.0
    span = max(max(xs) - min(xs), max(ys) - min(ys), 1.0) * mult
    s1 = (cx - span, cy - span)
    s2 = (cx + span, cy - span)
    s3 = (cx, cy + span)
    tris: List[Tri] = [(s1, s2, s3)]
    for p in pts:
        bad = [t for t in tris if _circum_contains(t, p)]
        boundary: Dict[Edge, int] = {}
        for t in bad:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                k = (e[1], e[0]) if (e[1], e[0]) in boundary else e
                boundary[k] = boundary.get(k, 0) + 1
        tris = [t for t in tris if t not in bad]
        for e, cnt in boundary.items():
            if cnt == 1:
                a, b = e
                t = (a, b, p) if _ccw(a, b, p) > 0 else (b, a, p)
                if abs(_ccw(*t)) > 1e-12:
                    tris.append(t)
    supers = {s1, s2, s3}
    return [t for t in tris if not (set(t) & supers)]


def _hull_area2(pts: List[Coord]) -> float:
    """Doubled convex-hull area by monotone chain (local: avoids an
    algos import cycle)."""
    ps = sorted(set(pts))
    if len(ps) < 3:
        return 0.0

    def chain(seq):
        out: List[Coord] = []
        for p in seq:
            while len(out) >= 2 and _ccw(out[-2], out[-1], p) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = chain(ps)
    upper = chain(reversed(ps))
    ring = lower[:-1] + upper[:-1]
    a2 = 0.0
    for i in range(len(ring)):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % len(ring)]
        a2 += x1 * y2 - x2 * y1
    return abs(a2)


def delaunay_triangles(g: Geometry) -> List[Tri]:
    """Bowyer-Watson over the distinct vertices of ``g``. Triangles are
    returned CCW with a canonical vertex rotation, sorted, so output
    order is deterministic.

    Super-triangle distance is chosen ADAPTIVELY: a near-degenerate
    hull sliver has an enormous circumcircle, and if it reaches the
    super vertices the sliver never forms and the triangulation is
    left with a dented hull (invariant fuzz: a 16-point set lost a
    0.5-area boundary sliver at the old fixed 64× distance). The
    triangulation is accepted when its area matches the convex hull's;
    otherwise the super distance grows 64× and the insertion reruns —
    terminating because a finite site set's true Delaunay triangles
    all have finite circumradii, and a sliver thin enough to defeat
    the largest multiplier contributes (sub-tolerance) zero area."""
    pts = _sites(g)
    if len(pts) < 3:
        return []
    hull2 = _hull_area2(pts)
    out: List[Tri] = []
    best_gap = float("inf")
    for mult in (64.0, 4096.0, 262144.0, 16777216.0):
        att = _bowyer_watson(pts, mult)
        tri2 = sum(abs(_ccw(*t)) for t in att)
        gap = abs(tri2 - hull2)
        # keep the attempt CLOSEST to the hull area, not the last
        # one: a 16777216x super-span degrades circumcircle precision,
        # so when no multiplier meets tolerance an earlier, better-
        # conditioned attempt is the one to return
        if gap < best_gap:
            best_gap, out = gap, att
        if gap <= 1e-9 * max(hull2, 1.0):
            break

    def canon(t: Tri) -> Tri:
        i = min(range(3), key=lambda k: t[k])
        return (t[i], t[(i + 1) % 3], t[(i + 2) % 3])

    return sorted(canon(t) for t in out)


def delaunay_geometry(g: Geometry, edges: bool = False) -> Geometry:
    """ST_DelaunayTriangles: GEOMETRYCOLLECTION of triangle POLYGONs
    (or MULTILINESTRING of unique edges with ``edges``)."""
    tris = delaunay_triangles(g)
    if edges:
        es: Set[Edge] = set()
        for t in tris:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                es.add(e if e[0] <= e[1] else (e[1], e[0]))
        return Geometry("MultiLineString",
                        [[a, b] for a, b in sorted(es)], g.srid)
    members = [Geometry("Polygon", [[t[0], t[1], t[2], t[0]]], g.srid)
               for t in tris]
    return Geometry("GeometryCollection", members, g.srid)


# ----------------------------------------------------------------- voronoi

def _clip_halfplane(poly: List[Coord], a: float, b: float,
                    c: float) -> List[Coord]:
    """Sutherland-Hodgman clip of polygon ``poly`` (open ring, CCW)
    against half-plane a·x + b·y <= c."""
    out: List[Coord] = []
    n = len(poly)
    for i in range(n):
        p, q = poly[i], poly[(i + 1) % n]
        fp = a * p[0] + b * p[1] - c
        fq = a * q[0] + b * q[1] - c
        if fp <= 1e-12:
            out.append(p)
        if (fp < -1e-12 and fq > 1e-12) or (fp > 1e-12 and fq < -1e-12):
            t = fp / (fp - fq)
            out.append((p[0] + t * (q[0] - p[0]),
                        p[1] + t * (q[1] - p[1])))
    return out


def voronoi_cells(g: Geometry,
                  extend_to: Optional[Geometry] = None
                  ) -> List[Tuple[Coord, List[Coord]]]:
    """(site, cell-ring) pairs; cells clipped to the envelope."""
    pts = _sites(g)
    if not pts:
        return []
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    if extend_to is not None and extend_to.bounds() is not None:
        x0, y0, x1, y1 = extend_to.bounds()
    else:
        mx = max(max(xs) - min(xs), max(ys) - min(ys), 1.0)
        x0, y0 = min(xs) - mx, min(ys) - mx
        x1, y1 = max(xs) + mx, max(ys) + mx
    out: List[Tuple[Coord, List[Coord]]] = []
    for s in pts:
        cell = [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]
        for o in pts:
            if o == s:
                continue
            # bisector half-plane: points nearer s than o
            a, b = o[0] - s[0], o[1] - s[1]
            c = (o[0] * o[0] - s[0] * s[0]
                 + o[1] * o[1] - s[1] * s[1]) / 2.0
            cell = _clip_halfplane(cell, a, b, c)
            if not cell:
                break
        if len(cell) >= 3:
            out.append((s, cell))
    return out


def voronoi_geometry(g: Geometry,
                     extend_to: Optional[Geometry] = None) -> Geometry:
    """ST_VoronoiPolygons: GEOMETRYCOLLECTION of cell POLYGONs in site
    order (sites sorted lexicographically — deterministic)."""
    members = []
    for _, ring in voronoi_cells(g, extend_to):
        r = list(ring)
        if dist(r[0], r[-1]) > 0.0:
            r.append(r[0])
        members.append(Geometry("Polygon", [r], g.srid))
    return Geometry("GeometryCollection", members, g.srid)


# ------------------------------------------------------------ concave hull

def concave_hull(g: Geometry, ratio: float = 0.3) -> Geometry:
    """ST_ConcaveHull (GEOS 3.11 edge-length-ratio algorithm shape):
    Delaunay, then peel boundary triangles whose boundary edge exceeds
    lmin + ratio·(lmax − lmin), never exposing a vertex twice on the
    boundary (keeps the shell simple). ratio >= 1 → convex hull."""
    tris = delaunay_triangles(g)
    if not tris:
        return Geometry("Polygon", [], g.srid)
    ratio = min(max(ratio, 0.0), 1.0)
    alive: Set[Tri] = set(tris)

    def edge_key(a: Coord, b: Coord) -> Edge:
        return (a, b) if a <= b else (b, a)

    def boundary_edges() -> Dict[Edge, Tri]:
        cnt: Dict[Edge, List[Tri]] = {}
        for t in alive:
            for e in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                cnt.setdefault(edge_key(*e), []).append(t)
        return {e: ts[0] for e, ts in cnt.items() if len(ts) == 1}

    lens = [dist(a, b) for t in tris
            for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0]))]
    lmin, lmax = min(lens), max(lens)
    # ratio = 1 must yield EXACTLY lmax: the lmin + 1·(lmax − lmin)
    # float chain can land a couple of ulps BELOW lmax, peeling the
    # longest boundary edge and denting the promised convex hull
    # (found by the invariant fuzz: 6-point set where the chain gave
    # ...504 vs lmax ...506)
    thresh = lmax if ratio >= 1.0 else lmin + ratio * (lmax - lmin)

    changed = True
    while changed:
        changed = False
        bd = boundary_edges()
        bverts: Dict[Coord, int] = {}
        for (a, b) in bd:
            bverts[a] = bverts.get(a, 0) + 1
            bverts[b] = bverts.get(b, 0) + 1
        # longest-first peeling is the GEOS priority-queue order
        for e, t in sorted(bd.items(),
                           key=lambda kv: -dist(kv[0][0], kv[0][1])):
            if t not in alive or dist(e[0], e[1]) <= thresh:
                continue
            apex = [v for v in t if v not in e]
            if not apex or apex[0] in bverts:
                continue   # would pinch the shell
            # both other edges must be interior (shared) edges or the
            # triangle is an isolated ear
            alive.discard(t)
            changed = True
            break
    # dissolve: edges used once among alive triangles form the shell
    once: Dict[Edge, Edge] = {}
    cnt: Dict[Edge, int] = {}
    directed: Dict[Edge, Edge] = {}
    for t in alive:
        for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            k = edge_key(a, b)
            cnt[k] = cnt.get(k, 0) + 1
            directed[k] = (a, b)
    shell_edges = [directed[k] for k, c in cnt.items() if c == 1]
    if not shell_edges:
        return Geometry("Polygon", [], g.srid)
    nxt: Dict[Coord, Coord] = {a: b for a, b in shell_edges}
    start = min(nxt)
    ring = [start]
    cur = nxt.get(start)
    guard = 0
    while cur is not None and cur != start and guard <= len(shell_edges):
        ring.append(cur)
        cur = nxt.get(cur)
        guard += 1
    ring.append(start)
    if len(ring) < 4:
        return Geometry("Polygon", [], g.srid)
    return Geometry("Polygon", [ring], g.srid)


# --------------------------------------------------------- generate points

def _xorshift(state: int) -> int:
    state ^= (state << 13) & 0xFFFFFFFFFFFFFFFF
    state ^= state >> 7
    state ^= (state << 17) & 0xFFFFFFFFFFFFFFFF
    return state & 0xFFFFFFFFFFFFFFFF


def generate_points(g: Geometry, n: int, seed: int = 1) -> Geometry:
    """ST_GeneratePoints: ``n`` uniform points inside the polygonal
    geometry via seeded rejection sampling in the bbox (deterministic
    xorshift64*; same inputs → same MULTIPOINT everywhere)."""
    if n <= 0:
        return Geometry("MultiPoint", [], g.srid)
    polys = _member_polys(g)
    bb = g.bounds()
    if not polys or bb is None:
        return Geometry("MultiPoint", [], g.srid)
    x0, y0, x1, y1 = bb
    w, h = x1 - x0, y1 - y0
    if w <= 0.0 or h <= 0.0:
        return Geometry("MultiPoint", [], g.srid)
    state = (seed * 0x9E3779B97F4A7C15 + 1) & 0xFFFFFFFFFFFFFFFF
    pts: List[Coord] = []
    budget = 10000 * n
    while len(pts) < n and budget > 0:
        budget -= 1
        state = _xorshift(state)
        ux = (state >> 11) / float(1 << 53)
        state = _xorshift(state)
        uy = (state >> 11) / float(1 << 53)
        p = (x0 + ux * w, y0 + uy * h)
        if _pt_in(p, polys) == 1:
            pts.append(p)
    return Geometry("MultiPoint", pts, g.srid)
