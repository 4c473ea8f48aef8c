"""Validity / simplicity predicates (PostGIS parity; beyond-reference —
the reference engine never validates inputs): ST_IsClosed, ST_IsRing,
ST_IsSimple, ST_IsValid, ST_IsValidReason.

Semantics follow GEOS, including the "interior is connected" polygon
rule: once every other ring rule holds, rings touch only at ISOLATED
POINTS, and the interior is disconnected exactly when the ring-touch
multigraph (nodes = shell + holes, one edge per distinct touch point
per pair) contains a cycle — a hole chain shell→h1→…→shell, or one
hole touching the shell twice, pinches the interior
(:func:`_interior_disconnected`; GEOS's ConnectedInteriorTester
specialized to the point-touch-only state the earlier checks
guarantee). Reason strings use the PostGIS vocabulary with a
``[x y]`` location suffix."""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

from .algos import (EPS, _on_segment, point_in_polygon, segment_crossing,
                    segments_intersect)
from .geom import Coord, Geometry, dist

Ring = Sequence[Coord]


def is_closed(g: Geometry) -> Optional[bool]:
    """ST_IsClosed: line start == end (all members for multi-lines).
    Points are closed; polygons are closed; NULL on empty."""
    t = g.typ
    if t == "LineString":
        return bool(g.parts) and dist(g.parts[0], g.parts[-1]) <= 0.0
    if t == "MultiLineString":
        if not g.parts:
            return None
        return all(len(m) >= 2 and dist(m[0], m[-1]) <= 0.0
                   for m in g.parts)
    if t in ("Point", "MultiPoint", "Polygon", "MultiPolygon"):
        return g.parts is not None and (t == "Point" or bool(g.parts))
    if t == "GeometryCollection":
        vals = [is_closed(m) for m in g.parts]
        return all(v for v in vals) if vals else None
    return None


def _seg_pairs_simple(cs: List[Coord], closed: bool) -> Optional[Coord]:
    """First improper self-meeting point of a chain, or None if the
    chain is simple. Adjacent segments may share exactly their common
    endpoint; a closed chain's first and last segment likewise."""
    n = len(cs) - 1
    for i in range(n):
        a, b = cs[i], cs[i + 1]
        if dist(a, b) <= 0.0:
            continue
        for j in range(i + 1, n):
            c, d = cs[j], cs[j + 1]
            if dist(c, d) <= 0.0:
                continue
            if not segments_intersect(a, b, c, d):
                continue
            adjacent = (j == i + 1)
            wraps = closed and i == 0 and j == n - 1
            if adjacent or wraps:
                shared = b if adjacent else a
                # the only allowed meeting is the shared endpoint
                other_hits = []
                for p in (a, b):
                    if _on_segment(p, c, d) and dist(p, shared) > EPS:
                        other_hits.append(p)
                for p in (c, d):
                    if _on_segment(p, a, b) and dist(p, shared) > EPS:
                        other_hits.append(p)
                x = segment_crossing(a, b, c, d)
                if x is not None and dist(x, shared) > EPS:
                    other_hits.append(x)
                if other_hits:
                    return other_hits[0]
                continue
            x = segment_crossing(a, b, c, d)
            if x is not None:
                return x
            for p in (c, d):
                if _on_segment(p, a, b):
                    return p
            for p in (a, b):
                if _on_segment(p, c, d):
                    return p
    return None


def _line_simple_violation(cs: List[Coord]) -> Optional[Coord]:
    closed = len(cs) >= 3 and dist(cs[0], cs[-1]) <= 0.0
    # repeated interior vertices are non-simple
    seen = {}
    last = len(cs) - 1
    for i, c in enumerate(cs):
        if closed and i == last:
            continue
        if c in seen and not (closed and {seen[c], i} == {0, last}):
            return c
        seen[c] = i
    return _seg_pairs_simple(cs, closed)


def is_simple(g: Geometry) -> Optional[bool]:
    """ST_IsSimple (OGC): no anomalous self-intersection. Points and
    polygonal geometries are simple by definition (GEOS); a MultiPoint
    is simple iff it has no duplicates; lines may self-touch only at
    their own boundary points; multi-line members may touch each other
    only at boundary points."""
    t = g.typ
    if t in ("Point", "Polygon", "MultiPolygon"):
        return True
    if t == "MultiPoint":
        pts = list(g.parts)
        return len(set(pts)) == len(pts)
    if t == "LineString":
        if len(g.parts) < 2:
            return True
        return _line_simple_violation(list(g.parts)) is None
    if t == "MultiLineString":
        members = [list(m) for m in g.parts if len(m) >= 2]
        for m in members:
            if _line_simple_violation(m) is not None:
                return False
        # members may only meet at mutual boundary points
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                if _members_meet_improperly(members[i], members[j]):
                    return False
        return True
    if t == "GeometryCollection":
        vals = [is_simple(m) for m in g.parts]
        return all(v for v in vals) if vals else True
    return None


def _bnd_pts(cs: List[Coord]) -> List[Coord]:
    if dist(cs[0], cs[-1]) <= 0.0:
        return []
    return [cs[0], cs[-1]]


def _members_meet_improperly(a: List[Coord], b: List[Coord]) -> bool:
    ok = set(map(tuple, _bnd_pts(a))) & set(map(tuple, _bnd_pts(b)))
    for i in range(len(a) - 1):
        for j in range(len(b) - 1):
            p, q = a[i], a[i + 1]
            c, d = b[j], b[j + 1]
            if not segments_intersect(p, q, c, d):
                continue
            x = segment_crossing(p, q, c, d)
            cands = [x] if x is not None else []
            for e in (c, d):
                if _on_segment(e, p, q):
                    cands.append(e)
            for e in (p, q):
                if _on_segment(e, c, d):
                    cands.append(e)
            if not cands:   # collinear overlap with no isolated witness
                return True
            for m in cands:
                if m is None:
                    continue
                if tuple(m) not in ok and \
                        not any(dist(m, kb) <= EPS
                                for kb in _bnd_pts(a) + _bnd_pts(b)):
                    return True
    return False


def is_ring(g: Geometry) -> Optional[bool]:
    """ST_IsRing: a closed AND simple LINESTRING. NULL for non-lines
    (PostGIS errors on polygons; NULL is the engine's convention)."""
    if g.typ != "LineString":
        return None
    if len(g.parts) < 2:
        return False
    return bool(is_closed(g)) and bool(is_simple(g))


def _fmt_loc(p: Coord) -> str:
    from .wkt import fmt_num
    return "[%s %s]" % (fmt_num(p[0]), fmt_num(p[1]))


def _ring_violation(r: Ring) -> Optional[str]:
    cs = list(r)
    if len(cs) < 4:
        return "Too few points in geometry component" + _fmt_loc(cs[0])
    if dist(cs[0], cs[-1]) > 0.0:
        return "Ring is not closed" + _fmt_loc(cs[0])
    x = _seg_pairs_simple(cs, True)
    if x is not None:
        return "Ring Self-intersection" + _fmt_loc(x)
    return None


def _rings_cross(a: Ring, b: Ring) -> Optional[Coord]:
    """A point where two rings properly cross (touching is allowed)."""
    la, lb = list(a), list(b)
    for i in range(len(la) - 1):
        for j in range(len(lb) - 1):
            x = segment_crossing(la[i], la[i + 1], lb[j], lb[j + 1])
            if x is None:
                continue
            # proper crossing = interior to both segments
            if (dist(x, la[i]) > EPS and dist(x, la[i + 1]) > EPS
                    and dist(x, lb[j]) > EPS and dist(x, lb[j + 1]) > EPS):
                return x
    return None


def _rings_overlap_segment(a: Ring, b: Ring) -> Optional[Coord]:
    """A witness point where two rings run along a SHARED SEGMENT of
    positive length. OGC allows ring pairs to touch only at isolated
    points; a collinear overlap (hole edge lying on the shell, two
    holes sharing an edge, two member shells glued along a border) is
    invalid — GEOS reports it as Self-intersection. _rings_cross can't
    see it: there is no proper crossing anywhere."""
    la, lb = list(a), list(b)
    for i in range(len(la) - 1):
        p1, p2 = la[i], la[i + 1]
        for j in range(len(lb) - 1):
            q1, q2 = lb[j], lb[j + 1]
            d1 = (p2[0] - p1[0]) * (q1[1] - p1[1]) \
                - (p2[1] - p1[1]) * (q1[0] - p1[0])
            d2 = (p2[0] - p1[0]) * (q2[1] - p1[1]) \
                - (p2[1] - p1[1]) * (q2[0] - p1[0])
            if abs(d1) > EPS or abs(d2) > EPS:
                continue  # not collinear
            # project both segments on the dominant axis of p1p2
            ax = 0 if abs(p2[0] - p1[0]) >= abs(p2[1] - p1[1]) else 1
            lo_p, hi_p = sorted((p1[ax], p2[ax]))
            lo_q, hi_q = sorted((q1[ax], q2[ax]))
            lo, hi = max(lo_p, lo_q), min(hi_p, hi_q)
            if hi - lo <= EPS:
                continue  # touch at (at most) a point — allowed
            mid = (lo + hi) / 2.0
            if ax == 0:
                t = (mid - p1[0]) / (p2[0] - p1[0])
                return (mid, p1[1] + t * (p2[1] - p1[1]))
            t = (mid - p1[1]) / (p2[1] - p1[1])
            return (p1[0] + t * (p2[0] - p1[0]), mid)
    return None


def _ring_touch_points(a: Ring, b: Ring) -> List[Coord]:
    """Isolated touch points between two rings, under the
    point-touch-only contract the earlier validity checks enforce (no
    proper crossings, no shared segments): two straight segments
    cannot meet in a single point interior to BOTH without crossing,
    so every legal touch includes a vertex of one ring lying on the
    other ring's boundary. Deduped by EPS distance."""
    la, lb = list(a), list(b)
    pts: List[Coord] = []

    def add(p: Coord) -> None:
        if not any(dist(p, q) <= EPS for q in pts):
            pts.append(p)

    for v in la[:-1]:           # closing vertex repeats the first
        if any(_on_segment(v, lb[j], lb[j + 1])
               for j in range(len(lb) - 1)):
            add(v)
    for v in lb[:-1]:
        if any(_on_segment(v, la[i], la[i + 1])
               for i in range(len(la) - 1)):
            add(v)
    return pts


def _interior_disconnected(rings: List[Ring]) -> Optional[Coord]:
    """GEOS's ConnectedInteriorTester rule, specialized to the state
    the preceding checks guarantee (rings touch only at isolated
    points): the interior is disconnected iff the BIPARTITE graph of
    ring nodes and EPS-deduplicated touch-POINT nodes (one edge per
    ring↔point incidence) contains a cycle. A hole chain
    shell→P1→h1→P2→h2→P3→shell closes a cycle; so do two distinct
    touches between the same pair (a lens-shaped hole against the
    shell splits the disk into two lunes meeting only at points). But
    three or more rings meeting at ONE coincident point stay a star —
    a tree — and the interior stays connected (GEOS/JTS agree): the
    earlier ring-pair-edge formulation wrongly counted that as a
    cycle because it never identified coincident points across pairs.
    Union-find: the first incidence whose ring and point are already
    connected is the pinch, and the touch point is the reported
    location."""
    n = len(rings)
    pts: List[Coord] = []           # global EPS-deduped touch points

    def pid(p: Coord) -> int:
        for k, q in enumerate(pts):
            if dist(p, q) <= EPS:
                return k
        pts.append(p)
        return len(pts) - 1

    incidences: List[tuple] = []    # (ring index, point id), deduped
    seen = set()
    for i in range(n):
        for j in range(i + 1, n):
            for p in _ring_touch_points(rings[i], rings[j]):
                k = pid(p)
                for r in (i, j):
                    if (r, k) not in seen:
                        seen.add((r, k))
                        incidences.append((r, k))

    parent = list(range(n + len(pts)))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r, k in incidences:
        rr, rk = find(r), find(n + k)
        if rr == rk:
            return pts[k]
        parent[rr] = rk
    return None


def _poly_violation(rings: List[Ring]) -> Optional[str]:
    for r in rings:
        v = _ring_violation(r)
        if v is not None:
            return v
    if not rings:
        return None
    shell = list(rings[0])
    for hole in rings[1:]:
        h = list(hole)
        x = _rings_cross(shell, h) or _rings_overlap_segment(shell, h)
        if x is not None:
            return "Self-intersection" + _fmt_loc(x)
        if any(point_in_polygon(p, [shell]) == -1 for p in h):
            return "Hole lies outside shell" + _fmt_loc(h[0])
    for i in range(1, len(rings)):
        for j in range(i + 1, len(rings)):
            hi, hj = list(rings[i]), list(rings[j])
            x = _rings_cross(hi, hj) or _rings_overlap_segment(hi, hj)
            if x is not None:
                return "Self-intersection" + _fmt_loc(x)
            if all(point_in_polygon(p, [hi]) >= 0 for p in hj):
                return "Holes are nested" + _fmt_loc(hj[0])
            if all(point_in_polygon(p, [hj]) >= 0 for p in hi):
                return "Holes are nested" + _fmt_loc(hi[0])
    # LAST (ordering keeps every pre-existing reason string stable):
    # with all point-touch preconditions now certified, run the
    # connected-interior rule
    if len(rings) > 1:
        x = _interior_disconnected([list(r) for r in rings])
        if x is not None:
            return "Interior is disconnected" + _fmt_loc(x)
    return None


def is_valid_reason(g: Geometry) -> str:
    """ST_IsValidReason: 'Valid Geometry' or the first violation in
    PostGIS vocabulary. Points and lines are always valid (OGC —
    self-crossing LINES are valid, just not simple)."""
    t = g.typ
    if t == "Polygon":
        v = _poly_violation(list(g.parts)) if g.parts else None
        return v or "Valid Geometry"
    if t == "MultiPolygon":
        polys = [list(p) for p in g.parts]
        for rings in polys:
            v = _poly_violation(rings)
            if v is not None:
                return v
        # member interiors must not overlap: shells may touch at points
        for i in range(len(polys)):
            for j in range(i + 1, len(polys)):
                si, sj = list(polys[i][0]), list(polys[j][0])
                x = _rings_cross(si, sj) or _rings_overlap_segment(si, sj)
                if x is not None:
                    return "Self-intersection" + _fmt_loc(x)
                if all(point_in_polygon(p, [sj]) >= 0 for p in si):
                    return "Nested shells" + _fmt_loc(si[0])
                if all(point_in_polygon(p, [si]) >= 0 for p in sj):
                    return "Nested shells" + _fmt_loc(sj[0])
        return "Valid Geometry"
    if t == "GeometryCollection":
        for m in g.parts:
            v = is_valid_reason(m)
            if v != "Valid Geometry":
                return v
        return "Valid Geometry"
    return "Valid Geometry"


def is_valid(g: Geometry) -> bool:
    """ST_IsValid — see is_valid_reason for the rule set."""
    return is_valid_reason(g) == "Valid Geometry"
