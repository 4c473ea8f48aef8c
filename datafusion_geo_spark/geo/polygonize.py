"""ST_Polygonize: assemble polygons from correctly-noded linework
(PostGIS/GEOS Polygonizer semantics — edges must already meet only at
endpoints; ST_Polygonize does NOT node its input, and neither do we).

Classic planar face enumeration over HALF-edges: every input segment
contributes both directed half-edges; each face is walked by repeatedly
taking the most-counter-clockwise outgoing edge at the head, with the
immediate U-turn excluded unless the node is a dead end (a dead-end
round trip collapses to a zero-area ring and is dropped). CCW cycles
are bounded faces; CW cycles are either holes (assigned to the smallest
strictly-containing shell) or the unbounded face boundary (dropped).

Differs from overlay._trace_faces deliberately: that tracer consumes
single-direction pre-oriented overlay edges where U-turns cannot occur;
polygonize input is undirected linework where the U-turn IS the
leftmost candidate and must be excluded.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

from .algos import (EPS, _canon_start, _node_key, _unpinch_closed,
                    point_in_ring)
from .geom import Coord, Geometry, ring_area2
from .overlay import _line_members, _mid

__all__ = ["polygonize"]


def _collect_segments(geoms: Sequence[Geometry]):
    """Deduped node-snapped undirected segments from all lineal input."""
    rep: dict = {}
    segs = []
    seen = set()
    for g in geoms:
        if g is None or g.is_empty():
            continue
        for ln in _line_members(g):
            for a, b in zip(ln, ln[1:]):
                ka, kb = _node_key(a), _node_key(b)
                if ka == kb:
                    continue
                rep.setdefault(ka, a)
                rep.setdefault(kb, b)
                key = (min(ka, kb), max(ka, kb))
                if key in seen:
                    continue
                seen.add(key)
                segs.append((rep[ka], rep[kb]))
    return segs


def polygonize(geoms: Sequence[Geometry]) -> Geometry:
    """Bounded faces of the noded linework as (Multi)Polygon —
    GEOMETRYCOLLECTION EMPTY when the linework closes no face. Faces
    are emitted shells-smallest-first with canonical ring starts, so
    the output is a pure function of the input point set."""
    segs = _collect_segments(geoms)
    half = []
    for a, b in segs:
        half.append((a, b))
        half.append((b, a))
    outgoing: dict = {}
    for e in half:
        outgoing.setdefault(_node_key(e[0]), []).append(e)
    used = set()
    cycles: List[List[Coord]] = []
    for start in half:
        if id(start) in used:
            continue
        ring = [start[0]]
        e = start
        closed = False
        for _ in range(len(half) + 1):
            used.add(id(e))
            ring.append(e[1])
            if _node_key(e[1]) == _node_key(start[0]) and len(ring) >= 3:
                closed = True
                break
            din = math.atan2(e[1][1] - e[0][1], e[1][0] - e[0][0])
            cands = [c for c in outgoing.get(_node_key(e[1]), [])
                     if id(c) not in used
                     and _node_key(c[1]) != _node_key(e[0])]
            if not cands:   # dead end: U-turn back if possible
                cands = [c for c in outgoing.get(_node_key(e[1]), [])
                         if id(c) not in used]
                if not cands:
                    break

            def turn(c):
                ang = math.atan2(c[1][1] - c[0][1],
                                 c[1][0] - c[0][0]) - din
                while ang <= -math.pi:
                    ang += 2.0 * math.pi
                while ang > math.pi:
                    ang -= 2.0 * math.pi
                return ang

            e = max(cands, key=turn)
        if closed and len(ring) >= 4:
            ring[-1] = ring[0]
            cycles.append(ring)
    # a traced cycle can revisit a node (figure-eight linework): emit
    # the lobes as separate simple rings touching at the point — the
    # GEOS polygonizer's maximal-edge-ring behavior (r9 fuzz finding)
    cycles = _unpinch_closed(cycles)
    shells = sorted(((abs(ring_area2(r)), _canon_start(r)) for r in cycles
                     if ring_area2(r) > EPS), key=lambda s: s[0])
    holes = [_canon_start(r) for r in cycles if ring_area2(r) < -EPS]
    faces = [[r] for _, r in shells]
    for h in holes:
        for k, (_, shell) in enumerate(shells):  # smallest container first
            if any(point_in_ring(_mid(h[i], h[i + 1]), shell) == 1
                   for i in range(len(h) - 1)):
                faces[k].append(h)
                break
    if not faces:
        return Geometry("GeometryCollection", [])
    if len(faces) == 1:
        return Geometry("Polygon", faces[0])
    return Geometry("MultiPolygon", faces)
