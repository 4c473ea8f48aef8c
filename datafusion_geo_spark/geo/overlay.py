"""Geometry set operations — ST_Intersection / ST_Union / ST_Difference.

Beyond-reference additions (the reference has no set ops; its only
geometric union lives inside the split kernel,
/root/reference/src/function/split.rs:115-117). PostGIS/GEOS semantics
are the spec; the implementation is an independent boundary-
classification overlay built on the same planar primitives the split
kernel uses (geo/algos.py: _cut_segment, _on_segment, point_in_polygon,
leftmost-turn face tracing).

Algorithm (areal × areal): cut each operand's directed boundary edges
(interior-on-left: shells CCW, holes CW) at the other's boundary; every
resulting piece lies uniformly inside / on / outside the other operand,
so one midpoint test classifies it. An op keeps the pieces whose left
side belongs to the result —

  =============  ===========  ===========  ======================
  piece of ∂A    vs B: IN     vs B: OUT    vs B: ON (collinear)
  =============  ===========  ===========  ======================
  intersection   keep         drop         keep iff same direction
  union          drop         keep         keep iff same direction
  difference     drop         keep         keep iff OPPOSITE dir
  =============  ===========  ===========  ======================

(∂B pieces symmetric; for difference, ∂B pieces inside A are kept
REVERSED — they bound the removed region, so the result's interior is
on their right. Shared same-direction pieces are kept once.) The kept
directed edges are re-assembled into faces by the leftmost-turn trace;
positive cycles are shells, negative cycles are holes of the smallest
containing shell.

Scope / documented deviations from PostGIS:
  * dimensional collapses are dropped: two polygons touching only along
    an edge/point intersect as POLYGON EMPTY here (GEOS: LINESTRING /
    POINT);
  * mixed-dimension unions return GEOMETRYCOLLECTION of (a − b) parts
    plus b — same shape PostGIS produces, without line noding;
  * operands must be valid simple features; EPS-scale slivers follow
    the engine-wide EPS snapping.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

from .algos import (EPS, _canon_start, _cut_segment, _node_key, _on_segment,
                    _unpinch_closed,
                    point_in_polygon, point_in_ring, segment_crossing)
from .geom import Coord, Geometry, dist, ring_area2

RingList = List[List[Coord]]


# ------------------------------------------------------------ primitives

def _member_polys(g: Geometry) -> List[RingList]:
    """Member polygons as ring-lists normalized interior-on-left
    (shell CCW, holes CW)."""
    out: List[RingList] = []
    for m in g.geometries():
        if m.typ != "Polygon" or not m.parts:
            continue
        rings: RingList = []
        for idx, ring in enumerate(m.parts):
            r = list(ring)
            if len(r) < 4:
                continue
            ccw = ring_area2(r) > 0
            if (idx == 0) != ccw:
                r = r[::-1]
            rings.append(r)
        if rings:
            out.append(rings)
    return out


def _poly_segs(polys: Sequence[RingList]) -> List[Tuple[Coord, Coord]]:
    """Directed boundary edges, interior on the left."""
    segs: List[Tuple[Coord, Coord]] = []
    for rings in polys:
        for r in rings:
            for i in range(len(r) - 1):
                if dist(r[i], r[i + 1]) > EPS:
                    segs.append((r[i], r[i + 1]))
    return segs


def _pt_in(p: Coord, polys: Sequence[RingList]) -> int:
    """1 strictly inside any member, 0 on some boundary, -1 outside."""
    on = False
    for rings in polys:
        v = point_in_polygon(p, rings)
        if v == 1:
            return 1
        if v == 0:
            on = True
    return 0 if on else -1


def _mid(p: Coord, q: Coord) -> Coord:
    return ((p[0] + q[0]) / 2.0, (p[1] + q[1]) / 2.0)


def _same_dir_on(p: Coord, q: Coord,
                 other_segs: Sequence[Tuple[Coord, Coord]]) -> Optional[bool]:
    """For a piece whose midpoint lies ON the other boundary: does the
    other operand's covering directed edge run the same way (interiors
    on the same side)?"""
    m = _mid(p, q)
    for (c, d) in other_segs:
        if _on_segment(m, c, d):
            return ((q[0] - p[0]) * (d[0] - c[0])
                    + (q[1] - p[1]) * (d[1] - c[1])) > 0
    return None


def _pieces(polys: Sequence[RingList],
            other_segs: Sequence[Tuple[Coord, Coord]]
            ) -> List[Tuple[Coord, Coord]]:
    """Operand boundary cut at the other's boundary: each piece lies
    uniformly inside/on/outside the other operand."""
    out: List[Tuple[Coord, Coord]] = []
    for (a, b) in _poly_segs(polys):
        out.extend(_cut_segment(a, b, other_segs))
    return out


# ------------------------------------------------------------ face trace

def _trace_faces(edges: List[Tuple[Coord, Coord]]) -> List[RingList]:
    """Assemble directed (interior-on-left) edges into faces: snap nodes,
    prune dead ends, walk leftmost turns; positive cycles are shells,
    negative cycles holes of the smallest containing shell. Same trace
    discipline as algos._split_polygon_faces step 3, but every edge is
    single-direction (overlay edges are already oriented)."""
    if not edges:
        return []
    rep: dict = {}
    for p, q in edges:
        rep.setdefault(_node_key(p), p)
        rep.setdefault(_node_key(q), q)
    snapped = []
    seen = set()
    for p, q in edges:
        kp, kq = _node_key(p), _node_key(q)
        if kp == kq or (kp, kq) in seen:
            continue
        seen.add((kp, kq))
        snapped.append((rep[kp], rep[kq]))
    edges = snapped
    # defensive dead-end pruning: a well-formed overlay has balanced
    # nodes, but EPS-degenerate input can strand an edge
    while True:
        ins: dict = {}
        outs: dict = {}
        for p, q in edges:
            outs[_node_key(p)] = outs.get(_node_key(p), 0) + 1
            ins[_node_key(q)] = ins.get(_node_key(q), 0) + 1
        keep = [(p, q) for p, q in edges
                if ins.get(_node_key(p), 0) > 0
                and outs.get(_node_key(q), 0) > 0]
        if len(keep) == len(edges):
            break
        edges = keep
    outgoing: dict = {}
    for e in edges:
        outgoing.setdefault(_node_key(e[0]), []).append(e)
    used = set()
    rings_out: List[List[Coord]] = []
    for start in edges:
        if id(start) in used:
            continue
        ring = [start[0]]
        e = start
        ok = False
        for _ in range(len(edges) + 1):
            used.add(id(e))
            ring.append(e[1])
            if _node_key(e[1]) == _node_key(start[0]):
                ok = True
                break
            cands = [c for c in outgoing.get(_node_key(e[1]), [])
                     if id(c) not in used]
            if not cands:
                break
            din = math.atan2(e[1][1] - e[0][1], e[1][0] - e[0][0])

            def turn(c):
                ang = math.atan2(c[1][1] - c[0][1], c[1][0] - c[0][0]) - din
                while ang <= -math.pi:
                    ang += 2.0 * math.pi
                while ang > math.pi:
                    ang -= 2.0 * math.pi
                return ang
            e = max(cands, key=turn)  # leftmost turn keeps the face left
        if ok and len(ring) >= 4:
            ring[-1] = ring[0]
            rings_out.append(ring)
    # point-pinched result regions (e.g. subtracting a triangle whose
    # apex sits ON the other boundary) must come out as lobes touching
    # at the point, not one self-touching ring (r9 fuzz finding)
    rings_out = _unpinch_closed(rings_out)
    shells = sorted(
        ((abs(ring_area2(r)), _canon_start(r)) for r in rings_out
         if ring_area2(r) > EPS), key=lambda s: s[0])
    holes = [_canon_start(r) for r in rings_out if ring_area2(r) < -EPS]
    faces: List[RingList] = [[r] for _, r in shells]
    for h in holes:
        assigned = False
        for k, (_, shell) in enumerate(shells):  # smallest container first
            for i in range(len(h) - 1):
                hm = _mid(h[i], h[i + 1])
                if point_in_ring(hm, shell) == 1:
                    faces[k].append(h)
                    assigned = True
                    break
            if assigned:
                break
    return faces


def _faces_to_geom(faces: List[RingList], srid) -> Geometry:
    if not faces:
        return Geometry("Polygon", [], srid)
    if len(faces) == 1:
        return Geometry("Polygon", faces[0], srid)
    return Geometry("MultiPolygon", faces, srid)


# ------------------------------------------------------------ areal ops

def _overlay(a: Geometry, b: Geometry, op: str) -> Geometry:
    pa_polys, pb_polys = _member_polys(a), _member_polys(b)
    sa, sb = _poly_segs(pa_polys), _poly_segs(pb_polys)
    edges: List[Tuple[Coord, Coord]] = []
    for (p, q) in _pieces(pa_polys, sb):
        cls = _pt_in(_mid(p, q), pb_polys)
        if op == "intersection":
            if cls == 1 or (cls == 0 and _same_dir_on(p, q, sb)):
                edges.append((p, q))
        elif op == "union":
            if cls == -1 or (cls == 0 and _same_dir_on(p, q, sb)):
                edges.append((p, q))
        elif op == "symdifference":
            # left in exactly one: OUT pieces bound A-only on the left;
            # IN pieces reversed bound B-only on the left; ON pieces
            # drop either way (same-dir: in both / opposite: in neither
            # is a boundary of the symmetric difference)
            if cls == -1:
                edges.append((p, q))
            elif cls == 1:
                edges.append((q, p))
        else:  # difference a - b
            if cls == -1 or (cls == 0 and _same_dir_on(p, q, sb) is False):
                edges.append((p, q))
    for (p, q) in _pieces(pb_polys, sa):
        cls = _pt_in(_mid(p, q), pa_polys)
        if op == "intersection":
            if cls == 1 or (cls == 0 and _same_dir_on(p, q, sa)):
                edges.append((p, q))
        elif op == "union":
            if cls == -1 or (cls == 0 and _same_dir_on(p, q, sa)):
                edges.append((p, q))
        elif op == "symdifference":
            if cls == -1:
                edges.append((p, q))
            elif cls == 1:
                edges.append((q, p))
        else:  # difference: ∂B inside A bounds the removed region
            if cls == 1:
                edges.append((q, p))
    return _faces_to_geom(_trace_faces(edges), a.srid)


# ------------------------------------------------------------ line clips

def _line_members(g: Geometry) -> List[List[Coord]]:
    return [list(m.parts) for m in g.geometries()
            if m.typ == "LineString" and len(m.parts) > 1]


def _clip_lines(lines: List[List[Coord]],
                cut_segs: Sequence[Tuple[Coord, Coord]],
                classify, keep_classes) -> List[List[Coord]]:
    """Cut every line at cut_segs and stitch consecutive kept pieces
    back into maximal linestrings."""
    out: List[List[Coord]] = []
    for line in lines:
        chain: List[Coord] = []
        for i in range(len(line) - 1):
            a, b = line[i], line[i + 1]
            if dist(a, b) <= EPS:
                continue
            for (p, q) in _cut_segment(a, b, cut_segs):
                if classify(_mid(p, q)) in keep_classes:
                    if chain and dist(chain[-1], p) <= EPS:
                        chain.append(q)
                    else:
                        if len(chain) >= 2:
                            out.append(chain)
                        chain = [p, q]
                else:
                    if len(chain) >= 2:
                        out.append(chain)
                    chain = []
        if len(chain) >= 2:
            out.append(chain)
    return out


def _lines_to_geom(lines: List[List[Coord]], srid) -> Geometry:
    if not lines:
        return Geometry("LineString", [], srid)
    if len(lines) == 1:
        return Geometry("LineString", lines[0], srid)
    return Geometry("MultiLineString", lines, srid)


def _points_to_geom(pts: List[Coord], srid) -> Geometry:
    if not pts:
        return Geometry("Point", None, srid)
    if len(pts) == 1:
        return Geometry("Point", pts[0], srid)
    return Geometry("MultiPoint", sorted(pts), srid)


def _dim(g: Geometry) -> int:
    dims = []
    for m in g.geometries():
        if m.typ == "Polygon" and m.parts:
            dims.append(2)
        elif m.typ == "LineString" and m.parts:
            dims.append(1)
        elif m.typ == "Point" and m.parts is not None:
            dims.append(0)
    return max(dims) if dims else -1


def _point_members(g: Geometry) -> List[Coord]:
    return [m.parts for m in g.geometries()
            if m.typ == "Point" and m.parts is not None]


def _covered_pt(p: Coord, g: Geometry) -> bool:
    polys = _member_polys(g)
    if _pt_in(p, polys) >= 0:
        return True
    for line in _line_members(g):
        for i in range(len(line) - 1):
            if _on_segment(p, line[i], line[i + 1]):
                return True
    return any(dist(p, q) <= EPS for q in _point_members(g))


# ------------------------------------------------------------ public API

def intersection(a: Geometry, b: Geometry) -> Optional[Geometry]:
    """ST_Intersection. NULL-in → NULL-out handled by the kernel layer;
    empty-in → empty of the lower operand dimension (GEOS)."""
    da, db = _dim(a), _dim(b)
    if da > db:
        return intersection(b, a).with_srid(a.srid)
    # now da <= db
    if da == -1:   # empty operand: empty of the other operand's dim
        if db == 2:
            return Geometry("Polygon", [], a.srid)
        if db == 1:
            return Geometry("LineString", [], a.srid)
        return Geometry("Point", None, a.srid)
    if da == 0:
        pts = [p for p in _point_members(a) if _covered_pt(p, b)]
        return _points_to_geom(pts, a.srid)
    if da == 1 and db == 2:
        polys = _member_polys(b)
        kept = _clip_lines(_line_members(a), _poly_segs(polys),
                           lambda m: _pt_in(m, polys), (0, 1))
        return _lines_to_geom(kept, a.srid)
    if da == 1:    # line × line: collinear overlap pieces + crossings
        sb = [(ln[i], ln[i + 1]) for ln in _line_members(b)
              for i in range(len(ln) - 1)]

        def on_b(m):
            return 0 if any(_on_segment(m, c, d) for c, d in sb) else -1
        pieces = _clip_lines(_line_members(a), sb, on_b, (0,))
        pts: List[Coord] = []
        for ln in _line_members(a):
            for i in range(len(ln) - 1):
                for (c, d) in sb:
                    x = segment_crossing(ln[i], ln[i + 1], c, d)
                    if x is not None:
                        pts.append(x)
        covered = set()
        for piece in pieces:
            for x in pts:
                for i in range(len(piece) - 1):
                    if _on_segment(x, piece[i], piece[i + 1]):
                        covered.add(_node_key(x))
        uniq: List[Coord] = []
        for x in pts:
            k = _node_key(x)
            if k not in covered:
                covered.add(k)
                uniq.append(x)
        if pieces and uniq:
            return Geometry("GeometryCollection",
                            [_points_to_geom(uniq, a.srid),
                             _lines_to_geom(pieces, a.srid)], a.srid)
        if pieces:
            return _lines_to_geom(pieces, a.srid)
        return _points_to_geom(uniq, a.srid)
    return _overlay(a, b, "intersection")


def difference(a: Geometry, b: Geometry) -> Geometry:
    """ST_Difference a − b. Lower-dimensional b leaves a unchanged
    (removing a measure-zero set — PostGIS behavior)."""
    da, db = _dim(a), _dim(b)
    if da == -1 or db == -1 or db < da:
        return a
    if da == 0:
        pts = [p for p in _point_members(a) if not _covered_pt(p, b)]
        return _points_to_geom(pts, a.srid)
    if da == 1 and db == 2:
        polys = _member_polys(b)
        kept = _clip_lines(_line_members(a), _poly_segs(polys),
                           lambda m: _pt_in(m, polys), (-1,))
        return _lines_to_geom(kept, a.srid)
    if da == 1:
        sb = [(ln[i], ln[i + 1]) for ln in _line_members(b)
              for i in range(len(ln) - 1)]

        def off_b(m):
            return -1 if not any(_on_segment(m, c, d) for c, d in sb) else 0
        kept = _clip_lines(_line_members(a), sb, off_b, (-1,))
        return _lines_to_geom(kept, a.srid)
    return _overlay(a, b, "difference")


def union(a: Geometry, b: Geometry) -> Geometry:
    """ST_Union. Areal × areal is the dissolving overlay; mixed
    dimensions return GEOMETRYCOLLECTION((a − b), b) — the PostGIS
    result shape (the lower-dimensional part clipped to what is not
    already covered)."""
    da, db = _dim(a), _dim(b)
    if da == -1:
        return b
    if db == -1:
        return a
    if da == db == 2:
        return _overlay(a, b, "union")
    if da == db == 0:
        seen = set()
        pts: List[Coord] = []
        for p in _point_members(a) + _point_members(b):
            k = _node_key(p)
            if k not in seen:
                seen.add(k)
                pts.append(p)
        return _points_to_geom(pts, a.srid)
    if da != db:
        lo, hi = (a, b) if da < db else (b, a)
        rest = difference(lo, hi)
        if _dim(rest) == -1:
            return hi.with_srid(a.srid)
        return Geometry("GeometryCollection",
                        [rest, hi.with_srid(a.srid)], a.srid)
    # line × line: keep both, a's overlap-with-b pieces removed (noded
    # enough for measure correctness; no cross-segment renoding)
    rest = difference(a, b)
    mem = ([] if _dim(rest) == -1 else _line_members(rest)) + _line_members(b)
    return _lines_to_geom(mem, a.srid)


def symdifference(a: Geometry, b: Geometry) -> Geometry:
    """ST_SymDifference — points in exactly one operand. Areal × areal
    is a direct overlay rule (NOT union∘difference — one pass); equal
    dimensions otherwise compose the two differences; mixed dimensions
    return the collection PostGIS does ((a−b) with b, the lower part
    clipped)."""
    da, db = _dim(a), _dim(b)
    if da == -1:
        return b
    if db == -1:
        return a
    if da == db == 2:
        return _overlay(a, b, "symdifference")
    if da == db == 0:
        ap, bp = _point_members(a), _point_members(b)

        def key(p):
            return _node_key(p)
        bk = {key(p) for p in bp}
        ak = {key(p) for p in ap}
        pts = [p for p in ap if key(p) not in bk] + \
              [p for p in bp if key(p) not in ak]
        return _points_to_geom(pts, a.srid)
    if da == db == 1:
        ra, rb = difference(a, b), difference(b, a)
        mem = ([] if _dim(ra) == -1 else _line_members(ra)) + \
              ([] if _dim(rb) == -1 else _line_members(rb))
        return _lines_to_geom(mem, a.srid)
    return union(a, b)   # mixed dims: measure-zero overlap — PostGIS
                         # returns the same collection shape as union


def union_all(geoms: Sequence[Geometry]) -> Optional[Geometry]:
    """ST_Union aggregate: left fold of pairwise union over non-null
    inputs (areal inputs dissolve into a (Multi)Polygon). Kernel-side
    this runs per GROUP, so the quadratic-ish fold is bounded by the
    group size, never the corpus."""
    acc: Optional[Geometry] = None
    for g in geoms:
        if g is None:
            continue
        acc = g if acc is None else union(acc, g)
    return acc


def shared_paths(a: Geometry, b: Geometry) -> Optional[Geometry]:
    """ST_SharedPaths (PostGIS): GEOMETRYCOLLECTION of two
    MULTILINESTRINGs — the collinear-overlap pieces of ``a`` over ``b``
    running in the SAME direction, then those running OPPOSITE.
    None (SQL NULL) for non-lineal operands, as PostGIS errors."""
    la, lb = _line_members(a), _line_members(b)
    if not la or not lb:
        return None
    segs_b = [(ln[i], ln[i + 1]) for ln in lb for i in range(len(ln) - 1)
              if dist(ln[i], ln[i + 1]) > EPS]

    def on_b(m: Coord) -> int:
        return 0 if any(_on_segment(m, c, d) for c, d in segs_b) else -1

    pieces = _clip_lines(la, segs_b, on_b, (0,))
    same: List[List[Coord]] = []
    opp: List[List[Coord]] = []
    for piece in pieces:
        cur: List[Coord] = []
        cur_dir: Optional[bool] = None
        for i in range(len(piece) - 1):
            p, q = piece[i], piece[i + 1]
            d = _same_dir_on(p, q, segs_b)
            if d is None:
                d = cur_dir if cur_dir is not None else True
            if cur and d == cur_dir:
                cur.append(q)
            else:
                if len(cur) >= 2:
                    (same if cur_dir else opp).append(cur)
                cur, cur_dir = [p, q], d
        if len(cur) >= 2:
            (same if cur_dir else opp).append(cur)
    return Geometry("GeometryCollection",
                    [Geometry("MultiLineString", same, a.srid),
                     Geometry("MultiLineString", opp, a.srid)], a.srid)


def clip_by_box(g: Geometry, xmin: float, ymin: float,
                xmax: float, ymax: float) -> Optional[Geometry]:
    """ST_ClipByBox2D: intersection with an axis-aligned rectangle —
    the fast tiling clip, expressed through the overlay so semantics
    match ST_Intersection exactly."""
    if xmin > xmax or ymin > ymax:
        return Geometry("Polygon", [], g.srid)
    box = Geometry("Polygon",
                   [[(xmin, ymin), (xmax, ymin), (xmax, ymax),
                     (xmin, ymax), (xmin, ymin)]], g.srid)
    return intersection(g, box)
