"""Geometry editing utilities (PostGIS parity; beyond-reference):
ST_Reverse, ST_FlipCoordinates, ST_Rotate, ST_Scale, ST_Segmentize,
ST_LineSubstring, ST_ReducePrecision.

All are pure coordinate transforms over the Geometry model — no
topology machinery needed — except line_substring, which walks arc
length like ST_LineInterpolatePoint does.
"""

from __future__ import annotations

import math
from typing import List, Optional

from .geom import Coord, Geometry, dist


def reverse(g: Geometry) -> Geometry:
    """ST_Reverse: vertex order flipped in every line/ring."""
    t, p, s = g.typ, g.parts, g.srid
    if t == "LineString":
        return Geometry(t, list(reversed(p)), s)
    if t in ("Polygon", "MultiLineString"):
        return Geometry(t, [list(reversed(part)) for part in p], s)
    if t == "MultiPolygon":
        return Geometry(t, [[list(reversed(r)) for r in poly]
                            for poly in p], s)
    if t == "GeometryCollection":
        return Geometry(t, [reverse(m) for m in p], s)
    return g    # points have no order


def flip_coordinates(g: Geometry) -> Geometry:
    """ST_FlipCoordinates: (x, y) -> (y, x)."""
    return g.map_coords(lambda c: (c[1], c[0]))


def rotate(g: Geometry, angle: float,
           x0: float = 0.0, y0: float = 0.0) -> Geometry:
    """ST_Rotate: counter-clockwise by ``angle`` radians about
    (x0, y0) — PostGIS defaults to the origin."""
    c, s = math.cos(angle), math.sin(angle)

    def f(p):
        dx, dy = p[0] - x0, p[1] - y0
        return (x0 + dx * c - dy * s, y0 + dx * s + dy * c)
    return g.map_coords(f)


def scale(g: Geometry, sx: float, sy: float) -> Geometry:
    """ST_Scale about the origin (PostGIS semantics)."""
    return g.map_coords(lambda p: (p[0] * sx, p[1] * sy))


def segmentize(g: Geometry, max_len: float) -> Geometry:
    """ST_Segmentize: no output segment longer than ``max_len`` —
    each segment is split into the MINIMAL equal number of pieces
    (PostGIS/GEOS rule), originals vertices preserved."""
    if not (max_len > 0.0):
        raise ValueError("ST_Segmentize: max_len must be positive")

    def seg_line(cs: List[Coord]) -> List[Coord]:
        if len(cs) < 2:
            return list(cs)
        out = [cs[0]]
        for a, b in zip(cs, cs[1:]):
            d = dist(a, b)
            n = max(1, int(math.ceil(d / max_len - 1e-12)))
            for i in range(1, n):
                t = i / n
                out.append((a[0] + (b[0] - a[0]) * t,
                            a[1] + (b[1] - a[1]) * t))
            out.append(b)
        return out

    t, p, s = g.typ, g.parts, g.srid
    if t == "LineString":
        return Geometry(t, seg_line(p), s)
    if t in ("Polygon", "MultiLineString"):
        return Geometry(t, [seg_line(part) for part in p], s)
    if t == "MultiPolygon":
        return Geometry(t, [[seg_line(r) for r in poly] for poly in p], s)
    if t == "GeometryCollection":
        return Geometry(t, [segmentize(m, max_len) for m in p], s)
    return g


def line_substring(g: Geometry, start: float, end: float) -> Optional[Geometry]:
    """ST_LineSubstring: the part of a LINESTRING between fractional
    arc positions ``start`` <= ``end`` in [0, 1]. start == end yields
    the interpolated POINT (PostGIS). Non-LineString input -> None
    (PostGIS raises; NULL is this engine's SQL-friendly convention)."""
    if g.typ != "LineString" or len(g.parts) < 2:
        return None
    if not (0.0 <= start <= 1.0 and 0.0 <= end <= 1.0 and start <= end):
        raise ValueError("ST_LineSubstring: need 0 <= start <= end <= 1")
    cs = g.parts
    total = sum(dist(a, b) for a, b in zip(cs, cs[1:]))

    def at(frac: float) -> Coord:
        if total <= 0.0:
            return cs[0]
        target = frac * total
        acc = 0.0
        for a, b in zip(cs, cs[1:]):
            d = dist(a, b)
            if acc + d >= target or (a, b) == (cs[-2], cs[-1]):
                t = 0.0 if d <= 0.0 else min(1.0, (target - acc) / d)
                return (a[0] + (b[0] - a[0]) * t, a[1] + (b[1] - a[1]) * t)
            acc += d
        return cs[-1]

    if start == end:
        return Geometry("Point", at(start), g.srid)
    s_len, e_len = start * total, end * total
    out = [at(start)]
    acc = 0.0
    for a, b in zip(cs, cs[1:]):
        acc += dist(a, b)          # arc length at vertex b
        if s_len < acc < e_len and dist(out[-1], b) > 1e-12:
            out.append(b)          # original vertices inside the window
    endp = at(end)
    if dist(out[-1], endp) > 1e-12:
        out.append(endp)
    if len(out) < 2:               # zero-length window on a vertex
        out = [out[0], endp]
    return Geometry("LineString", out, g.srid)


def reduce_precision(g: Geometry, gridsize: float) -> Geometry:
    """ST_ReducePrecision-style grid snap: coordinates rounded to the
    nearest multiple of ``gridsize`` (half away from zero, the same
    binary-value convention as round6_binary). NOTE: pure coordinate
    snap — unlike GEOS this does not repair topology collapses, which
    is documented behavior here."""
    if not (gridsize > 0.0):
        raise ValueError("ST_ReducePrecision: gridsize must be positive")

    def snap(v: float) -> float:
        return math.copysign(
            math.floor(abs(v) / gridsize + 0.5), v) * gridsize + 0.0

    return g.map_coords(lambda p: (snap(p[0]), snap(p[1])))


def line_merge(g: Geometry) -> Geometry:
    """ST_LineMerge: sew the constituent linework of a
    (Multi)LineString together at nodes of degree 2 (GEOS
    LineMergeGraph semantics — a line may be REVERSED to join its
    neighbor; junctions of degree != 2 stay unmerged). Non-lineal
    input returns GEOMETRYCOLLECTION EMPTY, as PostGIS does.

    Deterministic deviation from GEOS: chains start from
    non-degree-2 endpoints in input order (then leftover cycles in
    input order), so the output part order and orientation are a
    pure function of the input — a promise a distributed engine can
    keep and an oracle can pin.
    """
    if g.typ == "LineString":
        return g
    if g.typ != "MultiLineString":
        return Geometry("GeometryCollection", [], g.srid)
    lines: List[List[Coord]] = [list(p) for p in g.parts if len(p) >= 2]
    if not lines:
        return Geometry("GeometryCollection", [], g.srid)

    incid = {}          # node coord -> [(line index, end 0|1), ...]
    for i, cs in enumerate(lines):
        for end, c in ((0, cs[0]), (1, cs[-1])):
            incid.setdefault(c, []).append((i, end))
    deg = {c: len(v) for c, v in incid.items()}
    used = [False] * len(lines)

    def walk(i: int, end: int) -> List[Coord]:
        """Traverse line i entering at endpoint ``end``, extending
        through degree-2 nodes until a junction/termination/cycle."""
        used[i] = True
        coords = list(lines[i]) if end == 0 else list(reversed(lines[i]))
        while deg[coords[-1]] == 2:
            nxt = [(j, e) for (j, e) in incid[coords[-1]] if not used[j]]
            if not nxt:
                break               # closed a cycle
            j, e = nxt[0]
            used[j] = True
            more = list(lines[j]) if e == 0 else list(reversed(lines[j]))
            coords.extend(more[1:])
        return coords

    merged: List[List[Coord]] = []
    for i in range(len(lines)):
        for end in (0, 1):
            if not used[i] and deg[lines[i][0 if end == 0 else -1]] != 2:
                merged.append(walk(i, end))
    for i in range(len(lines)):    # leftovers are pure cycles
        if not used[i]:
            merged.append(walk(i, 0))
    if len(merged) == 1:
        return Geometry("LineString", merged[0], g.srid)
    return Geometry("MultiLineString", merged, g.srid)


def affine(g: Geometry, a: float, b: float, d: float, e: float,
           xoff: float, yoff: float) -> Geometry:
    """ST_Affine (2D form): x' = a·x + b·y + xoff, y' = d·x + e·y +
    yoff — the general matrix rotate/scale/shear/translate compose."""
    return g.map_coords(
        lambda p: (a * p[0] + b * p[1] + xoff, d * p[0] + e * p[1] + yoff))


def expand(g: Geometry, dx: float, dy: Optional[float] = None) -> Geometry:
    """ST_Expand: the bounding box grown by dx/dy (dy defaults to dx),
    returned as a POLYGON (PostGIS returns the expanded BOX2D cast to
    geometry). Empty input -> POLYGON EMPTY. A negative delta that
    inverts the box collapses to POLYGON EMPTY (PostGIS yields an
    inverted box; an empty result is this engine's saner convention,
    and is documented)."""
    if dy is None:
        dy = dx
    bb = g.bounds()
    if bb is None:
        return Geometry("Polygon", [], g.srid)
    x0, y0, x1, y1 = bb[0] - dx, bb[1] - dy, bb[2] + dx, bb[3] + dy
    if x0 > x1 or y0 > y1:
        return Geometry("Polygon", [], g.srid)
    ring = [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]
    return Geometry("Polygon", [ring], g.srid)


def _azim(p: Coord, q: Coord) -> Optional[float]:
    """North-based clockwise azimuth of p->q in [0, 2π)."""
    dx, dy = q[0] - p[0], q[1] - p[1]
    if abs(dx) <= 1e-15 and abs(dy) <= 1e-15:
        return None
    return math.atan2(dx, dy) % (2.0 * math.pi)


def angle(p1: Coord, p2: Coord, p3: Coord,
          p4: Optional[Coord] = None) -> Optional[float]:
    """ST_Angle: with four points, the clockwise angle from the
    direction p1->p2 to the direction p3->p4; with three, the angle at
    vertex p2 of the path p1-p2-p3 (PostGIS defines it as
    ST_Angle(p2,p1, p2,p3)). Radians in [0, 2π); None when either
    direction is degenerate (coincident points)."""
    if p4 is None:
        a1, a2 = _azim(p2, p1), _azim(p2, p3)
    else:
        a1, a2 = _azim(p1, p2), _azim(p3, p4)
    if a1 is None or a2 is None:
        return None
    return (a2 - a1) % (2.0 * math.pi)


def remove_repeated_points(g: Geometry, tolerance: float = 0.0) -> Geometry:
    """ST_RemoveRepeatedPoints: drop consecutive vertices closer than
    ``tolerance`` (exact duplicates when 0). Ring closure is preserved;
    a line keeps >= 2 points and a ring >= 4 (the last repeats the
    first), matching PostGIS's refusal to collapse below validity."""
    tol = max(tolerance, 0.0)

    def dedup(cs: List[Coord], closed: bool) -> List[Coord]:
        keep = [cs[0]]
        for c in cs[1:]:
            if dist(keep[-1], c) > tol:
                keep.append(c)
        if closed:
            if dist(keep[0], keep[-1]) > 0.0:
                keep.append(keep[0])
            if len(keep) < 4:    # would collapse the ring: keep original
                return list(cs)
        elif len(keep) < 2:
            keep.append(cs[-1])
        return keep

    t, p, s = g.typ, g.parts, g.srid
    if t == "LineString" and len(p) >= 2:
        return Geometry(t, dedup(list(p), False), s)
    if t == "MultiLineString":
        return Geometry(t, [dedup(list(m), False) for m in p if len(m) >= 2], s)
    if t == "Polygon" and p:
        return Geometry(t, [dedup(list(r), True) for r in p], s)
    if t == "MultiPolygon":
        return Geometry(t, [[dedup(list(r), True) for r in poly]
                            for poly in p], s)
    if t == "MultiPoint":
        seen, out = set(), []
        for c in p:
            k = c if tol == 0.0 else None
            if tol == 0.0:
                if k in seen:
                    continue
                seen.add(k)
                out.append(c)
            else:
                if all(dist(c, q) > tol for q in out):
                    out.append(c)
        return Geometry(t, out, s)
    if t == "GeometryCollection":
        return Geometry(t, [remove_repeated_points(m, tol) for m in p], s)
    return g


def snap_to_grid(g: Geometry, size: float) -> Geometry:
    """ST_SnapToGrid (origin 0,0): coordinates snapped to multiples of
    ``size`` (half away from zero), consecutive duplicates dissolved;
    parts that collapse below validity (ring < 4 pts after closure,
    line < 2 pts) are DROPPED — PostGIS behavior."""
    if not (size > 0.0):
        raise ValueError("ST_SnapToGrid: size must be positive")

    def snap1(v: float) -> float:
        k = math.copysign(math.floor(abs(v) / size + 0.5), v) * size
        # k*size carries one-ulp product noise (9300000·1e-6 =
        # 9.299999999999999); 12-significant-digit reparse restores the
        # intended grid value without disturbing exact results
        return float(f"{k:.12g}") + 0.0

    def snap(c: Coord) -> Coord:
        return (snap1(c[0]), snap1(c[1]))

    def snap_seq(cs: List[Coord], closed: bool) -> Optional[List[Coord]]:
        out: List[Coord] = []
        for c in cs:
            sc = snap(c)
            if not out or dist(out[-1], sc) > 0.0:
                out.append(sc)
        if closed:
            if len(out) >= 2 and dist(out[0], out[-1]) <= 0.0:
                out.pop()
            if len(out) < 3:
                return None
            out.append(out[0])
            return out
        return out if len(out) >= 2 else None

    t, p, s = g.typ, g.parts, g.srid
    if t == "Point":
        return Geometry(t, snap(p) if p is not None else None, s)
    if t == "MultiPoint":
        seen, out = set(), []
        for c in p:
            sc = snap(c)
            if sc not in seen:
                seen.add(sc)
                out.append(sc)
        return Geometry(t, out, s)
    if t == "LineString":
        cs = snap_seq(list(p), False) if len(p) >= 2 else None
        return Geometry(t, cs if cs else [], s)
    if t == "MultiLineString":
        ms = [snap_seq(list(m), False) for m in p if len(m) >= 2]
        return Geometry(t, [m for m in ms if m], s)
    if t == "Polygon":
        rs = [snap_seq(list(r), True) for r in p]
        if not rs or rs[0] is None:      # collapsed shell kills the polygon
            return Geometry(t, [], s)
        return Geometry(t, [r for r in rs if r], s)
    if t == "MultiPolygon":
        polys = []
        for poly in p:
            rs = [snap_seq(list(r), True) for r in poly]
            if rs and rs[0]:
                polys.append([r for r in rs if r])
        return Geometry(t, polys, s)
    if t == "GeometryCollection":
        return Geometry(t, [snap_to_grid(m, size) for m in p], s)
    return g


def add_point(g: Geometry, pt: Coord, pos: int = -1) -> Optional[Geometry]:
    """ST_AddPoint: insert ``pt`` into a LINESTRING before 0-based
    index ``pos`` (-1 = append). None for non-lines / out-of-range
    (PostGIS errors; NULL is the engine's SQL convention)."""
    if g.typ != "LineString":
        return None
    cs = list(g.parts)
    if pos == -1 or pos == len(cs):
        cs.append(pt)
    elif 0 <= pos < len(cs):
        cs.insert(pos, pt)
    else:
        return None
    return Geometry("LineString", cs, g.srid)


def set_point(g: Geometry, pos: int, pt: Coord) -> Optional[Geometry]:
    """ST_SetPoint: replace vertex ``pos`` (negative counts from the
    end, PostGIS-style) of a LINESTRING."""
    if g.typ != "LineString":
        return None
    cs = list(g.parts)
    if pos < 0:
        pos += len(cs)
    if not (0 <= pos < len(cs)):
        return None
    cs[pos] = pt
    return Geometry("LineString", cs, g.srid)


def remove_point(g: Geometry, pos: int) -> Optional[Geometry]:
    """ST_RemovePoint: delete vertex ``pos`` of a LINESTRING; None if
    that would leave fewer than 2 points or the index is bad."""
    if g.typ != "LineString":
        return None
    cs = list(g.parts)
    if not (0 <= pos < len(cs)) or len(cs) <= 2:
        return None
    del cs[pos]
    return Geometry("LineString", cs, g.srid)


def multi(g: Geometry) -> Geometry:
    """ST_Multi: promote a single geometry to its multi-type (already-
    multi and collections pass through)."""
    t, p, s = g.typ, g.parts, g.srid
    if t == "Point" and p is not None:
        return Geometry("MultiPoint", [p], s)
    if t == "LineString" and p:
        return Geometry("MultiLineString", [list(p)], s)
    if t == "Polygon" and p:
        return Geometry("MultiPolygon", [[list(r) for r in p]], s)
    return g


def collection_extract(g: Geometry, dimtype: int) -> Geometry:
    """ST_CollectionExtract: the members of the requested type
    (1=points, 2=lines, 3=polygons, PostGIS codes) re-assembled as a
    multi-geometry; empty multi of that type when none match."""
    want = {1: "Point", 2: "LineString", 3: "Polygon"}.get(dimtype)
    if want is None:
        raise ValueError("ST_CollectionExtract: type must be 1, 2 or 3")
    members = [m for m in g.geometries() if m.typ == want]
    if want == "Point":
        return Geometry("MultiPoint",
                        [m.parts for m in members if m.parts is not None],
                        g.srid)
    if want == "LineString":
        return Geometry("MultiLineString",
                        [list(m.parts) for m in members if len(m.parts) >= 2],
                        g.srid)
    return Geometry("MultiPolygon",
                    [[list(r) for r in m.parts] for m in members if m.parts],
                    g.srid)


def collection_homogenize(g: Geometry) -> Geometry:
    """ST_CollectionHomogenize: the simplest representation of the
    contents — a lone member unwraps, same-type members collapse to one
    multi, mixed contents stay a collection (members themselves
    unwrapped of nesting)."""
    members = [m for m in g.geometries()
               if not (m.parts is None and m.typ == "Point") and m.parts
               or (m.typ == "Point" and m.parts is not None)]
    if not members:
        return Geometry("GeometryCollection", [], g.srid)
    if len(members) == 1:
        m = members[0]
        return Geometry(m.typ, m.parts, g.srid)
    typs = {m.typ for m in members}
    if typs == {"Point"}:
        return Geometry("MultiPoint", [m.parts for m in members], g.srid)
    if typs == {"LineString"}:
        return Geometry("MultiLineString",
                        [list(m.parts) for m in members], g.srid)
    if typs == {"Polygon"}:
        return Geometry("MultiPolygon",
                        [[list(r) for r in m.parts] for m in members], g.srid)
    return Geometry("GeometryCollection", members, g.srid)


def snap(g: Geometry, ref: Geometry, tol: float) -> Geometry:
    """ST_Snap (GEOS SnapTo semantics): vertices of ``g`` within
    ``tol`` of a vertex of ``ref`` move onto it, and ``ref`` vertices
    lying within ``tol`` of a segment of ``g`` are inserted into that
    segment (in projection order) — the standard pre-overlay
    coordinate-reconciliation step. tol <= 0 returns ``g``
    unchanged."""
    if tol <= 0.0:
        return g
    ref_vs: List[Coord] = []
    for m in ref.geometries():
        if m.typ == "Point" and m.parts is not None:
            ref_vs.append(m.parts)
        elif m.typ == "LineString":
            ref_vs.extend(m.parts)
        elif m.typ == "Polygon":
            for r in m.parts:
                ref_vs.extend(r)
    if not ref_vs:
        return g

    def snap_vertex(c: Coord) -> Coord:
        best, bd = c, tol
        for v in ref_vs:
            d = dist(c, v)
            if d <= bd:
                best, bd = v, d
        return best

    def seg_insertions(a: Coord, b: Coord) -> List[Coord]:
        L2 = (b[0] - a[0]) ** 2 + (b[1] - a[1]) ** 2
        if L2 <= 0.0:
            return []
        ins = []
        for v in ref_vs:
            if dist(v, a) <= 1e-12 or dist(v, b) <= 1e-12:
                continue
            t = ((v[0] - a[0]) * (b[0] - a[0])
                 + (v[1] - a[1]) * (b[1] - a[1])) / L2
            if t <= 0.0 or t >= 1.0:
                continue
            px = a[0] + t * (b[0] - a[0])
            py = a[1] + t * (b[1] - a[1])
            if dist(v, (px, py)) <= tol:
                ins.append((t, v))
        return [v for _, v in sorted(ins)]

    def snap_seq(cs: List[Coord], closed: bool) -> List[Coord]:
        moved = [snap_vertex(c) for c in cs]
        out: List[Coord] = []
        for i in range(len(moved) - 1):
            a, b = moved[i], moved[i + 1]
            if not out or dist(out[-1], a) > 0.0:
                out.append(a)
            for v in seg_insertions(a, b):
                if dist(out[-1], v) > 0.0:
                    out.append(v)
        if dist(out[-1], moved[-1]) > 0.0 or len(out) == 1:
            out.append(moved[-1])
        if closed and dist(out[0], out[-1]) > 0.0:
            out.append(out[0])
        return out

    t, p, s = g.typ, g.parts, g.srid
    if t == "Point":
        return Geometry(t, None if p is None else snap_vertex(p), s)
    if t == "MultiPoint":
        return Geometry(t, [snap_vertex(c) for c in p], s)
    if t == "LineString":
        return Geometry(t, snap_seq(list(p), False) if len(p) >= 2 else p, s)
    if t == "MultiLineString":
        return Geometry(t, [snap_seq(list(m), False) for m in p], s)
    if t == "Polygon":
        return Geometry(t, [snap_seq(list(r), True) for r in p], s)
    if t == "MultiPolygon":
        return Geometry(t, [[snap_seq(list(r), True) for r in poly]
                            for poly in p], s)
    if t == "GeometryCollection":
        return Geometry(t, [snap(m, ref, tol) for m in p], s)
    return g


def normalize(g: Geometry) -> Geometry:
    """ST_Normalize — a canonical form that is a pure function of the
    point set: shells CCW / holes CW starting at their lexicographically
    smallest vertex, open lines directed from their smaller endpoint,
    multi-members sorted lexicographically. (GEOS's normalized form
    differs in convention; ours is documented and idempotent, which is
    what equality-after-normalize workflows actually need.)"""
    from .algos import _canon_start, ring_area2
    t, p, s = g.typ, g.parts, g.srid

    def norm_ring(r: List[Coord], ccw: bool) -> List[Coord]:
        rr = list(r)
        if len(rr) >= 4:
            a2 = ring_area2(rr)
            if a2 == 0:
                # degenerate (zero-area, e.g. collinear) ring: the CCW
                # test would flip it on EVERY pass, breaking idempotence
                # — instead pick the direction whose canonical rotation
                # is lexicographically smaller, a pure function of the
                # point sequence
                fwd = _canon_start(rr)
                rev = _canon_start(rr[::-1])
                return (fwd if [tuple(c) for c in fwd]
                        <= [tuple(c) for c in rev] else rev)
            if (a2 > 0) != ccw:
                rr = rr[::-1]
            rr = _canon_start(rr)
        return rr

    def norm_line(cs: List[Coord]) -> List[Coord]:
        cs = list(cs)
        if len(cs) >= 2 and dist(cs[0], cs[-1]) <= 0.0:
            ring = norm_ring(cs, True)
            return ring
        if cs and tuple(cs[-1]) < tuple(cs[0]):
            cs = cs[::-1]
        return cs

    def norm_poly(rings) -> list:
        out = [norm_ring(rings[0], True)] if rings else []
        holes = sorted((norm_ring(r, False) for r in rings[1:]),
                       key=lambda r: r[0] if r else ())
        return out + list(holes)

    if t == "MultiPoint":
        return Geometry(t, sorted(p), s)
    if t == "LineString":
        return Geometry(t, norm_line(p), s)
    if t == "MultiLineString":
        return Geometry(t, sorted((norm_line(m) for m in p),
                                  key=lambda m: [tuple(c) for c in m]), s)
    if t == "Polygon":
        return Geometry(t, norm_poly(p), s)
    if t == "MultiPolygon":
        return Geometry(t, sorted((norm_poly(poly) for poly in p),
                                  key=lambda poly: [tuple(c) for c in
                                                    poly[0]] if poly else []),
                        s)
    if t == "GeometryCollection":
        return Geometry(t, [normalize(m) for m in p], s)
    return g


def _chaikin_once(coords, closed: bool):
    """One corner-cutting pass: each edge (p,q) yields the 1/4 and 3/4
    points. Open lines keep their endpoints (PostGIS keeps them always
    for lines); rings cut every corner and re-close."""
    n = len(coords)
    out = []
    if closed:
        ring = coords[:-1] if n > 1 and coords[0] == coords[-1] else coords
        m = len(ring)
        for i in range(m):
            px, py = ring[i]
            qx, qy = ring[(i + 1) % m]
            out.append((0.75 * px + 0.25 * qx, 0.75 * py + 0.25 * qy))
            out.append((0.25 * px + 0.75 * qx, 0.25 * py + 0.75 * qy))
        out.append(out[0])
        return out
    out.append(coords[0])
    for i in range(n - 1):
        px, py = coords[i]
        qx, qy = coords[i + 1]
        if i > 0:
            out.append((0.75 * px + 0.25 * qx, 0.75 * py + 0.25 * qy))
        if i < n - 2:
            out.append((0.25 * px + 0.75 * qx, 0.25 * py + 0.75 * qy))
    out.append(coords[-1])
    return out


def chaikin_smoothing(g: Geometry, iterations: int = 1) -> Geometry:
    """ST_ChaikinSmoothing (PostGIS): iterative Chaikin corner cutting
    on (multi)linestrings and polygon rings; other types unchanged.
    ``iterations`` clamps to [1, 5] like PostGIS. Quarter-multiple
    arithmetic is exact for dyadic inputs, so goldens are exact."""
    it = max(1, min(5, int(iterations)))

    def seq(coords, closed):
        c = list(coords)
        if len(c) < 3:
            return c
        for _ in range(it):
            c = _chaikin_once(c, closed)
        return c

    t, p, s = g.typ, g.parts, g.srid
    if t == "LineString" and p:
        return Geometry(t, seq(p, False), s)
    if t == "MultiLineString":
        return Geometry(t, [seq(m, False) for m in p], s)
    if t == "Polygon" and p:
        return Geometry(t, [seq(r, True) for r in p], s)
    if t == "MultiPolygon":
        return Geometry(t, [[seq(r, True) for r in poly] for poly in p], s)
    if t == "GeometryCollection":
        return Geometry(t, [chaikin_smoothing(m, it) for m in p], s)
    return g


def _tri_area2(a, b, c) -> float:
    return abs((b[0] - a[0]) * (c[1] - a[1])
               - (c[0] - a[0]) * (b[1] - a[1]))


def _vw_seq(coords, closed: bool, tol2: float):
    """Visvalingam–Whyatt: repeatedly drop the vertex whose effective
    triangle has doubled-area < tol2 (smallest first, lowest index on
    ties), recomputing neighbors. Open lines keep endpoints; rings
    cycle over all vertices and must keep >= 3 distinct points."""
    if closed:
        pts = list(coords[:-1]) if len(coords) > 1 \
            and coords[0] == coords[-1] else list(coords)
    else:
        pts = list(coords)
    while True:
        m = len(pts)
        if closed:
            if m <= 3:
                break
            areas = [(_tri_area2(pts[(i - 1) % m], pts[i],
                                 pts[(i + 1) % m]), i) for i in range(m)]
        else:
            if m <= 2:
                break
            areas = [(_tri_area2(pts[i - 1], pts[i], pts[i + 1]), i)
                     for i in range(1, m - 1)]
        best_a, best_i = min(areas)
        if best_a >= tol2:
            break
        del pts[best_i]
    if closed:
        pts.append(pts[0])
    return pts


def simplify_vw(g: Geometry, tolerance: float) -> Geometry:
    """ST_SimplifyVW (PostGIS): Visvalingam–Whyatt area-based
    simplification — vertices whose effective triangle area is below
    ``tolerance`` are removed smallest-first. Rings never drop below a
    triangle (GEOS keeps a minimal ring); a ring left without 3
    distinct vertices (repeated points) is dropped, and a polygon
    losing its shell that way becomes POLYGON EMPTY.
    Points/multipoints unchanged."""
    tol2 = 2.0 * float(tolerance)

    def ring_ok(r):
        return len(set(r[:-1])) >= 3

    t, p, s = g.typ, g.parts, g.srid
    if t == "LineString" and p:
        return Geometry(t, _vw_seq(p, False, tol2), s)
    if t == "MultiLineString":
        return Geometry(t, [_vw_seq(m, False, tol2) for m in p], s)
    if t == "Polygon" and p:
        rings = [_vw_seq(r, True, tol2) for r in p]
        if not ring_ok(rings[0]):
            return Geometry(t, None, s)
        return Geometry(t, [rings[0]] + [r for r in rings[1:]
                                         if ring_ok(r)], s)
    if t == "MultiPolygon":
        polys = []
        for poly in p:
            rings = [_vw_seq(r, True, tol2) for r in poly]
            if ring_ok(rings[0]):
                polys.append([rings[0]] + [r for r in rings[1:]
                                           if ring_ok(r)])
        return Geometry(t, polys, s)
    if t == "GeometryCollection":
        return Geometry(t, [simplify_vw(m, tolerance) for m in p], s)
    return g
