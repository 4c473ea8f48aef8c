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
