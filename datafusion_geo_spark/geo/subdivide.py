"""ST_Subdivide: recursively split a geometry along its bounding box's
longer axis until every piece has at most ``max_vertices`` vertices
(PostGIS semantics: a set-returning halving cascade used to break
continent-sized polygons into index-friendly tiles before spatial
joins — the pre-shard step that keeps per-pair refinement costs bounded
at 100-TB join scale).

Built on the repo's own overlay machinery (geo/overlay.py intersection
with a half-plane box). Deviations, documented: pieces are emitted in
deterministic left/bottom-first recursion order; if a split fails to
reduce the vertex count (degenerate slivers) the piece is emitted as-is
rather than looping forever.
"""

from __future__ import annotations

from typing import List

from .geom import Geometry
from . import overlay

__all__ = ["subdivide"]

_MAX_DEPTH = 48


def _nverts(g: Geometry) -> int:
    return len(g.vertices())


def _parts(g: Geometry) -> List[Geometry]:
    """Split multi/collection geometries into single-geometry members;
    drop empties."""
    if g.typ in ("MultiPolygon", "MultiLineString", "MultiPoint",
                 "GeometryCollection"):
        out: List[Geometry] = []
        for m in g.geometries():
            out.extend(_parts(m))
        return out
    return [] if g.is_empty() else [g]


def _is_convex_ring(ring) -> bool:
    """Closed ring strictly convex up to collinear runs (segmentized
    envelopes and every half-plane cut of them). One cross-product sign
    scan; degenerate all-collinear rings report False and fall back to
    the robust overlay path."""
    n = len(ring) - 1
    if n < 3:
        return False
    sign = 0
    for i in range(n):
        ax, ay = ring[i]
        bx, by = ring[(i + 1) % n]
        cx, cy = ring[(i + 2) % n]
        cr = (bx - ax) * (cy - by) - (by - ay) * (cx - bx)
        if cr != 0.0:
            s = 1 if cr > 0.0 else -1
            if sign == 0:
                sign = s
            elif s != sign:
                return False
    return sign != 0


def _clip_convex(ring, axis: int, mid: float, keep_le: bool):
    """Sutherland-Hodgman clip of a closed CONVEX ring against the
    half-plane coord[axis] <= mid (or >= mid) — exact for convex input
    (exactly two boundary crossings, output again convex). Crossings
    that land on an existing vertex reuse that vertex bit-for-bit, so
    piece vertex counts and areas match the overlay path the pinned
    tests were recorded against. Returns a closed ring or None."""
    n = len(ring) - 1
    out = []

    def push(p):
        if not out or out[-1] != p:
            out.append(p)

    for i in range(n):
        a, b = ring[i], ring[i + 1]
        ia = (a[axis] <= mid) if keep_le else (a[axis] >= mid)
        ib = (b[axis] <= mid) if keep_le else (b[axis] >= mid)
        if ia:
            push(a)
        if ia != ib:
            if a[axis] == mid:
                q = a
            elif b[axis] == mid:
                q = b
            else:
                t = (mid - a[axis]) / (b[axis] - a[axis])
                q = ((mid, a[1] + t * (b[1] - a[1])) if axis == 0
                     else (a[0] + t * (b[0] - a[0]), mid))
            push(q)
    if len(out) >= 2 and out[0] == out[-1]:
        out.pop()
    if len(out) < 3:
        return None
    out.append(out[0])
    return out


def subdivide(g: Geometry, max_vertices: int = 128,
              _depth: int = 0) -> List[Geometry]:
    """Pieces of ``g`` with <= max_vertices vertices each, covering the
    same point set. PostGIS requires max_vertices >= 5 (a closed ring
    needs 5); so do we.

    Hot path: a single-ring convex polygon (the envelope/segmentize
    pipelines' only shape, and closed under half-plane cuts) clips via
    _clip_convex in O(n) instead of the generic plane-sweep overlay —
    ~50x on the canonical segmentized box. Concave or holed parts keep
    the robust overlay path."""
    if max_vertices < 5:
        raise ValueError(
            f"ST_Subdivide: max_vertices must be >= 5, got {max_vertices}")
    out: List[Geometry] = []
    for part in _parts(g):
        if part.typ == "Point" or _nverts(part) <= max_vertices \
                or _depth >= _MAX_DEPTH:
            out.append(part)
            continue
        xmin, ymin, xmax, ymax = part.bounds()
        axis = 0 if xmax - xmin >= ymax - ymin else 1
        if axis == 0:
            mid = (xmin + xmax) / 2.0
            halves = (Geometry.box(xmin, ymin, mid, ymax),
                      Geometry.box(mid, ymin, xmax, ymax))
        else:
            mid = (ymin + ymax) / 2.0
            halves = (Geometry.box(xmin, ymin, xmax, mid),
                      Geometry.box(xmin, mid, xmax, ymax))
        convex = (part.typ == "Polygon" and len(part.parts) == 1
                  and _is_convex_ring(part.parts[0]))
        for idx, clip in enumerate(halves):
            if convex:
                r = _clip_convex(part.parts[0], axis, mid, idx == 0)
                piece = (Geometry("Polygon", [r], part.srid)
                         if r is not None else None)
            else:
                piece = overlay.intersection(part, clip)
            if piece is None or piece.is_empty():
                continue
            for m in _parts(piece):
                # progress = fewer vertices OR a strictly smaller bbox
                # (the next cut then has a different midpoint, so the
                # recursion converges; _MAX_DEPTH is the hard backstop).
                # Vertex count alone is too strict: an uneven cut of a
                # convex arc keeps both cut endpoints and can tie the
                # parent's count while the shape genuinely halved.
                if _nverts(m) < _nverts(part) \
                        or m.bounds() != part.bounds():
                    out.extend(subdivide(m, max_vertices, _depth + 1))
                else:       # true sliver: emit rather than loop forever
                    out.append(m)
    return [p.with_srid(g.srid) for p in out]
