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


def subdivide(g: Geometry, max_vertices: int = 128,
              _depth: int = 0) -> List[Geometry]:
    """Pieces of ``g`` with <= max_vertices vertices each, covering the
    same point set. PostGIS requires max_vertices >= 5 (a closed ring
    needs 5); so do we."""
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
        if xmax - xmin >= ymax - ymin:
            mid = (xmin + xmax) / 2.0
            halves = (Geometry.box(xmin, ymin, mid, ymax),
                      Geometry.box(mid, ymin, xmax, ymax))
        else:
            mid = (ymin + ymax) / 2.0
            halves = (Geometry.box(xmin, ymin, xmax, mid),
                      Geometry.box(xmin, mid, xmax, ymax))
        for clip in halves:
            piece = overlay.intersection(part, clip)
            if piece is None or piece.is_empty():
                continue
            for m in _parts(piece):
                if _nverts(m) < _nverts(part):
                    out.extend(subdivide(m, max_vertices, _depth + 1))
                else:       # no progress: emit rather than recurse forever
                    out.append(m)
    return [p.with_srid(g.srid) for p in out]
