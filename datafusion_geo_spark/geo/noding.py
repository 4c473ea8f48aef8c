"""Linework noding and validity repair (PostGIS ST_Node /
ST_MakeValid, linework method).

``node_paths`` splits every input path at each intersection with any
other segment — proper crossings (algos.segment_crossing) and
endpoint-on-interior touches (algos._on_segment), which together also
delimit collinear overlaps at their endpoints. O(segments²) per CALL —
these kernels run per geometry (or per small group), where vertex
counts are bounded; corpus-scale noding is the job of the distributed
operators on top.

``make_valid`` is the GEOS/PostGIS *linework* strategy: node the
boundary rings, polygonize the resulting arrangement, and keep the
faces whose interior has ODD even-odd parity against the original ring
multiset (a bowtie becomes two triangles; a valid polygon round-trips).
Kept faces are then sanitized into a VALID decomposition
(_dissolve_and_unpinch): faces sharing boundary segments dissolve into
one region, and point-pinched rings split into lobes touching at the
point — matching PostGIS, which never emits edge-adjacent members or
self-touching rings (r9 fuzz finding; see tests/test_makevalid.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from .algos import (_node_key, _on_segment, _split_pinched,
                    point_in_ring, segment_crossing)
from .geom import Coord, Geometry, ring_area2

__all__ = ["node_paths", "node_geometry", "make_valid"]


def node_paths(lines: Sequence[Sequence[Coord]]) -> List[List[Coord]]:
    """Each input path split at every node; pieces keep their original
    interior vertices and direction. Duplicate pieces are NOT removed
    here (ST_Node dissolves them; polygonize dedups itself)."""
    lines = [list(ln) for ln in lines if len(ln) >= 2]
    segs: List[Tuple[int, int, Coord, Coord]] = []
    for li, line in enumerate(lines):
        for si in range(len(line) - 1):
            segs.append((li, si, line[si], line[si + 1]))
    cuts: Dict[Tuple[int, int], Dict[tuple, Coord]] = {}

    def addcut(li: int, si: int, p: Coord) -> None:
        cuts.setdefault((li, si), {})[_node_key(p)] = p

    for i in range(len(segs)):
        li, si, a, b = segs[i]
        for j in range(i + 1, len(segs)):
            lj, sj, c, d = segs[j]
            if li == lj and abs(si - sj) <= 1:
                continue            # same-path neighbors share a vertex
            x = segment_crossing(a, b, c, d)
            if x is not None:
                addcut(li, si, x)
                addcut(lj, sj, x)
            for p in (c, d):
                if _on_segment(p, a, b):
                    addcut(li, si, p)
            for p in (a, b):
                if _on_segment(p, c, d):
                    addcut(lj, sj, p)

    out: List[List[Coord]] = []
    for li, line in enumerate(lines):
        piece: List[Coord] = [line[0]]
        for si in range(len(line) - 1):
            a, b = line[si], line[si + 1]
            cs = list(cuts.get((li, si), {}).values())
            cs.sort(key=lambda p: (p[0] - a[0]) ** 2 + (p[1] - a[1]) ** 2)
            for p in cs:
                if _node_key(p) == _node_key(piece[-1]):
                    # node AT the current position (segment start / a
                    # previous cut): close the running piece
                    if len(piece) > 1:
                        out.append(piece)
                        piece = [piece[-1]]
                    continue
                piece.append(p)
                out.append(piece)
                piece = [p]
            if _node_key(b) != _node_key(piece[-1]):
                piece.append(b)
        if len(piece) > 1:
            out.append(piece)
    return out


def _line_members(g: Geometry) -> List[List[Coord]]:
    from .overlay import _line_members as lm
    return lm(g)


def node_geometry(g: Geometry) -> Geometry:
    """ST_Node: fully node the lineal input; duplicate pieces dissolve
    (undirected canonical-key dedup), output is a MultiLineString of
    the noded paths in deterministic input order."""
    pieces = node_paths(_line_members(g))
    seen = set()
    keep: List[List[Coord]] = []
    for p in pieces:
        fwd = tuple(_node_key(c) for c in p)
        key = min(fwd, fwd[::-1])
        if key in seen:
            continue
        seen.add(key)
        keep.append(p)
    if not keep:
        return Geometry("MultiLineString", [], g.srid)
    if len(keep) == 1:
        return Geometry("LineString", keep[0], g.srid)
    return Geometry("MultiLineString", keep, g.srid)


def _interior_point(face: Sequence[Sequence[Coord]],
                    avoid: Sequence[Tuple[Coord, Coord]]) -> Optional[Coord]:
    """A point strictly inside the face (inside its shell, outside its
    holes) and off every ``avoid`` segment, so an even-odd parity test
    is unambiguous. Probes points pulled from each shell corner toward
    its neighbors' midpoint at shrinking weights (small weights first —
    a large step can vault across a concavity or into a hole)."""
    shell = list(face[0])
    holes = [list(h) for h in face[1:]]
    n = len(shell) - 1
    for i in range(n):
        a, v, b = shell[(i - 1) % n], shell[i], shell[(i + 1) % n]
        for w in (0.1, 0.01, 0.5, 0.001):
            m = (v[0] + w * ((a[0] + b[0]) / 2.0 - v[0]),
                 v[1] + w * ((a[1] + b[1]) / 2.0 - v[1]))
            if point_in_ring(m, shell) != 1:
                continue
            if any(point_in_ring(m, h) != -1 for h in holes):
                continue
            if any(_on_segment(m, p, q) for p, q in avoid):
                continue
            return m
    return None


def make_valid(g: Geometry) -> Geometry:
    """ST_MakeValid (linework method) for areal inputs; non-areal
    geometries come back unchanged (points/lines have no ring validity
    to repair — PostGIS behaves the same)."""
    if g.typ not in ("Polygon", "MultiPolygon"):
        return g
    rings: List[List[Coord]] = []
    if g.typ == "Polygon":
        rings = [list(r) for r in g.parts]
    else:
        for poly in g.parts:
            rings.extend(list(r) for r in poly)
    rings = [r for r in rings if len(r) >= 4]
    if not rings:
        return Geometry("Polygon", [], g.srid)
    from .polygonize import polygonize
    noded = node_paths(rings)
    arrangement = polygonize(
        [Geometry("LineString", p) for p in noded])
    faces: List[List[List[Coord]]] = []
    if arrangement.typ == "Polygon" and not arrangement.is_empty():
        faces = [arrangement.parts]
    elif arrangement.typ == "MultiPolygon":
        faces = list(arrangement.parts)
    ring_segs = [(r[i], r[i + 1]) for r in rings for i in range(len(r) - 1)]

    def classify(cand_faces):
        """Keep the faces whose interior has ODD crossing parity
        against the original rings (the linework-method rule)."""
        out = []
        for face in cand_faces:
            m = _interior_point(face, ring_segs)
            if m is None:
                continue        # sliver thinner than the probe — drop
            crossings = sum(1 for r in rings if point_in_ring(m, r) == 1)
            if crossings % 2 == 1:
                out.append(face)
        return out

    kept = classify(faces)
    kept = _dissolve_and_unpinch(kept, classify, polygonize)
    kept = [[r for r in (_drop_spikes(r) for r in face) if r is not None]
            for face in kept]
    kept = [face for face in kept if face]
    if not kept:
        return Geometry("Polygon", [], g.srid)
    if len(kept) == 1:
        return Geometry("Polygon", kept[0], g.srid)
    return Geometry("MultiPolygon", kept, g.srid)


def _dissolve_and_unpinch(kept, classify, polygonize):
    """Sanitize the kept faces into a VALID (multi)polygon decomposition
    (r9 fuzz finding: ~3.5% of random invalid inputs produced invalid
    make_valid output before this).

    Two repairs, applied only when needed so well-behaved inputs keep
    their byte-identical decomposition:

    * DISSOLVE — two kept faces can share a boundary SEGMENT (adjacent
      odd-parity faces of the arrangement); MultiPolygon members may
      only touch at points. Interior segments appear an EVEN number of
      times across all kept rings — drop them, re-polygonize the
      surviving boundary, and re-classify by the same parity rule
      (parity is a property of the region, not of its decomposition).
    * UNPINCH — a traced face ring can revisit a vertex (point-pinched
      interior); split it into simple lobes touching at the point and
      reassemble shells/holes by sign + containment (the polygonize
      tail rule: holes to the smallest strictly-containing shell)."""
    from collections import Counter
    from .algos import _canon_start
    from .overlay import _mid

    def seg_key(a, b):
        ka, kb = _node_key(a), _node_key(b)
        return (min(ka, kb), max(ka, kb))

    all_segs = Counter(seg_key(r[i], r[i + 1])
                       for face in kept for r in face
                       for i in range(len(r) - 1))
    if any(v > 1 for v in all_segs.values()):
        boundary = [Geometry("LineString", [r[i], r[i + 1]])
                    for face in kept for r in face
                    for i in range(len(r) - 1)
                    if all_segs[seg_key(r[i], r[i + 1])] % 2 == 1]
        arr = polygonize(boundary)
        faces2: List[List[List[Coord]]] = []
        if arr.typ == "Polygon" and not arr.is_empty():
            faces2 = [arr.parts]
        elif arr.typ == "MultiPolygon":
            faces2 = list(arr.parts)
        kept = classify(faces2)

    if not any(len({_node_key(c) for c in r[:-1]}) != len(r) - 1
               for face in kept for r in face):
        return kept
    subrings: List[List[Coord]] = []
    for face in kept:
        for r in face:
            for sub in _split_pinched(r):
                if abs(ring_area2(sub + [sub[0]])) > 0.0:
                    subrings.append(sub + [sub[0]])
    shells = sorted(((abs(ring_area2(r)), _canon_start(r))
                     for r in subrings if ring_area2(r) > 0),
                    key=lambda s: s[0])
    holes = [_canon_start(r) for r in subrings if ring_area2(r) < 0]
    out = [[r] for _, r in shells]
    for h in holes:
        for k, (_, shell) in enumerate(shells):
            if any(point_in_ring(_mid(h[i], h[i + 1]), shell) == 1
                   for i in range(len(h) - 1)):
                out[k].append(h)
                break
    return out


def _drop_spikes(ring: Sequence[Coord]) -> Optional[List[Coord]]:
    """Remove zero-area spikes (…, a, b, a, …) from a closed ring —
    the boundary artifact a degenerate input spike leaves on an
    otherwise valid face (PostGIS's keepCollapsed=false drops them
    too). None if the ring collapses below a triangle."""
    r = list(ring[:-1])
    changed = True
    while changed and len(r) >= 3:
        changed = False
        for i in range(len(r)):
            if r[(i - 1) % len(r)] == r[(i + 1) % len(r)]:
                # vertex i is the tip of a backtrack: drop it and one
                # duplicate neighbor
                j = (i + 1) % len(r)
                for k in sorted((i, j), reverse=True):
                    r.pop(k)
                changed = True
                break
    if len(r) < 3 or abs(ring_area2(r + [r[0]])) == 0.0:
        return None
    return r + [r[0]]


def build_area(g: Geometry) -> Geometry:
    """ST_BuildArea (PostGIS/GEOS): form areal geometry from closed
    linework — faces of the noded arrangement at EVEN nesting depth
    are kept (odd-depth enclosed faces are the holes, the even-odd
    rule), dangling edges contribute nothing, and shared edges between
    kept faces dissolve through the overlay union. Non-lineal members
    are ignored; no closed face → POLYGON EMPTY."""
    lines = _line_members(g)
    if not lines:
        return Geometry("Polygon", [], g.srid)
    from .algos import point_in_polygon
    from .overlay import union_all
    from .polygonize import polygonize
    noded = node_paths(lines)
    arrangement = polygonize([Geometry("LineString", p) for p in noded])
    faces: List[List[List[Coord]]] = []
    if arrangement.typ == "Polygon" and not arrangement.is_empty():
        faces = [arrangement.parts]
    elif arrangement.typ == "MultiPolygon":
        faces = list(arrangement.parts)
    if not faces:
        return Geometry("Polygon", [], g.srid)
    segs = [(p[i], p[i + 1]) for p in noded for i in range(len(p) - 1)]
    kept = []
    for fi, face in enumerate(faces):
        ip = _interior_point(face, segs)
        if ip is None:
            continue
        # count containment in other faces' SHELLS (a hole-assigned
        # outer face would otherwise exclude the very face that is its
        # hole, breaking the parity)
        depth = sum(1 for fj, other in enumerate(faces)
                    if fj != fi and other
                    and point_in_polygon(ip, [other[0]]) == 1)
        if depth % 2 == 0:
            kept.append(Geometry("Polygon", face, g.srid))
    if not kept:
        return Geometry("Polygon", [], g.srid)
    out = union_all(kept)
    return out.with_srid(g.srid) if out is not None \
        else Geometry("Polygon", [], g.srid)
