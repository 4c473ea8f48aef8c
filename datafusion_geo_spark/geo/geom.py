"""Geometry object model for the PySpark spatial engine.

A deliberately small, dependency-free 2-D geometry model. The reference
(systemxlabs/datafusion-geo) stores geometries as WKB bytes inside Arrow
Binary arrays and decodes per element into ``geo::Geometry`` objects
(/root/reference/src/geo/array.rs:13-23). We mirror that: geometries live
as WKB in Spark ``BinaryType`` columns and are decoded into ``Geometry``
objects inside vectorized pandas-UDF kernels.

Coordinate model: XY only (the reference is 2-D as well — SURVEY.md §1.2).
SRID is carried on the object and round-trips through EWKB
(/root/reference/src/function/geom_from_text.rs:51-58).
"""

from __future__ import annotations

import math
from typing import Iterable, List, Optional, Sequence, Tuple

Coord = Tuple[float, float]

# Geometry type names, aligned with WKB integer codes (code = index).
GEOM_TYPES = (
    "",  # 0 unused
    "Point",
    "LineString",
    "Polygon",
    "MultiPoint",
    "MultiLineString",
    "MultiPolygon",
    "GeometryCollection",
)
TYPE_CODE = {name: i for i, name in enumerate(GEOM_TYPES) if name}


class Geometry:
    """A 2-D geometry.

    ``typ``:   one of GEOM_TYPES[1:]
    ``parts``: type-dependent payload
        Point              -> (x, y) or None (empty)
        LineString         -> [ (x,y), ... ]
        Polygon            -> [ ring, ... ]   ring = [ (x,y), ... ] closed
        MultiPoint         -> [ (x,y), ... ]
        MultiLineString    -> [ line, ... ]
        MultiPolygon       -> [ polygon, ... ]  polygon = [ ring, ... ]
        GeometryCollection -> [ Geometry, ... ]
    ``srid``:  int or None
    """

    __slots__ = ("typ", "parts", "srid")

    def __init__(self, typ: str, parts, srid: Optional[int] = None):
        self.typ = typ
        self.parts = parts
        self.srid = srid

    # -- constructors -------------------------------------------------
    @staticmethod
    def point(x: float, y: float, srid: Optional[int] = None) -> "Geometry":
        return Geometry("Point", (float(x), float(y)), srid)

    @staticmethod
    def linestring(coords: Iterable[Coord], srid: Optional[int] = None) -> "Geometry":
        return Geometry("LineString", [(float(x), float(y)) for x, y in coords], srid)

    @staticmethod
    def polygon(rings: Sequence[Iterable[Coord]], srid: Optional[int] = None) -> "Geometry":
        closed = []
        for ring in rings:
            r = [(float(x), float(y)) for x, y in ring]
            if r and r[0] != r[-1]:
                r.append(r[0])
            closed.append(r)
        return Geometry("Polygon", closed, srid)

    @staticmethod
    def box(xmin: float, ymin: float, xmax: float, ymax: float,
            srid: Optional[int] = None) -> "Geometry":
        """Envelope polygon; ring order follows the reference's
        ST_MakeEnvelope (/root/reference/src/function/make_envelope.rs:82-93):
        (xmin ymin, xmin ymax, xmax ymax, xmax ymin, xmin ymin)."""
        ring = [(xmin, ymin), (xmin, ymax), (xmax, ymax), (xmax, ymin), (xmin, ymin)]
        return Geometry("Polygon", [[(float(x), float(y)) for x, y in ring]], srid)

    # -- structure ----------------------------------------------------
    def is_empty(self) -> bool:
        if self.typ == "Point":
            return self.parts is None
        return len(self.parts) == 0

    def vertices(self) -> List[Coord]:
        """All coordinates, flattened."""
        t, p = self.typ, self.parts
        if t == "Point":
            return [] if p is None else [p]
        if t in ("LineString", "MultiPoint"):
            return list(p)
        if t in ("Polygon", "MultiLineString"):
            return [c for part in p for c in part]
        if t == "MultiPolygon":
            return [c for poly in p for ring in poly for c in ring]
        if t == "GeometryCollection":
            return [c for g in p for c in g.vertices()]
        raise ValueError(t)

    def bounds(self) -> Optional[Tuple[float, float, float, float]]:
        """(xmin, ymin, xmax, ymax) or None if empty."""
        vs = self.vertices()
        if not vs:
            return None
        xs = [c[0] for c in vs]
        ys = [c[1] for c in vs]
        return (min(xs), min(ys), max(xs), max(ys))

    def geometries(self) -> List["Geometry"]:
        """Decompose into simple (Point/LineString/Polygon) parts."""
        t, p, s = self.typ, self.parts, self.srid
        if t in ("Point", "LineString", "Polygon"):
            return [self]
        if t == "MultiPoint":
            return [Geometry("Point", c, s) for c in p]
        if t == "MultiLineString":
            return [Geometry("LineString", line, s) for line in p]
        if t == "MultiPolygon":
            return [Geometry("Polygon", poly, s) for poly in p]
        if t == "GeometryCollection":
            return [sub for g in p for sub in g.geometries()]
        raise ValueError(t)

    # -- transforms ---------------------------------------------------
    def map_coords(self, f) -> "Geometry":
        """New geometry with ``f((x, y)) -> (x, y)`` applied to every coord."""
        t, p = self.typ, self.parts
        if t == "Point":
            return Geometry(t, None if p is None else f(p), self.srid)
        if t in ("LineString", "MultiPoint"):
            return Geometry(t, [f(c) for c in p], self.srid)
        if t in ("Polygon", "MultiLineString"):
            return Geometry(t, [[f(c) for c in part] for part in p], self.srid)
        if t == "MultiPolygon":
            return Geometry(
                t, [[[f(c) for c in ring] for ring in poly] for poly in p], self.srid)
        if t == "GeometryCollection":
            return Geometry(t, [g.map_coords(f) for g in p], self.srid)
        raise ValueError(t)

    def translate(self, dx: float, dy: float) -> "Geometry":
        return self.map_coords(lambda c: (c[0] + dx, c[1] + dy))

    def affine(self, a: float, b: float, d: float, e: float,
               xoff: float, yoff: float) -> "Geometry":
        """x' = a*x + b*y + xoff ; y' = d*x + e*y + yoff (shapely order)."""
        return self.map_coords(lambda c: (a * c[0] + b * c[1] + xoff,
                                          d * c[0] + e * c[1] + yoff))

    # -- misc ---------------------------------------------------------
    def with_srid(self, srid: Optional[int]) -> "Geometry":
        return Geometry(self.typ, self.parts, srid)

    def __repr__(self) -> str:  # debug only
        from .wkt import to_wkt
        s = f"SRID={self.srid};" if self.srid else ""
        return f"<Geometry {s}{to_wkt(self)}>"

    def __eq__(self, other) -> bool:
        """Structural (coordinate-wise) equality, NOT topological.

        Topological equality lives in ``algos.equals`` — the reference's
        ST_Equals is topological (/root/reference/src/function/equals.rs:137-148).
        """
        return (isinstance(other, Geometry) and self.typ == other.typ
                and self.srid == other.srid
                and _freeze(self.parts) == _freeze(other.parts))

    def __hash__(self):
        return hash((self.typ, _freeze(self.parts), self.srid))


def _freeze(p):
    if isinstance(p, list):
        return tuple(_freeze(x) for x in p)
    return p


def ring_area2(ring: Sequence[Coord]) -> float:
    """Twice the signed area of a ring (shoelace). >0 = counter-clockwise."""
    a = 0.0
    n = len(ring)
    for i in range(n - 1):
        x1, y1 = ring[i]
        x2, y2 = ring[i + 1]
        a += x1 * y2 - x2 * y1
    return a


def dist(a: Coord, b: Coord) -> float:
    return math.hypot(a[0] - b[0], a[1] - b[1])
