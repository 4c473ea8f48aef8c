"""pandas-UDF kernels: pandas.Series in, pandas.Series out.

Each kernel mirrors one reference UDF ``invoke`` (SURVEY.md §2.1). The
reference's kernels decode WKB per element inside a columnar loop
(/root/reference/src/function/intersects.rs:104-130); here the loop runs
over an Arrow-delivered pandas batch inside a Spark Python worker —
partition-level parallelism replaces the reference's rayon threads
(SURVEY.md §3.1).

Null semantics (SURVEY.md §1.2): null in → null out; binary predicates are
null if either side is null (/root/reference/src/function/intersects.rs:111-127).

Literal arguments arrive as constant Series; kernels memoize WKB decoding
by value (``_DecodeCache``) so a scalar side is decoded once per batch.
"""

from __future__ import annotations

import json
from typing import Callable, Optional

import pandas as pd

from ..geo import algos
from ..geo.geom import Geometry
from ..geo.wkb import from_wkb, to_wkb, wkb_srid, point_wkb
from ..geo.wkt import fmt_num, from_wkt, to_ewkt, to_wkt


class _DecodeCache(dict):
    """Memoized WKB→Geometry decode (hit rate ~100% for literal sides)."""

    def geom(self, wkb: bytes) -> Geometry:
        g = self.get(wkb)
        if g is None:
            g = from_wkb(wkb)
            self[wkb] = g
        return g


def _obj_series(values) -> pd.Series:
    return pd.Series(values, dtype=object)


# ------------------------------------------------------------ constructors

def geom_from_text(s: pd.Series, srid: Optional[pd.Series] = None) -> pd.Series:
    """WKT -> (E)WKB. Mirrors ST_GeomFromText
    (/root/reference/src/function/geom_from_text.rs:50-76)."""
    srids = None if srid is None else srid.tolist()
    out = []
    cache: dict = {}
    for i, v in enumerate(s.tolist()):
        if v is None:
            out.append(None)
            continue
        r = srids[i] if srids is not None else None
        key = (v, r)
        b = cache.get(key)
        if b is None:
            g = from_wkt(v)
            if r is not None:
                g = g.with_srid(int(r))
            b = to_wkb(g)
            cache[key] = b
        out.append(b)
    return _obj_series(out)


def geom_from_wkb(s: pd.Series, srid: Optional[pd.Series] = None) -> pd.Series:
    """WKB -> validated (E)WKB, optionally stamping an SRID. Mirrors
    ST_GeomFromWKB (/root/reference/src/function/geom_from_wkb.rs:50-76).
    Every input blob is fully parsed — the reference validates eagerly too
    (/root/reference/src/geo/builder.rs:97-110)."""
    srids = None if srid is None else srid.tolist()
    out = []
    for i, v in enumerate(s.tolist()):
        if v is None:
            out.append(None)
            continue
        g = from_wkb(bytes(v))
        r = srids[i] if srids is not None else None
        if r is not None:
            g = g.with_srid(int(r))
        out.append(to_wkb(g))
    return _obj_series(out)


def make_envelope(xmin: pd.Series, ymin: pd.Series, xmax: pd.Series,
                  ymax: pd.Series, srid: Optional[pd.Series] = None) -> pd.Series:
    """Rectangle polygon from corners — ring order per the reference
    (/root/reference/src/function/make_envelope.rs:82-93)."""
    srids = None if srid is None else srid.tolist()
    out = []
    for i in range(len(xmin)):
        a, b, c, d = xmin.iat[i], ymin.iat[i], xmax.iat[i], ymax.iat[i]
        if a is None or b is None or c is None or d is None or \
                a != a or b != b or c != c or d != d:
            out.append(None)
            continue
        r = srids[i] if srids is not None else None
        g = Geometry.box(float(a), float(b), float(c), float(d),
                         srid=None if r is None else int(r))
        out.append(to_wkb(g))
    return _obj_series(out)


def st_point(x: pd.Series, y: pd.Series) -> pd.Series:
    """Fast 2-D point constructor (PostGIS ST_Point / ST_MakePoint)."""
    out = []
    xl, yl = x.tolist(), y.tolist()
    for i in range(len(xl)):
        a, b = xl[i], yl[i]
        if a is None or b is None or a != a or b != b:
            out.append(None)
        else:
            out.append(point_wkb(float(a), float(b)))
    return _obj_series(out)


# ------------------------------------------------------------ serializers

def _unary_to_str(fn: Callable[[Geometry], str]):
    def k(s: pd.Series) -> pd.Series:
        cache = _DecodeCache()
        out = []
        memo: dict = {}
        for v in s.tolist():
            if v is None:
                out.append(None)
                continue
            v = bytes(v)
            r = memo.get(v)
            if r is None:
                r = fn(cache.geom(v))
                memo[v] = r
            out.append(r)
        return _obj_series(out)
    return k


as_text = _unary_to_str(to_wkt)          # ST_AsText  (as_text.rs:88-110)
as_ewkt = _unary_to_str(to_ewkt)         # ST_AsEWKT  (as_ewkt.rs:88-101)


def _geojson(g: Geometry) -> str:
    """GeoJSON fragment — ST_AsGeoJSON
    (/root/reference/src/function/as_geojson.rs:88-110). Compact separators,
    key order type→coordinates, numbers via fmt_num (oracle-reproducible)."""
    def coords(c):
        return "[" + fmt_num(c[0]) + "," + fmt_num(c[1]) + "]"

    def arr(items):
        return "[" + ",".join(items) + "]"

    t, p = g.typ, g.parts
    if t == "Point":
        body = coords(p) if p is not None else "[]"
    elif t in ("LineString", "MultiPoint"):
        body = arr(coords(c) for c in p)
    elif t in ("Polygon", "MultiLineString"):
        body = arr(arr(coords(c) for c in part) for part in p)
    elif t == "MultiPolygon":
        body = arr(arr(arr(coords(c) for c in ring) for ring in poly) for poly in p)
    elif t == "GeometryCollection":
        return ('{"type":"GeometryCollection","geometries":['
                + ",".join(_geojson(sub) for sub in p) + "]}")
    else:
        raise ValueError(t)
    return '{"type":"' + t + '","coordinates":' + body + "}"


as_geojson = _unary_to_str(_geojson)


def geometry_type_name(g: Geometry) -> str:
    return "ST_" + g.typ


geometry_type = _unary_to_str(geometry_type_name)  # geometry_type.rs:79-92


def npoints(s: pd.Series) -> pd.Series:
    """Vertex count (PostGIS ST_NPoints; engine utility beyond the
    reference surface — used to validate constructions like ST_Buffer's
    quadsegs vertex layout)."""
    cache = _DecodeCache()
    return _obj_series([
        None if v is None else len(cache.geom(bytes(v)).vertices())
        for v in s.tolist()])


def srid(s: pd.Series) -> pd.Series:
    """SRID from the EWKB header, null when absent — ST_SRID
    (/root/reference/src/function/srid.rs:46-67). Header-only read."""
    return _obj_series([None if v is None else wkb_srid(bytes(v))
                        for v in s.tolist()])


# ------------------------------------------------------------ bbox

def box2d_rows(s: pd.Series) -> pd.DataFrame:
    """Per-row bounding box -> DataFrame(xmin,ymin,xmax,ymax) backing the
    Box2D struct UDF (/root/reference/src/function/box2d.rs:46-77;
    struct layout /root/reference/src/geo/box.rs:11-16)."""
    cache = _DecodeCache()
    xmin, ymin, xmax, ymax = [], [], [], []
    for v in s.tolist():
        if v is None:
            xmin.append(None); ymin.append(None)
            xmax.append(None); ymax.append(None)
            continue
        b = cache.geom(bytes(v)).bounds()
        if b is None:
            xmin.append(None); ymin.append(None)
            xmax.append(None); ymax.append(None)
        else:
            xmin.append(b[0]); ymin.append(b[1])
            xmax.append(b[2]); ymax.append(b[3])
    return pd.DataFrame({"xmin": xmin, "ymin": ymin, "xmax": xmax, "ymax": ymax})


# ------------------------------------------------------------ predicates

def _binary_pred(fn: Callable[[Geometry, Geometry], bool]):
    def k(a: pd.Series, b: pd.Series) -> pd.Series:
        cache = _DecodeCache()
        out = []
        al, bl = a.tolist(), b.tolist()
        memo: dict = {}
        for i in range(len(al)):
            va, vb = al[i], bl[i]
            if va is None or vb is None:
                out.append(None)
                continue
            va, vb = bytes(va), bytes(vb)
            key = (va, vb)
            r = memo.get(key)
            if r is None:
                r = bool(fn(cache.geom(va), cache.geom(vb)))
                memo[key] = r
            out.append(r)
        return _obj_series(out)
    return k


intersects = _binary_pred(algos.intersects)    # intersects.rs:100-132
covers = _binary_pred(algos.covers)            # covers.rs:103-122
covered_by = _binary_pred(algos.covered_by)    # covered_by.rs:102-121
equals = _binary_pred(algos.equals)            # equals.rs:103-122


# ------------------------------------------------------------ transforms

def _unary_geom(fn: Callable[[Geometry], Geometry]):
    def k(s: pd.Series) -> pd.Series:
        cache = _DecodeCache()
        memo: dict = {}
        out = []
        for v in s.tolist():
            if v is None:
                out.append(None)
                continue
            v = bytes(v)
            r = memo.get(v)
            if r is None:
                r = to_wkb(fn(cache.geom(v)))
                memo[v] = r
            out.append(r)
        return _obj_series(out)
    return k


boundary = _unary_geom(algos.boundary)         # boundary.rs:71-87


def translate(s: pd.Series, dx: pd.Series, dy: pd.Series) -> pd.Series:
    """ST_Translate (/root/reference/src/function/translate.rs:56-98).
    Unlike the reference, offsets may be per-row columns, not only literal
    scalars (translate.rs:57-62 restricts to scalars)."""
    cache = _DecodeCache()
    out = []
    sl, dxl, dyl = s.tolist(), dx.tolist(), dy.tolist()
    for i in range(len(sl)):
        v = sl[i]
        if v is None or dxl[i] is None or dyl[i] is None:
            out.append(None)
            continue
        g = cache.geom(bytes(v))
        out.append(to_wkb(g.translate(float(dxl[i]), float(dyl[i]))))
    return _obj_series(out)


def buffer(s: pd.Series, width: pd.Series, quadsegs: pd.Series) -> pd.Series:
    """ST_Buffer (/root/reference/src/function/buffer.rs:86-104)."""
    cache = _DecodeCache()
    out = []
    sl, wl, ql = s.tolist(), width.tolist(), quadsegs.tolist()
    for i in range(len(sl)):
        v = sl[i]
        if v is None or wl[i] is None or ql[i] is None:
            out.append(None)
            continue
        g = cache.geom(bytes(v))
        out.append(to_wkb(algos.buffer(g, float(wl[i]), int(ql[i]))))
    return _obj_series(out)


def split(s: pd.Series, blade: pd.Series) -> pd.Series:
    """ST_Split with PostGIS semantics — deliberately NOT the reference's
    broken boundary∪polygonize version
    (/root/reference/src/function/split.rs:148 FIXME; SURVEY.md §7.3)."""
    cache = _DecodeCache()
    out = []
    sl, bl = s.tolist(), blade.tolist()
    for i in range(len(sl)):
        v, b = sl[i], bl[i]
        if v is None or b is None:
            out.append(None)
            continue
        out.append(to_wkb(algos.split(cache.geom(bytes(v)), cache.geom(bytes(b)))))
    return _obj_series(out)


def as_mvt_geom(s: pd.Series, xmin: pd.Series, ymin: pd.Series,
                xmax: pd.Series, ymax: pd.Series) -> pd.Series:
    """ST_AsMVTGeom (/root/reference/src/function/as_mvt_geom.rs:86-95).
    The reference takes a Box2d struct argument; here the tile box arrives
    as four doubles (the struct variant is unpacked by the Column wrapper)."""
    cache = _DecodeCache()
    out = []
    sl = s.tolist()
    for i in range(len(sl)):
        v = sl[i]
        if v is None or xmin.iat[i] is None:
            out.append(None)
            continue
        g = cache.geom(bytes(v))
        out.append(to_wkb(algos.as_mvt_geom(
            g, float(xmin.iat[i]), float(ymin.iat[i]),
            float(xmax.iat[i]), float(ymax.iat[i]))))
    return _obj_series(out)
