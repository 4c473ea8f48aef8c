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

import re
from typing import Callable, Optional

import numpy as np
import pandas as pd

from ..geo import algos, edit, overlay, relate, vector
from ..geo import bounding, de9im, noding
from ..geo import metrics as metrics_mod
from ..geo import triangulate as triangulate_mod
from ..geo import validity as validity_mod
from ..geo import polygonize as polygonize_mod
from ..geo import subdivide as subdivide_mod
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


def _const_geom(vals: list) -> Optional[Geometry]:
    """If every non-null WKB in the batch is the same value (a broadcast
    literal — the reference's scalar-argument case, intersects.rs:49-60),
    decode it once."""
    first = None
    for v in vals:
        if v is None:
            continue
        if first is None:
            first = v
        elif v != first:
            return None
    return None if first is None else from_wkb(bytes(first))


def _fmt(v: float) -> str:
    return str(int(v)) if v == int(v) and abs(v) < 1e15 else repr(v)


def _num(v):
    """None when a numeric cell is SQL NULL: pandas delivers null numerics
    as NaN in float Series, so ``is None`` alone misses them (null-in →
    null-out contract for every numeric-argument kernel)."""
    return None if v is None or v != v else v


# NOTE: a pandas-based "vectorized" formatter (int astype(str) + Series
# concat) measured FASTER single-threaded (0.59s vs 0.80s per 600k) but
# 2× SLOWER inside Spark with 32 concurrent python workers (4.3s vs 1.9s
# per query) — the large object-array intermediates thrash the allocator
# under concurrency, while the per-row f-string loop stays cache-local.
# Keep the loop; benchmark any replacement IN-CLUSTER, not single-thread.


_POINT_RE = re.compile(r"^POINT\s*\(\s*(\S+)\s+(\S+)\s*\)\s*$")


def _nullable(arr: np.ndarray, valid: np.ndarray):
    """Float array → pandas-ready values with real None (NOT NaN — NaN
    survives Arrow as a non-null double) where invalid."""
    if valid.all():
        return arr
    out = arr.astype(object)
    out[~valid] = None
    return out


def _bool_nullable(arr: np.ndarray, valid: np.ndarray) -> pd.Series:
    out = arr.astype(object)
    out[~valid] = None
    return pd.Series(out, dtype=object)


# ------------------------------------------------------------ constructors

def geom_from_text(s: pd.Series, srid: Optional[pd.Series] = None) -> pd.Series:
    """WKT -> (E)WKB. Mirrors ST_GeomFromText
    (/root/reference/src/function/geom_from_text.rs:50-76).

    Fast path: an all-POINT batch parses via one vectorized regex extract
    and encodes with the numpy point codec (no SRID only)."""
    if srid is None:
        fast = _fast_points_from_text(s)
        if fast is None:
            fast = _fast_lines_from_text(s)
        if fast is not None:
            return fast
    srids = None if srid is None else srid.tolist()
    out = []
    cache: dict = {}
    for i, v in enumerate(s.tolist()):
        if v is None:
            out.append(None)
            continue
        if srids is not None:
            r = _num(srids[i])
            if r is None:  # srid argument present but NULL → NULL row
                out.append(None)
                continue
        else:
            r = None
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


_POINTS_ALLNULL = object()  # sentinel: batch parsed, every row NULL


def _parse_points_fast(s: pd.Series):
    """Shared C-speed parse of an all-'POINT(x y)' batch: strip the
    keyword with vectorized str ops, join the batch into one buffer,
    float-parse with numpy. Returns (xs_body, ys_body, isnull) with
    the body arrays aligned to the non-null rows, ``_POINTS_ALLNULL``
    for an all-null batch, or None when any row needs the full parser
    (SRID, EMPTY, extra spaces, wrong arity, non-finite text)."""
    isnull = s.isna().to_numpy()
    body = s.dropna()
    if len(body) == 0:
        return _POINTS_ALLNULL
    ok = (body.str.startswith("POINT(") & body.str.endswith(")")).all()
    if not ok:
        return None
    inner = body.str.slice(6, -1)
    # PER-ROW arity: exactly one separating space ⇒ exactly 'x y'. The
    # batch-total float count alone lets a 3-coord row ('POINT(1 2 3)',
    # which the strict parser truncates to XY) and a 1-coord row (which
    # it rejects) compensate into two silently wrong points.
    if not (inner.str.count(" ") == 1).all():
        return None
    joined = " ".join(inner.tolist())
    vals = np.fromstring(joined, dtype=float, sep=" ")
    if len(vals) != 2 * len(body):  # malformed → full parser
        return None
    if np.isnan(vals).any():
        return None
    return vals[0::2], vals[1::2], isnull


def _fast_points_from_text(s: pd.Series) -> Optional[pd.Series]:
    """All-'POINT(x y)' batches encoded to WKB at C speed."""
    parsed = _parse_points_fast(s)
    if parsed is _POINTS_ALLNULL:
        return _obj_series([None] * len(s))
    if parsed is None:
        return None
    bx, by, isnull = parsed
    xs = np.empty(len(s)); ys = np.empty(len(s))
    xs[~isnull] = bx
    ys[~isnull] = by
    return _obj_series(vector.encode_points(xs, ys, valid=~isnull))


def _fast_lines_from_text(s: pd.Series) -> Optional[pd.Series]:
    """All-'LINESTRING(x y,...)' batches with one shared vertex count."""
    isnull = s.isna().to_numpy()
    body = s.dropna()
    if len(body) == 0:
        return None
    ok = (body.str.startswith("LINESTRING(") & body.str.endswith(")")).all()
    if not ok:
        return None
    ncommas = body.str.count(",")
    k = int(ncommas.iloc[0]) + 1
    if k < 2 or not (ncommas == k - 1).all():
        return None
    raw = body.str.slice(11, -1)
    # PER-ROW arity: k 2-D points ⇒ exactly k separating spaces. Same
    # compensation hazard as the point path — a 3-D row and a 1-D row
    # with matching comma counts would otherwise misparse together.
    if not (raw.str.count(" ") == k).all():
        return None
    inner = raw.str.replace(",", " ", regex=False)
    joined = " ".join(inner.tolist())
    vals = np.fromstring(joined, dtype=float, sep=" ")
    if len(vals) != 2 * k * len(body) or np.isnan(vals).any():
        return None
    coords = np.empty((len(s), k, 2))
    coords[~isnull] = vals.reshape(len(body), k, 2)
    return _obj_series(vector.encode_uniform_lines(coords, valid=~isnull))


def geom_from_geojson(s: pd.Series) -> pd.Series:
    """GeoJSON text -> (E)WKB — PostGIS-parity ST_GeomFromGeoJSON; the
    inverse of as_geojson (the reference only serializes,
    /root/reference/src/function/as_geojson.rs:88-110). A legacy ``crs``
    EPSG member becomes the SRID (EWKB). Repeated strings within a batch
    (dimension tables, literal fan-out) hit the per-batch cache.

    Fast paths mirror geom_from_text's: an all-Point batch in the
    serializer's canonical key order parses via vectorized str ops +
    one numpy float parse; same for all-LineString batches with one
    shared vertex count (11.9 s → ~1 s for 600k×2 parses at sf0.1).
    Anything else (crs, elevation, spacing, mixed types) falls back to
    the full json.loads parser per row."""
    fast = _fast_points_from_geojson(s)
    if fast is None:
        fast = _fast_lines_from_geojson(s)
    if fast is not None:
        return fast
    from ..geo.geojson import from_geojson
    out = []
    cache: dict = {}
    for v in s.tolist():
        if v is None:
            out.append(None)
            continue
        b = cache.get(v)
        if b is None:
            b = to_wkb(from_geojson(v))
            cache[v] = b
        out.append(b)
    return _obj_series(out)


_GJ_POINT_PRE = '{"type":"Point","coordinates":['
_GJ_LINE_PRE = '{"type":"LineString","coordinates":[['


def _fast_points_from_geojson(s: pd.Series) -> Optional[pd.Series]:
    """All-'{"type":"Point","coordinates":[x,y]}' batches at C speed."""
    isnull = s.isna().to_numpy()
    body = s.dropna()
    if len(body) == 0:
        return _obj_series([None] * len(s))
    ok = (body.str.startswith(_GJ_POINT_PRE) & body.str.endswith("]}")).all()
    if not ok:
        return None
    inner = body.str.slice(len(_GJ_POINT_PRE), -2)
    # PER-ROW arity check: exactly one comma ⇒ exactly [x,y]. A batch
    # total alone lets a 3-float row and a 1-float row compensate each
    # other into two silently wrong points — elevation ([x,y,z]) and
    # short rows must fall back to the strict parser.
    if not (inner.str.count(",") == 1).all():
        return None
    joined = ",".join(inner.tolist())
    vals = np.fromstring(joined, dtype=float, sep=",")
    if len(vals) != 2 * len(body) or np.isnan(vals).any():
        return None
    xs = np.empty(len(s)); ys = np.empty(len(s))
    xs[~isnull] = vals[0::2]
    ys[~isnull] = vals[1::2]
    return _obj_series(vector.encode_points(xs, ys, valid=~isnull))


def _fast_lines_from_geojson(s: pd.Series) -> Optional[pd.Series]:
    """All-LineString batches with one shared vertex count."""
    isnull = s.isna().to_numpy()
    body = s.dropna()
    if len(body) == 0:
        return None
    ok = (body.str.startswith(_GJ_LINE_PRE) & body.str.endswith("]]}")).all()
    if not ok:
        return None
    raw = body.str.slice(len(_GJ_LINE_PRE), -3)
    # PER-ROW 2-D check: with m "],["-separated positions a 2-D row has
    # exactly 2m−1 commas; a 3-D row has 3m−1, which collides with some
    # 2-D comma count whenever m is even (3m−1 = 2k−1 ⇔ k = 3m/2) — so
    # comma totals alone would consume z values as the next point's x.
    npairs = raw.str.count(r"\],\[") + 1
    k = int(npairs.iloc[0])
    inner = raw.str.replace("],[", ",", regex=False)
    ncommas = inner.str.count(",")
    if k < 2 or not (npairs == k).all() \
            or not (ncommas == 2 * k - 1).all():
        return None
    joined = ",".join(inner.tolist())
    vals = np.fromstring(joined, dtype=float, sep=",")
    if len(vals) != 2 * k * len(body) or np.isnan(vals).any():
        return None
    coords = np.empty((len(s), k, 2))
    coords[~isnull] = vals.reshape(len(body), k, 2)
    return _obj_series(vector.encode_uniform_lines(coords, valid=~isnull))


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
        if srids is not None:
            r = _num(srids[i])
            if r is None:  # srid argument present but NULL → NULL row
                out.append(None)
                continue
        else:
            r = None
        g = from_wkb(bytes(v))
        if r is not None:
            g = g.with_srid(int(r))
        out.append(to_wkb(g))
    return _obj_series(out)


def geom_from_wkb_dialect(s: pd.Series, dialect: pd.Series,
                          srid: Optional[pd.Series] = None) -> pd.Series:
    """Foreign-dialect WKB ingest -> canonical (E)WKB. Accepts
    'wkb'/'ewkb'/'geopackage'/'mysql'/'spatialite', the reference's
    'tagged' storage form (1-byte dialect prefix,
    /root/reference/src/geo/dialect.rs:5-29), or 'auto' (framing sniff).
    The dialect argument is per-row (normally a literal column); the
    optional srid overrides the blob's SRID in the SAME crossing — no
    second decode pass."""
    from ..geo.dialect import from_dialect
    ds = dialect.tolist()
    srids = None if srid is None else srid.tolist()
    out = []
    for i, v in enumerate(s.tolist()):
        d = ds[i]
        if v is None or d is None:
            out.append(None)
            continue
        if srids is not None:
            r = _num(srids[i])
            if r is None:  # srid argument present but NULL → NULL row
                out.append(None)
                continue
        else:
            r = None
        g = from_dialect(bytes(v), str(d))
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
        a, b, c, d = (_num(xmin.iat[i]), _num(ymin.iat[i]),
                      _num(xmax.iat[i]), _num(ymax.iat[i]))
        r = _num(srids[i]) if srids is not None else None
        if a is None or b is None or c is None or d is None or \
                (srids is not None and r is None):
            out.append(None)
            continue
        g = Geometry.box(float(a), float(b), float(c), float(d),
                         srid=None if r is None else int(r))
        out.append(to_wkb(g))
    return _obj_series(out)


def st_point(x: pd.Series, y: pd.Series) -> pd.Series:
    """Fast 2-D point constructor (PostGIS ST_Point / ST_MakePoint) —
    fully vectorized numpy encode."""
    xs = pd.to_numeric(x, errors="coerce").to_numpy(float)
    ys = pd.to_numeric(y, errors="coerce").to_numpy(float)
    valid = ~(np.isnan(xs) | np.isnan(ys))
    return _obj_series(vector.encode_points(xs, ys, valid=valid))


# ------------------------------------------------------------ serializers

def _unary_to_str(fn: Callable[[Geometry], str], point_fast=None, line_fast=None):
    def k(s: pd.Series) -> pd.Series:
        vals = s.tolist()
        if point_fast is not None:
            pb = vector.decode_points(vals)
            if pb is not None:
                return _obj_series(point_fast(pb))
        if line_fast is not None:
            lb = vector.decode_uniform_lines(vals)
            if lb is not None:
                return _obj_series(line_fast(lb))
        cache = _DecodeCache()
        out = []
        memo: dict = {}
        for v in vals:
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


def _points_to_wkt(pb: vector.PointBatch) -> list:
    # POINT EMPTY travels as NaN coords with valid=True (e.g. centroid
    # of an empty geometry) — _fmt would raise on int(NaN)
    v = pb.valid
    return [("POINT EMPTY" if pb.x[i] != pb.x[i]
             else f"POINT({_fmt(pb.x[i])} {_fmt(pb.y[i])})") if v[i] else None
            for i in range(pb.n)]


def _lines_to_wkt(lb: vector.LineBatch) -> list:
    v = lb.valid
    c = lb.coords
    if lb.k == 0:   # a batch of empty linestrings (e.g. empty clips)
        return ["LINESTRING EMPTY" if v[i] else None for i in range(lb.n)]
    return ["LINESTRING(" + ",".join(
        f"{_fmt(c[i, j, 0])} {_fmt(c[i, j, 1])}" for j in range(lb.k)) + ")"
        if v[i] else None for i in range(lb.n)]


def _points_to_geojson(pb: vector.PointBatch) -> list:
    v = pb.valid
    return ['{"type":"Point","coordinates":[%s,%s]}' % (_fmt(pb.x[i]), _fmt(pb.y[i]))
            if v[i] else None for i in range(pb.n)]


# plain-WKB fast batches carry no SRID, so WKT == EWKT on them
as_text = _unary_to_str(to_wkt, _points_to_wkt, _lines_to_wkt)   # as_text.rs:88-110
as_ewkt = _unary_to_str(to_ewkt, _points_to_wkt, _lines_to_wkt)  # as_ewkt.rs:88-101


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


as_geojson = _unary_to_str(_geojson, _points_to_geojson)


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


def set_srid(s: pd.Series, srid_s: pd.Series) -> pd.Series:
    """ST_SetSRID: (re)stamp the EWKB header SRID per row — the writer
    twin of ST_SRID (/root/reference/src/function/srid.rs:46-67 reads
    the header; this rewrites it). PostGIS uses SRID 0 for "unknown";
    this engine's unknown is an absent EWKB flag, so srid NULL or <= 0
    clears the header (ST_SRID then returns NULL, the same contract the
    reference's header-less WKB produces)."""
    cache = _DecodeCache()
    out = []
    for v, r in zip(s.tolist(), srid_s.tolist()):
        if v is None:
            out.append(None)
            continue
        sr = None
        if r is not None and not (isinstance(r, float) and np.isnan(r)):
            sr = int(r)
            if sr <= 0:
                sr = None
        out.append(to_wkb(cache.geom(bytes(v)).with_srid(sr)))
    return _obj_series(out)


def area(s: pd.Series) -> pd.Series:
    """Planar area (PostGIS ST_Area; engine utility beyond the reference
    surface — shells minus holes, 0 for points/lines)."""
    cache = _DecodeCache()
    return _obj_series([
        None if v is None else algos.area(cache.geom(bytes(v)))
        for v in s.tolist()])


# ------------------------------------------------------------ bbox

def box2d_rows(s: pd.Series) -> pd.DataFrame:
    """Per-row bounding box -> DataFrame(xmin,ymin,xmax,ymax) backing the
    Box2D struct UDF (/root/reference/src/function/box2d.rs:46-77;
    struct layout /root/reference/src/geo/box.rs:11-16)."""
    vals = s.tolist()
    pb = vector.decode_points(vals)
    if pb is not None:
        x = _nullable(pb.x, pb.valid)
        y = _nullable(pb.y, pb.valid)
        return pd.DataFrame({"xmin": x, "ymin": y, "xmax": x, "ymax": y})
    lb = vector.decode_uniform_lines(vals)
    if lb is not None:
        xmin, ymin, xmax, ymax = vector.lines_bbox(lb)
        return pd.DataFrame({"xmin": _nullable(xmin, lb.valid),
                             "ymin": _nullable(ymin, lb.valid),
                             "xmax": _nullable(xmax, lb.valid),
                             "ymax": _nullable(ymax, lb.valid)})
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


def extent_array(s: pd.Series):
    """One group's extent as [xmin, ymin, xmax, ymax] (None for an
    all-null group) — the kernel behind the SQL-registered ST_Extent
    UDAF. Null geometries are skipped, not group-nulling, exactly like
    the reference accumulator (/root/reference/src/function/extent.rs:131-141)."""
    bb = box2d_rows(s)
    xmin = bb["xmin"].min()  # pandas min/max skip NaN/None
    if pd.isna(xmin):
        return None
    return [float(xmin), float(bb["ymin"].min()),
            float(bb["xmax"].max()), float(bb["ymax"].max())]


def geom_bbox_from_text(s: pd.Series) -> pd.DataFrame:
    """Fused constructor: WKT -> (geom WKB, xmin, ymin, xmax, ymax) in ONE
    Python crossing. The bbox recompute on the in-memory WKB is ~1/10 the
    cost of a second ArrowEvalPython stage round-tripping the geometry
    column (the plan-level alternative: ST_GeomFromText then Box2D = two
    chained-dependent pandas UDFs = two stages). This is the ingest shape
    for bbox-covering-column tables (cf. GeoParquet covering metadata) that
    spatial-join prefilters consume without touching the geometry blob."""
    g = geom_from_text(s)
    bb = box2d_rows(g)
    bb.insert(0, "geom", g)
    return bb


def point_bbox_from_xy(x: pd.Series, y: pd.Series) -> pd.DataFrame:
    """Fused point constructor: (x, y) -> (geom WKB, xmin, ymin, xmax,
    ymax) in ONE Python crossing — the POINT analogue of
    geom_bbox_from_text (a point's bbox IS its coordinate pair, so the
    bbox "recompute" is a column copy; box2d(st_point(x,y)) would be a
    SECOND chained ArrowEvalPython stage round-tripping the WKB).
    Null semantics match st_point then box2d: a NULL/NaN coordinate
    nulls geometry and bbox alike."""
    xs = pd.to_numeric(x, errors="coerce").to_numpy(float)
    ys = pd.to_numeric(y, errors="coerce").to_numpy(float)
    valid = ~(np.isnan(xs) | np.isnan(ys))
    return pd.DataFrame({
        "geom": vector.encode_points(xs, ys, valid=valid),
        "xmin": _nullable(xs, valid), "ymin": _nullable(ys, valid),
        "xmax": _nullable(xs, valid), "ymax": _nullable(ys, valid)})


def box_subdivide_stats(xmin: pd.Series, ymin: pd.Series,
                        xmax: pd.Series, ymax: pd.Series,
                        seg: pd.Series, maxv: pd.Series) -> pd.DataFrame:
    """Fused measure pipeline: ST_MakeEnvelope -> ST_Segmentize ->
    ST_Subdivide -> per-piece (ST_Area, ST_NPoints), in ONE Python
    crossing. The plan-level spelling is FIVE chained-dependent
    ArrowEvalPython stages, each round-tripping every intermediate
    polygon through WKB and the JVM (a 41-vertex segmentized envelope
    is ~670 WKB bytes x 2 codec passes per hop); fusing keeps the
    in-process ``Geometry`` alive across the whole chain and ships
    back only the per-piece scalars. Exactly the same kernels run in
    the same order (``Geometry.box`` / ``edit.segmentize`` /
    ``subdivide.subdivide`` / ``algos.area`` / vertex count), so every
    emitted value is byte-identical to the staged spelling — pinned by
    tests/test_subdivide.py. A NULL corner (or NULL seg/maxv) nulls the
    row, matching the staged chain's NULL propagation."""
    out_a: list = []
    out_n: list = []
    for i in range(len(xmin)):
        a, b = _num(xmin.iat[i]), _num(ymin.iat[i])
        c, d = _num(xmax.iat[i]), _num(ymax.iat[i])
        sg, mv = _num(seg.iat[i]), _num(maxv.iat[i])
        if None in (a, b, c, d, sg, mv):
            out_a.append(None)
            out_n.append(None)
            continue
        g = edit.segmentize(
            Geometry.box(float(a), float(b), float(c), float(d)),
            float(sg))
        pieces = subdivide_mod.subdivide(g, int(mv))
        out_a.append([algos.area(p) for p in pieces])
        out_n.append([len(p.vertices()) for p in pieces])
    return pd.DataFrame({"areas": _obj_series(out_a),
                         "npts": _obj_series(out_n)})


def wkt_roundtrip(s: pd.Series) -> pd.Series:
    """Fused ST_AsText(ST_GeomFromText(x)) — canonical-form WKT in ONE
    Python crossing. The plan-level alternative is two chained-dependent
    pandas UDFs (construct then serialize) = two ArrowEvalPython stages
    round-tripping the intermediate WKB through the JVM; fusing keeps the
    intermediate in-process (same rationale as geom_bbox_from_text).

    r11: an all-'POINT(x y)' batch additionally skips the WKB
    encode/decode hop entirely — the shared C-speed parse yields the
    coordinate arrays and the canonical string forms directly from
    them with the SAME ``_fmt`` the serializer uses (byte-identical
    output; parity-fuzzed in tests/test_geo_core.py). The fast parse
    rejects NaN/EMPTY/SRID, so the 'POINT EMPTY' branch of
    _points_to_wkt is unreachable here by construction."""
    parsed = _parse_points_fast(s)
    if parsed is _POINTS_ALLNULL:
        return _obj_series([None] * len(s))
    if parsed is not None:
        bx, by, isnull = parsed
        out = np.empty(len(s), dtype=object)
        out[~isnull] = [f"POINT({_fmt(x)} {_fmt(y)})"
                        for x, y in zip(bx, by)]
        return _obj_series(out)
    return as_text(geom_from_text(s))


def box2d_from_array(s: pd.Series) -> pd.DataFrame:
    """array<double>[4] -> Box2D struct rows; the SQL bridge back from
    ST_Extent's array encoding (grouped-agg pandas UDFs cannot return
    StructType) to the reference's Box2d struct
    (/root/reference/src/geo/box.rs:11-16)."""
    cols = {k: [] for k in ("xmin", "ymin", "xmax", "ymax")}
    for v in s.tolist():
        ok = v is not None and len(v) == 4
        for i, k in enumerate(cols):
            cols[k].append(float(v[i]) if ok else None)
    return pd.DataFrame(cols)


# ------------------------------------------------------------ predicates

def _pred_const_vs_points(fn_name: str, g: Geometry,
                          pb: "vector.PointBatch", g_is_left: bool):
    """Vectorized predicate between a constant geometry and a point
    batch. Returns a bool ndarray or None when unsupported.

    For point arguments every supported predicate reduces to membership:
    intersects(pt, G) == covers(G, pt) == covered_by(pt, G) ==
    "pt is on/in G" (boundary inclusive); equals needs G to be a point."""
    if g.typ == "Point":
        if g.parts is None:
            return None
        px, py = g.parts
        return vector.points_equal_xy(pb, px, py)
    membership_ok = (
        (fn_name == "intersects")
        or (fn_name == "covers" and g_is_left)       # G covers pt
        or (fn_name == "covered_by" and not g_is_left))  # pt covered_by G
    if not membership_ok:
        return None
    if g.typ == "Polygon" and len(g.parts) == 1:
        return vector.points_in_ring(pb, g.parts[0])
    if g.typ == "LineString":
        # membership of many points on one small line: few segments
        out = None
        import numpy as _np
        for i in range(len(g.parts) - 1):
            (ax, ay), (bx, by) = g.parts[i], g.parts[i + 1]
            scale = 1.0 + _np.abs(pb.x) + _np.abs(pb.y)
            cross = (bx - ax) * (pb.y - ay) - (by - ay) * (pb.x - ax)
            on = ((_np.abs(cross) <= vector.EPS * scale)
                  & (pb.x >= min(ax, bx) - vector.EPS)
                  & (pb.x <= max(ax, bx) + vector.EPS)
                  & (pb.y >= min(ay, by) - vector.EPS)
                  & (pb.y <= max(ay, by) + vector.EPS))
            out = on if out is None else (out | on)
        return out
    return None


def _box_class_fast(fn, al: list, bl: list):
    """Rectangle-pair class-memo fast path shared by the binary
    predicates and the relate family: when BOTH batches decode as
    uniform axis-aligned rectangles, any point-set function of the pair
    is constant within a (Allen-x, Allen-y) interval-relation class
    (vector.box_pair_classes), so ``fn`` runs once per distinct class —
    on the first actual pair of that class, so the result is the
    generic path's own answer — instead of once per distinct pair
    (≤ 169 evaluations per batch vs ~batch-size). Returns an object
    list, or None when the batches are not rectangle-shaped."""
    ba = vector.decode_boxes(al)
    if ba is None:
        return None
    bb = vector.decode_boxes(bl)
    if bb is None:
        return None
    code = vector.box_pair_classes(ba, bb)
    out = np.full(len(al), None, dtype=object)
    idx = np.flatnonzero(code >= 0)
    if len(idx):
        uniq, first, inv = np.unique(code[idx], return_index=True,
                                     return_inverse=True)
        reps = []
        for f in first:
            i = idx[f]
            reps.append(fn(from_wkb(bytes(al[i])), from_wkb(bytes(bl[i]))))
        out[idx] = np.array(reps, dtype=object)[inv]
    return list(out)


def _binary_pred(fn: Callable[[Geometry, Geometry], bool], fn_name: str):
    def k(a: pd.Series, b: pd.Series) -> pd.Series:
        al, bl = a.tolist(), b.tolist()

        # ---- vectorized fast paths --------------------------------
        ga = _const_geom(al) if len(al) else None
        gb = _const_geom(bl) if len(bl) else None
        pa = vector.decode_points(al) if ga is None else None
        pbb = vector.decode_points(bl) if gb is None else None

        fastres = None
        valid = None
        if gb is not None and pa is not None:
            fastres = _pred_const_vs_points(fn_name, gb, pa, g_is_left=False)
            valid = pa.valid & np.array([v is not None for v in bl])
        elif ga is not None and pbb is not None:
            fastres = _pred_const_vs_points(fn_name, ga, pbb, g_is_left=True)
            valid = pbb.valid & np.array([v is not None for v in al])
        elif pa is not None and pbb is not None and fn_name in ("intersects", "equals"):
            fastres = ((np.abs(pa.x - pbb.x) <= vector.EPS)
                       & (np.abs(pa.y - pbb.y) <= vector.EPS))
            if fn_name == "equals":
                # POINT EMPTY ≡ POINT EMPTY (NaN coords): the object path
                # (algos.equals) returns True for two empties; the NaN
                # comparison above yields False — align the fast path.
                both_empty = (np.isnan(pa.x) & np.isnan(pa.y)
                              & np.isnan(pbb.x) & np.isnan(pbb.y))
                fastres = fastres | both_empty
            valid = pa.valid & pbb.valid
        elif gb is not None and gb.typ == "Point" and fn_name == "intersects":
            la = vector.decode_uniform_lines(al)
            if la is not None and gb.parts is not None:
                fastres = vector.point_on_uniform_lines(la, *gb.parts)
                valid = la.valid & np.array([v is not None for v in bl])
        elif ga is not None and ga.typ == "Point" and fn_name == "intersects":
            lb_ = vector.decode_uniform_lines(bl)
            if lb_ is not None and ga.parts is not None:
                fastres = vector.point_on_uniform_lines(lb_, *ga.parts)
                valid = lb_.valid & np.array([v is not None for v in al])
        elif ga is None and gb is None and fn_name == "intersects":
            # line×line pairs (the big×big spatial-join hot path)
            la_ = vector.decode_uniform_lines(al)
            lb2 = vector.decode_uniform_lines(bl) if la_ is not None else None
            if la_ is not None and lb2 is not None:
                fastres = vector.lines_intersect_lines(la_, lb2)
                valid = la_.valid & lb2.valid
        if fastres is not None:
            return _bool_nullable(fastres, valid)
        if ga is None and gb is None and pa is None and pbb is None:
            # rectangle×rectangle batches: one evaluation per interval-
            # relation class instead of per distinct pair
            bres = _box_class_fast(lambda x, y: bool(fn(x, y)), al, bl)
            if bres is not None:
                return _obj_series(bres)

        # ---- object fallback --------------------------------------
        cache = _DecodeCache()
        out = []
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


intersects = _binary_pred(algos.intersects, "intersects")    # intersects.rs:100-132
covers = _binary_pred(algos.covers, "covers")                # covers.rs:103-122
covered_by = _binary_pred(algos.covered_by, "covered_by")    # covered_by.rs:102-121


def disjoint(a: pd.Series, b: pd.Series) -> pd.Series:
    """ST_Disjoint (PostGIS; beyond-reference utility) — the exact
    negation of intersects, sharing all of its vectorized fast paths."""
    out = intersects(a, b)
    return _obj_series([None if v is None else not v for v in out.tolist()])
equals = _binary_pred(algos.equals, "equals")                # equals.rs:103-122


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
    vals = s.tolist()
    dxa = pd.to_numeric(dx, errors="coerce").to_numpy(float)
    dya = pd.to_numeric(dy, errors="coerce").to_numpy(float)
    off_ok = ~(np.isnan(dxa) | np.isnan(dya))
    pb = vector.decode_points(vals)
    if pb is not None:
        valid = pb.valid & off_ok
        return _obj_series(vector.encode_points(pb.x + dxa, pb.y + dya,
                                                valid=valid))
    lb = vector.decode_uniform_lines(vals)
    if lb is not None:
        valid = lb.valid & off_ok
        c = lb.coords + np.stack([dxa, dya], axis=1)[:, None, :]
        return _obj_series(vector.encode_uniform_lines(c, valid=valid))
    cache = _DecodeCache()
    out = []
    sl, dxl, dyl = s.tolist(), dx.tolist(), dy.tolist()
    for i in range(len(sl)):
        v, ox, oy = sl[i], _num(dxl[i]), _num(dyl[i])
        if v is None or ox is None or oy is None:
            out.append(None)
            continue
        g = cache.geom(bytes(v))
        out.append(to_wkb(g.translate(float(ox), float(oy))))
    return _obj_series(out)


def buffer(s: pd.Series, width: pd.Series, quadsegs: pd.Series) -> pd.Series:
    """ST_Buffer (/root/reference/src/function/buffer.rs:86-104)."""
    cache = _DecodeCache()
    out = []
    sl, wl, ql = s.tolist(), width.tolist(), quadsegs.tolist()
    for i in range(len(sl)):
        v, w, q = sl[i], _num(wl[i]), _num(ql[i])
        if v is None or w is None or q is None:
            out.append(None)
            continue
        g = cache.geom(bytes(v))
        out.append(to_wkb(algos.buffer(g, float(w), int(q))))
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
        a, b2, c, d = (_num(xmin.iat[i]), _num(ymin.iat[i]),
                       _num(xmax.iat[i]), _num(ymax.iat[i]))
        if v is None or a is None or b2 is None or c is None or d is None:
            out.append(None)
            continue
        g = cache.geom(bytes(v))
        out.append(to_wkb(algos.as_mvt_geom(
            g, float(a), float(b2), float(c), float(d))))
    return _obj_series(out)


# ------------------------------------------- measures (beyond-reference)

def length(s: pd.Series) -> pd.Series:
    """ST_Length (PostGIS; beyond-reference utility — line length, 0 for
    points/polygons)."""
    cache = _DecodeCache()
    return _obj_series([
        None if v is None else algos.length(cache.geom(bytes(v)))
        for v in s.tolist()])


def perimeter(s: pd.Series) -> pd.Series:
    """ST_Perimeter (PostGIS; beyond-reference utility — polygon ring
    length incl. holes, 0 for points/lines)."""
    cache = _DecodeCache()
    return _obj_series([
        None if v is None else algos.perimeter(cache.geom(bytes(v)))
        for v in s.tolist()])


centroid = _unary_geom(algos.centroid)        # PostGIS ST_Centroid
convex_hull = _unary_geom(algos.convex_hull)  # PostGIS ST_ConvexHull
envelope = _unary_geom(algos.envelope)        # PostGIS ST_Envelope


def _geom_num_kernel(fn):
    """Factory for (wkb, numeric) -> scalar/wkb kernels: decode cache,
    null-in/null-out, (bytes, value) result memo — ONE definition for
    the geohash / interpolate / simplify family."""
    def k(s: pd.Series, n: pd.Series) -> pd.Series:
        cache = _DecodeCache()
        out = []
        sl, nl = s.tolist(), n.tolist()
        memo: dict = {}
        for i in range(len(sl)):
            v, x = sl[i], _num(nl[i])
            if v is None or x is None:
                out.append(None)
                continue
            v = bytes(v)
            key = (v, float(x))
            if key not in memo:
                memo[key] = fn(cache.geom(v), x)
            out.append(memo[key])
        return _obj_series(out)
    return k


def _geom_num_num_kernel(fn):
    """Factory for (wkb, numeric, numeric) -> wkb/scalar kernels —
    the 2-parameter twin of _geom_num_kernel (scale / line-substring
    family)."""
    def k(s: pd.Series, n1: pd.Series, n2: pd.Series) -> pd.Series:
        cache = _DecodeCache()
        out = []
        sl, l1, l2 = s.tolist(), n1.tolist(), n2.tolist()
        memo: dict = {}
        for i in range(len(sl)):
            v, x, y = sl[i], _num(l1[i]), _num(l2[i])
            if v is None or x is None or y is None:
                out.append(None)
                continue
            v = bytes(v)
            x, y = float(x), float(y)   # SQL DECIMAL literals
            key = (v, x, y)
            if key not in memo:
                memo[key] = fn(cache.geom(v), x, y)
            out.append(memo[key])
        return _obj_series(out)
    return k


def to_wkb_opt(g):
    """to_wkb that passes None through (kernels whose algorithm can
    itself return NULL, e.g. line_substring on a non-line)."""
    return None if g is None else to_wkb(g)


def _geom_geom_scalar_kernel(fn, box_class: bool = False):
    """Factory for (wkb, wkb) -> scalar kernels with pair memoization
    (azimuth / line-locate family). ``box_class=True`` opts a kernel
    whose result is a pure point-set function of the pair (the
    contains/touches/overlaps/relate family — NOT coordinate-dependent
    kernels like azimuth/closest_point) into the rectangle class-memo
    fast path (_box_class_fast)."""
    def k(a: pd.Series, b: pd.Series) -> pd.Series:
        al, bl = a.tolist(), b.tolist()
        if box_class:
            bres = _box_class_fast(fn, al, bl)
            if bres is not None:
                return _obj_series(bres)
        cache = _DecodeCache()
        out = []
        memo: dict = {}
        for i in range(len(al)):
            va, vb = al[i], bl[i]
            if va is None or vb is None:
                out.append(None)
                continue
            va, vb = bytes(va), bytes(vb)
            key = (va, vb)
            if key not in memo:
                memo[key] = fn(cache.geom(va), cache.geom(vb))
            out.append(memo[key])
        return _obj_series(out)
    return k


def st_geohash(s: pd.Series, prec: Optional[pd.Series] = None) -> pd.Series:
    """ST_GeoHash (PostGIS; beyond-reference utility). The optional
    precision follows PostGIS: omitted or <= 0 means full precision."""
    if prec is None:
        prec = pd.Series([0] * len(s))
    return _geom_num_kernel(lambda g, p_: algos.geohash(g, int(p_)))(s, prec)


st_azimuth = _geom_geom_scalar_kernel(algos.azimuth)     # PostGIS ST_Azimuth
closest_point = _geom_geom_scalar_kernel(
    lambda a, b: to_wkb(algos.closest_point(a, b)))      # ST_ClosestPoint

# topological predicates beyond the covers family (geo/relate.py;
# PostGIS ST_Contains/Within/Touches/Overlaps/Crosses)
st_contains = _geom_geom_scalar_kernel(relate.contains, box_class=True)
st_within = _geom_geom_scalar_kernel(relate.within, box_class=True)
st_touches = _geom_geom_scalar_kernel(relate.touches, box_class=True)
st_overlaps = _geom_geom_scalar_kernel(relate.overlaps, box_class=True)
st_crosses = _geom_geom_scalar_kernel(relate.crosses, box_class=True)

# full DE-9IM matrix (geo/de9im.py; PostGIS ST_Relate / ST_RelateMatch;
# beyond the reference's covers/intersects/equals predicate surface)
st_relate = _geom_geom_scalar_kernel(de9im.relate, box_class=True)


def st_relate_pattern(a: pd.Series, b: pd.Series,
                      pat: pd.Series) -> pd.Series:
    """ST_Relate(a, b, pattern) — matrix computed once per distinct
    geometry pair, then tested against the row's pattern."""
    al, bl, pl = a.tolist(), b.tolist(), pat.tolist()
    cache = _DecodeCache()
    memo: dict = {}
    out = []
    for i in range(len(al)):
        va, vb, p = al[i], bl[i], pl[i]
        if va is None or vb is None or p is None:
            out.append(None)
            continue
        va, vb = bytes(va), bytes(vb)
        key = (va, vb)
        if key not in memo:
            memo[key] = de9im.relate(cache.geom(va), cache.geom(vb))
        out.append(de9im.relate_match(memo[key], str(p)))
    return _obj_series(out)


def st_relate_match(m: pd.Series, p: pd.Series) -> pd.Series:
    """ST_RelateMatch — pure string matrix-vs-pattern test."""
    out = [None if (mv is None or pv is None)
           else de9im.relate_match(str(mv), str(pv))
           for mv, pv in zip(m.tolist(), p.tolist())]
    return _obj_series(out)


# set operations (geo/overlay.py boundary-classification overlay;
# beyond-reference — PostGIS ST_Intersection/ST_Union/ST_Difference)
_geom_intersection_obj = _geom_geom_scalar_kernel(
    lambda a, b: to_wkb(overlay.intersection(a, b)))

_POLY_EMPTY_WKB = b"\x01\x03\x00\x00\x00\x00\x00\x00\x00"


def geom_intersection(a: pd.Series, b: pd.Series) -> pd.Series:
    """ST_Intersection with a vectorized rectangle×rectangle fast path:
    the intersection of two axis-aligned rectangles is the clamped
    coordinate-interval product — a rectangle in the overlay's
    canonical ring layout (min-corner start, CCW; every boundary node
    of the result is one of its corners because each clamp bound
    dominates the interior candidates), or POLYGON EMPTY when the
    interval product is empty or degenerate (dimensional collapse —
    same rule as the generic overlay). Byte parity with the object
    path is fuzz-pinned (tests/test_setops.py)."""
    al, bl = a.tolist(), b.tolist()
    ba = vector.decode_boxes(al)
    bb = vector.decode_boxes(bl) if ba is not None else None
    if ba is None or bb is None:
        return _geom_intersection_obj(a, b)
    valid = ba.valid & bb.valid
    ix0 = np.maximum(ba.x0, bb.x0)
    iy0 = np.maximum(ba.y0, bb.y0)
    ix1 = np.minimum(ba.x1, bb.x1)
    iy1 = np.minimum(ba.y1, bb.y1)
    pos = valid & (ix0 < ix1) & (iy0 < iy1)
    rects = vector.encode_boxes(ix0, iy0, ix1, iy1, valid=pos)
    out = [rects[i] if pos[i] else (_POLY_EMPTY_WKB if valid[i] else None)
           for i in range(len(al))]
    return _obj_series(out)
geom_union = _geom_geom_scalar_kernel(
    lambda a, b: to_wkb(overlay.union(a, b)))
geom_difference = _geom_geom_scalar_kernel(
    lambda a, b: to_wkb(overlay.difference(a, b)))


def st_union_all(s: pd.Series) -> pd.Series:
    """Fold overlay.union_all over an array<binary> column (the
    collect_list side of the ST_Union aggregate): one fold per row —
    rows are GROUPS, so the quadratic-ish fold is bounded by group
    size, never the corpus."""
    cache = _DecodeCache()
    out = []
    for arr in s.tolist():
        if arr is None:
            out.append(None)
            continue
        gs = [cache.geom(bytes(w)) for w in arr if w is not None]
        u = overlay.union_all(gs)
        out.append(None if u is None else to_wkb(u))
    return _obj_series(out)
line_locate_point = _geom_geom_scalar_kernel(
    algos.line_locate_point)                             # ST_LineLocatePoint
line_interpolate_point = _geom_num_kernel(
    lambda g, f: to_wkb(algos.line_interpolate_point(g, float(f))))


# ST_Simplify (PostGIS Douglas-Peucker, non-topology-preserving)
simplify = _geom_num_kernel(
    lambda g, t: to_wkb(algos.simplify(g, float(t))))

# editing utilities (geo/edit.py; PostGIS parity, beyond-reference)
st_reverse = _unary_geom(edit.reverse)
st_flip_coordinates = _unary_geom(edit.flip_coordinates)
st_scale2 = _geom_num_num_kernel(
    lambda g, sx, sy: to_wkb(edit.scale(g, sx, sy)))
st_segmentize = _geom_num_kernel(
    lambda g, m: to_wkb(edit.segmentize(g, float(m))))
st_line_substring = _geom_num_num_kernel(
    lambda g, s_, e_: to_wkb_opt(edit.line_substring(g, s_, e_)))
st_reduce_precision = _geom_num_kernel(
    lambda g, gs: to_wkb(edit.reduce_precision(g, float(gs))))
st_chaikin_smoothing = _geom_num_kernel(
    lambda g, n: to_wkb(edit.chaikin_smoothing(g, int(n))))
st_simplify_vw = _geom_num_kernel(
    lambda g, t: to_wkb(edit.simplify_vw(g, float(t))))
st_line_merge = _unary_geom(edit.line_merge)
st_subdivide = _geom_num_kernel(
    lambda g, m: [to_wkb(p) for p in subdivide_mod.subdivide(g, int(m))])
st_polygonize = _unary_geom(
    lambda g: polygonize_mod.polygonize([g]))


def _mbc_center(g: Geometry) -> Geometry:
    mbc = bounding.min_bounding_circle(g)
    if mbc is None:
        return Geometry("Point", None, g.srid)
    return Geometry("Point", mbc[0], g.srid)


st_minbound_center = _unary_geom(_mbc_center)
st_node = _unary_geom(noding.node_geometry)
st_shortest_line = _geom_geom_scalar_kernel(
    lambda a, b: to_wkb_opt(algos.shortest_line(a, b)))
st_project = _geom_num_num_kernel(
    lambda g, d_, az_: to_wkb_opt(algos.project_point(g, d_, az_)))
st_make_valid = _unary_geom(noding.make_valid)
st_oriented_envelope = _unary_geom(bounding.oriented_envelope)


def st_polygonize_all(s: pd.Series) -> pd.Series:
    """Polygonize an array<binary> column (the collect_list side of the
    ST_Polygonize AGGREGATE): one face assembly per row — rows are
    GROUPS, so the planar walk is bounded by group linework, never the
    corpus."""
    cache = _DecodeCache()
    out = []
    for arr in s.tolist():
        if arr is None:
            out.append(None)
            continue
        gs = [cache.geom(bytes(w)) for w in arr if w is not None]
        out.append(to_wkb(polygonize_mod.polygonize(gs)))
    return _obj_series(out)
geom_symdifference = _geom_geom_scalar_kernel(
    lambda a, b: to_wkb(overlay.symdifference(a, b)))


def st_rotate(s: pd.Series, angle: pd.Series,
              x0: Optional[pd.Series] = None,
              y0: Optional[pd.Series] = None) -> pd.Series:
    """ST_Rotate(geom, radians[, x0, y0]) — CCW about (x0, y0), origin
    by default (PostGIS)."""
    if x0 is None:
        x0 = pd.Series([0.0] * len(s))
    if y0 is None:
        y0 = pd.Series([0.0] * len(s))
    cache = _DecodeCache()
    out = []
    al, an, xl, yl = s.tolist(), angle.tolist(), x0.tolist(), y0.tolist()
    memo: dict = {}
    for i in range(len(al)):
        v = al[i]
        ang, ox, oy = _num(an[i]), _num(xl[i]), _num(yl[i])
        if v is None or ang is None or ox is None or oy is None:
            out.append(None)
            continue
        # SQL DECIMAL literals reach pandas as decimal.Decimal
        ang, ox, oy = float(ang), float(ox), float(oy)
        key = (bytes(v), ang, ox, oy)
        if key not in memo:
            memo[key] = to_wkb(edit.rotate(cache.geom(bytes(v)),
                                           ang, ox, oy))
        out.append(memo[key])
    return _obj_series(out)
def _dist_points_to_const(pb: "vector.PointBatch", g) -> np.ndarray:
    """Vectorized distance from a point batch to one constant geometry:
    numpy point-to-segment over the constant's few edges, then zero out
    points lying inside polygon parts (shell minus holes)."""
    best = np.full(pb.n, np.inf)
    for (a, b) in algos._all_segments(g):
        vx, vy = b[0] - a[0], b[1] - a[1]
        l2 = vx * vx + vy * vy
        # sqrt(dx*dx+dy*dy), NOT np.hypot: hypot's rescaling differs
        # from plain sqrt by an ulp on ~0.6% of integer-grid inputs,
        # which would break exact-oracle reproducibility; coordinates
        # here are far from the overflow range hypot guards against
        if l2 <= 0.0:
            dx0, dy0 = pb.x - a[0], pb.y - a[1]
            d = np.sqrt(dx0 * dx0 + dy0 * dy0)
        else:
            t = np.clip(((pb.x - a[0]) * vx + (pb.y - a[1]) * vy) / l2,
                        0.0, 1.0)
            dx0, dy0 = pb.x - (a[0] + t * vx), pb.y - (a[1] + t * vy)
            d = np.sqrt(dx0 * dx0 + dy0 * dy0)
        np.minimum(best, d, out=best)
    for part in g.geometries():
        if part.typ == "Polygon" and part.parts:
            inside = vector.points_in_ring(pb, part.parts[0])
            for hole in part.parts[1:]:
                # hole interior is outside the polygon; hole BOUNDARY
                # points already have best == 0 from the edge loop
                inside &= ~vector.points_in_ring(pb, hole)
            best[inside] = 0.0
    return best


def _distance_fast(al: list, bl: list) -> Optional[pd.Series]:
    """Vectorized distance cases shared by distance() and dwithin():
    point×point pairs (pure numpy) and point-column × constant geometry
    (numpy per-edge loop). None when neither applies."""
    pa = vector.decode_points(al)
    pbb = vector.decode_points(bl)
    if pa is not None and pbb is not None:
        dx0, dy0 = pa.x - pbb.x, pa.y - pbb.y
        d = np.sqrt(dx0 * dx0 + dy0 * dy0)  # sqrt-form: see _dist_points_to_const
        # POINT EMPTY decodes as NaN coords with valid=True; PostGIS
        # returns NULL for any empty operand
        ok = pa.valid & pbb.valid & ~(np.isnan(pa.x) | np.isnan(pbb.x))
        return pd.Series(_nullable(d, ok))
    ga = _const_geom(al)
    gb = _const_geom(bl)
    # a constant with NO segments (e.g. a collection of only-empty
    # members: not is_empty(), yet edgeless) must fall through to the
    # object path, which returns the NULL the contract requires —
    # the per-edge loop would leave the distance at +inf
    if gb is not None and pa is not None and not gb.is_empty() \
            and algos._all_segments(gb):
        d = _dist_points_to_const(pa, gb)
        ok = pa.valid & ~np.isnan(pa.x) & np.array([v is not None for v in bl])
        return pd.Series(_nullable(d, ok))
    if ga is not None and pbb is not None and not ga.is_empty() \
            and algos._all_segments(ga):
        d = _dist_points_to_const(pbb, ga)
        ok = pbb.valid & ~np.isnan(pbb.x) & np.array([v is not None for v in al])
        return pd.Series(_nullable(d, ok))
    return None


def distance(a: pd.Series, b: pd.Series) -> pd.Series:
    """ST_Distance (PostGIS; beyond-reference utility). Vectorized fast
    paths (_distance_fast); object fallback with decode+result
    memoization otherwise."""
    al, bl = a.tolist(), b.tolist()
    fast = _distance_fast(al, bl)
    if fast is not None:
        return fast
    cache = _DecodeCache()
    out = []
    memo: dict = {}
    for i in range(len(al)):
        va, vb = al[i], bl[i]
        if va is None or vb is None:
            out.append(None)
            continue
        va, vb = bytes(va), bytes(vb)
        key = (va, vb)
        if key not in memo:
            memo[key] = algos.distance(cache.geom(va), cache.geom(vb))
        out.append(memo[key])
    return _obj_series(out)


def dwithin(a: pd.Series, b: pd.Series, d: pd.Series) -> pd.Series:
    """ST_DWithin (PostGIS; beyond-reference utility): vectorized
    distance fast paths when they apply; otherwise the object path goes
    through algos.dwithin, whose bbox band rejection answers the common
    far-apart negative without the pairwise segment loop."""
    al, bl, dl = a.tolist(), b.tolist(), d.tolist()
    fast = _distance_fast(al, bl)
    if fast is not None:
        out = []
        for i, v in enumerate(fast.tolist()):
            v = _num(v)
            lim = _num(dl[i])
            if v is None or lim is None:
                out.append(None)
            else:
                out.append(bool(v <= float(lim)))
        return _obj_series(out)
    cache = _DecodeCache()
    out = []
    memo: dict = {}
    for i in range(len(al)):
        va, vb, lim = al[i], bl[i], _num(dl[i])
        if va is None or vb is None or lim is None:
            out.append(None)
            continue
        va, vb = bytes(va), bytes(vb)
        key = (va, vb, float(lim))
        if key not in memo:
            memo[key] = algos.dwithin(cache.geom(va), cache.geom(vb),
                                      float(lim))
        out.append(memo[key])
    return _obj_series(out)


def transform_srid(s: pd.Series, to_srid: pd.Series,
                   from_srid: Optional[pd.Series] = None) -> pd.Series:
    """ST_Transform for the closed-form CRSs (geo/proj.py): 4326<->3857,
    4326<->UTM 326xx/327xx (Krüger series), and every proj.CRS_REGISTRY
    code (LCC 2SP / Albers / generic TM, optional Helmert datum shift),
    with projected->projected routed through the 4326 hub; PostGIS
    semantics — source SRID from the EWKB header unless from_srid is
    given.
    Vectorized numpy fast path for uniform plain-WKB point batches on
    the 4326->3857 pair with an explicit constant from_srid; object
    fallback with decode+result memoization otherwise (UTM pairs take
    the memoized path)."""
    from ..geo import proj
    tl = to_srid.tolist()
    fl = from_srid.tolist() if from_srid is not None else None
    vals = s.tolist()
    if fl is not None and len(vals):
        t0 = _num(tl[0])
        f0 = _num(fl[0])
        const_pair = (t0 is not None and f0 is not None
                      and all(_num(v) == t0 for v in tl)
                      and all(_num(v) == f0 for v in fl))
        if const_pair and (int(f0), int(t0)) == (proj.SRID_LONLAT,
                                                 proj.SRID_MERCATOR):
            pb = vector.decode_points(vals)
            if pb is not None and np.all(
                    (np.abs(pb.y[pb.valid]) < 90.0)
                    | np.isnan(pb.y[pb.valid])):
                # errstate: invalid slots may hold garbage coords
                with np.errstate(all="ignore"):
                    x = proj.R_MAJOR * (pb.x * proj.DEG2RAD)
                    y = proj.R_MAJOR * np.log(np.tan(
                        proj.PI_4 + (pb.y * proj.DEG2RAD) * 0.5))
                return _obj_series(vector.encode_points(
                    x, y, valid=pb.valid, srid=int(t0)))
        if const_pair:
            # registry-CRS batch fast paths (numpy twins of the
            # scalar Snyder chains, geo/proj.py *_np): 4326 -> CRS
            # forward and CRS -> 4326 inverse over uniform point
            # batches — the map-only 100 TB shape for state plane /
            # Albers / national-grid reprojection
            f0i, t0i = int(f0), int(t0)
            crs_f = (proj.CRS_REGISTRY.get(t0i)
                     if f0i == proj.SRID_LONLAT else None)
            crs_i = (proj.CRS_REGISTRY.get(f0i)
                     if t0i == proj.SRID_LONLAT else None)
            if crs_f is not None or crs_i is not None:
                pb = vector.decode_points(vals)
                ok = pb is not None and (
                    crs_i is not None
                    or np.all((np.abs(pb.y[pb.valid]) < 90.0)
                              | np.isnan(pb.y[pb.valid])))
                if ok:
                    with np.errstate(all="ignore"):
                        if crs_f is not None:
                            x, y = crs_f.forward_np(pb.x, pb.y)
                        else:
                            x, y = crs_i.inverse_np(pb.x, pb.y)
                    return _obj_series(vector.encode_points(
                        x, y, valid=pb.valid, srid=t0i))
                # uniform plain-WKB LINESTRING batches (trajectories):
                # the *_np twins are elementwise, so the (n, k) vertex
                # matrices flow straight through
                lb = vector.decode_uniform_lines(vals)
                if lb is not None:
                    lx = lb.coords[:, :, 0]
                    ly = lb.coords[:, :, 1]
                    ok = (crs_i is not None
                          or np.all((np.abs(ly[lb.valid]) < 90.0)
                                    | np.isnan(ly[lb.valid])))
                    if ok:
                        with np.errstate(all="ignore"):
                            if crs_f is not None:
                                x, y = crs_f.forward_np(lx, ly)
                            else:
                                x, y = crs_i.inverse_np(lx, ly)
                        return _obj_series(vector.encode_uniform_lines(
                            np.stack([x, y], axis=-1),
                            valid=lb.valid, srid=t0i))
    cache = _DecodeCache()
    out = []
    memo: dict = {}
    for i, v in enumerate(vals):
        t = _num(tl[i])
        f = _num(fl[i]) if fl is not None else None
        if v is None or t is None or (fl is not None and f is None):
            out.append(None)
            continue
        v = bytes(v)
        key = (v, t, f)
        if key not in memo:
            memo[key] = to_wkb(proj.transform_geometry(
                cache.geom(v), int(t),
                None if f is None else int(f)))
        out.append(memo[key])
    return _obj_series(out)


# ------------------------------------------- accessors (beyond-reference)

def _unary_to_num(fn):
    def k(s: pd.Series) -> pd.Series:
        cache = _DecodeCache()
        return _obj_series([
            None if v is None else fn(cache.geom(bytes(v)))
            for v in s.tolist()])
    return k


def _pt_x(g) -> Optional[float]:
    if g.typ != "Point" or g.parts is None:
        return None
    return float(g.parts[0])


def _pt_y(g) -> Optional[float]:
    if g.typ != "Point" or g.parts is None:
        return None
    return float(g.parts[1])


def st_x(s: pd.Series) -> pd.Series:
    """ST_X (PostGIS): x of a POINT; NULL for empty/non-point.
    Vectorized for uniform point batches."""
    pb = vector.decode_points(s.tolist())
    if pb is not None:
        return pd.Series(_nullable(pb.x, pb.valid & ~np.isnan(pb.x)))
    return _unary_to_num(_pt_x)(s)


def st_y(s: pd.Series) -> pd.Series:
    """ST_Y (PostGIS): y of a POINT; NULL for empty/non-point."""
    pb = vector.decode_points(s.tolist())
    if pb is not None:
        return pd.Series(_nullable(pb.y, pb.valid & ~np.isnan(pb.y)))
    return _unary_to_num(_pt_y)(s)


def _mbc_radius(g: Geometry) -> Optional[float]:
    mbc = bounding.min_bounding_circle(g)
    return None if mbc is None else float(mbc[1])


def st_minbound_radius(s: pd.Series) -> pd.Series:
    """ST_MinimumBoundingRadius's radius field (PostGIS returns a
    record; the center half is st_minbound_center)."""
    return _unary_to_num(_mbc_radius)(s)


def _direct_members(g: Geometry) -> list:
    """DIRECT members of a geometry — what ST_NumGeometries counts and
    ST_GeometryN indexes (PostGIS): the geometry itself for simple
    types, one level of members for multi/collection. NOT the recursive
    flattening of Geometry.geometries() — a GeometryCollection holding a
    MultiPoint has 2 members, not 1-per-point."""
    if g.typ in ("Point", "LineString", "Polygon"):
        return [] if g.is_empty() else [g]
    if g.typ == "GeometryCollection":
        return list(g.parts)
    if g.typ == "MultiPoint":
        return [Geometry("Point", c, g.srid) for c in g.parts]
    if g.typ == "MultiLineString":
        return [Geometry("LineString", line, g.srid) for line in g.parts]
    return [Geometry("Polygon", poly, g.srid) for poly in g.parts]


def num_geometries(s: pd.Series) -> pd.Series:
    """ST_NumGeometries (PostGIS): direct-member count — 1 for simple
    non-empty geometries, len for multi/collection, 0 for empty."""
    return _unary_to_num(lambda g: len(_direct_members(g)))(s)


def geometry_n(s: pd.Series, n: pd.Series) -> pd.Series:
    """ST_GeometryN (PostGIS, 1-based): nth DIRECT member of a multi/
    collection; the geometry itself for n=1 on a simple type; NULL out
    of range."""
    cache = _DecodeCache()
    out = []
    sl, nl = s.tolist(), n.tolist()
    for i in range(len(sl)):
        v, k = sl[i], _num(nl[i])
        if v is None or k is None:
            out.append(None)
            continue
        g = cache.geom(bytes(v))
        k = int(k)
        members = _direct_members(g)
        if 1 <= k <= len(members):
            out.append(to_wkb(members[k - 1].with_srid(g.srid)))
        else:
            out.append(None)
    return _obj_series(out)


def point_n(s: pd.Series, n: pd.Series) -> pd.Series:
    """ST_PointN (PostGIS, 1-based; negative counts from the end):
    nth vertex of a LINESTRING; NULL otherwise / out of range."""
    cache = _DecodeCache()
    out = []
    sl, nl = s.tolist(), n.tolist()
    for i in range(len(sl)):
        v, k = sl[i], _num(nl[i])
        if v is None or k is None:
            out.append(None)
            continue
        g = cache.geom(bytes(v))
        if g.typ != "LineString":
            out.append(None)
            continue
        k = int(k)
        idx = k - 1 if k > 0 else len(g.parts) + k
        if 0 <= idx < len(g.parts):
            out.append(to_wkb(Geometry("Point", g.parts[idx], g.srid)))
        else:
            out.append(None)
    return _obj_series(out)


# ------------------------------------------------- editing utilities (r5)
# ST_Affine / ST_Expand / ST_Angle / ST_RemoveRepeatedPoints /
# ST_SnapToGrid / ST_AddPoint / ST_SetPoint / ST_RemovePoint /
# ST_Multi / ST_CollectionExtract / ST_CollectionHomogenize / ST_Dump
# (geo/edit.py; PostGIS parity, beyond-reference)

def st_affine(s: pd.Series, a: pd.Series, b: pd.Series, d: pd.Series,
              e: pd.Series, xoff: pd.Series, yoff: pd.Series) -> pd.Series:
    cache = _DecodeCache()
    out = []
    cols = [s.tolist()] + [c.tolist() for c in (a, b, d, e, xoff, yoff)]
    memo: dict = {}
    for i in range(len(cols[0])):
        v = cols[0][i]
        nums = [_num(c[i]) for c in cols[1:]]
        if v is None or any(n is None for n in nums):
            out.append(None)
            continue
        v = bytes(v)
        nums = [float(n) for n in nums]
        key = (v, *nums)
        if key not in memo:
            memo[key] = to_wkb(edit.affine(cache.geom(v), *nums))
        out.append(memo[key])
    return _obj_series(out)


def st_expand(s: pd.Series, dx: pd.Series,
              dy: Optional[pd.Series] = None) -> pd.Series:
    if dy is None:
        return _geom_num_kernel(
            lambda g, v: to_wkb(edit.expand(g, float(v))))(s, dx)
    return _geom_num_num_kernel(
        lambda g, x, y: to_wkb(edit.expand(g, x, y)))(s, dx, dy)


def st_angle(p1: pd.Series, p2: pd.Series, p3: pd.Series,
             p4: Optional[pd.Series] = None) -> pd.Series:
    """ST_Angle over POINT args (3- or 4-point form)."""
    cache = _DecodeCache()
    cols = [p1.tolist(), p2.tolist(), p3.tolist()]
    if p4 is not None:
        cols.append(p4.tolist())
    out = []
    for i in range(len(cols[0])):
        vs = [c[i] for c in cols]
        if any(v is None for v in vs):
            out.append(None)
            continue
        pts = []
        ok = True
        for v in vs:
            g = cache.geom(bytes(v))
            if g.typ != "Point" or g.parts is None:
                ok = False
                break
            pts.append(g.parts)
        out.append(edit.angle(*pts) if ok else None)
    return _obj_series(out)


def st_remove_repeated_points(s: pd.Series,
                              tol: Optional[pd.Series] = None) -> pd.Series:
    if tol is None:
        return _unary_geom(edit.remove_repeated_points)(s)
    return _geom_num_kernel(
        lambda g, v: to_wkb(edit.remove_repeated_points(g, float(v))))(s, tol)


st_snap_to_grid = _geom_num_kernel(
    lambda g, v: to_wkb(edit.snap_to_grid(g, float(v))))
st_remove_point = _geom_num_kernel(
    lambda g, v: (lambda r: None if r is None else to_wkb(r))(
        edit.remove_point(g, int(v))))
st_multi = _unary_geom(edit.multi)
st_collection_extract = _geom_num_kernel(
    lambda g, v: to_wkb(edit.collection_extract(g, int(v))))
st_collection_homogenize = _unary_geom(edit.collection_homogenize)


def st_add_point(s: pd.Series, pt: pd.Series,
                 pos: Optional[pd.Series] = None) -> pd.Series:
    cache = _DecodeCache()
    sl, ptl = s.tolist(), pt.tolist()
    posl = [-1] * len(sl) if pos is None else pos.tolist()
    out = []
    for i in range(len(sl)):
        v, pv, k = sl[i], ptl[i], _num(posl[i])
        if v is None or pv is None or k is None:
            out.append(None)
            continue
        gp = cache.geom(bytes(pv))
        if gp.typ != "Point" or gp.parts is None:
            out.append(None)
            continue
        r = edit.add_point(cache.geom(bytes(v)), gp.parts, int(k))
        out.append(None if r is None else to_wkb(r))
    return _obj_series(out)


def st_set_point(s: pd.Series, pos: pd.Series, pt: pd.Series) -> pd.Series:
    cache = _DecodeCache()
    sl, posl, ptl = s.tolist(), pos.tolist(), pt.tolist()
    out = []
    for i in range(len(sl)):
        v, k, pv = sl[i], _num(posl[i]), ptl[i]
        if v is None or k is None or pv is None:
            out.append(None)
            continue
        gp = cache.geom(bytes(pv))
        if gp.typ != "Point" or gp.parts is None:
            out.append(None)
            continue
        r = edit.set_point(cache.geom(bytes(v)), int(k), gp.parts)
        out.append(None if r is None else to_wkb(r))
    return _obj_series(out)


def st_dump(s: pd.Series) -> pd.Series:
    """ST_Dump as an ARRAY of member WKBs — explode() DataFrame-side
    (the set-returning form is not expressible as a pandas UDF; the
    array + explode composition is the idiomatic Spark spelling)."""
    cache = _DecodeCache()
    out = []
    for v in s.tolist():
        if v is None:
            out.append(None)
            continue
        g = cache.geom(bytes(v))
        out.append([to_wkb(m.with_srid(g.srid)) for m in g.geometries()
                    if m.parts is not None and (m.typ == "Point" or m.parts)])
    return _obj_series(out)


def st_dump_points(s: pd.Series) -> pd.Series:
    """ST_DumpPoints as an ARRAY of vertex POINT WKBs, in coordinate
    order (ring/member order preserved)."""
    cache = _DecodeCache()
    out = []
    for v in s.tolist():
        if v is None:
            out.append(None)
            continue
        g = cache.geom(bytes(v))
        pts = []

        def walk(m):
            if m.typ == "Point" and m.parts is not None:
                pts.append(m.parts)
            elif m.typ == "LineString":
                pts.extend(m.parts)
            elif m.typ == "Polygon":
                for r in m.parts:
                    pts.extend(r)
        for m in g.geometries():
            walk(m)
        out.append([to_wkb(Geometry("Point", p, g.srid)) for p in pts])
    return _obj_series(out)


# --------------------------------------- validity & interior-point (r5)
# ST_IsClosed / ST_IsRing / ST_IsSimple / ST_IsValid / ST_IsValidReason
# (geo/validity.py), ST_PointOnSurface and the discrete Hausdorff /
# Fréchet distances (geo/metrics.py). PostGIS parity, beyond-reference.

st_is_closed = _unary_to_num(validity_mod.is_closed)
st_is_ring = _unary_to_num(validity_mod.is_ring)
st_is_simple = _unary_to_num(validity_mod.is_simple)
st_is_valid = _unary_to_num(validity_mod.is_valid)
st_is_valid_reason = _unary_to_num(validity_mod.is_valid_reason)
st_point_on_surface = _unary_geom(metrics_mod.point_on_surface)
st_hausdorff = _geom_geom_scalar_kernel(metrics_mod.hausdorff_distance)
st_frechet = _geom_geom_scalar_kernel(metrics_mod.frechet_distance)


# ------------------------------------ triangulations & derivatives (r5)
# ST_DelaunayTriangles / ST_VoronoiPolygons / ST_ConcaveHull /
# ST_GeneratePoints (geo/triangulate.py; PostGIS parity,
# beyond-reference).

def st_delaunay_triangles(s: pd.Series,
                          flags: Optional[pd.Series] = None) -> pd.Series:
    """flags 0 (default) -> GEOMETRYCOLLECTION of triangles; 1 ->
    MULTILINESTRING of unique edges (PostGIS flag semantics)."""
    if flags is None:
        return _unary_geom(triangulate_mod.delaunay_geometry)(s)
    return _geom_num_kernel(
        lambda g, v: to_wkb(
            triangulate_mod.delaunay_geometry(g, edges=int(v) == 1)))(s, flags)


def st_voronoi_polygons(s: pd.Series,
                        extend_to: Optional[pd.Series] = None) -> pd.Series:
    if extend_to is None:
        return _unary_geom(triangulate_mod.voronoi_geometry)(s)
    cache = _DecodeCache()
    sl, el = s.tolist(), extend_to.tolist()
    out = []
    for i in range(len(sl)):
        v = sl[i]
        if v is None:
            out.append(None)
            continue
        ext = None if el[i] is None else cache.geom(bytes(el[i]))
        out.append(to_wkb(triangulate_mod.voronoi_geometry(
            cache.geom(bytes(v)), ext)))
    return _obj_series(out)


def st_concave_hull(s: pd.Series, ratio: pd.Series) -> pd.Series:
    return _geom_num_kernel(
        lambda g, v: to_wkb(triangulate_mod.concave_hull(g, float(v))))(
        s, ratio)


def st_generate_points(s: pd.Series, n: pd.Series,
                       seed: Optional[pd.Series] = None) -> pd.Series:
    if seed is None:
        return _geom_num_kernel(
            lambda g, v: to_wkb(
                triangulate_mod.generate_points(g, int(v))))(s, n)
    return _geom_num_num_kernel(
        lambda g, a, b: to_wkb(
            triangulate_mod.generate_points(g, int(a), int(b))))(s, n, seed)


# ---------------------------- max inscribed circle + snapping (r5)
# ST_MaximumInscribedCircle (geo/bounding.py polylabel; center/radius
# split across two SQL names like the min-bounding pair) and ST_Snap
# (geo/edit.py). PostGIS parity, beyond-reference.

def _mic(g):
    return bounding.max_inscribed_circle(g)


def st_max_inscribed_center(s: pd.Series) -> pd.Series:
    def f(g):
        r = _mic(g)
        return to_wkb(Geometry("Point", None if r is None else r[0],
                               g.srid))
    return _unary_to_num(f)(s)


def st_max_inscribed_radius(s: pd.Series) -> pd.Series:
    def f(g):
        r = _mic(g)
        return None if r is None else float(r[1])
    return _unary_to_num(f)(s)


def st_snap(a: pd.Series, b: pd.Series, tol: pd.Series) -> pd.Series:
    cache = _DecodeCache()
    al, bl, tl = a.tolist(), b.tolist(), tol.tolist()
    memo: dict = {}
    out = []
    for i in range(len(al)):
        va, vb, t = al[i], bl[i], _num(tl[i])
        if va is None or vb is None or t is None:
            out.append(None)
            continue
        va, vb = bytes(va), bytes(vb)
        key = (va, vb, float(t))
        if key not in memo:
            memo[key] = to_wkb(edit.snap(cache.geom(va), cache.geom(vb),
                                         float(t)))
        out.append(memo[key])
    return _obj_series(out)


# -------------------- offset curve / shared paths / box clip (r5)
# ST_OffsetCurve (geo/offset.py one-sided offset), ST_SharedPaths and
# ST_ClipByBox2D (geo/overlay.py). PostGIS parity, beyond-reference.

def st_offset_curve(s: pd.Series, d: pd.Series,
                    quadsegs: Optional[pd.Series] = None) -> pd.Series:
    from ..geo import offset as offset_mod
    if quadsegs is None:
        return _geom_num_kernel(
            lambda g, v: (lambda r: None if r is None else to_wkb(r))(
                offset_mod.offset_curve_geometry(g, float(v))))(s, d)
    return _geom_num_num_kernel(
        lambda g, v, q: (lambda r: None if r is None else to_wkb(r))(
            offset_mod.offset_curve_geometry(g, v, int(q))))(s, d, quadsegs)


st_shared_paths = _geom_geom_scalar_kernel(
    lambda a, b: (lambda r: None if r is None else to_wkb(r))(
        overlay.shared_paths(a, b)))


def st_clip_by_box(s: pd.Series, xmin: pd.Series, ymin: pd.Series,
                   xmax: pd.Series, ymax: pd.Series) -> pd.Series:
    cache = _DecodeCache()
    sl = s.tolist()
    bl = [c.tolist() for c in (xmin, ymin, xmax, ymax)]
    out = []
    for i in range(len(sl)):
        v = sl[i]
        nums = [_num(c[i]) for c in bl]
        if v is None or any(n is None for n in nums):
            out.append(None)
            continue
        r = overlay.clip_by_box(cache.geom(bytes(v)),
                                *[float(n) for n in nums])
        out.append(None if r is None else to_wkb(r))
    return _obj_series(out)


# ---------------------------------------- spherical distance (r5)
# ST_DistanceSphere over POINT geometries (geo/proj.py haversine;
# PostGIS mean-radius sphere). Beyond-reference.

def st_distance_sphere(a: pd.Series, b: pd.Series) -> pd.Series:
    from ..geo import proj as proj_mod
    cache = _DecodeCache()
    al, bl = a.tolist(), b.tolist()
    out = []
    for i in range(len(al)):
        va, vb = al[i], bl[i]
        if va is None or vb is None:
            out.append(None)
            continue
        ga, gb = cache.geom(bytes(va)), cache.geom(bytes(vb))
        if ga.typ != "Point" or gb.typ != "Point" \
                or ga.parts is None or gb.parts is None:
            out.append(None)
            continue
        out.append(proj_mod.haversine_m(ga.parts[0], ga.parts[1],
                                        gb.parts[0], gb.parts[1]))
    return _obj_series(out)


def st_distance_spheroid(a: pd.Series, b: pd.Series) -> pd.Series:
    """ST_DistanceSpheroid over POINT geometries (geo/proj.py
    vincenty_m: Vincenty inverse, WGS84, deterministic 8 fixed
    iterations). Beyond-reference; the ellipsoidal twin of
    st_distance_sphere."""
    from ..geo import proj as proj_mod
    cache = _DecodeCache()
    al, bl = a.tolist(), b.tolist()
    out = []
    for i in range(len(al)):
        va, vb = al[i], bl[i]
        if va is None or vb is None:
            out.append(None)
            continue
        ga, gb = cache.geom(bytes(va)), cache.geom(bytes(vb))
        if ga.typ != "Point" or gb.typ != "Point" \
                or ga.parts is None or gb.parts is None:
            out.append(None)
            continue
        out.append(proj_mod.vincenty_m(ga.parts[0], ga.parts[1],
                                       gb.parts[0], gb.parts[1]))
    return _obj_series(out)


def _sphere_measure_kernel(fn_name):
    """Factory for the geography measure twins (area / length /
    perimeter on the R_SPHERE sphere, geo/proj.py)."""
    def k(s: pd.Series) -> pd.Series:
        from ..geo import proj as proj_mod
        fn = getattr(proj_mod, fn_name)
        cache = _DecodeCache()
        return _obj_series([
            None if v is None else fn(cache.geom(bytes(v)))
            for v in s.tolist()])
    k.__name__ = fn_name
    return k


# Geography ST_Area / ST_Length / ST_Perimeter twins (lon/lat degrees
# in, meters/m² on the PostGIS mean-radius sphere). Beyond-reference.
st_area_sphere = _sphere_measure_kernel("sphere_area_m2")
st_length_sphere = _sphere_measure_kernel("sphere_length_m")
st_perimeter_sphere = _sphere_measure_kernel("sphere_perimeter_m")


# ------------------------------- tile envelope + normalize (r5)

_MERC_WORLD = 20037508.342789244


def st_tile_envelope(z: pd.Series, x: pd.Series, y: pd.Series) -> pd.Series:
    """ST_TileEnvelope: web-mercator XYZ tile bounds as a POLYGON
    stamped SRID 3857 (exact power-of-two arithmetic)."""
    out = []
    zl, xl, yl = z.tolist(), x.tolist(), y.tolist()
    for i in range(len(zl)):
        zz, xx, yy = _num(zl[i]), _num(xl[i]), _num(yl[i])
        if zz is None or xx is None or yy is None:
            out.append(None)
            continue
        zz, xx, yy = int(zz), int(xx), int(yy)
        n = 1 << zz
        if not (0 <= xx < n and 0 <= yy < n):
            out.append(None)
            continue
        size = 2.0 * _MERC_WORLD / n
        x0 = -_MERC_WORLD + xx * size
        y1 = _MERC_WORLD - yy * size
        ring = [(x0, y1 - size), (x0 + size, y1 - size),
                (x0 + size, y1), (x0, y1), (x0, y1 - size)]
        out.append(to_wkb(Geometry("Polygon", [ring], 3857)))
    return _obj_series(out)


st_normalize = _unary_geom(edit.normalize)


# ----------------------------------------- simple accessors II (r5)
# ST_IsEmpty / ST_Dimension / ST_ExteriorRing / ST_InteriorRingN /
# ST_NumInteriorRings / ST_BoundingDiagonal (PostGIS parity).

st_is_empty = _unary_to_num(lambda g: g.is_empty())


def _g_dimension(g: Geometry):
    dims = [2 if m.typ == "Polygon" and m.parts else
            1 if m.typ == "LineString" and len(m.parts or []) > 1 else
            0 if m.typ == "Point" and m.parts is not None else -1
            for m in g.geometries()]
    dims = [d for d in dims if d >= 0]
    return max(dims) if dims else 0


st_dimension = _unary_to_num(_g_dimension)


def _g_exterior_ring(g: Geometry):
    if g.typ != "Polygon" or not g.parts:
        return None
    return to_wkb(Geometry("LineString", list(g.parts[0]), g.srid))


st_exterior_ring = _unary_to_num(_g_exterior_ring)


def st_interior_ring_n(s: pd.Series, n: pd.Series) -> pd.Series:
    """1-based like PostGIS; NULL out of range / non-polygon."""
    def f(g: Geometry, k) -> object:
        k = int(k)
        if g.typ != "Polygon" or not g.parts or not (1 <= k <= len(g.parts) - 1):
            return None
        return to_wkb(Geometry("LineString", list(g.parts[k]), g.srid))
    return _geom_num_kernel(f)(s, n)


st_num_interior_rings = _unary_to_num(
    lambda g: max(len(g.parts) - 1, 0) if g.typ == "Polygon" and g.parts
    else None)


def _g_bounding_diagonal(g: Geometry):
    bb = g.bounds()
    if bb is None:
        return to_wkb(Geometry("LineString", [], g.srid))
    return to_wkb(Geometry("LineString",
                           [(bb[0], bb[1]), (bb[2], bb[3])], g.srid))


st_bounding_diagonal = _unary_to_num(_g_bounding_diagonal)


# ------------------------- spherical azimuth / destination (r5)

def st_azimuth_sphere(a: pd.Series, b: pd.Series) -> pd.Series:
    from ..geo import proj as proj_mod
    cache = _DecodeCache()
    al, bl = a.tolist(), b.tolist()
    out = []
    for i in range(len(al)):
        va, vb = al[i], bl[i]
        if va is None or vb is None:
            out.append(None)
            continue
        ga, gb = cache.geom(bytes(va)), cache.geom(bytes(vb))
        if ga.typ != "Point" or gb.typ != "Point" \
                or ga.parts is None or gb.parts is None:
            out.append(None)
            continue
        out.append(proj_mod.sphere_azimuth(ga.parts[0], ga.parts[1],
                                           gb.parts[0], gb.parts[1]))
    return _obj_series(out)


def st_project_sphere(s: pd.Series, d: pd.Series,
                      az: pd.Series) -> pd.Series:
    from ..geo import proj as proj_mod
    cache = _DecodeCache()
    sl, dl, azl = s.tolist(), d.tolist(), az.tolist()
    out = []
    for i in range(len(sl)):
        v, dd, aa = sl[i], _num(dl[i]), _num(azl[i])
        if v is None or dd is None or aa is None:
            out.append(None)
            continue
        g = cache.geom(bytes(v))
        if g.typ != "Point" or g.parts is None:
            out.append(None)
            continue
        lon2, lat2 = proj_mod.sphere_project(g.parts[0], g.parts[1],
                                             float(dd), float(aa))
        out.append(to_wkb(Geometry("Point", (lon2, lat2), g.srid)))
    return _obj_series(out)


def st_project_spheroid(s: pd.Series, d: pd.Series,
                        az: pd.Series) -> pd.Series:
    """Spheroid ST_Project twin (geo/proj.py vincenty_direct: Vincenty
    direct problem on WGS84, deterministic fixed iterations)."""
    from ..geo import proj as proj_mod
    cache = _DecodeCache()
    sl, dl, azl = s.tolist(), d.tolist(), az.tolist()
    out = []
    for i in range(len(sl)):
        v, dd, aa = sl[i], _num(dl[i]), _num(azl[i])
        if v is None or dd is None or aa is None:
            out.append(None)
            continue
        g = cache.geom(bytes(v))
        if g.typ != "Point" or g.parts is None:
            out.append(None)
            continue
        lon2, lat2 = proj_mod.vincenty_direct(g.parts[0], g.parts[1],
                                              float(dd), float(aa))
        out.append(to_wkb(Geometry("Point", (lon2, lat2), g.srid)))
    return _obj_series(out)


# ST_GeometricMedian (geo/metrics.py Weiszfeld; fixed rounds) — r5
st_geometric_median = _unary_geom(metrics_mod.geometric_median)


# ST_BuildArea (geo/noding.py even-odd face parity) — r5
st_build_area = _unary_geom(noding.build_area)


# ST_MaxDistance / ST_LongestLine (geo/metrics.py vertex-pair scan) — r5
st_max_distance = _geom_geom_scalar_kernel(metrics_mod.max_distance)
st_longest_line = _geom_geom_scalar_kernel(
    lambda a, b: (lambda r: None if r is None else to_wkb(r))(
        metrics_mod.longest_line(a, b)))
