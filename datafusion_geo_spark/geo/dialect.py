"""Foreign WKB dialect codecs (ingest/export shim).

The reference decodes five WKB dialects selected by a 1-byte tag prefix
on every stored blob (/root/reference/src/geo/dialect.rs:5-29: 1=WKB,
2=EWKB, 3=GeoPackage, 4=MySQL, 5=SpatiaLite). Per SURVEY.md §7.0 this
repo stores canonical (E)WKB only — the tag-per-blob scheme buys nothing
under parquet — but a user importing foreign blobs (a GeoPackage table,
a SpatiaLite dump, a MySQL export) still needs to READ those encodings.
This module converts each dialect to/from the internal Geometry model;
``st_geomfromwkb(col, dialect=...)`` is the user-facing entry.

Formats implemented from their public specs:
  * GeoPackage Binary (OGC 12-128r17 §2.1.3): "GP" magic, version,
    flags (bit0 header endianness, bits1-3 envelope indicator, bit4
    empty, bit5 extended), int32 srs_id, optional envelope doubles,
    then standard ISO WKB.
  * SpatiaLite BLOB (spatialite docs "BLOB-Geometry format"): 0x00
    start, endian byte, int32 SRID, 4-double MBR, 0x7C marker, class
    type + WKB-like body with 0x69 entity markers inside collections
    (sub-geometries carry no endian byte), 0xFE end.
  * MySQL: little-endian uint32 SRID prefix + standard WKB.
  * "tagged": the reference's own storage — dialect tag byte then that
    dialect's encoding (dialect.rs:16-29).
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

from .geom import Coord, Geometry, GEOM_TYPES, TYPE_CODE
from .wkb import from_wkb, to_wkb

DIALECTS = ("wkb", "ewkb", "geopackage", "mysql", "spatialite")

# reference tag byte -> dialect name (dialect.rs:5-13)
_TAG_TO_DIALECT = {1: "wkb", 2: "ewkb", 3: "geopackage", 4: "mysql",
                   5: "spatialite"}
_DIALECT_TO_TAG = {v: k for k, v in _TAG_TO_DIALECT.items()}

_GPKG_MAGIC = b"GP"
_SL_START, _SL_MBR_END, _SL_ENTITY, _SL_END = 0x00, 0x7C, 0x69, 0xFE
# envelope indicator -> number of doubles (OGC 12-128r17 table 6)
_GPKG_ENV_DOUBLES = {0: 0, 1: 4, 2: 6, 3: 6, 4: 8}


# ------------------------------------------------------------- GeoPackage

def from_geopackage(buf: bytes) -> Geometry:
    buf = bytes(buf)
    if len(buf) < 8 or buf[:2] != _GPKG_MAGIC:
        raise ValueError("invalid GeoPackage blob: bad magic")
    flags = buf[3]
    if flags & 0x20:
        raise ValueError("GeoPackage extended geometry types not supported")
    fmt = "<" if flags & 0x01 else ">"
    env_ind = (flags >> 1) & 0x07
    if env_ind not in _GPKG_ENV_DOUBLES:
        raise ValueError(f"invalid GeoPackage envelope indicator {env_ind}")
    (srs_id,) = struct.unpack_from(fmt + "i", buf, 4)
    body = 8 + 8 * _GPKG_ENV_DOUBLES[env_ind]
    g = from_wkb(buf[body:])
    # srs_id 0 = undefined geographic, -1 = undefined cartesian — both
    # map to "no SRID" in the internal model (like PostGIS SRID 0)
    if srs_id > 0 and g.srid is None:
        g = g.with_srid(srs_id)
    return g


def to_geopackage(g: Geometry) -> bytes:
    srs_id = g.srid if g.srid is not None else 0
    bbox = g.bounds()
    if bbox is None:  # empty geometry: E flag, no envelope
        header = struct.pack("<2sBBi", _GPKG_MAGIC, 0, 0x01 | 0x10, srs_id)
        return header + to_wkb(g.with_srid(None))
    xmin, ymin, xmax, ymax = bbox
    header = struct.pack("<2sBBi", _GPKG_MAGIC, 0, 0x01 | (1 << 1), srs_id)
    env = struct.pack("<4d", xmin, xmax, ymin, ymax)  # [minx,maxx,miny,maxy]
    return header + env + to_wkb(g.with_srid(None))


# ------------------------------------------------------------------ MySQL

def from_mysql(buf: bytes) -> Geometry:
    buf = bytes(buf)
    if len(buf) < 9:
        raise ValueError("invalid MySQL geometry blob: too short")
    (srid,) = struct.unpack_from("<I", buf, 0)
    g = from_wkb(buf[4:])
    if srid and g.srid is None:
        g = g.with_srid(srid)
    return g


def to_mysql(g: Geometry) -> bytes:
    return struct.pack("<I", g.srid or 0) + to_wkb(g.with_srid(None))


# ------------------------------------------------------------- SpatiaLite

def _sl_coords(buf: bytes, pos: int, fmt: str, n: int) -> Tuple[List[Coord], int]:
    if 16 * n > len(buf) - pos:
        # bounds-check BEFORE building the n-sized format string — the
        # wkb.py count-bomb fix (a tiny blob declaring a ~4-billion
        # point count must not allocate gigabytes to fail)
        raise ValueError(
            f"invalid SpatiaLite blob: declared count {n} exceeds buffer")
    vals = struct.unpack_from(fmt + "d" * (2 * n), buf, pos)
    return [(vals[2 * i], vals[2 * i + 1]) for i in range(n)], pos + 16 * n


def _sl_body(buf: bytes, pos: int, fmt: str, code: int) -> Tuple[Geometry, int]:
    """Geometry body (after the class-type int) — WKB-like, but nested
    entities are 0x69-marked and carry no endian byte."""
    if not 1 <= code <= 7:
        raise ValueError(f"unsupported SpatiaLite class {code}")
    typ = GEOM_TYPES[code]

    def u32() -> int:
        nonlocal pos
        (v,) = struct.unpack_from(fmt + "I", buf, pos)
        pos += 4
        return v

    if typ == "Point":
        cs, pos = _sl_coords(buf, pos, fmt, 1)
        return Geometry("Point", cs[0]), pos
    if typ == "LineString":
        n = u32()  # u32 advances pos — must run before _sl_coords reads it
        cs, pos = _sl_coords(buf, pos, fmt, n)
        return Geometry("LineString", cs), pos
    if typ == "Polygon":
        rings = []
        for _ in range(u32()):
            n = u32()
            cs, pos = _sl_coords(buf, pos, fmt, n)
            rings.append(cs)
        return Geometry("Polygon", rings), pos
    # multi / collection: n × (0x69 marker, class int32, body)
    n = u32()
    if 5 * n > len(buf) - pos:  # each member: marker + class minimum
        raise ValueError(
            f"invalid SpatiaLite blob: declared count {n} exceeds buffer")
    subs = []
    for _ in range(n):
        if buf[pos] != _SL_ENTITY:
            raise ValueError("invalid SpatiaLite blob: missing entity marker")
        pos += 1
        sub_code = struct.unpack_from(fmt + "I", buf, pos)[0]
        pos += 4
        sub, pos = _sl_body(buf, pos, fmt, sub_code & 0xFF)
        subs.append(sub)
    if typ == "MultiPoint":
        return Geometry("MultiPoint", [s.parts for s in subs]), pos
    if typ == "MultiLineString":
        return Geometry("MultiLineString", [s.parts for s in subs]), pos
    if typ == "MultiPolygon":
        return Geometry("MultiPolygon", [s.parts for s in subs]), pos
    return Geometry("GeometryCollection", subs), pos


def from_spatialite(buf: bytes) -> Geometry:
    buf = bytes(buf)
    # 48 = minimum well-formed blob: header 39 + class 4 + a zero count
    # (empty LINESTRING/POLYGON/MULTI*) 4 + end byte. Truncated bodies
    # past the framing check surface as ValueError below, not struct.error.
    if len(buf) < 48 or buf[0] != _SL_START or buf[-1] != _SL_END:
        raise ValueError("invalid SpatiaLite blob: bad framing")
    fmt = "<" if buf[1] == 1 else ">"
    (srid,) = struct.unpack_from(fmt + "i", buf, 2)
    if buf[38] != _SL_MBR_END:
        raise ValueError("invalid SpatiaLite blob: missing MBR terminator")
    try:
        (code,) = struct.unpack_from(fmt + "I", buf, 39)
        g, _ = _sl_body(buf, 43, fmt, code & 0xFF)
    except (struct.error, IndexError, RecursionError) as e:
        # RecursionError: a deep nested-collection bomb fails the ROW,
        # not the task (the wkb.py convention)
        raise ValueError(f"invalid SpatiaLite blob: {e}") from e
    if srid > 0:
        g = g.with_srid(srid)
    return g


def _sl_encode_body(g: Geometry, out: List[bytes]) -> None:
    t, p = g.typ, g.parts
    if t == "Point":
        out.append(struct.pack("<2d", p[0], p[1]))
        return
    if t == "LineString":
        out.append(struct.pack("<I", len(p)))
        out.append(struct.pack("<" + "d" * (2 * len(p)),
                               *[v for c in p for v in c]))
        return
    if t == "Polygon":
        out.append(struct.pack("<I", len(p)))
        for ring in p:
            out.append(struct.pack("<I", len(ring)))
            out.append(struct.pack("<" + "d" * (2 * len(ring)),
                                   *[v for c in ring for v in c]))
        return
    if t == "GeometryCollection":
        subs = p
    elif t == "MultiPoint":
        subs = [Geometry("Point", c) for c in p]
    elif t == "MultiLineString":
        subs = [Geometry("LineString", line) for line in p]
    else:  # MultiPolygon
        subs = [Geometry("Polygon", poly) for poly in p]
    out.append(struct.pack("<I", len(subs)))
    for sub in subs:
        out.append(struct.pack("<BI", _SL_ENTITY, TYPE_CODE[sub.typ]))
        _sl_encode_body(sub, out)


def to_spatialite(g: Geometry) -> bytes:
    bbox = g.bounds()
    if bbox is None:
        raise ValueError("SpatiaLite blobs cannot encode empty geometries")
    out = [struct.pack("<BBi", _SL_START, 1, g.srid or 0),
           struct.pack("<4d", *bbox), bytes([_SL_MBR_END]),
           struct.pack("<I", TYPE_CODE[g.typ])]
    _sl_encode_body(g, out)
    out.append(bytes([_SL_END]))
    return b"".join(out)


# ----------------------------------------------------------- entry points

def from_dialect(buf: bytes, dialect: str) -> Geometry:
    """Decode one blob of the given dialect ('auto' sniffs framing;
    'tagged' expects the reference's 1-byte tag prefix)."""
    d = dialect.lower()
    if d == "tagged":
        buf = bytes(buf)
        inner = _TAG_TO_DIALECT.get(buf[0] if buf else -1)
        if inner is None:
            raise ValueError(f"cannot decode WKB dialect tag {buf[:1]!r}")
        return from_dialect(buf[1:], inner)
    if d == "auto":
        return from_dialect(bytes(buf), _sniff(bytes(buf)))
    if d in ("wkb", "ewkb"):
        return from_wkb(buf)
    if d == "geopackage":
        return from_geopackage(buf)
    if d == "mysql":
        return from_mysql(buf)
    if d == "spatialite":
        return from_spatialite(buf)
    raise ValueError(f"unknown WKB dialect {dialect!r}")


def to_dialect(g: Geometry, dialect: str) -> bytes:
    d = dialect.lower()
    if d == "tagged":  # reference storage form: EWKB tag + EWKB
        return bytes([_DIALECT_TO_TAG["ewkb"]]) + to_wkb(g)
    if d == "wkb":  # ISO WKB carries no SRID — strip it
        return to_wkb(g.with_srid(None))
    if d == "ewkb":
        return to_wkb(g)
    if d == "geopackage":
        return to_geopackage(g)
    if d == "mysql":
        return to_mysql(g)
    if d == "spatialite":
        return to_spatialite(g)
    raise ValueError(f"unknown WKB dialect {dialect!r}")


def _sniff(buf: bytes) -> str:
    """Framing-based dialect detection. WKB/EWKB start with an endian
    byte (0x00/0x01) followed by a type word; GeoPackage has a 2-byte
    magic; SpatiaLite frames with 0x00 … 0xFE and a 0x7C at offset 38.
    MySQL's uint32-SRID prefix is NOT sniffable (any int32 is a legal
    SRID) — pass dialect='mysql' explicitly."""
    if len(buf) >= 2 and buf[:2] == _GPKG_MAGIC:
        return "geopackage"
    # 48 = the same minimum from_spatialite enforces (header 39 + MBR-end
    # + shortest WKB body); a shorter blob with matching framing bytes
    # must fall through to the wkb path instead of failing in the codec.
    if len(buf) >= 48 and buf[0] == _SL_START and buf[-1] == _SL_END \
            and buf[38] == _SL_MBR_END:
        return "spatialite"
    return "wkb"
