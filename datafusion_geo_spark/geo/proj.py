"""Coordinate reference transforms (beyond-reference utility).

Supports the one projection pair that covers the overwhelming share of
web/tile workloads — WGS84 lon/lat (EPSG:4326) <-> spherical web
mercator (EPSG:3857) — with the standard closed-form spherical formulas
(no proj4 dependency; the container has none). Any other SRID pair
raises. PostGIS ST_Transform semantics: the source SRID comes from the
geometry (EWKB) unless the caller supplies one; the result is stamped
with the target SRID.

Determinism: the arithmetic is written with explicit literal constants
and a fixed operation order (lon * DEG2RAD, then * R) so a SQL oracle
multiplying by the same decimal literals reproduces the doubles to the
last ulp before any rounding.
"""

from __future__ import annotations

import math

from .geom import Geometry

R_MAJOR = 6378137.0
DEG2RAD = 0.017453292519943295   # repr(math.pi / 180)
RAD2DEG = 57.29577951308232      # repr(180 / math.pi)
PI_4 = 0.7853981633974483        # repr(math.pi / 4)

SRID_LONLAT = 4326
SRID_MERCATOR = 3857


def lonlat_to_mercator(lon: float, lat: float) -> tuple:
    if not (-90.0 < lat < 90.0):
        raise ValueError(f"latitude {lat} out of (-90, 90) for EPSG:3857")
    x = R_MAJOR * (lon * DEG2RAD)
    y = R_MAJOR * math.log(math.tan(PI_4 + (lat * DEG2RAD) * 0.5))
    return (x, y)


def mercator_to_lonlat(x: float, y: float) -> tuple:
    lon = (x / R_MAJOR) * RAD2DEG
    lat = (2.0 * math.atan(math.exp(y / R_MAJOR)) - 2.0 * PI_4) * RAD2DEG
    return (lon, lat)


def transform_geometry(g: Geometry, to_srid: int,
                       from_srid: int = None) -> Geometry:
    """PostGIS-style ST_Transform for the 4326<->3857 pair. ``from_srid``
    falls back to the geometry's own SRID; missing both is an error
    (PostGIS: 'cannot transform geometry with unknown SRID')."""
    src = from_srid if from_srid is not None else g.srid
    if src is None:
        raise ValueError("ST_Transform: source SRID unknown "
                         "(geometry has none and no from_srid given)")
    src, dst = int(src), int(to_srid)
    if src == dst:
        return g.with_srid(dst)
    if (src, dst) == (SRID_LONLAT, SRID_MERCATOR):
        f = lonlat_to_mercator
    elif (src, dst) == (SRID_MERCATOR, SRID_LONLAT):
        f = mercator_to_lonlat
    else:
        raise ValueError(
            f"ST_Transform: unsupported SRID pair {src} -> {dst} "
            f"(supported: {SRID_LONLAT} <-> {SRID_MERCATOR})")
    return g.map_coords(lambda c: f(c[0], c[1])).with_srid(dst)
