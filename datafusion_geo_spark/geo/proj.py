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


# ---- UTM (EPSG:326xx north / 327xx south) — closed-form Transverse
# Mercator, Krüger α/β series to n³ (public formulas; sub-mm inside a
# standard 6° zone). Constants precomputed once from WGS84
# f = 1/298.257223563 and hard-coded as shortest-repr literals so a SQL
# oracle can embed the identical doubles.
K0_UTM = 0.9996
FE_UTM = 500000.0
FN_SOUTH = 10000000.0
N_TM = 0.0016792203863837047        # n = f / (2 - f)
A_TM = 6367449.145823415            # rectifying radius a/(1+n)(1+n²/4+n⁴/64)
TT_TM = 0.08181919084262149         # 2·√n/(1+n)  (= first eccentricity e)
ALPHA_TM = (0.0008377318188192541, 7.608496958699166e-07,
            1.2034877875966646e-09)
BETA_TM = (0.000837732164082144, 5.906110863719917e-08,
           1.6769911794379754e-10)
DELTA_TM = (0.003356551448628875, 6.571913193172695e-06,
            1.76774599620756e-08)


def utm_zone(srid: int):
    """(zone, is_north) for EPSG:32601-32660 / 32701-32760, else None."""
    if 32601 <= srid <= 32660:
        return srid - 32600, True
    if 32701 <= srid <= 32760:
        return srid - 32700, False
    return None


def lonlat_to_utm(lon: float, lat: float, zone: int,
                  north: bool) -> tuple:
    """Forward Transverse Mercator (Krüger series). Operation order is
    fixed and mirrored term-for-term by the SQL oracle (which expands
    sinh/cosh/atanh via exp/ln); outputs are compared at 2 dp (cm), far
    above the few-ulp libm-vs-exp-form divergence."""
    lam0 = (zone * 6 - 183) * DEG2RAD
    sphi = math.sin(lat * DEG2RAD)
    t = math.sinh(math.atanh(sphi) - TT_TM * math.atanh(TT_TM * sphi))
    lam = lon * DEG2RAD - lam0
    xi_p = math.atan2(t, math.cos(lam))
    eta_p = math.atanh(math.sin(lam) / math.sqrt(1.0 + t * t))
    xi = xi_p
    eta = eta_p
    for j, aj in enumerate(ALPHA_TM, start=1):
        xi = xi + aj * math.sin(2 * j * xi_p) * math.cosh(2 * j * eta_p)
        eta = eta + aj * math.cos(2 * j * xi_p) * math.sinh(2 * j * eta_p)
    e = FE_UTM + K0_UTM * A_TM * eta
    nn = (0.0 if north else FN_SOUTH) + K0_UTM * A_TM * xi
    return (e, nn)


def utm_to_lonlat(e: float, nn: float, zone: int, north: bool) -> tuple:
    """Inverse Transverse Mercator (Krüger β/δ series)."""
    lam0 = (zone * 6 - 183) * DEG2RAD
    xi = (nn - (0.0 if north else FN_SOUTH)) / (K0_UTM * A_TM)
    eta = (e - FE_UTM) / (K0_UTM * A_TM)
    xi_p = xi
    eta_p = eta
    for j, bj in enumerate(BETA_TM, start=1):
        xi_p = xi_p - bj * math.sin(2 * j * xi) * math.cosh(2 * j * eta)
        eta_p = eta_p - bj * math.cos(2 * j * xi) * math.sinh(2 * j * eta)
    chi = math.asin(math.sin(xi_p) / math.cosh(eta_p))
    lat = chi
    for j, dj in enumerate(DELTA_TM, start=1):
        lat = lat + dj * math.sin(2 * j * chi)
    lon = lam0 + math.atan2(math.sinh(eta_p), math.cos(xi_p))
    return (lon * RAD2DEG, lat * RAD2DEG)


def transform_geometry(g: Geometry, to_srid: int,
                       from_srid: int = None) -> Geometry:
    """PostGIS-style ST_Transform for the closed-form pairs this engine
    carries: 4326 <-> 3857 (spherical web mercator) and 4326 <-> UTM
    (EPSG:326xx/327xx, Krüger series). ``from_srid`` falls back to the
    geometry's own SRID; missing both is an error (PostGIS: 'cannot
    transform geometry with unknown SRID')."""
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
    elif src == SRID_LONLAT and utm_zone(dst) is not None:
        zone, north = utm_zone(dst)

        def f(lon, lat):
            return lonlat_to_utm(lon, lat, zone, north)
    elif dst == SRID_LONLAT and utm_zone(src) is not None:
        zone, north = utm_zone(src)

        def f(e, nn):
            return utm_to_lonlat(e, nn, zone, north)
    else:
        raise ValueError(
            f"ST_Transform: unsupported SRID pair {src} -> {dst} "
            f"(supported: {SRID_LONLAT} <-> {SRID_MERCATOR}, "
            f"{SRID_LONLAT} <-> UTM 326xx/327xx)")
    return g.map_coords(lambda c: f(c[0], c[1])).with_srid(dst)


# PostGIS ST_DistanceSphere radius (mean Earth radius, meters)
R_SPHERE = 6371008.0


def haversine_m(lon1: float, lat1: float, lon2: float, lat2: float) -> float:
    """Great-circle distance in meters on the R_SPHERE sphere
    (PostGIS ST_DistanceSphere). Fixed operation order so a SQL oracle
    with the same literals reproduces the doubles exactly."""
    phi1 = lat1 * DEG2RAD
    phi2 = lat2 * DEG2RAD
    dphi = (lat2 - lat1) * DEG2RAD
    dlam = (lon2 - lon1) * DEG2RAD
    s1 = math.sin(dphi / 2.0)
    s2 = math.sin(dlam / 2.0)
    a = s1 * s1 + math.cos(phi1) * math.cos(phi2) * s2 * s2
    if a > 1.0:
        a = 1.0
    return 2.0 * R_SPHERE * math.asin(math.sqrt(a))


def sphere_azimuth(lon1: float, lat1: float,
                   lon2: float, lat2: float) -> float:
    """Initial great-circle bearing from point 1 to point 2, radians in
    [0, 2π) clockwise from north (the geography twin of the planar
    ST_Azimuth). Fixed literal constants / operation order for oracle
    replay."""
    phi1 = lat1 * DEG2RAD
    phi2 = lat2 * DEG2RAD
    dlam = (lon2 - lon1) * DEG2RAD
    y = math.sin(dlam) * math.cos(phi2)
    x = (math.cos(phi1) * math.sin(phi2)
         - math.sin(phi1) * math.cos(phi2) * math.cos(dlam))
    return math.atan2(y, x) % (2.0 * math.pi)


def sphere_project(lon: float, lat: float, dist_m: float,
                   azimuth: float) -> tuple:
    """Destination point at ``dist_m`` meters along the great circle
    with initial bearing ``azimuth`` (radians clockwise from north) —
    the geography form of PostGIS ST_Project, on the R_SPHERE
    sphere."""
    phi1 = lat * DEG2RAD
    lam1 = lon * DEG2RAD
    delta = dist_m / R_SPHERE
    sphi2 = (math.sin(phi1) * math.cos(delta)
             + math.cos(phi1) * math.sin(delta) * math.cos(azimuth))
    # rounding near the poles can push |sphi2| infinitesimally past 1;
    # clamp before asin (same guard as haversine_m's a > 1.0 clamp)
    sphi2 = max(-1.0, min(1.0, sphi2))
    phi2 = math.asin(sphi2)
    y = math.sin(azimuth) * math.sin(delta) * math.cos(phi1)
    x = math.cos(delta) - math.sin(phi1) * sphi2
    lam2 = lam1 + math.atan2(y, x)
    lon2 = lam2 * RAD2DEG
    if lon2 > 180.0:
        lon2 -= 360.0
    elif lon2 < -180.0:
        lon2 += 360.0
    return (lon2, phi2 * RAD2DEG)


def sphere_ring_sum(ring) -> float:
    """Raw spherical-area accumulator for one closed ring: the JPL
    "Some Algorithms for Polygons on a Sphere" (Chamberlain & Duquette
    2007) edge sum Σ (λ2−λ1)·(2 + sin φ1 + sin φ2) over edges in vertex
    order (radians for λ, degrees in, the turf.js ringArea form).
    Fixed operation order so a SQL oracle spelling the same per-edge
    terms and left-associated additions replays the double exactly."""
    total = 0.0
    for i in range(len(ring) - 1):
        lon1, lat1 = ring[i]
        lon2, lat2 = ring[i + 1]
        total = total + (lon2 - lon1) * DEG2RAD * (
            2.0 + math.sin(lat1 * DEG2RAD) + math.sin(lat2 * DEG2RAD))
    return total


def sphere_area_m2(g: Geometry) -> float:
    """Geography ST_Area twin on the R_SPHERE sphere: per polygon,
    |shell sum| − Σ |hole sums|, each scaled by R²/2; areal parts only
    (lines/points contribute 0, like PostGIS geography ST_Area).
    Coordinates are interpreted as lon/lat degrees."""
    total = 0.0
    for part in g.geometries():
        if part.typ != "Polygon" or not part.parts:
            continue
        rings = part.parts
        poly = abs(sphere_ring_sum(rings[0])) * R_SPHERE * R_SPHERE / 2.0
        for hole in rings[1:]:
            poly = poly - abs(sphere_ring_sum(hole)) \
                * R_SPHERE * R_SPHERE / 2.0
        total = total + poly
    return total


def _sphere_path_m(coords) -> float:
    total = 0.0
    for i in range(len(coords) - 1):
        lon1, lat1 = coords[i]
        lon2, lat2 = coords[i + 1]
        total = total + haversine_m(lon1, lat1, lon2, lat2)
    return total


def sphere_length_m(g: Geometry) -> float:
    """Geography ST_Length twin: great-circle length of the linear
    parts (haversine per segment, summed in vertex order); areal and
    puntal parts contribute 0, like PostGIS geography ST_Length."""
    total = 0.0
    for part in g.geometries():
        if part.typ == "LineString" and part.parts:
            total = total + _sphere_path_m(part.parts)
    return total


def sphere_perimeter_m(g: Geometry) -> float:
    """Geography ST_Perimeter twin: great-circle length of every ring
    (shells and holes) of the areal parts; linear/puntal parts
    contribute 0."""
    total = 0.0
    for part in g.geometries():
        if part.typ == "Polygon" and part.parts:
            for ring in part.parts:
                total = total + _sphere_path_m(ring)
    return total
