"""Differential parity: every vectorized numpy fast path in the measure
kernels must agree with the object path (algos / proj per-row) on the
same batch. Pure pandas-level (no Spark session) — catches fast-path
drift that oracle queries can mask when a fixture never exercises the
fallback."""

import random
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

from datafusion_geo_spark.functions import kernels
from datafusion_geo_spark.geo import algos, proj
from datafusion_geo_spark.geo.geom import Geometry
from datafusion_geo_spark.geo.wkb import from_wkb, to_wkb
from datafusion_geo_spark.geo.wkt import from_wkt

RNG = random.Random(42)


def _point_series(n, lo=-50.0, hi=50.0):
    pts = [(RNG.uniform(lo, hi), RNG.uniform(lo, hi)) for _ in range(n)]
    vals = [to_wkb(Geometry("Point", p)) for p in pts]
    vals[3] = None                     # a null row rides along
    return pd.Series(vals, dtype=object), pts


def test_distance_points_vs_const_polygon_parity():
    s, pts = _point_series(64)
    poly = from_wkt(
        "POLYGON((0 0,30 0,30 30,0 30,0 0),(10 10,20 10,20 20,10 20,10 10))")
    const = pd.Series([to_wkb(poly)] * 64, dtype=object)
    fast = kernels.distance(s, const).tolist()
    for i, v in enumerate(fast):
        if s.iloc[i] is None:
            assert v is None
            continue
        want = algos.distance(from_wkb(bytes(s.iloc[i])), poly)
        assert v == pytest.approx(want, abs=1e-9), (i, pts[i])


def test_distance_point_pairs_parity():
    a, _ = _point_series(40)
    b, _ = _point_series(40)
    fast = kernels.distance(a, b).tolist()
    for i, v in enumerate(fast):
        if a.iloc[i] is None or b.iloc[i] is None:
            assert v is None
            continue
        want = algos.distance(from_wkb(bytes(a.iloc[i])),
                              from_wkb(bytes(b.iloc[i])))
        assert v == want


def test_transform_fast_path_vs_object_parity():
    pts = [(RNG.uniform(-179, 179), RNG.uniform(-80, 80)) for _ in range(32)]
    s = pd.Series([to_wkb(Geometry("Point", p)) for p in pts], dtype=object)
    to = pd.Series([3857] * 32)
    frm = pd.Series([4326] * 32)
    fast = kernels.transform_srid(s, to, frm).tolist()
    for i, v in enumerate(fast):
        g = from_wkb(bytes(v))
        want = proj.transform_geometry(
            from_wkb(bytes(s.iloc[i])), 3857, 4326)
        assert g.srid == 3857
        assert g.parts[0] == want.parts[0]          # x: pure multiplies
        # y: numpy's vectorized tan/log can differ from libm by an ulp
        # (~4e-9 at 2e7 magnitude); the 6-dp output rounding the oracle
        # compares under absorbs this entirely
        assert g.parts[1] == pytest.approx(want.parts[1], abs=1e-7)


def test_st_xy_fast_path_parity():
    s, pts = _point_series(32)
    xs = kernels.st_x(s).tolist()
    ys = kernels.st_y(s).tolist()
    for i in range(32):
        if s.iloc[i] is None:
            assert xs[i] is None and ys[i] is None
        else:
            assert (xs[i], ys[i]) == pts[i]


def test_dwithin_fast_vs_object_consistency():
    """dwithin through the fast path (point pairs) must agree with the
    bbox-rejecting object path (lines) on equivalent inputs."""
    a, pa = _point_series(20)
    b, pb = _point_series(20)
    d = pd.Series([25.0] * 20)
    fast = kernels.dwithin(a, b, d).tolist()
    # same points as 1-vertex "lines" forces the object path
    la = pd.Series([None if v is None else to_wkb(
        Geometry("LineString", [p, p]))
        for v, p in zip(a.tolist(), pa)], dtype=object)
    lb = pd.Series([None if v is None else to_wkb(
        Geometry("LineString", [p, p]))
        for v, p in zip(b.tolist(), pb)], dtype=object)
    obj = kernels.dwithin(la, lb, d).tolist()
    assert fast == obj
