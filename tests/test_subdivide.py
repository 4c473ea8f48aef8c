"""ST_Subdivide: vertex bound respected, point set preserved (area /
length identities), multi/holed/line inputs, guard rails."""

import pytest

from datafusion_geo_spark.geo.algos import area, length
from datafusion_geo_spark.geo.edit import segmentize
from datafusion_geo_spark.geo.subdivide import subdivide
from datafusion_geo_spark.geo.wkt import from_wkt


def _check(g, max_v):
    ps = subdivide(g, max_v)
    assert ps, "no pieces"
    for p in ps:
        assert len(p.vertices()) <= max_v
    return ps


def test_canonical_box_pinned():
    # the exact shape the subdivide_boxes driver oracle hardcodes:
    # segmentized 10x10 box at max_len 1 (41 verts) / max_vertices 20
    g = segmentize(from_wkt("POLYGON((0 0,10 0,10 10,0 10,0 0))"), 1.0)
    ps = _check(g, 20)
    assert len(ps) == 4
    assert max(len(p.vertices()) for p in ps) == 13
    assert sum(area(p) for p in ps) == 100.0


def test_translation_invariant_piece_count():
    for dx, dy in ((37.0, 121.0), (-250.0, 400.0), (499.0, 3.0)):
        w = (f"POLYGON(({dx} {dy},{dx+10} {dy},{dx+10} {dy+10},"
             f"{dx} {dy+10},{dx} {dy}))")
        ps = _check(segmentize(from_wkt(w), 1.0), 20)
        assert len(ps) == 4
        assert sum(area(p) for p in ps) == 100.0


def test_holed_polygon_area_preserved():
    h = from_wkt("POLYGON((0 0,10 0,10 10,0 10,0 0),"
                 "(4 4,4 6,6 6,6 4,4 4))")
    ps = _check(segmentize(h, 1.0), 20)
    assert abs(sum(area(p) for p in ps) - 96.0) < 1e-9


def test_line_and_small_inputs():
    ln = segmentize(from_wkt("LINESTRING(0 0,40 0)"), 1.0)
    ps = _check(ln, 12)
    assert abs(sum(length(p) for p in ps) - 40.0) < 1e-9
    # already small: unchanged single piece
    g = from_wkt("POLYGON((0 0,1 0,1 1,0 1,0 0))")
    assert _check(g, 20) == [g]
    # multi input subdivides per member
    m = from_wkt("MULTIPOLYGON(((0 0,1 0,1 1,0 1,0 0)),"
                 "((5 5,6 5,6 6,5 6,5 5)))")
    assert len(_check(m, 20)) == 2


def test_min_vertices_guard():
    with pytest.raises(ValueError):
        subdivide(from_wkt("POLYGON((0 0,1 0,1 1,0 1,0 0))"), 4)


def test_convex_fast_path_matches_overlay():
    """The Sutherland-Hodgman convex fast path must agree with the
    generic overlay on piece count, total area, and vertex bound for
    random convex inputs (regular n-gons, scaled/translated/rotated by
    rational-ish factors)."""
    import math

    from datafusion_geo_spark.geo import overlay
    from datafusion_geo_spark.geo import subdivide as mod
    from datafusion_geo_spark.geo.geom import Geometry

    def via_overlay(g, max_v):
        # force the robust path by monkeypatching convexity off
        orig = mod._is_convex_ring
        mod._is_convex_ring = lambda ring: False
        try:
            return mod.subdivide(g, max_v)
        finally:
            mod._is_convex_ring = orig

    for n, scale, dx, dy, rot in [(12, 3.0, 0.0, 0.0, 0.0),
                                  (24, 7.5, 11.0, -4.0, 0.3),
                                  (40, 2.25, -100.0, 55.0, 1.1),
                                  (64, 12.0, 0.5, 0.25, 2.0)]:
        ring = []
        for i in range(n):
            a = 2.0 * math.pi * i / n + rot
            ring.append((dx + scale * math.cos(a), dy + scale * math.sin(a)))
        g = Geometry.polygon([ring])
        for max_v in (8, 13, 21):
            fast = mod.subdivide(g, max_v)
            slow = via_overlay(g, max_v)
            # piece COUNT may differ (the two clippers place cut
            # vertices differently, so recursion depth can differ);
            # the contract is the vertex bound and the point set
            assert all(len(p.vertices()) <= max_v for p in fast), (n, max_v)
            af = sum(area(p) for p in fast)
            as_ = sum(area(p) for p in slow)
            assert abs(af - as_) < 1e-9 * max(1.0, abs(as_)), (n, max_v)


def test_fused_box_subdivide_stats_parity():
    """r12 fused kernel == the five staged kernels, byte for byte,
    including the NULL lane (the subdivide_boxes entry rewiring)."""
    import pandas as pd

    from datafusion_geo_spark.functions import kernels as K

    xs = [0.0, 37.0, None, 499.0, 123.0, 250.0]
    ys = [0.0, 121.0, 5.0, 3.0, None, 499.0]
    n = len(xs)
    xmin = pd.Series(xs, dtype=object)
    ymin = pd.Series(ys, dtype=object)
    xmax = pd.Series([None if v is None else v + 10 for v in xs],
                     dtype=object)
    ymax = pd.Series([None if v is None else v + 10 for v in ys],
                     dtype=object)
    seg = pd.Series([1.0] * n)
    maxv = pd.Series([20] * n)

    fused = K.box_subdivide_stats(xmin, ymin, xmax, ymax, seg, maxv)

    env = K.make_envelope(xmin, ymin, xmax, ymax)
    segd = pd.Series([None if v is None else
                      K.to_wkb(K.edit.segmentize(K.from_wkb(bytes(v)),
                                                 1.0))
                      for v in env.tolist()], dtype=object)
    for i in range(n):
        if segd.iat[i] is None:
            assert fused["areas"].iat[i] is None
            assert fused["npts"].iat[i] is None
            continue
        pieces = K.st_subdivide(pd.Series([segd.iat[i]]),
                                pd.Series([20])).iat[0]
        a_staged = K.area(pd.Series(list(pieces), dtype=object)).tolist()
        n_staged = K.npoints(pd.Series(list(pieces),
                                       dtype=object)).tolist()
        assert fused["areas"].iat[i] == a_staged, i
        assert fused["npts"].iat[i] == n_staged, i
