"""DBSCAN (ST_ClusterDBSCAN parity) — operator vs an in-test
brute-force reference implementation of the same semantics."""

import numpy as np
import pytest

from datafusion_geo_spark.operators.cluster import (dbscan_points,
                                                    eps_neighbor_pairs)


def _brute_dbscan(pts, eps, min_pts):
    """Reference DBSCAN: dict id -> (is_core, cluster-or-None).
    cluster = min id reachable through the core graph; border points
    adopt min cluster among core neighbors; else noise."""
    ids = sorted(pts)
    xy = {i: np.asarray(pts[i], dtype=float) for i in ids}
    nbrs = {i: [j for j in ids
                if float(np.sum((xy[i] - xy[j]) ** 2)) <= eps * eps + 1e-12]
            for i in ids}
    core = {i for i in ids if len(nbrs[i]) >= min_pts}
    # union-find over core-core edges
    parent = {i: i for i in core}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in core:
        for j in nbrs[i]:
            if j in core:
                ra, rb = find(i), find(j)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comp = {i: min(j for j in core if find(j) == find(i)) for i in core}
    out = {}
    for i in ids:
        if i in core:
            out[i] = (True, comp[i])
        else:
            cn = [comp[j] for j in nbrs[i] if j in core]
            out[i] = (False, min(cn)) if cn else (False, None)
    return out


def _run(spark, pts, eps, min_pts):
    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in sorted(pts.items())],
        "id long, x double, y double")
    got = {r["id"]: (r["is_core"], r["cluster"])
           for r in dbscan_points(df, eps, min_pts).collect()}
    assert got == _brute_dbscan(pts, eps, min_pts)


def test_two_blobs_border_noise(spark):
    pts = {}
    for ix in range(5):
        for iy in range(5):
            pts[ix * 5 + iy] = (ix, iy)          # blob A: 5x5 lattice
    for k, ix in enumerate(range(4)):
        for iy in range(4):
            pts[100 + ix * 4 + iy] = (100 + ix, 100 + iy)  # blob B
    pts[800] = (5.4, 0.0)                        # border of blob A
    pts[900] = (500.0, 500.0)                    # noise
    pts[901] = (600.0, -50.0)                    # noise
    _run(spark, pts, eps=1.5, min_pts=4)


def test_duplicate_coordinates_min_pts(spark):
    # min_pts duplicates at one coordinate are all core, isolated pair
    # below min_pts is noise
    pts = {i: (10.0, 10.0) for i in range(4)}
    pts.update({50: (20.0, 20.0), 51: (20.0, 20.0)})
    _run(spark, pts, eps=0.5, min_pts=4)


def test_chain_is_one_cluster(spark):
    # a long eps-chain: every point core with min_pts=2, single cluster
    pts = {i: (i * 0.9, 0.0) for i in range(30)}
    _run(spark, pts, eps=1.0, min_pts=2)


@pytest.mark.parametrize("seed", [7, 42])
def test_random_vs_brute(spark, seed):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-100, 100, size=(6, 2))
    pts, nid = {}, 0
    for c in centers:
        for p in c + rng.normal(0, 1.0, size=(25, 2)):
            pts[nid] = (round(float(p[0]), 3), round(float(p[1]), 3))
            nid += 1
    for p in rng.uniform(-150, 150, size=(15, 2)):   # sparse noise
        pts[nid] = (round(float(p[0]), 3), round(float(p[1]), 3))
        nid += 1
    _run(spark, pts, eps=1.2, min_pts=5)


def test_self_pairs_present(spark):
    df = spark.createDataFrame([(1, 0.0, 0.0), (2, 10.0, 0.0)],
                               "id long, x double, y double")
    pairs = {(r["ia"], r["ib"])
             for r in eps_neighbor_pairs(df, 1.0).collect()}
    assert pairs == {(1, 1), (2, 2)}


def test_cluster_within_is_minpts1(spark):
    from datafusion_geo_spark.operators.cluster import cluster_within_points
    pts = {0: (0.0, 0.0), 1: (1.0, 0.0), 2: (2.5, 0.0),
           3: (10.0, 10.0), 4: (10.5, 10.0), 5: (50.0, 50.0)}
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in sorted(pts.items())],
        "id long, x double, y double")
    got = {r["id"]: r["cluster"]
           for r in cluster_within_points(df, 1.6).collect()}
    want = {i: c for i, (_, c) in _brute_dbscan(pts, 1.6, 1).items()}
    assert got == want == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5}


def test_duplicate_coordinate_contraction_parity(spark):
    """r11 coordinate-group contraction: heavy duplicate coordinates
    (several points per exact (x, y)) must produce the identical
    per-point result as brute-force DBSCAN on the point multiset —
    duplicates share core status and cluster, and multiplicity counts
    toward min_pts through the group weight."""
    import random
    rng = random.Random(411)
    pts, nid = {}, 0
    coords = [(float(ix), float(iy)) for ix in range(4) for iy in range(3)]
    coords += [(100.0, 100.0), (200.0, -50.0)]      # isolated duplicates
    for (x, y) in coords:
        for _ in range(rng.randint(1, 5)):          # 1..5 copies each
            pts[nid] = (x, y)
            nid += 1
    _run(spark, pts, eps=1.5, min_pts=4)
    # min_pts reachable ONLY through multiplicity: a lone coordinate
    # with weight 4 is its own core cluster
    _run(spark, {0: (0.0, 0.0), 1: (0.0, 0.0), 2: (0.0, 0.0),
                 3: (0.0, 0.0), 4: (9.0, 9.0)}, eps=1.0, min_pts=4)
