"""triangle_count (operators/graph.py): degree-oriented exact count
vs brute force on random graphs."""

from itertools import combinations

from datafusion_geo_spark.operators.graph import triangle_count


def _brute(edges):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    verts = sorted({x for e in es for x in e})
    tri = sum(1 for a, b, c in combinations(verts, 3)
              if (a, b) in es and (a, c) in es and (b, c) in es)
    return len(verts), len(es), tri


def _df(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


def test_known_graphs(spark):
    k4 = [(a, b) for a, b in combinations(range(4), 2)]
    r = triangle_count(_df(spark, k4)).collect()[0]
    assert (r.n_vertices, r.n_edges, r.n_triangles) == (4, 6, 4)
    # n_wedges counts ORIENTED wedges (candidate triangles at each
    # edge's minimum corner), not undirected 2-paths: a path graph
    # orients every edge away from its endpoints' minimum, so no
    # source holds two out-edges and no candidate is ever checked
    path = [(0, 1), (1, 2), (2, 3)]
    r = triangle_count(_df(spark, path)).collect()[0]
    assert (r.n_triangles, r.n_wedges) == (0, 0)
    # duplicates / reversed / self-loops collapse
    messy = [(0, 1), (1, 0), (0, 1), (2, 2), (1, 2), (0, 2)]
    r = triangle_count(_df(spark, messy)).collect()[0]
    assert (r.n_vertices, r.n_edges, r.n_triangles) == (3, 3, 1)


def test_random_graphs_match_brute_force(spark):
    import random
    rng = random.Random(13)
    for trial in range(3):
        n = 14
        edges = [(rng.randrange(n), rng.randrange(n))
                 for _ in range(40)]
        nv, ne, tri = _brute(edges)
        r = triangle_count(_df(spark, edges)).collect()[0]
        assert (r.n_vertices, r.n_edges, r.n_triangles) == \
            (nv, ne, tri), (trial, edges)


def test_hub_graph(spark):
    # star + one rim edge: exactly 1 triangle, hub degree high —
    # orientation must point AWAY from low-degree rim vertices
    star = [(0, i) for i in range(1, 10)] + [(1, 2)]
    r = triangle_count(_df(spark, star)).collect()[0]
    assert r.n_triangles == 1
