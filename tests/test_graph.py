"""Behavioral tests for the graph operators on a hand-built graph.

Orders: o1 = {1,2,3} (a triangle), o2 = {3,4}, o3 = {4,5,3} — known
edges, degrees, triangle count, and PageRank mass to check against.
"""

import pytest

from big_data_analytics_project_spark.operators import graph as G


@pytest.fixture(scope="module")
def li(spark):
    rows = [
        (1, 1), (1, 2), (1, 3), (1, 3),  # duplicate membership collapses
        (2, 3), (2, 4),
        (3, 4), (3, 5), (3, 3),
    ]
    return spark.createDataFrame(rows, "l_orderkey long, l_partkey long")


def test_edges_canonical_distinct(li):
    edges = {(r.src, r.dst) for r in G.copurchase_edges(li).collect()}
    assert edges == {(1, 2), (1, 3), (2, 3), (3, 4), (3, 5), (4, 5)}


def test_degrees(li):
    deg = {r.node: r.deg for r in G.degrees(G.copurchase_edges(li)).collect()}
    assert deg == {1: 2, 2: 2, 3: 4, 4: 2, 5: 2}


def test_triangle_count_exact(li):
    # triangles: {1,2,3} and {3,4,5}
    tri = G.triangle_count(G.copurchase_edges(li)).collect()[0].n_triangles
    assert tri == 2


def test_pagerank_mass_and_ranking(li):
    pr = {r.node: r.pr for r in G.pagerank(G.copurchase_edges(li), 3).collect()}
    assert set(pr) == {1, 2, 3, 4, 5}
    # fixed-point truncation only ever LOSES mass, at most deg*1e-12/node/iter
    assert 0.999 < sum(pr.values()) <= 1.0 + 1e-9
    # node 3 bridges both triangles — strictly highest rank
    assert pr[3] == max(pr.values())
    assert all(pr[n] < pr[3] for n in (1, 2, 4, 5))


def test_pagerank_rerun_deterministic(li):
    edges = G.copurchase_edges(li)
    a = sorted(map(tuple, G.pagerank(edges, 3).collect()))
    b = sorted(map(tuple, G.pagerank(edges, 3).collect()))
    assert a == b


def test_triangles_per_node(li):
    tri = {r.node: r.triangles for r in G.triangles_per_node(G.copurchase_edges(li)).collect()}
    # triangles {1,2,3} and {3,4,5}: node 3 corners both
    assert tri == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1}


def test_common_neighbors_counts(li):
    cn = {(r.a, r.c): r.cn for r in G.common_neighbors(G.copurchase_edges(li)).collect()}
    # non-adjacent pairs via node 3: (1,4),(1,5),(2,4),(2,5) each share only 3
    for pair in [(1, 4), (1, 5), (2, 4), (2, 5)]:
        assert cn[pair] == 1
    # adjacent pairs inside a triangle share exactly one common neighbor
    assert cn[(1, 2)] == 1 and cn[(4, 5)] == 1
    # (1,3) share 2; (3,5) share 4
    assert cn[(1, 3)] == 1 and cn[(3, 5)] == 1
