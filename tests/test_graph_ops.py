import itertools
import random

import pytest

from phenobert_spark.operators.closure import bfs_distances
from phenobert_spark.operators.kg_metrics import triangle_count


def _bfs_ref(edges, sources):
    """Driver-side BFS reference."""
    adj = {}
    for s, t in edges:
        adj.setdefault(s, []).append(t)
    dist = {s: 0 for s in sources}
    frontier = list(sources)
    d = 0
    while frontier:
        d += 1
        nxt = []
        for u in frontier:
            for v in adj.get(u, []):
                if v not in dist:
                    dist[v] = d
                    nxt.append(v)
        frontier = nxt
    return dist


def test_bfs_min_distance_on_diamond(spark):
    # two paths of different length to the same node: BFS must record
    # the SHORTER one (1 -> 5 direct vs 1 -> 2 -> 3 -> 5)
    edges = [(1, 2), (2, 3), (3, 5), (1, 5), (5, 6), (7, 8)]
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    s = spark.createDataFrame([(1,)], "node bigint")
    got = {r.node: r.dist for r in bfs_distances(e, s).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 5: 1, 6: 2}
    # node 7/8 unreachable -> absent, not dist=null


def test_bfs_multi_source_and_random_graph(spark):
    rng = random.Random(7)
    nodes = list(range(60))
    edges = [
        (a, b)
        for a in nodes
        for b in nodes
        if a != b and rng.random() < 0.04
    ]
    sources = [0, 1, 2]
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    s = spark.createDataFrame([(x,) for x in sources], "node bigint")
    got = {r.node: r.dist for r in bfs_distances(e, s).collect()}
    assert got == _bfs_ref(edges, sources)


def test_bfs_raises_past_iteration_budget(spark):
    chain = [(i, i + 1) for i in range(10)]
    e = spark.createDataFrame(chain, "src bigint, dst bigint")
    s = spark.createDataFrame([(0,)], "node bigint")
    with pytest.raises(RuntimeError, match="max_iters"):
        bfs_distances(e, s, max_iters=3)


def _tri_ref(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = dict.fromkeys(adj, 0)
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    return {
        n: (len(adj[n]), tri[n]) for n in adj
    }


def test_triangles_k4_and_star(spark):
    k4 = list(itertools.combinations([1, 2, 3, 4], 2))
    star = [(100, x) for x in range(101, 106)]
    # duplicate + reversed + self-loop edges must be normalized away
    noisy = k4 + star + [(2, 1), (3, 3), (1, 2)]
    e = spark.createDataFrame(noisy, "src bigint, dst bigint")
    got = {r.node: r for r in triangle_count(e).collect()}
    for n in [1, 2, 3, 4]:
        assert got[n].degree == 3
        assert got[n].triangles == 3  # K4: C(3,2) triangles per node
        assert abs(got[n].clustering - 1.0) < 1e-12
    assert got[100].degree == 5 and got[100].triangles == 0
    assert got[100].clustering == 0.0
    for n in range(101, 106):
        assert got[n].degree == 1 and got[n].triangles == 0


def test_triangles_match_brute_force_random(spark):
    rng = random.Random(13)
    edges = [
        (a, b)
        for a in range(40)
        for b in range(40)
        if a < b and rng.random() < 0.12
    ]
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        r.node: (r.degree, r.triangles) for r in triangle_count(e).collect()
    }
    assert got == _tri_ref(edges)


def test_transitive_reduction_drops_exactly_the_shortcuts(spark):
    from phenobert_spark.operators.closure import transitive_reduction

    # chain a->b->c->d plus every shortcut; reduction = the chain.
    chain = [("a", "b"), ("b", "c"), ("c", "d")]
    shortcuts = [("a", "c"), ("a", "d"), ("b", "d")]
    # plus a disconnected minimal edge that must survive untouched
    extra = [("x", "y")]
    edges = spark.createDataFrame(
        chain + shortcuts + extra, "child string, parent string"
    )
    out = {(r.child, r.parent) for r in transitive_reduction(edges).collect()}
    assert out == set(chain + extra)


def test_transitive_reduction_keeps_diamond_sides(spark):
    from phenobert_spark.operators.closure import transitive_reduction

    # diamond a->{b,c}->d: no edge is implied by a longer path,
    # so the reduction is the identity.
    edges_l = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")]
    edges = spark.createDataFrame(edges_l, "child string, parent string")
    out = {(r.child, r.parent) for r in transitive_reduction(edges).collect()}
    assert out == set(edges_l)


def test_cyclic_nodes_finds_exactly_the_cycle_members(spark):
    from phenobert_spark.operators.closure import cyclic_nodes

    # a -> b -> c -> a (cycle) ; d -> a (on-ramp, NOT on the cycle) ;
    # e -> f (clean chain)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("d", "a"), ("e", "f")],
        "child string, parent string",
    )
    got = {r.node for r in cyclic_nodes(edges).collect()}
    assert got == {"a", "b", "c"}


def test_cyclic_nodes_empty_on_dag_and_self_loop(spark):
    from phenobert_spark.operators.closure import cyclic_nodes

    dag = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")], "child string, parent string"
    )
    assert cyclic_nodes(dag).count() == 0
    loop = spark.createDataFrame(
        [("x", "x"), ("x", "y")], "child string, parent string"
    )
    assert {r.node for r in cyclic_nodes(loop).collect()} == {"x"}


def test_cyclic_nodes_accepts_precomputed_closure(spark):
    from phenobert_spark.operators.closure import (
        cyclic_nodes,
        transitive_closure,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "child string, parent string"
    )
    cl = transitive_closure(edges)
    got = {r.node for r in cyclic_nodes(edges, closure=cl).collect()}
    assert got == {"a", "b"}
