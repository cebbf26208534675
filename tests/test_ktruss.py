"""k-truss (operators/graph_analytics.py:k_truss) vs a naive
pure-Python peel."""

from __future__ import annotations

import itertools
import random

from ferenda_spark.operators.graph_analytics import k_truss


def _brute_truss(edges, k):
    es = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    while True:
        adj = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {e: len((adj[e[0]] & adj[e[1]])) for e in es}
        bad = {e for e, s in sup.items() if s < k - 2}
        if not bad:
            return {e: sup[e] for e in es}
        es -= bad


def _got(spark, edges, k):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    return {(r.a, r.b): r.support for r in k_truss(df, k).collect()}


def test_clique_survives(spark):
    # K5 plus a pendant path: the 4-truss is exactly K5
    edges = list(itertools.combinations(range(5), 2)) + [(4, 10), (10, 11)]
    got = _got(spark, edges, 4)
    assert got == _brute_truss(edges, 4)
    assert set(got) == set(itertools.combinations(range(5), 2))
    assert all(s == 3 for s in got.values())


def test_triangle_chain(spark):
    # two triangles sharing a vertex: each edge has support 1 -> 3-truss
    # keeps everything, 4-truss empties
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4)]
    assert _got(spark, edges, 3) == _brute_truss(edges, 3)
    assert _got(spark, edges, 4) == {}


def test_cascade_peel(spark):
    # K4 with one edge hanging off a triangle that dies once the bridge
    # edge is peeled — exercises multi-round cascade
    edges = list(itertools.combinations(range(4), 2)) + [
        (3, 5), (3, 6), (5, 6)]
    got = _got(spark, edges, 4)
    assert got == _brute_truss(edges, 4)
    assert set(got) == set(itertools.combinations(range(4), 2))


def test_random_vs_brute(spark):
    rng = random.Random(41)
    edges = list({(rng.randrange(15), rng.randrange(15))
                  for _ in range(55)})
    for k in (3, 4, 5):
        assert _got(spark, edges, k) == _brute_truss(edges, k), k
