"""Sampled betweenness (operators/graph_analytics.py:betweenness_sample)
vs a pure-Python Brandes implementation on the same pivot set."""

from __future__ import annotations

import random
from collections import deque

import pytest

from ferenda_spark.operators.graph_analytics import betweenness_sample


def _brandes(edges, seeds, directed=False, max_depth=10):
    adj = {}
    for a, b in set(edges):
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        if not directed:
            adj.setdefault(b, set()).add(a)
    delta_sum = {}
    for s in seeds:
        dist = {s: 0}
        sigma = {s: 1.0}
        order = [s]
        q = deque([s])
        while q:
            v = q.popleft()
            if dist[v] >= max_depth:
                continue
            for w in sorted(adj.get(v, ())):
                if w not in dist:
                    dist[w] = dist[v] + 1
                    sigma[w] = 0.0
                    order.append(w)
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = {v: 0.0 for v in order}
        for w in reversed(order):
            for v in adj.get(w, ()) if not directed else ():
                if dist.get(v, -2) == dist[w] - 1:
                    delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if directed:
                # predecessors under directed edges: v -> w
                for v in [x for x in dist if w in adj.get(x, ())]:
                    if dist[v] == dist[w] - 1:
                        delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
        for v, dl in delta.items():
            if v != s:
                delta_sum[v] = delta_sum.get(v, 0.0) + dl
    return delta_sum


def _got(spark, edges, seeds, **kw):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    out = betweenness_sample(df, seeds, **kw).collect()
    return {r.node: r.delta_sum for r in out}


def test_path_graph_center(spark):
    # path 0-1-2-3-4, all nodes as pivots: node 2 is the bottleneck
    edges = [(0, 1), (1, 2), (2, 3), (3, 4)]
    seeds = [0, 1, 2, 3, 4]
    got = _got(spark, edges, seeds)
    want = _brandes(edges, seeds)
    assert set(got) == set(want)
    for n, v in want.items():
        assert got[n] == pytest.approx(v, abs=1e-9), n
    # classic exact values for P5 (undirected, both directions counted):
    assert got[2] == pytest.approx(8.0)
    assert got[1] == pytest.approx(6.0)


def test_star_graph(spark):
    edges = [(0, i) for i in range(1, 6)]
    seeds = list(range(6))
    got = _got(spark, edges, seeds)
    want = _brandes(edges, seeds)
    for n, v in want.items():
        assert got[n] == pytest.approx(v, abs=1e-9)
    assert got[0] == pytest.approx(20.0)  # n=6 star center: (5*4)


def test_random_graph_vs_reference(spark):
    rng = random.Random(23)
    edges = list({(rng.randrange(25), rng.randrange(25)) for _ in range(60)})
    seeds = [0, 3, 7, 11, 19]
    got = _got(spark, edges, seeds)
    want = _brandes(edges, seeds)
    assert set(got) == set(want)
    for n, v in want.items():
        assert got[n] == pytest.approx(v, abs=1e-9), n


def test_multiple_shortest_paths_split_credit(spark):
    # diamond: 0->1->3, 0->2->3 (undirected): from pivot 0, nodes 1 and 2
    # each carry half the dependency for 3
    edges = [(0, 1), (0, 2), (1, 3), (2, 3)]
    got = _got(spark, edges, [0])
    assert got[1] == pytest.approx(0.5)
    assert got[2] == pytest.approx(0.5)
    assert got[3] == pytest.approx(0.0)


def test_depth_cap_truncates(spark):
    edges = [(i, i + 1) for i in range(6)]
    got = _got(spark, edges, [0], max_depth=2)
    want = _brandes(edges, [0], max_depth=2)
    assert set(got) == set(want)
    for n, v in want.items():
        assert got[n] == pytest.approx(v, abs=1e-9)


def test_directed(spark):
    edges = [(0, 1), (1, 2), (0, 2), (2, 3)]
    got = _got(spark, edges, [0, 1], directed=True)
    want = _brandes(edges, [0, 1], directed=True)
    assert set(got) == set(want)
    for n, v in want.items():
        assert got[n] == pytest.approx(v, abs=1e-9), n
