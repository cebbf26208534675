"""Modularity decomposition (operators/graph.py:modularity) vs the
textbook formula computed brute-force in Python."""

from __future__ import annotations

import random

import pytest

from ferenda_spark.operators.graph import (
    connected_components,
    modularity,
    modularity_score,
)


def _brute_q(edges, labels):
    """Per-community (n_nodes, m_internal, deg_total, q_contrib)."""
    canon = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    m = len(canon)
    deg = {}
    for a, b in canon:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    out = {}
    for n, c in labels.items():
        st = out.setdefault(c, [0, 0, 0])
        st[0] += 1
        st[2] += deg.get(n, 0)
    for a, b in canon:
        if labels[a] == labels[b]:
            out[labels[a]][1] += 1
    return {
        c: (n, mi, dt, mi / m - (dt / (2 * m)) ** 2)
        for c, (n, mi, dt) in out.items()
    }


def test_two_triangles_bridge(spark):
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    labels = {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1}
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    l = spark.createDataFrame(list(labels.items()), "node bigint, comp bigint")
    rows = modularity(e, l).collect()
    got = {r.comp: (r.n_nodes, r.m_internal, r.deg_total,
                    pytest.approx(r.q_contrib, abs=1e-12)) for r in rows}
    assert got == _brute_q(edges, labels)
    q = modularity_score(modularity(e, l)).collect()[0]
    # 2 * (3/7 - (7/14)^2)
    assert q.modularity == pytest.approx(2 * (3 / 7 - 0.25), abs=1e-12)
    assert q.n_communities == 2


def test_random_vs_brute(spark):
    rng = random.Random(17)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(200)]
    labels = {n: n % 7 for n in range(40)}
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    l = spark.createDataFrame(list(labels.items()), "node bigint, comp bigint")
    rows = modularity(e, l).collect()
    want = _brute_q(edges, labels)
    assert len(rows) == len(want)
    for r in rows:
        n, mi, dt, q = want[r.comp]
        assert (r.n_nodes, r.m_internal, r.deg_total) == (n, mi, dt)
        assert r.q_contrib == pytest.approx(q, abs=1e-12)


def test_perfect_components_labels(spark):
    # disjoint cliques labeled by their own component -> high Q;
    # single-community labeling -> Q == 0 exactly
    edges = []
    for base in (0, 10, 20):
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((base + i, base + j))
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    comps = connected_components(e)
    per = modularity(e, comps)
    q = modularity_score(per).collect()[0]
    assert q.n_communities == 3
    assert q.modularity == pytest.approx(3 * (1 / 3 - 1 / 9), abs=1e-12)
    one = spark.createDataFrame([(n, 0) for n in {x for t in edges for x in t}],
                                "node bigint, comp bigint")
    q1 = modularity_score(modularity(e, one)).collect()[0]
    assert q1.modularity == pytest.approx(0.0, abs=1e-12)


def test_string_node_ids(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("x", "y")]
    labels = [("a", "g1"), ("b", "g1"), ("c", "g1"), ("x", "g2"), ("y", "g2")]
    e = spark.createDataFrame(edges, "src string, dst string")
    l = spark.createDataFrame(labels, "node string, comp string")
    got = {r.comp: r.q_contrib for r in modularity(e, l).collect()}
    assert got["g1"] == pytest.approx(3 / 4 - (6 / 8) ** 2, abs=1e-12)
    assert got["g2"] == pytest.approx(1 / 4 - (2 / 8) ** 2, abs=1e-12)
