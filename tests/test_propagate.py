"""Feature propagation (operators/graph_analytics.py:propagate_features)
vs a dict-based replay."""

from __future__ import annotations

import random

import pytest

from ferenda_spark.operators.graph_analytics import propagate_features


def _ref(edges, feats, hops, include_self=True, directed=False):
    adj = set()
    for a, b in edges:
        if a == b:
            continue
        adj.add((a, b))
        if not directed:
            adj.add((b, a))
    if include_self:
        for n in feats:
            adj.add((n, n))
    v = dict(feats)
    for _ in range(hops):
        nxt = {}
        for a, b in adj:
            if a in v:
                nxt.setdefault(b, []).append(v[a])
        v = {b: sum(xs) / len(xs) for b, xs in nxt.items()}
    return v


def _run(spark, edges, feats, **kw):
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    f = spark.createDataFrame(list(feats.items()), "node bigint, value double")
    return {r.node: r.value
            for r in propagate_features(e, f, **kw).collect()}


def test_matches_reference_random(spark):
    rng = random.Random(19)
    edges = list({(rng.randrange(15), rng.randrange(15)) for _ in range(40)})
    feats = {n: float(n * n % 7) for n in range(0, 15, 2)}
    for hops in (1, 2, 3):
        got = _run(spark, edges, feats, hops=hops)
        want = _ref(edges, feats, hops)
        assert set(got) == set(want), hops
        for n, x in want.items():
            assert got[n] == pytest.approx(x, abs=1e-9), (hops, n)


def test_isolated_featured_node_keeps_value(spark):
    got = _run(spark, [(0, 1)], {0: 1.0, 1: 3.0, 9: 7.0}, hops=3)
    assert got[9] == pytest.approx(7.0)
    # connected pair converges toward the mutual mean
    assert got[0] == pytest.approx(got[1], abs=0.6)


def test_unfeatured_node_acquires_neighbor_mean(spark):
    got = _run(spark, [(0, 2), (1, 2)], {0: 2.0, 1: 4.0}, hops=1)
    assert got[2] == pytest.approx(3.0)


def test_directed_one_way(spark):
    got = _run(spark, [(0, 1)], {0: 10.0}, hops=1,
               directed=True, include_self=False)
    assert got == {1: pytest.approx(10.0)}
