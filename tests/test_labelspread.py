"""Label spreading (operators/labelspread.py) vs a dense numpy replay of
the Zhou et al. update rule."""

from __future__ import annotations

import random

import numpy as np
import pytest

from ferenda_spark.operators.labelspread import assign_labels, spread_labels


def _reference(edges, seeds, alpha, n_iter):
    nodes = sorted({x for e in edges for x in e} | {n for n, _ in seeds})
    idx = {n: i for i, n in enumerate(nodes)}
    labels = sorted({l for _, l in seeds})
    lidx = {l: j for j, l in enumerate(labels)}
    n, k = len(nodes), len(labels)
    A = np.zeros((n, n))
    for a, b in set(edges):
        if a == b:
            continue
        A[idx[a], idx[b]] = 1.0
        A[idx[b], idx[a]] = 1.0
    d = A.sum(axis=1)
    with np.errstate(divide="ignore"):
        dinv = np.where(d > 0, 1.0 / np.sqrt(d), 0.0)
    S = A * dinv[:, None] * dinv[None, :]
    Y = np.zeros((n, k))
    for nd, l in set(seeds):
        Y[idx[nd], lidx[l]] = 1.0
    Fm = Y.copy()
    for _ in range(n_iter):
        Fm = alpha * (S.T @ Fm) + (1 - alpha) * Y
    return nodes, labels, Fm


def _run(spark, edges, seeds, alpha=0.85, n_iter=5):
    e = spark.createDataFrame(edges, "src bigint, dst bigint")
    s = spark.createDataFrame(seeds, "node bigint, label string")
    return spread_labels(e, s, alpha=alpha, n_iter=n_iter)


def test_matches_numpy_random(spark):
    rng = random.Random(31)
    edges = list({(rng.randrange(20), rng.randrange(20)) for _ in range(50)})
    seeds = [(0, "spam"), (1, "spam"), (15, "ham"), (16, "ham")]
    got = {(r.node, r.label): r.score
           for r in _run(spark, edges, seeds, n_iter=4).collect()}
    nodes, labels, Fm = _reference(edges, seeds, 0.85, 4)
    for i, nd in enumerate(nodes):
        for j, l in enumerate(labels):
            want = Fm[i, j]
            if (nd, l) in got:
                assert got[(nd, l)] == pytest.approx(want, abs=1e-9), (nd, l)
            else:
                assert want == pytest.approx(0.0, abs=1e-12), (nd, l)


def test_seeds_stay_anchored(spark):
    # n_iter=20: a bipartite path oscillates (the 2-hop seed's mass
    # arrives on alternating rounds) — the α^t-geometric fixed point
    # needs ~15 rounds before nearest-seed dominance is stable
    edges = [(0, 1), (1, 2), (2, 3)]
    seeds = [(0, "spam"), (3, "ham")]
    scores = _run(spark, edges, seeds, n_iter=20)
    hard = {r.node: r.label for r in assign_labels(scores).collect()}
    assert hard[0] == "spam" and hard[1] == "spam"
    assert hard[3] == "ham" and hard[2] == "ham"


def test_tie_breaks_min_label(spark):
    # node 1 equidistant between two seeds with symmetric structure
    edges = [(0, 1), (1, 2)]
    seeds = [(0, "b_label"), (2, "a_label")]
    scores = _run(spark, edges, seeds, n_iter=4)
    hard = {r.node: r.label for r in assign_labels(scores).collect()}
    assert hard[1] == "a_label"


def test_isolated_seed_keeps_label(spark):
    edges = [(0, 1)]
    seeds = [(5, "x")]  # node 5 has no edges
    got = {(r.node, r.label): r.score
           for r in _run(spark, edges, seeds, alpha=0.8, n_iter=3).collect()}
    # F(5,x) = (1-a) after round 1, stays (1-a) (no neighbors)
    assert got[(5, "x")] == pytest.approx(0.2, abs=1e-12)
