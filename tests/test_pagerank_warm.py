"""Warm-start (incremental) PageRank: init_ranks semantics + the
convergence claim the docstring makes."""

from __future__ import annotations

import random

import pytest

from ferenda_spark.operators.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def _ranks(df):
    return {r.node: r.rank for r in df.collect()}


def _graph(rng, n, m):
    return list({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})


def test_warm_start_reaches_same_fixed_point(spark):
    rng = random.Random(3)
    pairs = _graph(rng, 60, 240)
    e = _edges(spark, pairs)
    cold = _ranks(pagerank(e, n_iter=30))
    warm_init = pagerank(e, n_iter=6)
    warm = _ranks(pagerank(e, n_iter=24, init_ranks=warm_init))
    for k, v in cold.items():
        assert warm[k] == pytest.approx(v, abs=1e-9)


def test_warm_start_converges_faster_after_delta(spark):
    rng = random.Random(7)
    pairs = _graph(rng, 80, 320)
    e_old = _edges(spark, pairs)
    old = pagerank(e_old, n_iter=40)  # yesterday's fixed point

    delta = [(i, (i * 31 + 5) % 80) for i in range(4)]  # ~1% new edges
    e_new = _edges(spark, list(set(pairs) | set(delta)))
    truth = _ranks(pagerank(e_new, n_iter=60))

    def err(ranks):
        return max(abs(ranks[k] - truth[k]) for k in truth)

    warm4 = _ranks(pagerank(e_new, n_iter=4, init_ranks=old))
    cold4 = _ranks(pagerank(e_new, n_iter=4))
    cold6 = _ranks(pagerank(e_new, n_iter=6))
    assert err(warm4) < err(cold4) / 5  # warm start is far closer
    assert err(warm4) < err(cold6)     # >= 2 rounds saved at equal tol


def test_new_nodes_enter_uniform_and_mass_normalized(spark):
    e_old = _edges(spark, [(0, 1), (1, 2), (2, 0)])
    old = pagerank(e_old, n_iter=10)
    # delta adds node 3; stale init also carries a departed node 99
    stale = old.sparkSession.createDataFrame(
        [(99, 0.5)], "node bigint, rank double"
    )
    init = old.unionByName(stale)
    e_new = _edges(spark, [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0)])
    warm = pagerank(e_new, n_iter=0, init_ranks=init)
    got = _ranks(warm)
    assert 99 not in got
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert got[3] > 0  # new node seeded at 1/N (then normalized)


def test_warm_start_duplicate_init_rows_are_merged(spark):
    """Duplicate node rows in init_ranks must not fan out the rank
    vector through the join (regression for the round-4 advice)."""
    e = _edges(spark, [(0, 1), (1, 2), (2, 0)])
    base = pagerank(e, n_iter=5)
    doubled = base.unionByName(base)  # every node's prior twice
    clean = _ranks(pagerank(e, n_iter=3, init_ranks=base))
    dup = _ranks(pagerank(e, n_iter=3, init_ranks=doubled))
    assert set(dup) == set(clean)
    for k, v in clean.items():
        assert dup[k] == pytest.approx(v, abs=1e-12)
    assert sum(dup.values()) == pytest.approx(1.0, abs=1e-9)
