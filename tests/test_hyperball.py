"""HyperBall (operators/hyperball.py) vs an exact BFS reference.

At toy cardinalities the Datasketches HLL sits in exact (coupon list)
mode, so estimates should match BFS counts exactly; assertions still
allow a small relative tolerance so a library-side estimator tweak
degrades the test to 'approximate', not red."""

import math

import pytest
from hypothesis import given, settings, strategies as st

from ferenda_spark.operators.hyperball import hyperball

REL = 0.03


def _bfs_ref(edges, transpose=True):
    """{node: (reachable, harmonic, sum_dist, lin)} — exact, over the
    (optionally transposed) simple digraph."""
    e = {(b, a) if transpose else (a, b) for a, b in edges if a != b}
    nodes = sorted({x for p in e for x in p})
    adj = {n: [] for n in nodes}
    for a, b in e:
        adj[a].append(b)
    out = {}
    for s in nodes:
        dist = {s: 0}
        frontier = [s]
        d = 0
        while frontier:
            d += 1
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = d
                        nxt.append(v)
            frontier = nxt
        harm = sum(1.0 / dd for dd in dist.values() if dd > 0)
        sd = float(sum(dist.values()))
        lin = (len(dist) ** 2) / sd if sd > 0 else 1.0
        out[s] = (float(len(dist)), harm, sd, lin)
    return out


def _run(spark, edges, **kw):
    df = spark.createDataFrame(sorted(set(edges)), "src long, dst long")
    return {
        r["node"]: (
            r["reachable_est"], r["harmonic"], r["sum_dist"], r["lin"]
        )
        for r in hyperball(df, **kw).collect()
    }


def _close(got, exp):
    assert set(got) == set(exp)
    for n in exp:
        for g, e in zip(got[n], exp[n]):
            assert g == pytest.approx(e, rel=REL, abs=1e-9), (n, got[n], exp[n])


def test_path_graph_harmonic(spark):
    edges = [(1, 2), (2, 3), (3, 4)]
    got = _run(spark, edges)
    _close(got, _bfs_ref(edges))
    # spot values: harmonic(4) = 1 + 1/2 + 1/3 over the three ancestors
    assert got[4][1] == pytest.approx(1 + 0.5 + 1 / 3, rel=REL)
    assert got[1][1] == 0.0 and got[1][3] == 1.0  # nothing reaches node 1


def test_transpose_false_is_outward(spark):
    edges = [(1, 2), (2, 3), (3, 4)]
    got = _run(spark, edges, transpose=False)
    # outward: node 1 reaches everyone, node 4 reaches nobody
    _close(got, {n: v for n, v in _bfs_ref(edges, transpose=False).items()})
    assert got[1][0] == pytest.approx(4, rel=REL)
    assert got[4][1] == 0.0


def test_star_hub(spark):
    # spokes -> hub: harmonic(hub) = k, every spoke 0
    k = 6
    edges = [(i, 99) for i in range(k)]
    got = _run(spark, edges)
    assert got[99][1] == pytest.approx(k, rel=REL)
    assert all(got[i][1] == 0.0 for i in range(k))


def test_disconnected_components_do_not_mix(spark):
    edges = [(1, 2), (2, 1), (10, 11)]
    _close(_run(spark, edges), _bfs_ref(edges))


def test_cycle_converges_before_max_iter(spark):
    edges = [(1, 2), (2, 3), (3, 1)]
    got = _run(spark, edges, max_iter=32)
    exp = _bfs_ref(edges)
    _close(got, exp)
    # all symmetric on a cycle
    assert got[1] == got[2] == got[3]


def test_string_node_ids(spark):
    df = spark.createDataFrame(
        [("a.com", "b.com"), ("b.com", "c.com")], "src string, dst string"
    )
    got = {r["node"]: r["harmonic"] for r in hyperball(df).collect()}
    assert got["c.com"] == pytest.approx(1.5, rel=REL)
    assert got["a.com"] == 0.0


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)),
        min_size=1,
        max_size=24,
    ),
    st.booleans(),
)
def test_matches_bfs_on_random_digraphs(spark, edges, transpose):
    edges = [e for e in edges if e[0] != e[1]]
    if not edges:
        return
    _close(
        _run(spark, edges, transpose=transpose),
        _bfs_ref(edges, transpose=transpose),
    )
