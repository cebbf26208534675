"""graph_summary (operators/profiling.py) vs brute-force stats."""

from __future__ import annotations

import random

import pytest

from ferenda_spark.operators.profiling import graph_summary


def _brute(edges):
    es = set(edges)
    loops = {e for e in es if e[0] == e[1]}
    clean = es - loops
    nodes = {x for e in clean for x in e}
    recip = sum(1 for a, b in clean if (b, a) in clean)
    outdeg = {}
    for a, _ in clean:
        outdeg[a] = outdeg.get(a, 0) + 1
    degs = sorted(outdeg.get(n, 0) for n in nodes)
    n, s = len(degs), sum(degs)
    gini = (
        sum((2 * (i + 1) - n - 1) * d for i, d in enumerate(degs)) / (n * s)
        if s else 0.0
    )
    return {
        "n_nodes": n,
        "n_edges": len(clean),
        "n_self_loops": len(loops),
        "reciprocity": recip / len(clean) if clean else 0.0,
        "out_gini": gini,
        "max_out_share": (max(outdeg.values()) / len(clean)
                          if outdeg else 0.0),
        "dangling_share": (n - len(outdeg)) / n if n else 0.0,
    }


def _got(spark, edges):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    return graph_summary(df).collect()[0].asDict()


def _check(spark, edges):
    got, want = _got(spark, edges), _brute(edges)
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-9), k


def test_hand_case(spark):
    # 0<->1 reciprocal, 1->2, 2->2 self-loop; node 3 isolated-by-loop only
    edges = [(0, 1), (1, 0), (1, 2), (2, 2)]
    _check(spark, edges)
    got = _got(spark, edges)
    assert got["reciprocity"] == pytest.approx(2 / 3)
    assert got["n_self_loops"] == 1
    assert got["dangling_share"] == pytest.approx(1 / 3)  # node 2


def test_random_graphs(spark):
    for seed in (5, 11):
        rng = random.Random(seed)
        edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(150)]
        _check(spark, edges)


def test_star_gini_extremes(spark):
    # perfect star: one source owns all edges -> high gini, max share 1.0
    edges = [(0, i) for i in range(1, 20)]
    got = _got(spark, edges)
    assert got["max_out_share"] == pytest.approx(1.0)
    _check(spark, edges)
    # regular ring: all degrees equal -> gini 0
    ring = [(i, (i + 1) % 12) for i in range(12)]
    assert _got(spark, ring)["out_gini"] == pytest.approx(0.0, abs=1e-12)
