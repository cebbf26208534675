"""Redirect resolution (operators/redirects.py) vs a naive chain walker."""

from __future__ import annotations

import random

import pytest

from ferenda_spark.operators.redirects import resolve_redirects


def _naive(edges):
    nxt = {}
    for a, b in edges:
        if a != b:
            nxt[a] = min(b, nxt.get(a, b))
    out = {}
    for u in nxt:
        seen, cur, hops = {u}, nxt[u], 1
        while cur in nxt and cur not in seen:
            seen.add(cur)
            cur = nxt[cur]
            hops += 1
        if cur in nxt:  # stopped because of a revisit → loop
            out[u] = (None, None, True)
        else:
            out[u] = (cur, hops, False)
    return out


def _run(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {
        r.url: (r.final_url, r.n_hops, r.is_cycle)
        for r in resolve_redirects(df).collect()
    }


def test_chains_cycles_and_conflicts(spark):
    edges = [
        ("a", "b"), ("b", "c"), ("c", "d"),            # 3-hop chain
        ("x", "y"), ("y", "z"), ("z", "x"),            # 3-loop
        ("p", "x"),                                    # leads into loop
        ("q", "r"), ("q", "m"),                        # conflict: min wins
        ("solo", "end"),
    ]
    got = _run(spark, edges)
    assert got["a"] == ("d", 3, False)
    assert got["b"] == ("d", 2, False)
    assert got["x"] == (None, None, True)
    assert got["p"] == (None, None, True)
    assert got["q"] == ("m", 1, False)  # min("r","m") = "m"
    assert got["solo"] == ("end", 1, False)
    assert got == _naive(edges)


def test_long_chain_exact_hops(spark):
    n = 40  # needs ceil(log2(40)) = 6 doubling rounds
    edges = [(f"u{i:03d}", f"u{i + 1:03d}") for i in range(n)]
    got = _run(spark, edges)
    assert got["u000"] == (f"u{n:03d}", n, False)
    assert got[f"u{n - 1:03d}"] == (f"u{n:03d}", 1, False)
    assert got == _naive(edges)


@pytest.mark.parametrize("seed", [2, 8])
def test_random_functional_graphs(spark, seed):
    rnd = random.Random(seed)
    edges = [
        (f"n{rnd.randint(0, 40)}", f"n{rnd.randint(0, 40)}")
        for _ in range(60)
    ]
    edges = [e for e in edges if e[0] != e[1]]
    assert _run(spark, edges) == _naive(edges)
