"""Co-citation / bibliographic coupling (operators/graph_analytics.py)
vs a brute-force pure-Python pair count."""

from __future__ import annotations

import itertools
import random

from ferenda_spark.operators.graph_analytics import (
    bibliographic_coupling,
    cocitation,
)


def _brute_cocite(edges, cap=None):
    out = {}
    by_src = {}
    for s, d in set(edges):
        by_src.setdefault(s, set()).add(d)
    for s, ds in by_src.items():
        if cap is not None and len(ds) > cap:
            continue
        for a, b in itertools.combinations(sorted(ds), 2):
            out[(a, b)] = out.get((a, b), 0) + 1
    return out


def test_cocitation_hand_case(spark):
    # p1 and p2 both cite x and y; p3 cites x only
    edges = [("p1", "x"), ("p1", "y"), ("p2", "x"), ("p2", "y"), ("p3", "x")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {(r.a, r.b): r.n_common for r in cocitation(df).collect()}
    assert got == {("x", "y"): 2}


def test_cocitation_random_vs_brute(spark):
    rng = random.Random(3)
    edges = [(f"s{rng.randrange(30)}", f"t{rng.randrange(20)}")
             for _ in range(400)]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {(r.a, r.b): r.n_common for r in cocitation(df).collect()}
    assert got == _brute_cocite(edges)


def test_cocitation_degree_cap(spark):
    rng = random.Random(5)
    edges = [(f"s{rng.randrange(10)}", f"t{rng.randrange(12)}")
             for _ in range(300)]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {(r.a, r.b): r.n_common
           for r in cocitation(df, max_out_degree=6).collect()}
    assert got == _brute_cocite(edges, cap=6)


def test_cocitation_min_count_and_dup_edges(spark):
    edges = [("p1", "x"), ("p1", "x"), ("p1", "y"), ("p2", "x"), ("p2", "y"),
             ("p3", "x"), ("p3", "z")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {(r.a, r.b): r.n_common
           for r in cocitation(df, min_count=2).collect()}
    assert got == {("x", "y"): 2}  # (x,z) count 1 filtered; dup edge once


def test_bibcoupling_is_transpose(spark):
    rng = random.Random(9)
    edges = [(f"s{rng.randrange(15)}", f"t{rng.randrange(15)}")
             for _ in range(250)]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {(r.a, r.b): r.n_shared
           for r in bibliographic_coupling(df, max_in_degree=8).collect()}
    want = _brute_cocite([(d, s) for s, d in edges], cap=8)
    assert got == want
