"""Taxonomy rollup (operators/taxonomy.py) vs a naive Python closure."""

from __future__ import annotations

from collections import defaultdict

from ferenda_spark.operators.taxonomy import taxonomy_rollup


def _naive(membership, broader):
    children = defaultdict(set)
    parents = defaultdict(set)
    for c, p in broader:
        parents[c].add(p)
    concepts = {c for _, c in membership} | {x for e in broader for x in e}
    # reflexive-transitive ancestor sets
    anc = {}
    for c in concepts:
        seen, stack = {c}, [c]
        while stack:
            v = stack.pop()
            for p in parents[v]:
                if p not in seen:
                    seen.add(p)
                    stack.append(p)
        anc[c] = seen
    direct = defaultdict(set)
    rolled = defaultdict(set)
    for item, c in membership:
        direct[c].add(item)
        for a in anc[c]:
            rolled[a].add(item)
    return {
        c: (len(direct[c]), len(rolled[c])) for c in concepts
    }


def _run(spark, membership, broader):
    m = spark.createDataFrame(membership, "item bigint, concept string")
    b = spark.createDataFrame(broader, "child string, parent string")
    return {
        r["concept"]: (r["n_items_direct"], r["n_items_closure"])
        for r in taxonomy_rollup(m, b).collect()
    }


def test_tree_rollup(spark):
    broader = [("b", "a"), ("c", "a"), ("d", "b"), ("e", "b")]
    membership = [(1, "d"), (2, "d"), (3, "e"), (4, "c"), (5, "a")]
    assert _run(spark, membership, broader) == _naive(membership, broader)


def test_polyhierarchy_counts_item_once(spark):
    # d has two paths to a (via b and via c) — item must count once at a
    broader = [("b", "a"), ("c", "a"), ("d", "b"), ("d", "c")]
    membership = [(1, "d")]
    got = _run(spark, membership, broader)
    assert got["a"] == (0, 1)
    assert got == _naive(membership, broader)


def test_multi_concept_items_and_empty_concepts(spark):
    broader = [("y", "x"), ("z", "x"), ("w", "z")]
    membership = [(1, "y"), (1, "z"), (2, "y")]  # item 1 in two concepts
    got = _run(spark, membership, broader)
    assert got["x"] == (0, 2)
    assert got["w"] == (0, 0)  # empty leaf still present
    assert got == _naive(membership, broader)


def test_deep_chain_closure(spark):
    broader = [(f"c{i}", f"c{i+1}") for i in range(12)]
    membership = [(1, "c0")]
    got = _run(spark, membership, broader)
    assert all(got[f"c{i}"] == ((1, 1) if i == 0 else (0, 1)) for i in range(13))
