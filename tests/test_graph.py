"""Connected-components tests (operators/graph.py).

Covers: long chains (pointer-jumping path), multiple components, string
node ids, and agreement with a naive union-find on a seeded random graph
(the same oracle style as the SPARQL property test — an independent
reference implementation, not golden files)."""

from __future__ import annotations

import random

import pytest

from ferenda_spark.operators.graph import cluster_sizes, connected_components


def _cc_naive(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical representative = min node of the component
    comps = {}
    for n in parent:
        comps.setdefault(find(n), []).append(n)
    out = {}
    for members in comps.values():
        root = min(members)
        for n in members:
            out[n] = root
    return out


def test_chain_converges_to_single_component(spark):
    # a 40-node chain: diameter 39 — plain propagation would need 39 rounds,
    # pointer jumping must finish well inside the max_iter=12 budget
    edges = [(i, i + 1) for i in range(39)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.comp
        for r in connected_components(df, max_iter=12).collect()
    }
    assert got == {i: 0 for i in range(40)}


def test_multiple_components_and_string_ids(spark):
    edges = [("b", "a"), ("c", "b"), ("y", "x"), ("x", "y"), ("q", "q")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.comp for r in connected_components(df).collect()}
    # self-loop (q,q) contributes no node; duplicates/symmetric edges dedup
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}
    sizes = {
        r.comp: r.n_members
        for r in cluster_sizes(
            connected_components(df)
        ).collect()
    }
    assert sizes == {"a": 3, "x": 2}


def test_matches_naive_union_find_on_random_graph(spark):
    rng = random.Random(42)
    nodes = list(range(80))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(70)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.comp for r in connected_components(df).collect()}
    assert got == _cc_naive(edges)


def test_canonicalize_dictionary_repoints_aliases(spark):
    """Two vocabularies name the same entities under different URIs; LSH
    evidence pairs them; after canonicalization every alias points at the
    component representative and linking yields one subject per entity."""
    from ferenda_spark.operators.graph import canonicalize_dictionary

    dictionary = spark.createDataFrame(
        [
            ("ACME Corp", "acme corp", "uri:a/acme", "org", True),
            ("ACME", "acme", "uri:b/acme-inc", "org", True),
            ("Acme Incorporated", "acme incorporated", "uri:c/acme3", "org", True),
            ("Globex", "globex", "uri:a/globex", "org", True),
        ],
        "alias string, alias_key string, canonical_uri string, kind string, is_exact boolean",
    )
    evidence = spark.createDataFrame(
        [("uri:a/acme", "uri:b/acme-inc"), ("uri:b/acme-inc", "uri:c/acme3")],
        "uri_a string, uri_b string",
    )
    out = canonicalize_dictionary(dictionary, evidence)
    got = {r.alias_key: r.canonical_uri for r in out.collect()}
    assert got == {
        "acme corp": "uri:a/acme",
        "acme": "uri:a/acme",
        "acme incorporated": "uri:a/acme",
        "globex": "uri:a/globex",  # untouched: no evidence
    }
    # schema preserved (the rewrite must stay drop-in for link_mentions)
    assert out.columns == dictionary.columns or sorted(out.columns) == sorted(
        dictionary.columns
    )
    # broadcast rewrite: the physical plan must not shuffle the dictionary
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_checkpoint_blocks_freed_per_round(spark):
    """Each round's localCheckpoint must free the previous round's blocks —
    otherwise 50-round runs pin O(rounds × nodes) executor storage."""
    before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    edges = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(edges, "src long, dst long")
    connected_components(df, max_iter=12).count()
    after = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    # at most the final round's checkpoint survives (plus whatever the
    # session already had persisted before the call)
    assert after - before <= 1


# ------------------------------------------------------------ pagerank


def _pagerank_ref(edges, d=0.85, it=8):
    import numpy as np

    e = sorted({(a, b) for a, b in edges if a != b})
    nodes = sorted({x for p in e for x in p})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = {v: 0 for v in nodes}
    for a, _ in e:
        out[a] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(it):
        nr = np.zeros(n)
        dm = sum(r[idx[v]] for v in nodes if out[v] == 0)
        for a, b in e:
            nr[idx[b]] += r[idx[a]] / out[a]
        r = (1 - d) / n + d * (nr + dm / n)
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_matches_reference_with_dangling(spark):
    from ferenda_spark.operators.graph import pagerank

    # node 3 is dangling (no out-edges); self-loop and duplicate edge must
    # be ignored; node 4 only appears as a source
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (1, 1), (0, 1), (4, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, n_iter=8).collect()}
    exp = _pagerank_ref(edges)
    assert set(got) == set(exp)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-12)
    # full damping mass conservation (dangling redistributed)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_deterministic_across_parallelism(spark):
    from ferenda_spark.operators.graph import pagerank

    edges = [(i, (7 * i + 11 * j) % 40) for i in range(40) for j in (1, 2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {r.node: r.rank for r in pagerank(df, n_iter=6).collect()}
    b = {
        r.node: r.rank
        for r in pagerank(df.repartition(13), n_iter=6).collect()
    }
    for v in a:
        assert a[v] == pytest.approx(b[v], abs=1e-12)


def test_pagerank_empty_edges(spark):
    from ferenda_spark.operators.graph import pagerank

    df = spark.createDataFrame([], "src long, dst long")
    assert pagerank(df, n_iter=3).count() == 0


def _hits_ref(edges, n_iter):
    import numpy as np

    nodes = sorted({u for e in edges for u in e if e[0] != e[1]})
    dedup = sorted({e for e in edges if e[0] != e[1]})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for s, d in dedup:
        A[idx[s], idx[d]] = 1.0
    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(n_iter):
        a = A.T @ h
        na = np.sqrt((a * a).sum())
        a = a / na if na > 0 else a * 0.0
        h = A @ a
        nh = np.sqrt((h * h).sum())
        h = h / nh if nh > 0 else h * 0.0
    return {v: (h[idx[v]], a[idx[v]]) for v in nodes}


def test_hits_matches_reference(spark):
    from ferenda_spark.operators.graph import hits

    # node 3: authority only; node 4: hub only; dup edge + self-loop drop
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (1, 1), (0, 1), (4, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: (r.hub, r.authority) for r in hits(df, n_iter=8).collect()}
    exp = _hits_ref(edges, 8)
    assert set(got) == set(exp)
    for v in exp:
        assert got[v][0] == pytest.approx(exp[v][0], abs=1e-12)
        assert got[v][1] == pytest.approx(exp[v][1], abs=1e-12)
    # L2 norms are 1 after the final normalization
    assert sum(h * h for h, _a in got.values()) == pytest.approx(1.0, abs=1e-9)
    assert sum(a * a for _h, a in got.values()) == pytest.approx(1.0, abs=1e-9)


def test_hits_deterministic_across_parallelism(spark):
    from ferenda_spark.operators.graph import hits

    edges = [(i, (5 * i + 13 * j) % 30) for i in range(30) for j in (1, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {r.node: (r.hub, r.authority) for r in hits(df, n_iter=4).collect()}
    b = {
        r.node: (r.hub, r.authority)
        for r in hits(df.repartition(11), n_iter=4).collect()
    }
    for v in a:
        assert a[v][0] == pytest.approx(b[v][0], abs=1e-12)
        assert a[v][1] == pytest.approx(b[v][1], abs=1e-12)


def test_hits_empty_edges(spark):
    from ferenda_spark.operators.graph import hits

    df = spark.createDataFrame([], "src long, dst long")
    assert hits(df, n_iter=3).count() == 0


# -------------------------------------------------- incremental components
from ferenda_spark.operators.graph import update_components


def _cc_naive(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_update_components_equals_full_recompute(spark):
    import random

    rnd = random.Random(13)
    old = [(rnd.randint(0, 30), rnd.randint(0, 30)) for _ in range(40)]
    new = [(rnd.randint(0, 45), rnd.randint(0, 45)) for _ in range(25)]
    old = [e for e in old if e[0] != e[1]]
    new = [e for e in new if e[0] != e[1]]
    prev = connected_components(spark.createDataFrame(old, ["src", "dst"]))
    got = {
        r.node: r.comp
        for r in update_components(
            prev, spark.createDataFrame(new, ["src", "dst"])
        ).collect()
    }
    assert got == _cc_naive(old + new)


def test_update_components_merges_old_clusters(spark):
    old = [(1, 2), (3, 4), (10, 11)]
    prev = connected_components(spark.createDataFrame(old, ["src", "dst"]))
    # one new edge bridges {1,2} and {3,4}; {10,11} untouched
    got = {
        r.node: r.comp
        for r in update_components(
            prev, spark.createDataFrame([(2, 3)], ["src", "dst"])
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_update_components_preserves_singleton_rows(spark):
    prev = spark.createDataFrame(
        [(1, 1), (2, 1), (9, 9)], ["node", "comp"]  # 9 = isolated, unioned in
    )
    got = {
        r.node: r.comp
        for r in update_components(
            prev, spark.createDataFrame([(2, 5)], ["src", "dst"])
        ).collect()
    }
    assert got == {1: 1, 2: 1, 5: 1, 9: 9}


def test_update_components_chained_batches(spark):
    b1 = [(1, 2), (4, 5)]
    b2 = [(2, 4)]
    b3 = [(7, 8), (5, 7)]
    cur = connected_components(spark.createDataFrame(b1, ["src", "dst"]))
    for batch in (b2, b3):
        cur = update_components(
            cur, spark.createDataFrame(batch, ["src", "dst"])
        )
    got = {r.node: r.comp for r in cur.collect()}
    assert got == _cc_naive(b1 + b2 + b3)


# ------------------------------------------------- personalized pagerank


def _ppr_ref(edges, seeds, d=0.85, it=8):
    import numpy as np

    e = sorted({(a, b) for a, b in edges if a != b})
    nodes = sorted({x for p in e for x in p})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    s = sorted(set(seeds) & set(nodes))
    p = np.zeros(n)
    for v in s:
        p[idx[v]] = 1.0 / len(s)
    out = {v: 0 for v in nodes}
    for a, _ in e:
        out[a] += 1
    r = p.copy()
    for _ in range(it):
        nr = np.zeros(n)
        dm = sum(r[idx[v]] for v in nodes if out[v] == 0)
        for a, b in e:
            nr[idx[b]] += r[idx[a]] / out[a]
        r = (1 - d) * p + d * (nr + dm * p)
    return {v: r[idx[v]] for v in nodes}


def test_ppr_matches_reference_with_dangling(spark):
    from ferenda_spark.operators.graph import personalized_pagerank

    # node 3 dangling; seed 5 not in the graph must be ignored;
    # duplicate edge + self-loop dropped
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (1, 1), (0, 1), (4, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.score
        for r in personalized_pagerank(df, [0, 4, 5], n_iter=8).collect()
    }
    exp = _ppr_ref(edges, [0, 4, 5])
    assert set(got) == set(exp)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-12)
    # teleport-redistributed dangling mass conserves the walk exactly
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_ppr_unreachable_nodes_score_zero(spark):
    from ferenda_spark.operators.graph import personalized_pagerank

    # two disjoint cycles; seeding only the first keeps the second at 0.0
    edges = [(0, 1), (1, 0), (10, 11), (11, 10)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: r.score
        for r in personalized_pagerank(df, [0], n_iter=6).collect()
    }
    assert got[10] == 0.0 and got[11] == 0.0
    exp = _ppr_ref(edges, [0], it=6)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-12)
    # all mass stays in the seeded component
    assert got[0] + got[1] == pytest.approx(1.0, abs=1e-9)


def test_ppr_no_seed_in_graph_raises(spark):
    from ferenda_spark.operators.graph import personalized_pagerank

    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        personalized_pagerank(df, [99], n_iter=3)


def test_ppr_string_node_ids(spark):
    from ferenda_spark.operators.graph import personalized_pagerank

    edges = [("a", "b"), ("b", "c"), ("c", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r.node: r.score
        for r in personalized_pagerank(df, ["a"], n_iter=5).collect()
    }
    exp = _ppr_ref(edges, ["a"], it=5)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-12)


# ---------------------------------------------- clustering coefficient


def _cc_ref(edges):
    und = {}
    for a, b in edges:
        if a == b:
            continue
        und.setdefault(a, set()).add(b)
        und.setdefault(b, set()).add(a)
    out = {}
    for v, nb in und.items():
        d = len(nb)
        t = sum(1 for x in nb for y in nb if x < y and y in und.get(x, ()))
        out[v] = (d, t, 2.0 * t / (d * (d - 1)) if d >= 2 else 0.0)
    return out


def test_clustering_coefficient_matches_reference(spark):
    from ferenda_spark.operators.graph import clustering_coefficient

    random.seed(7)
    edges = list({
        (random.randrange(30), random.randrange(30)) for _ in range(120)
    })
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r.node: (r.degree, r.n_triangles, r.cc)
        for r in clustering_coefficient(df).collect()
    }
    exp = _cc_ref(edges)
    assert set(got) == set(exp)
    for v, (d, t, cc) in exp.items():
        assert got[v][0] == d
        assert got[v][1] == t
        assert got[v][2] == pytest.approx(cc, abs=1e-12)


def test_clustering_coefficient_triangle_plus_leaf(spark):
    from ferenda_spark.operators.graph import clustering_coefficient

    # triangle a-b-c plus a pendant leaf d off a: cc(a)=1/3, cc(b)=cc(c)=1,
    # cc(d)=0 (degree 1)
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d")],
        "src string, dst string",
    )
    got = {r.node: r.cc for r in clustering_coefficient(df).collect()}
    assert got["a"] == pytest.approx(1 / 3)
    assert got["b"] == pytest.approx(1.0)
    assert got["c"] == pytest.approx(1.0)
    assert got["d"] == 0.0
