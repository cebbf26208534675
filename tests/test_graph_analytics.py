"""Graph-analytics operators vs naive single-machine references.

Every operator is checked against an independent pure-Python
implementation on deterministic pseudo-random graphs (hash-derived edges —
no RNG, so failures reproduce), plus targeted structural cases.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

import pytest

from ferenda_spark.operators.graph_analytics import (
    adamic_adar,
    bfs_distances,
    graph_digest,
    k_core,
    label_propagation,
    wl_colors,
)


def _edges(n_nodes: int, n_edges: int, salt: str = "g") -> list[tuple[int, int]]:
    """Deterministic pseudo-random edge list."""
    out = []
    for i in range(n_edges):
        h = hashlib.md5(f"{salt}:{i}".encode()).hexdigest()
        a = int(h[:8], 16) % n_nodes
        b = int(h[8:16], 16) % n_nodes
        if a != b:
            out.append((a, b))
    return out


def _adj(edges):
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    return adj


def _df(spark, edges):
    return spark.createDataFrame(edges, "src bigint, dst bigint")


# --------------------------------------------------------------------- BFS


def _bfs_ref(edges, sources, max_hops):
    adj = _adj(edges)
    dist = {s: 0 for s in sources}
    frontier = set(sources)
    for h in range(1, max_hops + 1):
        nxt = set()
        for v in frontier:
            for u in adj.get(v, ()):
                if u not in dist:
                    dist[u] = h
                    nxt.add(u)
        if not nxt:
            break
        frontier = nxt
    return dist


def test_bfs_matches_reference(spark):
    edges = _edges(60, 120, "bfs")
    sources = [0, 7]
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(_df(spark, edges), sources, max_hops=8).collect()
    }
    assert got == _bfs_ref(edges, sources, 8)


def test_bfs_max_hops_truncates(spark):
    # path graph 0-1-2-3-4: from 0 with max_hops=2 only 0,1,2 reachable
    edges = [(i, i + 1) for i in range(4)]
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(_df(spark, edges), [0], max_hops=2).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2}


def test_bfs_directed(spark):
    edges = [(0, 1), (1, 2), (3, 0)]  # 3 unreachable FROM 0 when directed
    got = {
        r["node"]: r["dist"]
        for r in bfs_distances(
            _df(spark, edges), [0], max_hops=5, directed=True
        ).collect()
    }
    assert got == {0: 0, 1: 1, 2: 2}


# --------------------------------------------------------------------- LPA


def _lpa_ref(edges, n_iter):
    adj = _adj(edges)
    labels = {v: v for v in adj}
    for _ in range(n_iter):
        nxt = {}
        for v in adj:
            cnt = Counter(labels[u] for u in adj[v])
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[v] = best[0]
        labels = nxt
    return labels


@pytest.mark.parametrize("n_iter", [1, 3, 5])
def test_lpa_matches_reference(spark, n_iter):
    edges = _edges(50, 100, "lpa")
    got = {
        r["node"]: r["label"]
        for r in label_propagation(_df(spark, edges), n_iter=n_iter).collect()
    }
    assert got == _lpa_ref(edges, n_iter)


def test_lpa_two_cliques_converge_to_min_member(spark):
    cl1 = [(a, b) for a in range(5) for b in range(5) if a < b]
    cl2 = [(a, b) for a in range(10, 15) for b in range(10, 15) if a < b]
    bridge = [(4, 10)]
    got = {
        r["node"]: r["label"]
        for r in label_propagation(
            _df(spark, cl1 + cl2 + bridge), n_iter=5
        ).collect()
    }
    assert all(got[v] == 0 for v in range(5))
    assert all(got[v] == 10 for v in range(11, 15))


# ------------------------------------------------------------------ k-core


def _kcore_ref(edges, k):
    adj = _adj(edges)
    alive = set(adj)
    while True:
        bad = {v for v in alive if sum(u in alive for u in adj[v]) < k}
        if not bad:
            break
        alive -= bad
    return {v: sum(u in alive for u in adj[v]) for v in alive}


@pytest.mark.parametrize("k", [2, 3])
def test_kcore_matches_reference(spark, k):
    edges = _edges(40, 110, "core")
    got = {
        r["node"]: r["degree"] for r in k_core(_df(spark, edges), k).collect()
    }
    assert got == _kcore_ref(edges, k)


def test_kcore_clique_plus_tail(spark):
    clique = [(a, b) for a in range(4) for b in range(4) if a < b]
    tail = [(3, 4), (4, 5)]
    got = {r["node"]: r["degree"] for r in k_core(_df(spark, clique + tail), 3).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_kcore_empty_when_k_too_large(spark):
    edges = [(0, 1), (1, 2)]
    assert k_core(_df(spark, edges), 5).count() == 0


# -------------------------------------------------------------- Adamic-Adar


def _aa_ref(edges, top_k, cap):
    adj = _adj(edges)
    scores = defaultdict(float)
    for z, nb in adj.items():
        d = len(nb)
        if d < 2 or (cap is not None and d > cap):
            continue
        nb = sorted(nb)
        w = 1.0 / math.log(d)
        for i in range(len(nb)):
            for j in range(i + 1, len(nb)):
                scores[(nb[i], nb[j])] += w
    out = [
        (a, b, round(s, 6))
        for (a, b), s in scores.items()
        if b not in adj[a]
    ]
    out.sort(key=lambda t: (-t[2], t[0], t[1]))
    return out[:top_k]


def test_adamic_adar_matches_reference(spark):
    edges = _edges(40, 90, "aa")
    got = [
        (r["a"], r["b"], r["score"])
        for r in adamic_adar(_df(spark, edges), top_k=15).collect()
    ]
    assert got == _aa_ref(edges, 15, 1000)


def test_adamic_adar_center_cap(spark):
    # star hub 0 with 6 leaves + a shared neighbor pair via node 100
    star = [(0, i) for i in range(1, 7)]
    side = [(100, 1), (100, 2)]
    got = adamic_adar(_df(spark, star + side), top_k=50, max_center_degree=3)
    rows = {(r["a"], r["b"]): r["score"] for r in got.collect()}
    # hub 0 (degree 6 > cap) forms no wedges, so no leaf-leaf pairs appear;
    # centers 1 and 2 (each deg 2) both close (0, 100); center 100 closes (1, 2)
    assert rows == {
        (0, 100): round(2.0 / math.log(2), 6),
        (1, 2): round(1.0 / math.log(2), 6),
    }
    # leaves 3..6 share ONLY the hub as a neighbor — any pair among them
    # could come only through center 0, which the cap excluded
    assert not any(3 <= a < b <= 6 for (a, b) in rows)


# ---------------------------------------------------------------- WL colors


def test_wl_distinguishes_path_from_star(spark):
    path = [(i, i + 1) for i in range(3)]  # 4-node path
    star = [(0, i) for i in range(1, 4)]  # 4-node star
    dp = graph_digest(wl_colors(_df(spark, path), n_rounds=2)).collect()[0]
    ds = graph_digest(wl_colors(_df(spark, star), n_rounds=2)).collect()[0]
    assert dp["n_nodes"] == ds["n_nodes"] == 4
    assert dp["digest"] != ds["digest"]


def test_wl_invariant_under_relabeling(spark):
    edges = _edges(30, 60, "wl")
    perm = {v: (v * 17 + 5) % 1000 for v in range(30)}
    relabeled = [(perm[a], perm[b]) for a, b in edges]
    d1 = graph_digest(wl_colors(_df(spark, edges), n_rounds=3)).collect()[0]
    d2 = graph_digest(wl_colors(_df(spark, relabeled), n_rounds=3)).collect()[0]
    assert d1["digest"] == d2["digest"]
    assert d1["n_nodes"] == d2["n_nodes"]


def test_wl_round0_is_degree_partition(spark):
    edges = [(0, 1), (1, 2), (2, 3)]  # degrees: 1,2,2,1
    colors = {
        r["node"]: r["color"]
        for r in wl_colors(_df(spark, edges), n_rounds=0).collect()
    }
    assert colors[0] == colors[3] and colors[1] == colors[2]
    assert colors[0] != colors[1]


def test_wl_refinement_splits_degree_ties(spark):
    # nodes 1 and 4 both have degree 2 but different neighborhoods:
    # triangle 0-1-2 plus path 2-3, 3-4, 4-5 ... check refinement separates
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5)]
    c0 = {r["node"]: r["color"] for r in wl_colors(_df(spark, edges), n_rounds=0).collect()}
    c2 = {r["node"]: r["color"] for r in wl_colors(_df(spark, edges), n_rounds=2).collect()}
    assert c0[1] == c0[4]  # same degree
    assert c2[1] != c2[4]  # different 2-hop structure


def test_lpa_string_node_ids(spark):
    """String ids must work — the tie-break may not negate the label."""
    cl1 = [(f"h{a}", f"h{b}") for a in range(4) for b in range(4) if a < b]
    df = spark.createDataFrame(cl1, "src string, dst string")
    got = {
        r["node"]: r["label"]
        for r in label_propagation(df, n_iter=4).collect()
    }
    assert got == {f"h{i}": "h0" for i in range(4)}


# -------------------------------------------------------------- Katz


def _katz_ref(edges, alpha, n_iter):
    nodes = {x for e in edges for x in e if e[0] != e[1]}
    ins = defaultdict(set)
    for a, b in set(edges):
        if a != b:
            ins[b].add(a)
    x = {v: 1.0 for v in nodes}
    for _ in range(n_iter):
        x = {v: 1.0 + alpha * sum(x[u] for u in ins[v]) for v in nodes}
    return {v: round(s, 6) for v, s in x.items()}


def test_katz_matches_reference(spark):
    from ferenda_spark.operators.graph_analytics import katz_centrality

    edges = _edges(30, 80, "katz")
    got = {
        r["node"]: r["katz"]
        for r in katz_centrality(_df(spark, edges), alpha=0.1, n_iter=4).collect()
    }
    assert got == _katz_ref(edges, 0.1, 4)


def test_katz_sink_prefers_in_degree(spark):
    from ferenda_spark.operators.graph_analytics import katz_centrality

    # everything points at node 0; node 0 points at 1
    edges = [(i, 0) for i in range(1, 6)] + [(0, 1)]
    got = {
        r["node"]: r["katz"]
        for r in katz_centrality(_df(spark, edges), n_iter=3).collect()
    }
    assert got[0] > got[1] > got[2]


# ------------------------------------------------------- assortativity


def test_assortativity_star_is_negative(spark):
    from ferenda_spark.operators.graph_analytics import degree_assortativity

    star = [(0, i) for i in range(1, 8)]
    r = degree_assortativity(_df(spark, star)).collect()[0]["r"]
    assert r == -1.0  # pure hub-leaf mixing


def test_assortativity_matches_reference(spark):
    import math as _math

    from ferenda_spark.operators.graph_analytics import degree_assortativity

    edges = _edges(30, 70, "assort")
    adj = _adj(edges)
    pts = [
        (len(adj[a]), len(adj[b]))
        for a in adj for b in adj[a]
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts); syy = sum(y * y for _, y in pts)
    ref = round(
        (n * sxy - sx * sy)
        / _math.sqrt(float(n * sxx - sx * sx) * float(n * syy - sy * sy)),
        6,
    )
    got = degree_assortativity(_df(spark, edges)).collect()[0]
    assert got["n_endpoints"] == n
    assert got["r"] == ref


# ---------------------------------------------------------- diameter


def test_diameter_double_sweep_on_path(spark):
    from ferenda_spark.operators.graph_analytics import diameter_estimate

    edges = [(i, i + 1) for i in range(9)]  # path of 10 → diameter 9
    got = diameter_estimate(_df(spark, edges)).collect()[0]
    assert got["diameter_lb"] == 9
    assert got["seed"] == 0


def test_diameter_lower_bounds_true_diameter(spark):
    from ferenda_spark.operators.graph_analytics import diameter_estimate

    edges = _edges(25, 50, "diam")
    adj = _adj(edges)

    def ecc(v):
        dist = {v: 0}
        frontier = [v]
        while frontier:
            nxt = []
            for x in frontier:
                for u in adj[x]:
                    if u not in dist:
                        dist[u] = dist[x] + 1
                        nxt.append(u)
            frontier = nxt
        return dist

    # true diameter of the seed's component
    comp = set(ecc(min(adj)).keys())
    true_d = max(max(ecc(v).values()) for v in comp)
    got = diameter_estimate(_df(spark, edges)).collect()[0]
    assert got["diameter_lb"] <= true_d
    # double sweep is exact on most small graphs; at least half is certain
    assert got["diameter_lb"] * 2 >= true_d


def test_diameter_string_node_ids(spark):
    # ADVICE r03: the result schema must follow the edge column's type —
    # string host ids, like every sibling operator here.
    from ferenda_spark.operators.graph_analytics import diameter_estimate

    edges = [("a.com", "b.com"), ("b.com", "c.com"), ("c.com", "d.com")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = diameter_estimate(df).collect()[0]
    assert got["diameter_lb"] == 3
    assert got["seed"] == "a.com"
    # second sweep starts at d.com (periphery of sweep 1) and its
    # farthest node is back at a.com on a path graph
    assert got["far_node"] == "a.com"


# --------------------------------------------------------------- SALSA


def _salsa_ref(edges):
    """Independent reference: explicit bipartite components + the closed
    form from Lempel & Moran §3.2."""
    e = sorted({(a, b) for a, b in edges if a != b})
    hubs = sorted({a for a, _ in e})
    auths = sorted({b for _, b in e})
    # bipartite union-find
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in e:
        for n in (("h", a), ("a", b)):
            parent.setdefault(n, n)
    for a, b in e:
        ra, rb = find(("h", a)), find(("a", b))
        if ra != rb:
            parent[ra] = rb
    outdeg = {h: 0 for h in hubs}
    indeg = {a: 0 for a in auths}
    for a, b in e:
        outdeg[a] += 1
        indeg[b] += 1
    scores = {}
    for side, nodes, deg in (
        ("h", hubs, outdeg),
        ("a", auths, indeg),
    ):
        bycomp = {}
        for v in nodes:
            bycomp.setdefault(find((side, v)), []).append(v)
        for comp in bycomp.values():
            sdeg = sum(deg[v] for v in comp)
            for v in comp:
                scores[(side, v)] = (
                    len(comp) / len(nodes) * deg[v] / sdeg
                )
    out = {}
    for v in set(hubs) | set(auths):
        out[v] = (scores.get(("h", v), 0.0), scores.get(("a", v), 0.0))
    return out


def test_salsa_matches_reference(spark):
    from ferenda_spark.operators.graph_analytics import salsa

    # two bipartite components: {1,2,3} clique-ish and {10,11} chain;
    # node 3 is hub-only, node 12 auth-only; dup edge + self-loop dropped
    edges = [(1, 2), (2, 1), (1, 3), (3, 2), (3, 12), (10, 11), (11, 10),
             (1, 2), (2, 2)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: (r.hub, r.auth) for r in salsa(df).collect()}
    exp = _salsa_ref(edges)
    assert set(got) == set(exp)
    for v in exp:
        assert got[v][0] == pytest.approx(exp[v][0], abs=1e-12), v
        assert got[v][1] == pytest.approx(exp[v][1], abs=1e-12), v
    # each side's scores sum to 1 (it's a distribution)
    assert sum(h for h, _ in got.values()) == pytest.approx(1.0)
    assert sum(a for _, a in got.values()) == pytest.approx(1.0)


def test_salsa_tkc_resistance(spark):
    """The reason SALSA exists: a dense 3x3 community must NOT swamp a
    higher-in-degree node outside it (HITS gives the clique everything;
    SALSA scores by degree share)."""
    from ferenda_spark.operators.graph_analytics import salsa

    clique = [(h, a) for h in (1, 2, 3) for a in (4, 5, 6)]
    # node 99: in-links from 4 outside hubs PLUS clique hub 1, so the
    # whole graph is ONE bipartite component and scores are pure
    # in-degree shares: auth(99) = 5/14 > auth(4..6) = 3/14. HITS'
    # mutual reinforcement concentrates authority inside the clique
    # regardless (the tightly-knit-community effect); SALSA does not.
    popular = [(h, 99) for h in (20, 21, 22, 23)] + [(1, 99)]
    df = spark.createDataFrame(clique + popular, "src long, dst long")
    got = {r.node: r.auth for r in salsa(df).collect()}
    assert got[99] == pytest.approx(5 / 14)
    assert got[4] == pytest.approx(3 / 14)
    assert got[99] > got[4]


def test_salsa_string_ids(spark):
    from ferenda_spark.operators.graph_analytics import salsa

    df = spark.createDataFrame(
        [("a.com", "b.com"), ("b.com", "a.com")], "src string, dst string"
    )
    got = {r.node: (r.hub, r.auth) for r in salsa(df).collect()}
    assert got["a.com"] == pytest.approx((0.5, 0.5))
    assert got["b.com"] == pytest.approx((0.5, 0.5))
