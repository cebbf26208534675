"""Entity PMI co-occurrence and deterministic random walks."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from ferenda_spark.operators.cooccur import entity_pmi
from ferenda_spark.operators.walks import random_walks


def _pmi_ref(pairs, min_pair=2, cap=1000):
    docs = defaultdict(set)
    for d, e in pairs:
        docs[d].add(e)
    docs = {d: es for d, es in docs.items() if len(es) <= cap}
    n = len(docs)
    ec = defaultdict(int)
    pc = defaultdict(int)
    for es in docs.values():
        for e in es:
            ec[e] += 1
        ss = sorted(es)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                pc[(ss[i], ss[j])] += 1
    return {
        (a, b): (c, round(math.log(c * n / (ec[a] * ec[b])), 6))
        for (a, b), c in pc.items()
        if c >= min_pair
    }


def test_pmi_matches_reference(spark):
    pairs = []
    for d in range(30):
        for e in range(5):
            if (d * 7 + e * 3) % 4 != 0:
                pairs.append((f"d{d}", f"e{(d + e) % 8}"))
    df = spark.createDataFrame(pairs, "doc string, ent string")
    got = {
        (r["a"], r["b"]): (r["n_ab"], r["pmi"])
        for r in entity_pmi(df).collect()
    }
    assert got == _pmi_ref(pairs)


def test_pmi_mega_doc_cap(spark):
    pairs = [("big", f"e{i}") for i in range(20)] + [
        ("d1", "x"), ("d1", "y"), ("d2", "x"), ("d2", "y"),
    ]
    df = spark.createDataFrame(pairs, "doc string, ent string")
    got = entity_pmi(df, max_doc_entities=10).collect()
    assert {(r["a"], r["b"]) for r in got} == {("x", "y")}
    # N counts only kept docs (2), so pmi = ln(2*2/(2*2)) = 0
    assert got[0]["pmi"] == 0.0


def _walk_ref(edges, length, salt=""):
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    out = set()
    for s in adj:
        node = s
        out.add((s, 0, s))
        for t in range(1, length + 1):
            nbrs = sorted(adj[node])
            if not nbrs:
                break
            h = int(
                hashlib.md5(f"{s}:{t-1}{salt}:{node}".encode()).hexdigest()[:15],
                16,
            )
            node = nbrs[h % len(nbrs)]
            out.add((s, t, node))
    return out


def test_walks_match_reference(spark):
    edges = []
    for i in range(40):
        h = hashlib.md5(f"we{i}".encode()).hexdigest()
        a, b = int(h[:8], 16) % 15, int(h[8:16], 16) % 15
        if a != b:
            edges.append((a, b))
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        (r["start"], r["step"], r["node"])
        for r in random_walks(df, length=4).collect()
    }
    assert got == _walk_ref(edges, 4)


def test_walks_deterministic_across_partitionings(spark):
    edges = [(i, (i * 3 + 1) % 9) for i in range(9)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    a = {tuple(r) for r in random_walks(df, length=3).collect()}
    b = {tuple(r) for r in random_walks(df.repartition(5), length=3).collect()}
    assert a == b


def test_walks_dead_end_truncates(spark):
    edges = [(1, 2)]  # directed: 2 is a dead end
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        (r["start"], r["step"], r["node"])
        for r in random_walks(df, length=3, directed=True).collect()
    }
    assert got == {(1, 0, 1), (1, 1, 2)}


def _h60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _neg_ref(edges, k, salt=""):
    nodes = sorted(
        {x for e in edges for x in e},
        key=lambda n: (_h60(str(n)) % 64, n),
    )
    v = len(nodes)
    out = []
    for a, b in edges:
        for j in range(k):
            r = _h60(f"{a}:{b}:{j}{salt}") % v
            out.append((a, b, nodes[r], j))
    return sorted(out)


def test_negative_samples_match_reference(spark):
    from ferenda_spark.operators.walks import negative_samples

    edges = [(i, (i * 7 + 3) % 20) for i in range(20) if i != (i * 7 + 3) % 20]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = sorted(
        (r["src"], r["dst"], r["neg"], r["j"])
        for r in negative_samples(df, k=3).collect()
    )
    assert got == _neg_ref(edges, 3)


def test_negative_samples_deterministic_and_salted(spark):
    from ferenda_spark.operators.walks import negative_samples

    edges = [(i, (i + 1) % 10) for i in range(10)]
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    a = sorted(map(tuple, negative_samples(df, k=2).collect()))
    b = sorted(map(tuple, negative_samples(df.repartition(4), k=2).collect()))
    assert a == b
    c = sorted(map(tuple, negative_samples(df, k=2, salt="x").collect()))
    assert a != c  # different salt → different draw
    # k rows per edge
    assert len(a) == len(edges) * 2
