"""Cluster-quality audit (operators/dedup.py:audit_clusters) vs a
brute-force exact-Jaccard reference."""

from __future__ import annotations

import pytest

from ferenda_spark.operators.dedup import audit_clusters


def _sh(text, k=3):
    toks = text.split()
    if len(toks) >= k:
        return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}
    return {" ".join(toks)} if toks else set()


def _brute(comps, docs, k=3, cap=6):
    text = dict(docs)
    by_comp = {}
    for node, comp in comps:
        by_comp.setdefault(comp, []).append(node)
    out = {}
    for comp, nodes in by_comp.items():
        members = sorted(nodes)[:cap]
        if len(members) < 2:
            continue
        js = []
        for i in range(len(members)):
            for jx in range(i + 1, len(members)):
                a, b = _sh(text[members[i]], k), _sh(text[members[jx]], k)
                u = len(a | b)
                js.append(len(a & b) / u if u else 1.0)
        out[comp] = (len(nodes), len(js),
                     sum(js) / len(js), min(js))
    return out


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog today"),
    (1, "the quick brown fox jumps over the lazy dog tonight"),
    (2, "a completely different document about spark shuffles"),
    (3, "the quick brown fox jumps over the lazy dog today"),
    (4, "another unrelated text with other words entirely here"),
    (5, ""),
    (6, ""),
    (7, "short text"),
]
COMPS = [(0, 10), (1, 10), (3, 10),       # near/exact dup cluster
         (2, 20), (4, 20),                 # false merge
         (5, 30), (6, 30),                 # two empty docs
         (7, 40)]                          # singleton -> no row


def _run(spark, cap=6):
    c = spark.createDataFrame(COMPS, "node bigint, comp bigint")
    d = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    return {r.comp: (r.n_members, r.n_pairs, r.mean_jaccard, r.min_jaccard)
            for r in audit_clusters(c, d).collect()}


def test_audit_matches_brute(spark):
    got = _run(spark)
    want = _brute(COMPS, DOCS)
    assert set(got) == set(want)
    for comp, (n, p, m, mn) in want.items():
        gn, gp, gm, gmn = got[comp]
        assert (gn, gp) == (n, p), comp
        assert gm == pytest.approx(m, abs=1e-9), comp
        assert gmn == pytest.approx(mn, abs=1e-9), comp


def test_flags_false_merge_and_scores_dups(spark):
    got = _run(spark)
    assert got[10][3] > 0.7          # dup cluster: worst pair (one-word diff) high
    assert got[20][2] < 0.1          # false merge: mean near zero
    assert got[30] == (2, 1, pytest.approx(1.0), pytest.approx(1.0))
    assert 40 not in got             # singleton unaudited


def test_member_cap(spark):
    comps = [(i, 1) for i in range(12)]
    docs = [(i, f"doc number {i} with common words shared across all")
            for i in range(12)]
    c = spark.createDataFrame(comps, "node bigint, comp bigint")
    d = spark.createDataFrame(docs, "doc_id bigint, text string")
    rows = audit_clusters(c, d, max_members=4).collect()
    assert len(rows) == 1
    assert rows[0].n_members == 12      # true size reported
    assert rows[0].n_pairs == 6         # C(4,2) pairs audited
