"""owl:sameAs canonicalization (operators/sameas.py).

Independent reference: a tiny pure-Python union-find over the same edge
set, so the Spark implementation is checked against textbook semantics,
not against itself.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ferenda_spark.operators.sameas import (
    OWL_SAMEAS,
    canonicalize_sameas,
    sameas_classes,
)

COLS = ["subj", "pred", "obj", "obj_is_uri", "obj_lang", "obj_dtype",
        "src_url", "part_key"]


def _t(subj, pred, obj, uri=True, lang=None, dtype=None, src="u:1", pk=0):
    return (subj, pred, obj, uri, lang, dtype, src, pk)


def _uf_classes(edges):
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
    groups = {}
    for n in list(parent):
        groups.setdefault(find(n), set()).add(n)
    out = {}
    for members in groups.values():
        canon = min(members)
        for m in members:
            out[m] = canon
    return out


def _df(spark, rows):
    from ferenda_spark.schemas import TRIPLES

    return spark.createDataFrame(rows, TRIPLES)


def test_classes_match_union_find(spark):
    # chain a-b-c, pair x-y, plus a reverse-direction edge and a self loop
    edges = [("e:a", "e:b"), ("e:c", "e:b"), ("e:x", "e:y"), ("e:y", "e:x")]
    rows = [_t(a, OWL_SAMEAS, b) for a, b in edges] + [
        _t("e:z", OWL_SAMEAS, "e:z"),  # self loop: dropped, no class
        _t("e:a", "p:label", "A", uri=False),
    ]
    got = {
        r["node"]: r["canonical"]
        for r in sameas_classes(_df(spark, rows)).collect()
    }
    assert got == _uf_classes(edges)
    assert "e:z" not in got


def test_rewrite_subjects_objects_literals(spark):
    rows = [
        _t("e:b", OWL_SAMEAS, "e:a"),
        _t("e:b", "p:cites", "e:q"),          # subj rewritten
        _t("e:q", "p:cites", "e:b"),          # obj rewritten
        _t("e:b", "p:label", "e:a", uri=False),  # literal untouched even if
                                                 # it LOOKS like a node id
        _t("e:q", "p:n", "42", uri=False, dtype="xsd:integer"),
    ]
    out = canonicalize_sameas(_df(spark, rows))
    got = {(r.subj, r.pred, r.obj, r.obj_is_uri) for r in out.collect()}
    assert got == {
        ("e:a", "p:cites", "e:q", True),
        ("e:q", "p:cites", "e:a", True),
        ("e:a", "p:label", "e:a", False),
        ("e:q", "p:n", "42", False),
    }
    # no sameAs rows survive without keep_provenance
    assert out.filter(F.col("pred") == OWL_SAMEAS).count() == 0


def test_transitive_merge_and_dedup(spark):
    # a=b=c all assert the same fact from different sources → ONE row,
    # min provenance wins deterministically
    rows = [
        _t("e:b", OWL_SAMEAS, "e:a", src="u:5", pk=5),
        _t("e:c", OWL_SAMEAS, "e:b", src="u:6", pk=6),
        _t("e:a", "p:type", "c:T", src="u:3", pk=3),
        _t("e:b", "p:type", "c:T", src="u:1", pk=1),
        _t("e:c", "p:type", "c:T", src="u:2", pk=2),
    ]
    out = canonicalize_sameas(_df(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.subj, r.obj, r.src_url, r.part_key) == ("e:a", "c:T", "u:1", 1)


def test_keep_provenance_members(spark):
    rows = [
        _t("e:b", OWL_SAMEAS, "e:a", src="u:9", pk=9),
        _t("e:c", OWL_SAMEAS, "e:a", src="u:2", pk=2),
        _t("e:a", "p:label", "A", uri=False),
    ]
    out = canonicalize_sameas(_df(spark, rows), keep_provenance=True)
    same = out.filter(F.col("pred") == OWL_SAMEAS).collect()
    got = {(r.subj, r.obj) for r in same}
    assert got == {("e:a", "e:b"), ("e:a", "e:c")}
    # class provenance = min over the class's original assertions
    assert all(r.src_url == "u:2" and r.part_key == 2 for r in same)
    assert all(r.obj_is_uri for r in same)


def test_no_edges_passthrough(spark):
    rows = [_t("e:a", "p:label", "A", uri=False), _t("e:a", "p:cites", "e:b")]
    out = canonicalize_sameas(_df(spark, rows))
    assert {(r.subj, r.pred, r.obj) for r in out.collect()} == {
        ("e:a", "p:label", "A"),
        ("e:a", "p:cites", "e:b"),
    }


@pytest.mark.parametrize("n_parts", [1, 7])
def test_determinism_across_partitioning(spark, n_parts):
    rows = []
    for i in range(60):
        rows.append(_t(f"e:{i:03d}", OWL_SAMEAS, f"e:{i - i % 4:03d}",
                       src=f"u:{i}", pk=i % 8))
        rows.append(_t(f"e:{i:03d}", "p:cites", f"e:{(i * 7 + 3) % 60:03d}",
                       src=f"u:{i}", pk=i % 8))
        rows.append(_t(f"e:{i:03d}", "p:idx", str(i), uri=False,
                       dtype="xsd:integer", src=f"u:{i}", pk=i % 8))
    base = _df(spark, rows)
    a = canonicalize_sameas(base.repartition(n_parts), keep_provenance=True)
    b = canonicalize_sameas(base.coalesce(1), keep_provenance=True)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
