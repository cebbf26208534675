"""RDFS inference (operators/inference.py) vs a naive Python fixpoint.

The reference applies the same six rules one fact at a time until nothing
changes — textbook semantics, independent of the Spark formulation.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from ferenda_spark.operators.inference import (
    RDF_TYPE,
    RDFS_DOMAIN,
    RDFS_RANGE,
    RDFS_SUBCLASSOF,
    RDFS_SUBPROPERTYOF,
    rdfs_closure,
    transitive_closure,
)
from ferenda_spark.schemas import TRIPLES


def _t(s, p, o, uri=True, src="u:0", pk=0):
    return (s, p, o, uri, None, None, src, pk)


def _naive_rdfs(facts):
    """facts: set of (s, p, o, obj_is_uri). Returns inferred-only set."""
    closed = set(facts)
    while True:
        new = set()
        sub_c = {(s, o) for s, p, o, u in closed if p == RDFS_SUBCLASSOF and u}
        sub_p = {(s, o) for s, p, o, u in closed if p == RDFS_SUBPROPERTYOF and u}
        dom = {(s, o) for s, p, o, u in closed if p == RDFS_DOMAIN and u}
        rng = {(s, o) for s, p, o, u in closed if p == RDFS_RANGE and u}
        schema_preds = {RDF_TYPE, RDFS_SUBCLASSOF, RDFS_SUBPROPERTYOF,
                        RDFS_DOMAIN, RDFS_RANGE}
        for a, b in sub_c:
            for c, d in sub_c:
                if b == c and a != d:
                    new.add((a, RDFS_SUBCLASSOF, d, True))
        for a, b in sub_p:
            for c, d in sub_p:
                if b == c and a != d:
                    new.add((a, RDFS_SUBPROPERTYOF, d, True))
        for s, p, o, u in closed:
            if p in schema_preds:
                if p == RDF_TYPE:
                    for c, d in sub_c:
                        if o == c:
                            new.add((s, RDF_TYPE, d, True))
                continue
            for p1, p2 in sub_p:
                if p == p1:
                    new.add((s, p2, o, u))
            for pp, cls in dom:
                if p == pp:
                    new.add((s, RDF_TYPE, cls, True))
            for pp, cls in rng:
                if p == pp and u:
                    new.add((o, RDF_TYPE, cls, True))
        if new <= closed:
            return closed - set(facts)
        closed |= new


def _run(spark, rows):
    df = spark.createDataFrame(rows, TRIPLES)
    out = rdfs_closure(df)
    return {(r.subj, r.pred, r.obj, r.obj_is_uri) for r in out.collect()}


def test_transitive_closure_chain_and_cycle(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"), ("y", "x")],
        ["sub", "sup"],
    )
    got = {(r.sub, r.sup) for r in transitive_closure(edges).collect()}
    assert got == {
        ("a", "b"), ("b", "c"), ("c", "d"),
        ("a", "c"), ("b", "d"), ("a", "d"),
        ("x", "y"), ("y", "x"),  # cycle: reach each other, no self loops
    }


def test_textbook_example(spark):
    rows = [
        _t("c:Dog", RDFS_SUBCLASSOF, "c:Mammal"),
        _t("c:Mammal", RDFS_SUBCLASSOF, "c:Animal"),
        _t("p:hasPet", RDFS_SUBPROPERTYOF, "p:owns"),
        _t("p:hasPet", RDFS_DOMAIN, "c:Person"),
        _t("p:hasPet", RDFS_RANGE, "c:Animal"),
        _t("e:alice", "p:hasPet", "e:rex"),
        _t("e:rex", RDF_TYPE, "c:Dog"),
        _t("e:alice", "p:note", "likes dogs", uri=False),
    ]
    got = _run(spark, rows)
    assert ("c:Dog", RDFS_SUBCLASSOF, "c:Animal", True) in got      # rdfs11
    assert ("e:alice", "p:owns", "e:rex", True) in got              # rdfs7
    assert ("e:alice", RDF_TYPE, "c:Person", True) in got           # rdfs2
    assert ("e:rex", RDF_TYPE, "c:Animal", True) in got             # rdfs3+9
    assert ("e:rex", RDF_TYPE, "c:Mammal", True) in got             # rdfs9
    # asserted facts never reappear
    assert ("e:rex", RDF_TYPE, "c:Dog", True) not in got
    # literals never become types
    assert not any(s == "likes dogs" for s, _, _, _ in got)
    naive = _naive_rdfs({(s, p, o, u) for s, p, o, u, *_ in rows})
    assert got == naive


def test_domain_inherited_through_subproperty(spark):
    # p1 ⊑ p2, domain(p2)=C: an assertion of p1 must type its subject C
    rows = [
        _t("p:p1", RDFS_SUBPROPERTYOF, "p:p2"),
        _t("p:p2", RDFS_DOMAIN, "c:C"),
        _t("e:x", "p:p1", "e:y"),
    ]
    got = _run(spark, rows)
    assert ("e:x", RDF_TYPE, "c:C", True) in got
    assert got == _naive_rdfs({(s, p, o, u) for s, p, o, u, *_ in rows})


def test_literal_objects_never_range_typed(spark):
    rows = [
        _t("p:age", RDFS_RANGE, "c:Num"),
        _t("e:x", "p:age", "42", uri=False),
    ]
    got = _run(spark, rows)
    assert not any(s == "42" for s, _, _, _ in got)


def test_provenance_rides_trigger(spark):
    rows = [
        _t("c:A", RDFS_SUBCLASSOF, "c:B", src="u:schema", pk=7),
        _t("e:x", RDF_TYPE, "c:A", src="u:doc", pk=3),
    ]
    df = spark.createDataFrame(rows, TRIPLES)
    out = {(r.subj, r.obj): (r.src_url, r.part_key)
           for r in rdfs_closure(df).filter(F.col("pred") == RDF_TYPE).collect()}
    assert out[("e:x", "c:B")] == ("u:doc", 3)


@pytest.mark.parametrize("seed", [1, 2])
def test_random_graphs_match_naive(spark, seed):
    rnd = random.Random(seed)
    classes = [f"c:{i}" for i in range(8)]
    props = [f"p:{i}" for i in range(6)]
    ents = [f"e:{i}" for i in range(20)]
    rows = []
    for _ in range(6):
        rows.append(_t(rnd.choice(classes), RDFS_SUBCLASSOF, rnd.choice(classes)))
    for _ in range(4):
        rows.append(_t(rnd.choice(props), RDFS_SUBPROPERTYOF, rnd.choice(props)))
    for _ in range(3):
        rows.append(_t(rnd.choice(props), RDFS_DOMAIN, rnd.choice(classes)))
        rows.append(_t(rnd.choice(props), RDFS_RANGE, rnd.choice(classes)))
    for _ in range(30):
        rows.append(_t(rnd.choice(ents), rnd.choice(props), rnd.choice(ents)))
    for _ in range(10):
        rows.append(_t(rnd.choice(ents), RDF_TYPE, rnd.choice(classes)))
    for _ in range(5):
        rows.append(_t(rnd.choice(ents), rnd.choice(props), "lit", uri=False))
    got = _run(spark, list(dict.fromkeys(rows)))
    naive = _naive_rdfs({(s, p, o, u) for s, p, o, u, *_ in rows})
    assert got == naive
