"""OWL-lite property semantics (operators/owl.py) vs a naive fixpoint."""

from __future__ import annotations

import hashlib

from ferenda_spark.operators.owl import (
    OWL_FUNCTIONAL,
    OWL_INVERSE_OF,
    OWL_SYMMETRIC,
    OWL_TRANSITIVE,
    functional_conflicts,
    owl_closure,
)
from ferenda_spark.operators.inference import RDF_TYPE

COLS = (
    "subj string, pred string, obj string, obj_is_uri boolean, "
    "obj_lang string, obj_dtype string"
)


def _df(spark, rows):
    """rows: (s, p, o, is_uri) — lang/dtype None."""
    return spark.createDataFrame(
        [(s, p, o, u, None, None) for s, p, o, u in rows], COLS
    )


def _naive(rows):
    """Fixpoint over the uri-object triples under the three inference
    characteristics; returns inferred-only (s, p, o) set."""
    asserted = {(s, p, o) for s, p, o, u in rows}
    uri = {(s, p, o) for s, p, o, u in rows if u}
    inv = {}
    sym, trans = set(), set()
    for s, p, o, u in rows:
        if p == OWL_INVERSE_OF and u:
            inv[s] = o
            inv[o] = s
        if p == RDF_TYPE and o == OWL_SYMMETRIC:
            sym.add(s)
        if p == RDF_TYPE and o == OWL_TRANSITIVE:
            trans.add(s)
    derived = set(uri)
    while True:
        new = set()
        for s, p, o in derived:
            if p in inv:
                new.add((o, inv[p], s))
            if p in sym:
                new.add((o, p, s))
        for s, p, o in derived:
            if p in trans:
                for s2, p2, o2 in derived:
                    if p2 == p and s2 == o and o2 != s:
                        new.add((s, p, o2))
        if new <= derived:
            break
        derived |= new
    return {(s, p, o) for s, p, o in derived - uri} - asserted


def _run(spark, rows):
    got = owl_closure(_df(spark, rows))
    return {(r["subj"], r["pred"], r["obj"]) for r in got.collect()}


INV = OWL_INVERSE_OF
T = RDF_TYPE


def test_inverse_both_directions(spark):
    rows = [
        ("hasPart", INV, "partOf", True),
        ("a", "hasPart", "b", True),
        ("c", "partOf", "d", True),  # declared one way, fires both
        ("x", "hasPart", "lit", False),  # literal object: no inverse
    ]
    assert _run(spark, rows) == {
        ("b", "partOf", "a"),
        ("d", "hasPart", "c"),
    }


def test_symmetric_skips_already_asserted(spark):
    rows = [
        ("rel", T, OWL_SYMMETRIC, True),
        ("a", "rel", "b", True),
        ("b", "rel", "a", True),  # reverse asserted → nothing new
        ("b", "rel", "c", True),
    ]
    assert _run(spark, rows) == {("c", "rel", "b")}


def test_transitive_chain(spark):
    rows = [
        ("in", T, OWL_TRANSITIVE, True),
        ("a", "in", "b", True),
        ("b", "in", "c", True),
        ("c", "in", "d", True),
    ]
    assert _run(spark, rows) == {
        ("a", "in", "c"), ("a", "in", "d"), ("b", "in", "d"),
    }
    assert _run(spark, rows) == _naive(rows)


def test_symmetric_transitive_composition(spark):
    rows = [
        ("near", T, OWL_SYMMETRIC, True),
        ("near", T, OWL_TRANSITIVE, True),
        ("a", "near", "b", True),
        ("b", "near", "c", True),
    ]
    assert _run(spark, rows) == _naive(rows)
    # the component becomes a clique (minus self-loops, minus asserted)
    assert ("c", "near", "a") in _run(spark, rows)


def test_fixpoint_property_random_graphs(spark):
    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    rows = [
        ("p0", INV, "q0", True),
        ("p1", T, OWL_SYMMETRIC, True),
        ("p2", T, OWL_TRANSITIVE, True),
    ]
    for i in range(60):
        p = f"p{h(f'pred{i}') % 3}"
        s = f"n{h(f's{i}') % 12}"
        o = f"n{h(f'o{i}') % 12}"
        if s != o:
            rows.append((s, p, o, True))
    assert _run(spark, rows) == _naive(rows)


def test_functional_conflicts(spark):
    rows = [
        ("birthPlace", T, OWL_FUNCTIONAL, True),
        ("e1", "birthPlace", "Paris", True),
        ("e1", "birthPlace", "Lyon", True),
        ("e2", "birthPlace", "Oslo", True),
        ("e3", "other", "x", True),
        ("e3", "other", "y", True),  # not declared functional
    ]
    got = functional_conflicts(_df(spark, rows)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["subj"], r["pred"], r["n_values"]) == ("e1", "birthPlace", 2)
    assert r["values"] == ["Lyon", "Paris"]


def test_functional_conflict_on_full_term_not_lexical(spark):
    """Same lexical form with different lang/dtype IS a conflict."""
    df = spark.createDataFrame(
        [
            ("birthPlace", T, OWL_FUNCTIONAL, True, None, None),
            ("e1", "birthPlace", "Boston", False, "en", None),
            ("e1", "birthPlace", "Boston", False, None, "xsd:string"),
        ],
        COLS,
    )
    got = functional_conflicts(df).collect()
    assert len(got) == 1
    assert got[0]["n_values"] == 2
    assert got[0]["values"] == ["Boston"]
