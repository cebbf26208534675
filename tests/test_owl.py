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


# ------------------------------------------ closure growth audit / budget


def _chain_df(spark, n):
    rows = [(f"n{i}", "p:part", f"n{i+1}", True) for i in range(n)]
    rows.append(("p:part", RDF_TYPE, OWL_TRANSITIVE, True))
    return _df(spark, rows)


def test_closure_budget_raises_on_deep_chain(spark):
    """10k-deep transitive chain: the closure is ~50M rows; a 50k budget
    must bail after a few doubling rounds instead of materializing it."""
    import pytest as _pytest

    from ferenda_spark.operators.inference import ClosureBudgetError

    audit = []
    with _pytest.raises(ClosureBudgetError) as exc:
        owl_closure(
            _chain_df(spark, 10_000),
            max_closure_rows=50_000,
            closure_audit=audit,
        ).count()
    assert exc.value.max_rows == 50_000
    assert exc.value.rows > 50_000
    assert audit[-1]["budget_exceeded"] is True
    # growth was audited every round, monotone, and stopped early:
    # ~80k rows after 3 doublings, nowhere near the 50M full closure
    assert [a["round"] for a in audit] == list(range(len(audit)))
    assert len(audit) <= 5
    assert all(a["added"] > 0 for a in audit)


def test_closure_budget_partial_is_under_approximation(spark):
    from ferenda_spark.operators.inference import ClosureBudgetError

    audit = []
    got = owl_closure(
        _chain_df(spark, 10_000),
        max_closure_rows=50_000,
        on_budget="partial",
        closure_audit=audit,
    )
    pairs = {(r["subj"], r["obj"]) for r in got.collect()}
    assert audit[-1]["budget_exceeded"] is True
    # every returned pair is a TRUE reachability pair (i < j), none is
    # asserted (inferred-only), and the deep pairs are absent (partial)
    assert pairs
    assert all(int(s[1:]) < int(o[1:]) for s, o in pairs)
    assert all(int(o[1:]) - int(s[1:]) >= 2 for s, o in pairs)
    assert ("n0", "n9999") not in pairs


def test_closure_audit_exact_growth_small_chain(spark):
    """Exact per-round growth on a 9-node chain (8 edges): rows double in
    path-length coverage each round — 8, 15, 26, 36, 36 (converged)."""
    audit = []
    got = owl_closure(_chain_df(spark, 8), closure_audit=audit)
    # inferred-only rows: all (i, j) with j - i >= 2 → C(9,2) - 8 = 28
    assert got.count() == 28
    assert audit[0] == {"round": 0, "rows": 8, "added": 8,
                        "budget_exceeded": False}
    rows_seq = [a["rows"] for a in audit]
    assert rows_seq == sorted(rows_seq)
    assert rows_seq[-1] == rows_seq[-2] == 36  # C(9,2) = 36, converged
    assert all(a["budget_exceeded"] is False for a in audit)
