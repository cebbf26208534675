"""SHACL-lite validation (operators/validation.py) vs a naive Python
checker applying the same constraint vocabulary one focus at a time."""

from __future__ import annotations

import re

from ferenda_spark.operators.validation import (
    RDF_TYPE,
    shapes_df,
    validate_shapes,
)
from ferenda_spark.schemas import TRIPLES


def _t(s, p, o, uri=True, dtype=None, src="u:0", pk=0):
    return (s, p, o, uri, None, dtype, src, pk)


def _naive(rows, shapes):
    """rows: TRIPLES tuples; shapes: list of dicts. → set of violations."""
    types = {(s, o) for s, p, o, u, *_ in rows if p == RDF_TYPE and u}
    out = set()
    for sh in shapes:
        foci = {s for s, c in types if c == sh["target_class"]}
        for f in foci:
            vals = [
                (o, u, dt)
                for s, p, o, u, _l, dt, *_ in rows
                if s == f and p == sh["property"]
            ]
            n = len(vals)
            if sh.get("min_count") and n < sh["min_count"]:
                out.add((f, sh["shape"], "minCount", str(n)))
            if sh.get("max_count") is not None and n > sh["max_count"]:
                out.add((f, sh["shape"], "maxCount", str(n)))
            for o, u, dt in vals:
                if sh.get("datatype") and (u or dt != sh["datatype"]):
                    out.add((f, sh["shape"], "datatype", o))
                if sh.get("node_kind") == "IRI" and not u:
                    out.add((f, sh["shape"], "nodeKind", o))
                if sh.get("node_kind") == "Literal" and u:
                    out.add((f, sh["shape"], "nodeKind", o))
                if sh.get("pattern") and not re.search(sh["pattern"], o):
                    out.add((f, sh["shape"], "pattern", o))
    return out


def _run(spark, rows, shapes):
    got = validate_shapes(
        spark.createDataFrame(rows, TRIPLES), shapes_df(spark, shapes)
    ).collect()
    return {(r.focus, r.shape, r.constraint, r.value) for r in got}


SHAPES = [
    dict(shape="DocShape-title", target_class="c:Doc", property="p:title",
         min_count=1, max_count=1, node_kind="Literal"),
    dict(shape="DocShape-issued", target_class="c:Doc", property="p:issued",
         min_count=1, datatype="xsd:date"),
    dict(shape="DocShape-code", target_class="c:Doc", property="p:code",
         min_count=0, pattern="^[A-Z]{3}-[0-9]+$"),
    dict(shape="PersonShape-home", target_class="c:Person",
         property="p:home", min_count=0, node_kind="IRI"),
]


def test_all_constraint_kinds(spark):
    rows = [
        _t("e:ok", RDF_TYPE, "c:Doc"),
        _t("e:ok", "p:title", "Fine", uri=False),
        _t("e:ok", "p:issued", "2026-01-01", uri=False, dtype="xsd:date"),
        _t("e:ok", "p:code", "ABC-42", uri=False),
        # missing title (minCount) + bad date dtype
        _t("e:m", RDF_TYPE, "c:Doc"),
        _t("e:m", "p:issued", "soon", uri=False, dtype=None),
        # two titles (maxCount), one a URI (nodeKind)
        _t("e:d", RDF_TYPE, "c:Doc"),
        _t("e:d", "p:title", "One", uri=False),
        _t("e:d", "p:title", "e:other", uri=True),
        _t("e:d", "p:issued", "2026-01-02", uri=False, dtype="xsd:date"),
        # bad pattern
        _t("e:p", RDF_TYPE, "c:Doc"),
        _t("e:p", "p:title", "T", uri=False),
        _t("e:p", "p:issued", "2026-01-03", uri=False, dtype="xsd:date"),
        _t("e:p", "p:code", "abc-42", uri=False),
        # person with literal home (nodeKind IRI)
        _t("e:al", RDF_TYPE, "c:Person"),
        _t("e:al", "p:home", "not-a-uri", uri=False),
        # untyped node: out of scope entirely
        _t("e:x", "p:title", "ignored", uri=False),
    ]
    got = _run(spark, rows, SHAPES)
    want = _naive(rows, SHAPES)
    assert got == want
    assert ("e:m", "DocShape-title", "minCount", "0") in got
    assert ("e:d", "DocShape-title", "maxCount", "2") in got
    assert ("e:m", "DocShape-issued", "datatype", "soon") in got
    assert ("e:d", "DocShape-title", "nodeKind", "e:other") in got
    assert ("e:p", "DocShape-code", "pattern", "abc-42") in got
    assert ("e:al", "PersonShape-home", "nodeKind", "not-a-uri") in got
    assert not any(f == "e:ok" or f == "e:x" for f, *_ in got)


def test_clean_graph_no_violations(spark):
    rows = [
        _t("e:1", RDF_TYPE, "c:Doc"),
        _t("e:1", "p:title", "A", uri=False),
        _t("e:1", "p:issued", "2026-02-02", uri=False, dtype="xsd:date"),
    ]
    assert _run(spark, rows, SHAPES) == set()


def test_random_graphs_match_naive(spark):
    import random

    rnd = random.Random(11)
    rows = []
    for i in range(40):
        e = f"e:{i}"
        rows.append(_t(e, RDF_TYPE, rnd.choice(["c:Doc", "c:Person", "c:Other"])))
        for _ in range(rnd.randint(0, 3)):
            rows.append(_t(e, "p:title", f"T{rnd.randint(0, 5)}",
                           uri=rnd.random() < 0.2))
        if rnd.random() < 0.8:
            rows.append(_t(e, "p:issued", "2026-01-01", uri=False,
                           dtype=rnd.choice(["xsd:date", None, "xsd:string"])))
        if rnd.random() < 0.5:
            rows.append(_t(e, "p:code",
                           rnd.choice(["ABC-1", "bad", "XYZ-99", "XY-1"]),
                           uri=False))
        if rnd.random() < 0.4:
            rows.append(_t(e, "p:home", f"h:{i}", uri=rnd.random() < 0.5))
    assert _run(spark, rows, SHAPES) == _naive(rows, SHAPES)
