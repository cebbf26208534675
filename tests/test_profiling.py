"""Schema profiling (operators/profiling.py) vs a naive Python profiler."""

from __future__ import annotations

from ferenda_spark.operators.profiling import RDF_TYPE, profile_schema
from ferenda_spark.schemas import TRIPLES


def _t(s, p, o, uri=True, dtype=None):
    return (s, p, o, uri, None, dtype, "u:0", 0)


def _naive(rows):
    types = {}
    for s, p, o, u, *_ in rows:
        if p == RDF_TYPE and u:
            types.setdefault(s, set()).add(o)
    out = {}
    for s, p, o, u, _l, dt, *_ in rows:
        if p == RDF_TYPE:
            continue
        s_classes = sorted(types.get(s, {None})) or [None]
        if u and o in types:
            kinds = sorted(types[o])
        elif u:
            kinds = ["@IRI"]
        elif dt:
            kinds = [dt]
        else:
            kinds = ["@Literal"]
        for sc in (s_classes if types.get(s) else [None]):
            for k in kinds:
                key = (sc, p, k)
                n, subjs, objs = out.get(key, (0, set(), set()))
                out[key] = (n + 1, subjs | {s}, objs | {o})
    return {k: (n, len(ss), len(oo)) for k, (n, ss, oo) in out.items()}


def _run(spark, rows):
    df = spark.createDataFrame(rows, TRIPLES)
    return {
        (r.subj_class, r.pred, r.obj_kind): (r.n, r.n_subj, r.n_obj)
        for r in profile_schema(df).collect()
    }


def test_profile_kinds(spark):
    rows = [
        _t("e:a", RDF_TYPE, "c:Doc"),
        _t("e:b", RDF_TYPE, "c:Person"),
        _t("e:a", "p:author", "e:b"),           # typed → typed
        _t("e:a", "p:link", "e:untyped"),       # typed → @IRI
        _t("e:a", "p:title", "T", uri=False),   # typed → @Literal
        _t("e:a", "p:n", "4", uri=False, dtype="xsd:integer"),
        _t("e:x", "p:title", "U", uri=False),   # untyped subject
        # literal that collides with a typed node's id: stays @Literal
        _t("e:a", "p:note", "e:b", uri=False),
    ]
    got = _run(spark, rows)
    assert got[("c:Doc", "p:author", "c:Person")] == (1, 1, 1)
    assert got[("c:Doc", "p:link", "@IRI")] == (1, 1, 1)
    assert got[("c:Doc", "p:title", "@Literal")] == (1, 1, 1)
    assert got[("c:Doc", "p:n", "xsd:integer")] == (1, 1, 1)
    assert got[(None, "p:title", "@Literal")] == (1, 1, 1)
    assert got[("c:Doc", "p:note", "@Literal")] == (1, 1, 1)
    assert got == _naive(rows)


def test_multi_typed_nodes_fan_out(spark):
    rows = [
        _t("e:a", RDF_TYPE, "c:A"),
        _t("e:a", RDF_TYPE, "c:B"),
        _t("e:o", RDF_TYPE, "c:O1"),
        _t("e:o", RDF_TYPE, "c:O2"),
        _t("e:a", "p:r", "e:o"),
    ]
    got = _run(spark, rows)
    # 2 subject classes x 2 object classes = 4 observation rows
    assert set(got) == {
        ("c:A", "p:r", "c:O1"), ("c:A", "p:r", "c:O2"),
        ("c:B", "p:r", "c:O1"), ("c:B", "p:r", "c:O2"),
    }
    assert all(v == (1, 1, 1) for v in got.values())


def test_random_matches_naive(spark):
    import random

    rnd = random.Random(21)
    rows = []
    for i in range(30):
        e = f"e:{i}"
        for _ in range(rnd.randint(0, 2)):
            rows.append(_t(e, RDF_TYPE, f"c:{rnd.randint(0, 3)}"))
    rows = list(dict.fromkeys(rows))
    for _ in range(120):
        s = f"e:{rnd.randint(0, 29)}"
        o = rnd.choice([f"e:{rnd.randint(0, 29)}", "lit", "e:999"])
        uri = o.startswith("e:") and rnd.random() < 0.8
        rows.append(_t(s, f"p:{rnd.randint(0, 4)}", o, uri=uri,
                       dtype="xsd:string" if not uri and rnd.random() < 0.3
                       else None))
    assert _run(spark, rows) == _naive(rows)
