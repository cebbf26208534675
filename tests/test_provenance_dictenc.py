"""PROV-O lineage triples (operators/provenance.py) and RDF dictionary
encoding (operators/dictenc.py)."""

from __future__ import annotations

from ferenda_spark.operators.dictenc import (
    collision_audit,
    decode_triples,
    encode_triples,
)
from ferenda_spark.operators.provenance import prov_triples


def _lineage(spark, rows):
    return spark.createDataFrame(
        rows,
        "stage string, part_key int, partition_id int, n_in long, "
        "n_out long, bytes_in long, wall_ms long, run_id string",
    )


def test_prov_triples_shapes(spark):
    lin = _lineage(
        spark,
        [
            ("parse", 3, 3, 100, 98, 5000, 120, "r1"),
            ("triples", 3, 3, 98, 400, None, None, "r1"),
        ],
    )
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in prov_triples(lin, upstream={"triples": "parse"}).collect()
    }
    act_p, act_t = "act:r1/parse/3", "act:r1/triples/3"
    ent_p, ent_t = "tbl:parse/p3", "tbl:triples/p3"
    assert (act_p, "rdf:type", "prov:Activity") in got
    assert (ent_t, "prov:wasGeneratedBy", act_t) in got
    assert (act_t, "prov:used", ent_p) in got
    assert (ent_t, "prov:wasDerivedFrom", ent_p) in got
    # parse has no upstream → no used/derivedFrom rows
    assert not any(s == act_p and p == "prov:used" for s, p, _ in got)
    # metrics as literals; NULLs dropped
    assert (act_p, "m:bytesIn", "5000") in got
    assert not any(s == act_t and p == "m:bytesIn" for s, p, _ in got)
    assert (act_t, "m:nOut", "400") in got


def test_prov_triple_count_per_row(spark):
    lin = _lineage(spark, [("parse", 0, 0, 1, 1, 1, 1, "r1")])
    # no upstream: 3 structure + 4 metrics = 7
    assert prov_triples(lin).count() == 7


def _triples(spark):
    rows = [
        ("e:1", "p:a", "e:2"),
        ("e:1", "p:b", "lit one"),
        ("e:2", "p:a", "e:1"),
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_encode_decode_roundtrip(spark):
    tri = _triples(spark)
    terms, enc = encode_triples(tri)
    assert set(enc.columns) == {"subj_id", "pred_id", "obj_id"}
    assert terms.count() == 5  # e:1 e:2 p:a p:b 'lit one' (repeats dedup)
    back = {
        (r["subj"], r["pred"], r["obj"])
        for r in decode_triples(enc, terms).collect()
    }
    assert back == {tuple(r) for r in tri.collect()}
    assert collision_audit(terms).count() == 0


def test_encode_is_stable_and_engine_replayable(spark):
    """Same term → same id in a separate encode call, and the id equals
    the documented md5-prefix formula."""
    import hashlib

    t1, _ = encode_triples(_triples(spark))
    t2, _ = encode_triples(_triples(spark).limit(1))
    m1 = {r["term"]: r["term_id"] for r in t1.collect()}
    m2 = {r["term"]: r["term_id"] for r in t2.collect()}
    for term, tid in m2.items():
        assert m1[term] == tid
    assert m1["e:1"] == int(hashlib.md5(b"e:1").hexdigest()[:15], 16)
