"""VoID dataset description (operators/void_stats.py)."""

from __future__ import annotations

import hashlib

from ferenda_spark.operators.void_stats import void_description


def _tri(spark):
    rows = [
        ("e1", "rdf:type", "c:Doc"),
        ("e2", "rdf:type", "c:Doc"),
        ("e3", "rdf:type", "c:Page"),
        ("e1", "p:cites", "e2"),
        ("e1", "p:cites", "e3"),
        ("e2", "p:label", "two"),
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_dataset_level_counts(spark):
    got = {
        (r["subj"], r["pred"]): r["obj"]
        for r in void_description(_tri(spark)).collect()
        if r["subj"] == "void:ds" and not r["pred"].endswith("Partition")
    }
    assert got[("void:ds", "void:triples")] == "6"
    assert got[("void:ds", "void:distinctSubjects")] == "3"
    assert got[("void:ds", "void:distinctObjects")] == "5"  # cDoc cPage e2 e3 two
    assert got[("void:ds", "void:properties")] == "3"
    assert got[("void:ds", "void:classes")] == "2"
    assert got[("void:ds", "rdf:type")] == "void:Dataset"


def test_partitions(spark):
    rows = void_description(_tri(spark)).collect()
    pnode = "void:ds/prop/" + hashlib.md5(b"p:cites").hexdigest()
    by = {(r["subj"], r["pred"]): r["obj"] for r in rows}
    assert by[(pnode, "void:property")] == "p:cites"
    assert by[(pnode, "void:triples")] == "2"
    cnode = "void:ds/class/" + hashlib.md5(b"c:Doc").hexdigest()
    assert by[(cnode, "void:class")] == "c:Doc"
    assert by[(cnode, "void:entities")] == "2"
    # partition membership edges exist
    assert by[("void:ds", "void:propertyPartition")] is not None


def test_numeric_literals_typed(spark):
    rows = void_description(_tri(spark)).collect()
    for r in rows:
        if r["pred"] in ("void:triples", "void:entities",
                         "void:distinctSubjects", "void:distinctObjects",
                         "void:properties", "void:classes"):
            assert r["obj_dtype"] == "http://www.w3.org/2001/XMLSchema#integer"
            assert not r["obj_is_uri"]
        if r["pred"] in ("void:property", "void:class", "rdf:type",
                         "void:propertyPartition", "void:classPartition"):
            assert r["obj_is_uri"]
