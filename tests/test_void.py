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


def _tri2(spark, lo, hi):
    from pyspark.sql import functions as F

    return (
        spark.range(lo, hi)
        .select(
            F.concat(F.lit("e:"), F.col("id").cast("string")).alias("subj"),
            F.lit("rdf:type").alias("pred"),
            F.concat(F.lit("c:"), (F.col("id") % 4).cast("string")).alias("obj"),
        )
        .unionByName(
            spark.range(lo, hi).select(
                F.concat(F.lit("e:"), F.col("id").cast("string")).alias("subj"),
                F.lit("p:cites").alias("pred"),
                F.concat(F.lit("e:"), ((F.col("id") * 3 + 1) % 200).cast("string")).alias("obj"),
            )
        )
    )


def test_void_state_merge_equals_union(spark):
    from ferenda_spark.operators.void_stats import (
        void_merge_states,
        void_sketch_state,
    )

    a = void_sketch_state(_tri2(spark, 0, 60))
    b = void_sketch_state(_tri2(spark, 60, 130))
    merged = void_merge_states(a.unionByName(b))
    full = void_sketch_state(_tri2(spark, 0, 130))
    ma = {r["metric"]: (r["cnt"], r["kmv"]) for r in merged.collect()}
    mf = {r["metric"]: (r["cnt"], r["kmv"]) for r in full.collect()}
    assert ma == mf  # state(A∪B) == merge(state(A), state(B)) exactly


def test_void_estimates_exact_below_k(spark):
    from ferenda_spark.operators.void_stats import (
        void_estimate,
        void_sketch_state,
    )

    t = _tri2(spark, 0, 100)  # 130 distinct subjects max < k=256 → exact
    got = {r["metric"]: r["value"] for r in void_estimate(void_sketch_state(t)).collect()}
    assert got["triples"] == 200.0
    assert got["subjects"] == 100.0
    assert got["predicates"] == 2.0
    assert got["classes"] == 4.0
    # objects: 4 classes + distinct cite targets
    exact_obj = t.select("obj").distinct().count()
    assert got["objects"] == float(exact_obj)
