"""R2RML-lite mapping (operators/r2rml.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ferenda_spark.operators.r2rml import (
    RDF_TYPE,
    XSD_INTEGER,
    ColumnMap,
    TableMapping,
    map_table,
    map_tables,
)
from ferenda_spark.schemas import TRIPLES


def test_map_table_all_term_kinds(spark):
    df = spark.createDataFrame(
        [(1, "alpha", 10, "hello"), (2, "beta", 20, None)],
        ["id", "name", "ref", "note"],
    )
    m = TableMapping(
        subject_template="ent:thing/{id}",
        class_uri="c:Thing",
        predicates=[
            ColumnMap("p:name", "name"),
            ColumnMap("p:ref", "ent:other/{ref}", template=True, is_uri=True),
            ColumnMap("p:note", "note", lang="en"),
            ColumnMap("p:id", "id", dtype=XSD_INTEGER),
        ],
    )
    out = map_table(df, m, src_url="t:test")
    assert out.columns == [f.name for f in TRIPLES.fields]
    got = {
        (r.subj, r.pred, r.obj, r.obj_is_uri, r.obj_lang, r.obj_dtype)
        for r in out.collect()
    }
    assert ("ent:thing/1", RDF_TYPE, "c:Thing", True, None, None) in got
    assert ("ent:thing/1", "p:name", "alpha", False, None, None) in got
    assert ("ent:thing/1", "p:ref", "ent:other/10", True, None, None) in got
    assert ("ent:thing/1", "p:note", "hello", False, "en", None) in got
    assert ("ent:thing/1", "p:id", "1", False, None, XSD_INTEGER) in got
    # NULL column → NO triple (R2RML term-map rule)
    assert not any(
        s == "ent:thing/2" and p == "p:note" for s, p, *_ in got
    )
    assert len([1 for s, *_ in got if s == "ent:thing/2"]) == 4
    assert out.filter(F.col("src_url") != "t:test").count() == 0
    assert out.filter(F.col("part_key").isNull()).count() == 0


def test_null_in_subject_template_drops_row(spark):
    df = spark.createDataFrame([(1, "a"), (None, "b")], ["id", "v"])
    m = TableMapping("ent:{id}", predicates=[ColumnMap("p:v", "v")])
    out = map_table(df, m).collect()
    assert {r.subj for r in out} == {"ent:1"}


def test_map_tables_union_and_src(spark):
    a = spark.createDataFrame([(1,)], ["x"])
    b = spark.createDataFrame([(2,)], ["y"])
    out = map_tables({
        "tbl:a": (a, TableMapping("a:{x}", class_uri="c:A")),
        "tbl:b": (b, TableMapping("b:{y}", class_uri="c:B")),
    }).collect()
    assert {(r.subj, r.src_url) for r in out} == {
        ("a:1", "tbl:a"), ("b:2", "tbl:b"),
    }
