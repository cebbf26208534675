"""Turtle-lite serialization (sources/turtle.py)."""

from __future__ import annotations

from ferenda_spark.sources.turtle import to_turtle_lines


def _tri(spark, rows):
    return spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_uri boolean, "
        "obj_lang string, obj_dtype string",
    )


def test_grouping_and_sorting(spark):
    rows = [
        ("s:1", "p:b", "o:2", True, None, None),
        ("s:1", "p:a", "zz", False, None, None),
        ("s:1", "p:a", "aa", False, "en", None),
        ("s:2", "p:c", "5", False, None, "xsd:int"),
    ]
    got = {r["subj"]: r["line"] for r in to_turtle_lines(_tri(spark, rows)).collect()}
    assert got["s:1"] == '<s:1> <p:a> "aa"@en , "zz" ; <p:b> <o:2> .'
    assert got["s:2"] == '<s:2> <p:c> "5"^^<xsd:int> .'


def test_escaping_matches_nt(spark):
    rows = [("s", "p", 'he said "hi"\\\n', False, None, None)]
    line = to_turtle_lines(_tri(spark, rows)).collect()[0]["line"]
    assert line == '<s> <p> "he said \\"hi\\"\\\\\\n" .'


def test_insertion_order_invariant(spark):
    rows = [
        ("s", "p", "b", False, None, None),
        ("s", "p", "a", False, None, None),
        ("s", "q", "c", True, None, None),
    ]
    a = to_turtle_lines(_tri(spark, rows)).collect()[0]["line"]
    b = to_turtle_lines(_tri(spark, list(reversed(rows)))).collect()[0]["line"]
    assert a == b == '<s> <p> "a" , "b" ; <q> <c> .'
