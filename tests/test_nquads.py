"""N-Quads sink/source: escape-exact round-trips, default-graph handling,
malformed-line errors-as-data, NT-dump compatibility."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ferenda_spark.sources.nquads import (
    parse_nquads_lines,
    read_nquads,
    to_nquads_lines,
    write_nquads,
)


def _quads(spark, rows):
    return spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_uri boolean, "
        "obj_lang string, obj_dtype string, graph string",
    )


NASTY = 'he said "hi"\\\n\ttab <not a uri>'


@pytest.fixture(scope="module")
def sample(spark):
    return _quads(
        spark,
        [
            ("s:1", "p:a", "o:1", True, None, None, "g:parse"),
            ("s:1", "p:b", NASTY, False, None, None, "g:parse"),
            ("s:2", "p:c", "x", False, "en", None, "g:harvest"),
            ("s:2", "p:d", "42", False, None, "xsd:integer", None),  # default graph
        ],
    )


def test_serialization_shapes(sample):
    lines = {r["graph"]: r["line"] for r in to_nquads_lines(sample).collect() if r["pred"] in ("p:a", "p:d")}
    assert lines["g:parse"] == "<s:1> <p:a> <o:1> <g:parse> ."
    assert lines[None] == '<s:2> <p:d> "42"^^<xsd:integer> .'


def test_roundtrip_exact(spark, sample, tmp_path):
    path = str(tmp_path / "quads")
    write_nquads(sample, path)
    back = read_nquads(spark, path)
    assert back.filter("kind != 'quad'").count() == 0
    orig = {tuple(r) for r in sample.collect()}
    got = {
        (r["subj"], r["pred"], r["obj"], r["obj_is_uri"], r["obj_lang"],
         r["obj_dtype"], r["graph"])
        for r in back.collect()
    }
    assert got == orig


def test_literal_with_angle_brackets_keeps_graph_slot(spark):
    """A literal containing ' <x>' must not be parsed as a graph term."""
    q = _quads(spark, [("s", "p", "see <here> ok", False, None, None, "g:1")])
    line = to_nquads_lines(q).collect()[0]["line"]
    back = parse_nquads_lines(
        q.sparkSession.createDataFrame([(line,)], "line string")
    ).collect()[0]
    assert back["obj"] == "see <here> ok"
    assert back["graph"] == "g:1"
    assert back["kind"] == "quad"


def test_ntriples_dump_reads_as_default_graph(spark):
    lines = spark.createDataFrame(
        [("<s> <p> <o> .",), ("# comment",), ("",)], "line string"
    )
    rows = parse_nquads_lines(lines).collect()
    assert len(rows) == 1
    assert rows[0]["graph"] is None and rows[0]["kind"] == "quad"


def test_malformed_lines_become_errors(spark):
    lines = spark.createDataFrame(
        [("<s> <p> .",), ("garbage",), ('<s> <p> "unterminated .',)],
        "line string",
    )
    rows = parse_nquads_lines(lines).collect()
    assert all(r["kind"] == "nq_error" for r in rows)
    assert {r["obj"] for r in rows} == {
        "<s> <p> .", "garbage", '<s> <p> "unterminated .'
    }
