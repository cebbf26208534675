"""N-Triples sink/source (sources/ntriples.py): canonical serialization
pinned against hand-written lines, round-trip identity over hostile
literals, malformed input as nt_error rows, file write/read."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ferenda_spark.schemas import TRIPLES
from ferenda_spark.sources.ntriples import (
    parse_ntriples_lines,
    read_ntriples,
    to_ntriples_lines,
    write_ntriples,
)


def _t(s, p, o, uri=True, lang=None, dtype=None):
    return (s, p, o, uri, lang, dtype, "u:0", 0)


def _lines(spark, rows):
    df = spark.createDataFrame(rows, TRIPLES)
    return [r.line for r in to_ntriples_lines(df).select("line").collect()]


def test_serialization_pinned(spark):
    got = set(_lines(spark, [
        _t("e:s", "p:p", "e:o"),
        _t("e:s", "p:p", "plain", uri=False),
        _t("e:s", "p:p", "hej", uri=False, lang="sv"),
        _t("e:s", "p:p", "42", uri=False, dtype="xsd:integer"),
        _t("e:s", "p:p", 'q"q\\b\nnl\ttab\rcr', uri=False),
    ]))
    assert got == {
        "<e:s> <p:p> <e:o> .",
        '<e:s> <p:p> "plain" .',
        '<e:s> <p:p> "hej"@sv .',
        '<e:s> <p:p> "42"^^<xsd:integer> .',
        '<e:s> <p:p> "q\\"q\\\\b\\nnl\\ttab\\rcr" .',
    }


NASTY = [
    "simple",
    'quote " inside',
    "back\\slash",
    "both \\\" mixed",
    "line\nbreak",
    "tab\tand\rcr",
    "trailing backslash \\",
    'ends with escaped quote \\"',
    "unicode åäö — ÿ",
    "literal \\n not a newline",
    "",
]


def test_roundtrip_identity(spark):
    rows = (
        [_t(f"e:{i}", "p:lit", s, uri=False) for i, s in enumerate(NASTY)]
        + [_t(f"e:{i}", "p:lang", s, uri=False, lang="en")
           for i, s in enumerate(NASTY)]
        + [_t(f"e:{i}", "p:dt", s, uri=False, dtype="xsd:string")
           for i, s in enumerate(NASTY)]
        + [_t(f"e:{i}", "p:uri", f"e:obj/{i}") for i in range(3)]
    )
    df = spark.createDataFrame(rows, TRIPLES)
    lines = to_ntriples_lines(df).select("line")
    back = parse_ntriples_lines(lines)
    assert back.filter(F.col("kind") != "triple").count() == 0
    got = {
        (r.subj, r.pred, r.obj, r.obj_is_uri, r.obj_lang, r.obj_dtype)
        for r in back.collect()
    }
    want = {(s, p, o, u, lg, dt) for s, p, o, u, lg, dt, *_ in rows}
    assert got == want


def test_malformed_and_comments(spark):
    lines = spark.createDataFrame(
        [
            ("<a> <b> <c> .",),
            ("# a comment",),
            ("   ",),
            ("<a> <b> garbage .",),
            ("not a triple at all",),
            ('<a> <b> "unterminated .',),
        ],
        ["line"],
    )
    out = parse_ntriples_lines(lines).collect()
    kinds = sorted(r.kind for r in out)
    assert kinds == ["nt_error", "nt_error", "nt_error", "triple"]
    errs = [r for r in out if r.kind == "nt_error"]
    assert all(r.obj is not None for r in errs)  # raw bytes kept for triage


def test_file_write_read(spark, tmp_path):
    rows = [_t(f"e:{i}", "p:p", f"v{i}\n!", uri=False) for i in range(20)]
    df = spark.createDataFrame(rows, TRIPLES).repartition(3)
    path = str(tmp_path / "dump.nt")
    write_ntriples(df, path)
    back = read_ntriples(spark, path)
    assert back.filter(F.col("kind") != "triple").count() == 0
    got = {(r.subj, r.obj) for r in back.collect()}
    assert got == {(f"e:{i}", f"v{i}\n!") for i in range(20)}
