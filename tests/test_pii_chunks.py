"""PII redaction (functions/pii.py) and chunk-level dedup (operators/
dedup.py chunk tier) — the corpus-curation passes with no reference analog
(SURVEY §2 curation block)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ferenda_spark.functions.pii import pii_counts, redact_pii
from ferenda_spark.operators.dedup import (
    drop_duplicate_chunks,
    duplicate_chunk_fraction,
    token_chunks,
)


def test_redact_and_count(spark):
    rows = [
        (1, "mail me at jane.doe+x@sub.example.org or call +46-555-0100."),
        (2, "server at 10.1.255.3 port 80; no pii here otherwise"),
        (3, "plain text without anything sensitive"),
        (4, "two mails: a@b.co c.d@e-f.org and +1-555-1234 10.0.0.1"),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    counts = pii_counts(F.col("text"))
    got = {
        r.id: (r.e, r.p, r.i, r.red)
        for r in df.select(
            "id",
            counts["email"].alias("e"),
            counts["phone"].alias("p"),
            counts["ipv4"].alias("i"),
            redact_pii(F.col("text")).alias("red"),
        ).collect()
    }
    assert got[1] == (1, 1, 0, "mail me at [PII] or call [PII].")
    assert got[2] == (0, 0, 1, "server at [PII] port 80; no pii here otherwise")
    assert got[3] == (0, 0, 0, "plain text without anything sensitive")
    assert got[4][:3] == (2, 1, 1)
    assert got[4][3] == "two mails: [PII] [PII] and [PII] [PII]"


def test_redaction_is_idempotent(spark):
    df = spark.createDataFrame(
        [(1, "a@b.co and +1-555-1234 at 10.0.0.1")], "id int, text string"
    )
    once = df.select(redact_pii(F.col("text")).alias("t"))
    twice = once.select(redact_pii(F.col("t")).alias("t"))
    assert once.collect() == twice.collect()


def test_token_chunks_shapes(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c"), (3, ""), (4, "   ")],
        "id int, text string",
    )
    got = {
        r.id: r.c
        for r in df.select(
            "id", token_chunks(F.col("text"), 3).alias("c")
        ).collect()
    }
    assert got[1] == ["a b c", "d e"]  # last chunk short
    assert got[2] == ["a b c"]
    assert got[3] == [] and got[4] == []


def test_drop_duplicate_chunks_keeps_first(spark):
    # doc 1 and doc 2 share the chunk "x y z"; doc 2 also repeats it
    rows = [(1, "x y z a b c"), (2, "x y z x y z"), (3, "q r s")]
    df = spark.createDataFrame(rows, "id int, text string")
    kept = drop_duplicate_chunks(df, "text", "id", n=3).collect()
    assert sorted((r.id, r.pos, r.chunk) for r in kept) == [
        (1, 0, "x y z"),
        (1, 1, "a b c"),
        (3, 0, "q r s"),
    ]


def test_duplicate_chunk_fraction(spark):
    rows = [(1, "x y z a b c"), (2, "x y z x y z"), (3, "q r s")]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {
        r.id: (r.n_chunks, r.n_dup_chunks, r.dup_fraction)
        for r in duplicate_chunk_fraction(df, "text", "id", n=3).collect()
    }
    assert got[1] == (2, 1, 0.5)
    assert got[2] == (2, 2, 1.0)
    assert got[3] == (1, 0, 0.0)


def test_normalize_url_column_and_python_twin_agree(spark):
    from ferenda_spark.functions.uris import normalize_url, normalize_url_py

    cases = [
        "HTTP://Sub.Example.COM:80/Path/Q?a=1&B=2#frag",
        "https://a.example:443/x?",
        "https://a.example:8443/x",
        "http://a.example:8080/y#z",
        "ftp://Mixed.Case/z",
        "no-scheme/relative?x#y",
        "https://b.example/UPPER/case?Q=Mixed",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "u string")
    got = [r.n for r in df.select(normalize_url(F.col("u")).alias("n")).collect()]
    assert got == [normalize_url_py(c) for c in cases]
    assert got[0] == "http://sub.example.com/Path/Q?a=1&B=2"
    assert got[1] == "https://a.example/x"
    assert got[2] == "https://a.example:8443/x"
    assert got[3] == "http://a.example:8080/y"
    assert got[4] == "ftp://mixed.case/z"
    assert got[5] == "no-scheme/relative?x#y"


def test_dedup_clean_text(spark):
    from ferenda_spark.operators.dedup import dedup_clean_text

    rows = [(1, "x y z a b c"), (2, "x y z x y z"), (3, "q r s")]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {
        r.id: (r.clean_text, r.n_kept_chunks)
        for r in dedup_clean_text(df, "text", "id", n=3).collect()
    }
    assert got[1] == ("x y z a b c", 2)  # first occurrence keeps everything
    assert got[2] == ("", 0)  # all chunks were boilerplate → empty, kept
    assert got[3] == ("q r s", 1)
