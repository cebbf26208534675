"""Composite curation filter (operators/curation.py) and the JSONL corpus
source (sources/jsonl.py)."""

from __future__ import annotations

import json
from datetime import datetime

from pyspark.sql import functions as F

from ferenda_spark.operators.curation import (
    apply_curation,
    curation_verdict,
    reason_histogram,
)
from ferenda_spark.sources.jsonl import read_jsonl_corpus

GOOD = (
    "The quick brown fox jumps over the lazy dog, and then it runs back "
    "home. It was a fine day in the forest, with many small animals out."
)


def test_curation_reasons(spark):
    rows = [
        (1, GOOD),
        (2, "tiny"),  # too_short (and low_quality)
        (3, GOOD + GOOD + " contact a@b.co now."),  # PII present, NOT dense
        (4, GOOD + " contact a@b.co or b@c.de now"),  # 2 emails/170ch: dense
        (5, "ab cd " * 30),  # borderline word-soup: permissive default KEEPS
        (6, ("x" * 20 + " ") * 12),  # 12 tokens of 20 chars → mtl 20 > 14
    ]
    df = apply_curation(spark.createDataFrame(rows, "id int, text string"))
    got = {r.id: (r.keep, sorted(r.reasons)) for r in df.collect()}
    assert got[1] == (True, [])
    assert got[2][0] is False and "too_short" in got[2][1]
    assert got[3] == (True, [])
    assert got[4][0] is False and "pii_dense" in got[4][1]
    assert got[5] == (True, [])
    assert got[6][0] is False and "gibberish" in got[6][1]
    # the same borderline doc drops under a stricter per-corpus threshold
    strict = apply_curation(
        spark.createDataFrame(rows[4:5], "id int, text string"),
        min_quality=0.7,
    ).collect()[0]
    assert strict.keep is False and strict.reasons == ["low_quality"]

    hist = {r.reason: r.n_docs for r in reason_histogram(df).collect()}
    assert hist["too_short"] == 1 and hist["low_quality"] >= 2

    # every reason is collected, not just the first
    multi = apply_curation(
        spark.createDataFrame([(9, "zz")], "id int, text string")
    ).collect()[0]
    assert set(multi.reasons) >= {"too_short", "low_quality"}


def test_curation_repetitive_rule(spark):
    df = spark.createDataFrame(
        [(1, GOOD, 0.9), (2, GOOD, 0.1)], "id int, text string, dupf double"
    )
    v = curation_verdict(F.col("text"), dup_fraction_col=F.col("dupf"))
    got = {r.id: (r.v.keep, list(r.v.reasons)) for r in df.select("id", v.alias("v")).collect()}
    assert got[1] == (False, ["repetitive"])
    assert got[2] == (True, [])


def test_read_jsonl_corpus(spark, tmp_path):
    recs = [
        {"url": "https://a.example/1", "timestamp": "2026-03-01 10:00:00",
         "content": "<html><p>one</p></html>", "lang": "en"},
        {"url": "https://b.example/2", "timestamp": "2026-03-02 11:30:00",
         "content": "<html><p>zwei</p></html>", "lang": "de"},
        {"url": "https://c.example/3", "content": "<html>three</html>"},
    ]
    p = tmp_path / "dump.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in recs))
    got = {r.url: r for r in read_jsonl_corpus(spark, str(p)).collect()}
    assert set(got) == {
        "https://a.example/1", "https://b.example/2", "https://c.example/3",
    }
    assert bytes(got["https://a.example/1"].html) == b"<html><p>one</p></html>"
    assert got["https://a.example/1"].warc_ts == datetime(2026, 3, 1, 10, 0, 0)
    assert got["https://b.example/2"].lang == "de"
    assert got["https://c.example/3"].warc_ts is None
    assert all(r.text is None for r in got.values())

    # integration: JSONL corpus flows through the parse stage
    from ferenda_spark.operators.parse import parse_stage, split_parsed

    docs, _ = split_parsed(
        parse_stage(read_jsonl_corpus(spark, str(p)), n_parts=2)
    )
    assert docs.count() == 3


def test_null_text_is_dropped(spark):
    """Extraction failures leave text NULL — those docs must NOT pass the
    keep/drop gate silently."""
    df = apply_curation(
        spark.createDataFrame([(1, None), (2, GOOD)], "id int, text string")
    )
    got = {r.id: (r.keep, list(r.reasons)) for r in df.collect()}
    assert got[1][0] is False and "too_short" in got[1][1]
    assert got[2] == (True, [])
