"""Text-analysis column functions (langid / quality / tokens / fingerprint)
over the driver's documents table — all pure column expressions, no UDFs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ferenda_spark.functions import textstats as ts

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_token_count_matches_python(spark):
    df = spark.createDataFrame(
        [(1, "a b  c"), (2, ""), (3, "  x  "), (4, "one")], "id long, text string"
    )
    got = {r["id"]: r["n"] for r in df.select("id", ts.token_count(F.col("text")).alias("n")).collect()}
    assert got == {1: 3, 2: 0, 3: 1, 4: 1}


def test_bpe_ish_tokens(spark):
    df = spark.createDataFrame([(1, "don't stop; 42 times!")], "id long, text string")
    toks = df.select(ts.bpe_ish_tokens(F.col("text")).alias("t")).collect()[0]["t"]
    assert toks == ["don", "'", "t", "stop", ";", "42", "times", "!"]


def test_detect_lang_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog is on that mat"),
            (2, "der hund und die katze ist nicht da"),
            (3, "le chat est sur la table et les chiens"),
            (4, "el perro es que los gatos con una casa"),
            (5, "zzz qqq vvv"),
        ],
        "id long, text string",
    )
    got = {r["id"]: r["l"] for r in df.select("id", ts.detect_lang(F.col("text")).alias("l")).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "und"}


def test_quality_and_ratios_bounded(docs):
    rows = docs.select(
        ts.quality_score(F.col("text")).alias("q"),
        ts.punct_ratio(F.col("text")).alias("p"),
        ts.stopword_ratio(F.col("text")).alias("s"),
    ).agg(
        F.min("q"), F.max("q"), F.min("p"), F.max("p"), F.min("s"), F.max("s")
    ).collect()[0]
    assert 0.0 <= rows[0] <= rows[1] <= 1.0
    assert 0.0 <= rows[2] <= rows[3] <= 1.0
    assert 0.0 <= rows[4] <= rows[5] <= 1.0


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "different")],
        "id long, text string",
    )
    fps = {r["id"]: r["fp"] for r in df.select("id", ts.doc_fingerprint(F.col("text")).alias("fp")).collect()}
    assert fps[1] == fps[2] != fps[3]


def test_shingles_and_rolling_hashes(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "id long, text string")
    sh = df.select(ts.shingles(F.col("text"), 3).alias("s")).collect()[0]["s"]
    assert sh == ["a b c", "b c d", "c d e"]
    fp = df.select(ts.shingle_fingerprints(F.col("text"), 3).alias("f")).collect()[0]["f"]
    assert len(fp) == 3 and len(set(fp)) == 3
    # short doc: whole text is the single shingle
    short = spark.createDataFrame([(1, "a b")], "id long, text string")
    s2 = short.select(ts.shingles(F.col("text"), 5).alias("s")).collect()[0]["s"]
    assert s2 == ["a b"]


def test_whole_stage_codegen_no_python(docs):
    """The textstats projection must stay JVM-side: no BatchEvalPython /
    ArrowEvalPython in the physical plan."""
    plan = (
        docs.select(
            ts.token_count(F.col("text")),
            ts.quality_score(F.col("text")),
            ts.detect_lang(F.col("text")),
            ts.doc_fingerprint(F.col("text")),
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
