"""Gopher-style repetition signals (operators/repetition.py) vs a naive
per-document Python reference, plus threshold-gate and plan checks."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ferenda_spark.operators.repetition import (
    repetition_flag,
    repetition_signals,
    word_ngrams,
)

WORDS = ["the", "cat", "sat", "on", "mat", "read", "more", "spam", "—", "été"]


def _ref(text: str, top_n: int = 2, dup_n: int = 5) -> tuple:
    lines = [l.strip() for l in text.split("\n") if l.strip()]
    n = len(lines)
    dlf = (n - len(set(lines))) / n if n else 0.0
    total = sum(len(l) for l in lines)
    dupc = sum((lines.count(d) - 1) * len(d) for d in set(lines))
    dlcf = dupc / total if total else 0.0
    bull = sum(1 for l in lines if l[:1] in "-*•") / n if n else 0.0
    ell = (
        sum(1 for l in lines if l.endswith("...") or l.endswith("…")) / n
        if n
        else 0.0
    )
    # token definition matches textstats.tokens: trim + split on \s+ with
    # ALL empty fragments filtered — equivalent to str.split()
    toks = text.split()
    nc = len(text)

    def grams(k):
        return (
            [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
            if len(toks) >= k
            else []
        )

    c_top = Counter(grams(top_n))
    topf = max((c * len(g) for g, c in c_top.items()), default=0) / nc if nc else 0.0
    c_dup = Counter(grams(dup_n))
    dupf = (
        sum(c * len(g) for g, c in c_dup.items() if c > 1) / nc if nc else 0.0
    )
    return (dlf, dlcf, bull, ell, topf, dupf)


def _run(spark, texts: list[str]) -> dict[int, tuple]:
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = repetition_signals(df).collect()
    return {
        r.doc_id: (
            r.dup_line_frac,
            r.dup_line_char_frac,
            r.bullet_start_frac,
            r.ellipsis_end_frac,
            r.top_2gram_char_frac,
            r.dup_5gram_char_frac,
        )
        for r in rows
    }


def test_signals_on_curated_edge_cases(spark):
    texts = [
        "",
        "x",
        "   \n \t \n",
        "same\nsame\nsame",
        "a b\na b\nc d",
        "- one\n- two\n- three",
        "teaser…\nmore...\nplain",
        "w1 w2 w3 w4 w5 w1 w2 w3 w4 w5 w1 w2 w3 w4 w5",
        "\tleading tab text here\nand more",
        "unicode • naïve — line\nunicode • naïve — line",
    ]
    got = _run(spark, texts)
    for i, t in enumerate(texts):
        exp = _ref(t)
        assert got[i] == pytest.approx(exp, abs=1e-12), (i, t, got[i], exp)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.lists(
            st.lists(st.sampled_from(WORDS), min_size=0, max_size=12).map(
                " ".join
            ),
            min_size=0,
            max_size=8,
        ).map("\n".join),
        min_size=1,
        max_size=6,
    )
)
def test_signals_match_reference_property(spark, texts):
    got = _run(spark, texts)
    for i, t in enumerate(texts):
        assert got[i] == pytest.approx(_ref(t), abs=1e-12), (t, got[i], _ref(t))


def test_word_ngrams_positions(spark):
    df = spark.range(1).select(F.lit("a b a b c").alias("t"))
    out = df.select(word_ngrams(F.col("t"), 2).alias("g")).head().g
    assert out == ["a b", "b a", "a b", "b c"]
    out3 = df.select(word_ngrams(F.col("t"), 6).alias("g")).head().g
    assert out3 == []


def test_repetition_flag_thresholds(spark):
    df = spark.createDataFrame(
        [
            # dup_line_frac 2/3 > 0.3 → flagged
            (1, "dup\ndup\nother line"),
            # clean prose, long enough that no single 2-gram nears 20% of
            # chars (the Gopher thresholds assume real-page lengths)
            (
                2,
                "the cat sat on the mat today while rain fell outside\n"
                "another normal sentence follows with different words\n"
                "a third line keeps the document varied and unremarkable\n"
                "finally some closing prose that repeats nothing at all",
            ),
            # all-bullet doc → flagged via bullet fraction
            (3, "- a\n- b\n- c\n- d\n- e\n- f\n- g\n- h\n- i\n- j"),
        ],
        "doc_id long, text string",
    )
    sig = repetition_signals(df)
    flags = {
        r.doc_id: r.flagged
        for r in sig.select(
            "doc_id",
            repetition_flag(
                F.col("dup_line_frac"),
                F.col("top_2gram_char_frac"),
                F.col("ellipsis_end_frac"),
                F.col("bullet_start_frac"),
            ).alias("flagged"),
        ).collect()
    }
    assert flags[1] is True
    assert flags[2] is False
    assert flags[3] is True


def test_plan_no_cartesian_and_single_gram_explode(spark):
    """The n-gram branch must be ONE explode (both gram sizes tagged in one
    pass) and the id join must not degrade to a cartesian product."""
    df = spark.createDataFrame(
        [(i, "a b c d e f g") for i in range(10)], "doc_id long, text string"
    )
    plan = repetition_signals(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert plan.count("Generate explode") == 1


def test_curation_verdict_line_repetition_optin(spark):
    from ferenda_spark.operators.curation import apply_curation

    df = spark.createDataFrame(
        [
            (1, "dup line here\ndup line here\ndup line here\nunique one"),
            (2, "- a\n- b\n- c\n- d\n- e\n- f\n- g\n- h\n- i\n- j"),
        ],
        "doc_id long, text string",
    )
    default = apply_curation(df)
    assert not any(
        r in ("dup_lines", "listy")
        for row in default.collect()
        for r in row.reasons
    ), "line-repetition rules must be OFF by default (driver contract)"
    opted = {
        r.doc_id: set(r.reasons)
        for r in apply_curation(df, line_repetition=True).collect()
    }
    assert "dup_lines" in opted[1]
    assert "listy" in opted[2]
