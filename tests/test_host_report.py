"""Host report card (operators/profiling.py:host_report)."""

from __future__ import annotations

import pytest

from ferenda_spark.operators.profiling import host_report


def test_host_report_hand_case(spark):
    rows = [
        # host A: 3 docs, 2 langs (en mode), one exact dup pair
        (0, "the cat sat on the mat with a hat for it", "en", "hostA"),
        (1, "the cat sat on the mat with a hat for it", "en", "hostA"),
        (2, "der hund und die katze sind nicht da mit", "de", "hostA"),
        # host B: 1 doc
        (3, "le chat est sur le tapis et la table", "fr", "hostB"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    )
    got = {r.host: r for r in host_report(df).collect()}
    a = got["hostA"]
    assert a.n_docs == 3
    assert a.n_langs == 2
    assert a.top_lang == "en"
    assert a.n_distinct_texts == 2
    assert a.exact_dup_share == pytest.approx(1 - 2 / 3, abs=1e-6)
    assert a.total_chars == sum(len(t) for _, t, _, h in rows if h == "hostA")
    b = got["hostB"]
    assert (b.n_docs, b.n_langs, b.exact_dup_share) == (1, 1, 0.0)


def test_top_lang_tie_breaks_min(spark):
    rows = [
        (0, "x y z", "en", "h"),
        (1, "x y z", "de", "h"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string"
    )
    assert host_report(df).collect()[0].top_lang == "de"
