"""Incremental rollup maintenance (operators/incremental.py): the
incrementally-updated toc/feeds tables must be row-identical to a full
recompute over the post-change corpus — inserts, updates that move docs
between buckets, and deletes all exercised."""

from __future__ import annotations

from ferenda_spark.operators.incremental import (
    affected_buckets,
    incremental_feeds,
    incremental_toc,
    invalidated_docs,
)
from ferenda_spark.operators.rollups import feeds_topk, toc_rollup

SCHEMA = "uri string, title string, issued string, lang string"

BASE = [
    (f"u{i}", f"T{i % 7}{i}", f"20{10 + i % 5}-01-01", ["en", "de", "fr"][i % 3])
    for i in range(30)
]
# updates that move docs across letter/year/lang buckets, one delete (u11),
# two inserts
CHANGED_OLD = [BASE[2], BASE[5], BASE[8], BASE[11]]
NEW_ROWS = [
    ("u2", "X2", "2011-01-01", "zh"),
    ("u5", "Y5", "2012-01-01", "en"),
    ("u8", "T88", "2013-01-01", "de"),
    ("u100", "New100", "2015-01-01", "es"),
    ("u101", "Zz", "2014-01-01", "en"),
]
FULL_NEW = [
    r for r in BASE if r[0] not in ("u2", "u5", "u8", "u11")
] + NEW_ROWS


def _dm(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_affected_buckets_cover_old_and_new_values(spark):
    b = {
        (r.facet, r.value)
        for r in affected_buckets(
            _dm(spark, CHANGED_OLD), _dm(spark, NEW_ROWS)
        ).collect()
    }
    assert ("letter", "X") in b and ("letter", "T") in b  # new + old letters
    assert ("lang", "zh") in b and ("lang", "fr") in b
    assert ("year", "2015") in b


def test_incremental_toc_matches_full_recompute(spark):
    got = incremental_toc(
        _dm(spark, FULL_NEW),
        _dm(spark, CHANGED_OLD),
        _dm(spark, NEW_ROWS),
        toc_rollup(_dm(spark, BASE)),
    )
    want = toc_rollup(_dm(spark, FULL_NEW))
    g = {
        (r.facet, r.value): (r.n_docs, [tuple(d) for d in r.page_docs])
        for r in got.collect()
    }
    w = {
        (r.facet, r.value): (r.n_docs, [tuple(d) for d in r.page_docs])
        for r in want.collect()
    }
    assert g == w


def test_incremental_toc_pure_insert_and_pure_delete(spark):
    # pure insert (no old rows)
    ins = [("u200", "Q200", "2016-01-01", "it")]
    got = incremental_toc(
        _dm(spark, BASE + ins), _dm(spark, []), _dm(spark, ins),
        toc_rollup(_dm(spark, BASE)),
    )
    want = toc_rollup(_dm(spark, BASE + ins))
    assert sorted((r.facet, r.value, r.n_docs) for r in got.collect()) == \
        sorted((r.facet, r.value, r.n_docs) for r in want.collect())
    # pure delete (no new rows) — bucket that empties must disappear
    rest = BASE[1:]
    got2 = incremental_toc(
        _dm(spark, rest), _dm(spark, [BASE[0]]), _dm(spark, []),
        toc_rollup(_dm(spark, BASE)),
    )
    want2 = toc_rollup(_dm(spark, rest))
    assert sorted((r.facet, r.value, r.n_docs) for r in got2.collect()) == \
        sorted((r.facet, r.value, r.n_docs) for r in want2.collect())


def test_incremental_feeds_matches_full_recompute(spark):
    got = incremental_feeds(
        _dm(spark, FULL_NEW),
        _dm(spark, CHANGED_OLD),
        _dm(spark, NEW_ROWS),
        feeds_topk(_dm(spark, BASE), page_size=5),
        page_size=5,
    )
    want = feeds_topk(_dm(spark, FULL_NEW), page_size=5)
    key = lambda r: (r.feed, r.rn, r.page, r.uri, r.title, r.issued)  # noqa: E731
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))


def test_invalidated_docs(spark):
    deps = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "y"), ("c", "z")],
        "src_doc string, dep_uri string",
    )
    changed = spark.createDataFrame([("y",)], "uri string")
    got = sorted(r.uri for r in invalidated_docs(deps, changed).collect())
    assert got == ["a", "b"]


def test_incremental_feeds_null_lang(spark):
    """A NULL lang is its own feed: it must be carried over when untouched
    and recomputed when a NULL-lang doc changes — never silently dropped."""
    base = BASE + [("n1", "N1", "2011-06-01", None), ("n2", "N2", "2012-06-01", None)]
    old_feeds = feeds_topk(_dm(spark, base), page_size=5)

    # change only an 'en' doc → the NULL feed must be carried over intact
    ch_old, ch_new = [BASE[0]], [("u0", "ZZ0", "2013-01-01", "en")]
    full1 = [r for r in base if r[0] != "u0"] + ch_new
    got1 = incremental_feeds(
        _dm(spark, full1), _dm(spark, ch_old), _dm(spark, ch_new),
        old_feeds, page_size=5,
    )
    want1 = feeds_topk(_dm(spark, full1), page_size=5)
    key = lambda r: (r.feed or "", r.rn, r.uri)  # noqa: E731
    assert sorted(map(key, got1.collect())) == sorted(map(key, want1.collect()))

    # change a NULL-lang doc → the NULL feed must be recomputed
    ch_old2, ch_new2 = [base[-1]], [("n2", "N2X", "2014-06-01", None)]
    full2 = [r for r in base if r[0] != "n2"] + ch_new2
    got2 = incremental_feeds(
        _dm(spark, full2), _dm(spark, ch_old2), _dm(spark, ch_new2),
        old_feeds, page_size=5,
    )
    want2 = feeds_topk(_dm(spark, full2), page_size=5)
    assert sorted(map(key, got2.collect())) == sorted(map(key, want2.collect()))


def test_incremental_toc_maintains_null_value_buckets(spark):
    """(facet, NULL) buckets are real rollup rows — a change to a doc with
    a NULL facet value (NULL issued → NULL year here) must recompute that
    bucket, not carry it over stale."""
    base = [
        ("u1", "Alpha", None, "en"),      # NULL year bucket member
        ("u2", "Beta", "2021-01-01", "en"),
        ("u3", "Gamma", None, "de"),      # NULL year bucket member
    ]
    # u3 gains a year (leaves the NULL bucket); u4 inserted with NULL year
    changed_old = [base[2]]
    new_rows = [("u3", "Gamma", "2022-01-01", "de"), ("u4", "Delta", None, "fr")]
    full_new = [base[0], base[1]] + new_rows
    got = incremental_toc(
        _dm(spark, full_new),
        _dm(spark, changed_old),
        _dm(spark, new_rows),
        toc_rollup(_dm(spark, base)),
    )
    want = toc_rollup(_dm(spark, full_new))
    key = lambda df: sorted(
        (r["facet"], r["value"] or "", r["n_docs"],
         tuple(d["uri"] for d in r["page_docs"]))
        for r in df.collect()
    )
    assert key(got) == key(want)
    null_year = [r for r in got.collect() if r["facet"] == "year" and r["value"] is None]
    assert null_year and null_year[0]["n_docs"] == 2  # u1 + u4, u3 gone


def test_incremental_toc_exact_after_delete_in_full_capped_window(spark):
    """A deletion inside a FULL capped global window triggers the exact
    TakeOrderedAndProject fallback: the new global list must be identical to
    a full recompute (the evicted (cap+1)-th doc resurrected), never
    |deleted| short."""
    cap = 10  # BASE has 30 docs, so the stored global list is at cap
    old_toc = toc_rollup(_dm(spark, BASE), global_cap=cap)
    old_list = [
        r.page_docs for r in old_toc.collect() if r.facet == "all"
    ][0]
    assert len(old_list) == cap
    # delete a doc that IS inside the capped window (the list is sorted by
    # title, so take the first entry's uri)
    victim = old_list[0]["uri"]
    gone = [r for r in BASE if r[0] == victim]
    remaining = [r for r in BASE if r[0] != victim]
    got = incremental_toc(
        _dm(spark, remaining),
        _dm(spark, gone),
        _dm(spark, []),
        old_toc,
        global_cap=cap,
    )
    want = toc_rollup(_dm(spark, remaining), global_cap=cap)
    g = [
        (r.n_docs, [tuple(d) for d in r.page_docs])
        for r in got.collect()
        if r.facet == "all"
    ][0]
    w = [
        (r.n_docs, [tuple(d) for d in r.page_docs])
        for r in want.collect()
        if r.facet == "all"
    ][0]
    assert g == w
    assert len(g[1]) == cap  # back at cap — the evicted doc was resurrected
