"""Toc/feed rollups + join-shaped operators (SURVEY A1/A2/W1/W4, J1/J2/J5–J8).

Ports the *shape* of the reference's toc/news tests
([ref: ferenda/documentrepository.py :: toc_pagesets, news] — tested upstream
in test/testDocRepo.py) onto small in-memory frames with hand-computable
expectations.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ferenda_spark.operators import rollups
from ferenda_spark.schemas import P_REFERENCES, P_SUBJECT


@pytest.fixture(scope="module")
def docmeta(spark):
    rows = [
        ("u1", 1, "Alpha doc", "2024-01-05", "en"),
        ("u2", 1, "Beta doc", "2024-03-01", "en"),
        ("u3", 2, "alpha two", "2023-07-09", "de"),
        ("u4", 2, "Gamma", "2024-03-01", "de"),
    ]
    return spark.createDataFrame(
        rows, "uri string, part_key int, title string, issued string, lang string"
    )


def test_toc_rollup_buckets(docmeta):
    toc = {(r["facet"], r["value"]): r for r in rollups.toc_rollup(docmeta).collect()}
    assert toc[("all", "*")]["n_docs"] == 4
    assert toc[("letter", "A")]["n_docs"] == 2  # Alpha + alpha (upper-cased)
    assert toc[("year", "2024")]["n_docs"] == 3
    assert toc[("lang", "de")]["n_docs"] == 2
    # page_docs sorted by sort_key (title)
    docs = [d["uri"] for d in toc[("lang", "en")]["page_docs"]]
    assert docs == ["u1", "u2"]


def test_feeds_topk_and_pages(docmeta):
    feeds = rollups.feeds_topk(docmeta, page_size=1).collect()
    en = sorted([r for r in feeds if r["feed"] == "en"], key=lambda r: r["rn"])
    assert [r["uri"] for r in en] == ["u2", "u1"]  # newest first
    assert [r["page"] for r in en] == [0, 1]


def test_toc_rollup_custom_facet(spark):
    """Declarative Facet list (SURVEY §1.1): a publisher-style custom facet
    drives the rollup without touching the operator, and NULL facet values
    get their own bucket (grouping_id, not isNotNull, identifies facets)."""
    from ferenda_spark.facets import Facet

    rows = [
        ("u1", "Alpha", "2024-01-05", "en", "acme"),
        ("u2", "Beta", "2024-03-01", "en", "acme"),
        ("u3", "Gamma", "2023-07-09", "de", None),
    ]
    dm = spark.createDataFrame(
        rows, "uri string, title string, issued string, lang string, publisher string"
    )
    facets = (
        Facet("publisher", "publisher"),
        Facet("lang", "lang", use_for_feed=True),
    )
    toc = {
        (r["facet"], r["value"]): r
        for r in rollups.toc_rollup(dm, facets=facets).collect()
    }
    assert toc[("publisher", "acme")]["n_docs"] == 2
    assert toc[("publisher", None)]["n_docs"] == 1  # NULL value bucket
    assert toc[("lang", "de")]["n_docs"] == 1
    assert toc[("all", "*")]["n_docs"] == 3
    assert ("letter", "A") not in toc  # defaults not silently added


def test_toc_rollup_global_cap(docmeta):
    toc = {
        (r["facet"], r["value"]): r
        for r in rollups.toc_rollup(docmeta, global_cap=2).collect()
    }
    g = toc[("all", "*")]
    assert g["n_docs"] == 4  # count stays exact
    # capped list = 2 first docs by sort_key (title): "Alpha doc", "Beta doc"
    assert [d["uri"] for d in g["page_docs"]] == ["u1", "u2"]
    # per-facet buckets stay complete
    assert len(toc[("lang", "de")]["page_docs"]) == 2


def test_feeds_topk_multi_facet(docmeta):
    """Feedsets per (facet, value) for every use_for_feed facet (W1)."""
    from ferenda_spark.facets import Facet

    facets = (
        Facet("letter", "upper(substring(title, 1, 1))", use_for_feed=True),
        Facet("lang", "lang", use_for_feed=True),
    )
    feeds = rollups.feeds_topk(docmeta, page_size=25, facets=facets).collect()
    by_feed = {}
    for r in feeds:
        by_feed.setdefault((r["facet"], r["feed"]), []).append(r)
    assert {k[0] for k in by_feed} == {"letter", "lang"}
    a = sorted(by_feed[("letter", "A")], key=lambda r: r["rn"])
    assert [r["uri"] for r in a] == ["u1", "u3"]  # newest first within feed
    assert [r["uri"] for r in sorted(by_feed[("lang", "en")], key=lambda r: r["rn"])] == [
        "u2", "u1",
    ]


def test_feed_main_topk(docmeta):
    main = rollups.feed_main(docmeta, k=2).collect()
    # 2024-03-01 ties broken by uri asc
    assert [r["uri"] for r in main] == ["u2", "u4"]


@pytest.fixture(scope="module")
def triples(spark):
    rows = [
        ("u1#S1", P_REFERENCES, "u3", True, None, None, "u1", 1),
        ("u1#S1", P_REFERENCES, "http://nowhere/x", True, None, None, "u1", 1),
        ("u3#S1", P_REFERENCES, "u1", True, None, None, "u3", 2),
        ("u1", P_SUBJECT, "spark", False, None, None, "u1", 1),
        ("u3", P_SUBJECT, "spark", False, None, None, "u3", 2),
        ("u4", P_SUBJECT, "graphs", False, None, None, "u4", 2),
    ]
    return spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_uri boolean, "
        "obj_lang string, obj_dtype string, src_url string, part_key int",
    )


def test_relate_dependencies_j1(triples, docmeta):
    deps = rollups.relate_dependencies(triples, docmeta).collect()
    got = {(r["from_doc"], r["to_doc"]) for r in deps}
    assert got == {("u1", "u3"), ("u3", "u1")}  # nowhere/x dropped


def test_annotations_j2(triples, docmeta):
    ann = {r["uri"]: r for r in rollups.annotations(triples, docmeta).collect()}
    assert ann["u3"]["n_incoming"] == 1
    assert ann["u3"]["citers"][0]["title"] == "Alpha doc"


def test_keyword_index_j5(triples):
    kw = {r["keyword"]: r for r in rollups.keyword_index(triples).collect()}
    assert kw["spark"]["docs"] == ["u1", "u3"]
    assert kw["graphs"]["n_docs"] == 1


def test_skeleton_j6(triples, docmeta):
    stub = [r["uri"] for r in rollups.skeleton_uris(triples, docmeta).collect()]
    assert stub == ["http://nowhere/x"]


def test_composite_precedence_j7(spark):
    a = spark.createDataFrame([("u1", "from_a"), ("u2", "from_a")], "uri string, body string")
    b = spark.createDataFrame([("u1", "from_b"), ("u3", "from_b")], "uri string, body string")
    out = {r["uri"]: r["body"] for r in rollups.composite_precedence([a, b]).collect()}
    assert out == {"u1": "from_a", "u2": "from_a", "u3": "from_b"}


def test_merge_descriptions_j8(spark, docmeta):
    wiki = spark.createDataFrame(
        [("alpha  doc", "wiki text"), ("nope", "x")], "title string, description string"
    )
    out = rollups.merge_descriptions(docmeta, wiki)
    got = {r["uri"]: r["description"] for r in out.collect()}
    assert got["u1"] == "wiki text"  # normalized-title match
    assert got["u2"] is None  # left outer keeps unmatched


def test_status_rollup_a2(spark):
    from ferenda_spark.operators.ledger import Ledger

    rows = [
        ("parse", 0, "ok", 10, 100, 5, "r1", None),
        ("parse", 1, "failed", 10, 0, 5, "r1", None),
    ]
    led = spark.createDataFrame(
        rows,
        "stage string, part_key int, status string, n_in long, n_out long, "
        "wall_ms long, run_id string, finished timestamp",
    )
    out = rollups.status_rollup(led).collect()[0]
    assert out["n_parts"] == 2 and out["n_ok"] == 1 and out["n_failed"] == 1
