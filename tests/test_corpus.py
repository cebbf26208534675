"""Corpus generator invariants: determinism, schema, skew, dictionary."""

from collections import Counter

from ferenda_spark.functions.uris import normalize_alias
from ferenda_spark.sources.corpus import (
    build_dictionary,
    doc_url,
    gen_doc,
    N_ENTITIES,
)


def test_deterministic_and_partition_independent():
    a, b = gen_doc(11, 500), gen_doc(11, 500)
    assert a["html"] == b["html"] and a["truth_triples"] == b["truth_triples"]


def test_url_reconstructible():
    assert gen_doc(123, 500)["url"] == doc_url(123)


def test_domain_skew():
    c = Counter(doc_url(i).split("/")[2] for i in range(2000))
    hottest = c.most_common(1)[0]
    assert hottest[0] == "d00.example.com"
    assert 0.24 < hottest[1] / 2000 < 0.36  # ~30% Zipf head (FIXTURES §1)


def test_title_triple_matches_extraction():
    for i in (0, 5, 17):  # includes a latin-1 doc (5)
        d = gen_doc(i, 500)
        first_chunk = d["text"].split("\n\n")[0]
        title = next(t for t in d["truth_triples"] if t[1].endswith("/title"))
        assert first_chunk == title[2]


def test_dictionary_shape():
    rows = build_dictionary()
    assert len({r["canonical_uri"] for r in rows}) == N_ENTITIES
    assert 3 * N_ENTITIES <= len(rows) <= 4 * N_ENTITIES
    exact = [r for r in rows if r["is_exact"]]
    fuzzy = [r for r in rows if not r["is_exact"]]
    assert len(exact) == 2 * N_ENTITIES  # canonical + abbreviation
    assert fuzzy and all(r["alias_key"] == normalize_alias(r["alias"]) for r in rows)
    # alias keys unique (first-wins dedup)
    keys = [r["alias_key"] for r in rows]
    assert len(keys) == len(set(keys))


def test_ground_truth_links_have_dict_or_fresh_form():
    d = gen_doc(7, 500)
    assert d["truth_links"], "doc 7 should plant entity mentions"
    for url, mention, can in d["truth_links"]:
        assert can.startswith("https://kg.example.org/entity/")
