"""SPARQL-subset compiler tests (SURVEY §2.4, reference surface
[ref: ferenda/triplestore.py :: TripleStore.select, construct]).

Strategy mirrors the upstream TripleStore tests (test/testTripleStore.py):
load a small hand-written graph, run query text, compare row sets — plus an
end-to-end check that the compiled J2-annotations query over real pipeline
triples equals the hand-built DataFrame form in ``operators.rollups``.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ferenda_spark.operators.sparql import (
    SparqlSyntaxError,
    SparqlUnsupportedError,
    parse_sparql,
    sparql_construct,
    sparql_select,
)
from ferenda_spark.schemas import DCTERMS, RDF_NS

PREFIX = f"PREFIX dcterms: <{DCTERMS}> PREFIX rdf: <{RDF_NS}> "


@pytest.fixture(scope="module")
def graph(spark):
    """Tiny graph: two docs, titles, langs, one cross-reference, one typed."""
    rows = [
        ("http://ex.org/d1", DCTERMS + "title", "Alpha doc", False, "en"),
        ("http://ex.org/d1", DCTERMS + "language", "en", False, None),
        ("http://ex.org/d1", RDF_NS + "type", "http://ex.org/Doc", True, None),
        ("http://ex.org/d2", DCTERMS + "title", "Beta doc", False, "en"),
        ("http://ex.org/d2", DCTERMS + "title", "Beta-Dokument", False, "de"),
        ("http://ex.org/d2", DCTERMS + "references", "http://ex.org/d1", True, None),
        ("http://ex.org/d3", DCTERMS + "references", "http://ex.org/d1", True, None),
        ("http://ex.org/d3", DCTERMS + "references", "http://ex.org/d2", True, None),
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_uri boolean, obj_lang string"
    )


# ------------------------------------------------------------------- parser


def test_parse_prefixed_and_a_and_lists():
    q = parse_sparql(
        PREFIX
        + 'SELECT ?s WHERE { ?s a <http://ex.org/Doc> ; dcterms:title "X", "Y" . }'
    )
    assert len(q.where.patterns) == 3
    assert q.where.patterns[0].p.value == RDF_NS + "type"
    # ';' keeps the subject, ',' keeps subject+predicate
    assert q.where.patterns[1].s == q.where.patterns[0].s
    assert q.where.patterns[2].p.value == DCTERMS + "title"
    assert q.where.patterns[2].o.value == "Y"


def test_parse_errors():
    with pytest.raises(SparqlSyntaxError):
        parse_sparql("SELECT ?s WHERE { ?s ?p }")  # incomplete triple
    with pytest.raises(SparqlSyntaxError):
        parse_sparql("SELECT ?s WHERE { ?s undeclared:x ?o }")
    with pytest.raises(SparqlUnsupportedError):
        parse_sparql('INSERT { ?s ?p "x" } WHERE { ?s ?p ?o }')


# ------------------------------------------------------------------- select


def test_bgp_join(spark, graph):
    got = sparql_select(
        graph,
        PREFIX
        + "SELECT ?t WHERE { ?d dcterms:references <http://ex.org/d1> . "
        + "?d dcterms:title ?t . }",
    ).collect()
    # d2 has two titles; d3 has none → two rows, both from d2
    assert sorted(r["t"] for r in got) == ["Beta doc", "Beta-Dokument"]


def test_lang_tagged_literal_and_order_limit(spark, graph):
    got = sparql_select(
        graph,
        PREFIX
        + 'SELECT ?d WHERE { ?d dcterms:title "Beta-Dokument"@de . }',
    ).collect()
    assert [r["d"] for r in got] == ["http://ex.org/d2"]
    top = sparql_select(
        graph,
        PREFIX
        + "SELECT ?d ?t WHERE { ?d dcterms:title ?t } ORDER BY DESC(?t) LIMIT 2 OFFSET 1",
    ).collect()
    assert [r["t"] for r in top] == ["Beta doc", "Alpha doc"]


def test_optional_left_join(spark, graph):
    got = {
        r["d"]: r["t"]
        for r in sparql_select(
            graph,
            PREFIX
            + "SELECT ?d ?t WHERE { ?d dcterms:references <http://ex.org/d1> . "
            + "OPTIONAL { ?d dcterms:title ?t . FILTER(?t = \"Beta doc\") } }",
        ).collect()
    }
    assert got == {"http://ex.org/d2": "Beta doc", "http://ex.org/d3": None}


def test_filters(spark, graph):
    q = (
        PREFIX
        + "SELECT DISTINCT ?d WHERE { ?d dcterms:title ?t . "
        + 'FILTER(regex(?t, "^beta", "i") && ?t != "Beta-Dokument") }'
    )
    assert [r["d"] for r in sparql_select(graph, q).collect()] == ["http://ex.org/d2"]

    # bound() over OPTIONAL var — docs WITHOUT a title (negation shape, J6)
    q2 = (
        PREFIX
        + "SELECT DISTINCT ?d WHERE { ?d ?p ?o . "
        + "OPTIONAL { ?d dcterms:title ?t } FILTER(!bound(?t)) }"
    )
    assert [r["d"] for r in sparql_select(graph, q2).collect()] == ["http://ex.org/d3"]

    # isURI distinguishes reference objects from literal objects
    q3 = PREFIX + "SELECT ?o WHERE { <http://ex.org/d2> ?p ?o . FILTER(isURI(?o)) }"
    assert [r["o"] for r in sparql_select(graph, q3).collect()] == ["http://ex.org/d1"]


def test_numeric_filter(spark):
    rows = [("s1", "p:n", "5", False), ("s2", "p:n", "40", False)]
    g = spark.createDataFrame(rows, "subj string, pred string, obj string, obj_is_uri boolean")
    got = sparql_select(g, "SELECT ?s WHERE { ?s ?p ?n . FILTER(?n > 9) }").collect()
    # numeric compare: "5" < 9 < "40" (string compare would invert this)
    assert [r["s"] for r in got] == ["s2"]


def test_union_null_padding_and_join(spark, graph):
    # UNION of title/language legs; ?t vs ?l are branch-private → null-padded
    got = sparql_select(
        graph,
        PREFIX
        + "SELECT ?d ?t ?l WHERE { { ?d dcterms:title ?t } "
        + "UNION { ?d dcterms:language ?l } }",
    ).collect()
    rows = sorted(
        ((r.d, r.t, r.l) for r in got),
        key=lambda x: tuple("" if v is None else v for v in x),
    )
    assert rows == [
        ("http://ex.org/d1", None, "en"),
        ("http://ex.org/d1", "Alpha doc", None),
        ("http://ex.org/d2", "Beta doc", None),
        ("http://ex.org/d2", "Beta-Dokument", None),
    ]
    # union joined with an outer pattern on the shared var
    got2 = sparql_select(
        graph,
        PREFIX
        + "SELECT ?d ?v WHERE { ?d dcterms:references <http://ex.org/d1> . "
        + "{ ?d dcterms:title ?v } UNION { ?d dcterms:language ?v } }",
    ).collect()
    assert sorted((r.d, r.v) for r in got2) == [
        ("http://ex.org/d2", "Beta doc"),
        ("http://ex.org/d2", "Beta-Dokument"),
    ]


def test_values_inline_data(spark, graph):
    got = sparql_select(
        graph,
        PREFIX
        + "SELECT ?d ?t WHERE { ?d dcterms:title ?t . "
        + 'VALUES ?t { "Alpha doc" "Beta doc" } }',
    ).collect()
    assert sorted((r.d, r.t) for r in got) == [
        ("http://ex.org/d1", "Alpha doc"),
        ("http://ex.org/d2", "Beta doc"),
    ]
    # multi-var VALUES with UNDEF in a non-join column
    got2 = sparql_select(
        graph,
        PREFIX
        + "SELECT ?d ?t ?x WHERE { ?d dcterms:title ?t . "
        + 'VALUES (?t ?x) { ("Alpha doc" "one") ("Beta doc" UNDEF) } }',
    ).collect()
    assert sorted((r.d, r.x) for r in got2) == [
        ("http://ex.org/d1", "one"),
        ("http://ex.org/d2", None),
    ]


def test_aggregates_group_by_having(spark, graph):
    got = sparql_select(
        graph,
        PREFIX
        + "SELECT ?d (COUNT(?t) AS ?n) (GROUP_CONCAT(?t; SEPARATOR=\"|\") AS ?ts) "
        + "WHERE { ?d dcterms:title ?t } GROUP BY ?d HAVING(?n >= 2) ORDER BY ?d",
    ).collect()
    assert [(r.d, r.n, r.ts) for r in got] == [
        ("http://ex.org/d2", 2, "Beta doc|Beta-Dokument")
    ]
    # global aggregation = TripleStore.triple_count parity (A3)
    cnt = sparql_select(
        graph,
        "SELECT (COUNT(*) AS ?n) (COUNT(DISTINCT ?s) AS ?n_subj) "
        "WHERE { ?s ?p ?o }",
    ).collect()
    assert (cnt[0].n, cnt[0].n_subj) == (8, 3)
    # SPARQL projection rule: ungrouped var in SELECT is an error
    with pytest.raises(SparqlSyntaxError):
        parse_sparql(
            "SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?p"
        )


def test_lang_function(spark, graph):
    got = sparql_select(
        graph,
        PREFIX
        + 'SELECT ?d ?t WHERE { ?d dcterms:title ?t . FILTER(lang(?t) = "de") }',
    ).collect()
    assert [(r.d, r.t) for r in got] == [("http://ex.org/d2", "Beta-Dokument")]
    # lang() = "" matches plain literals (language leg carries no tag)
    got2 = sparql_select(
        graph,
        PREFIX
        + 'SELECT ?d WHERE { ?d dcterms:language ?l . FILTER(lang(?l) = "") }',
    ).collect()
    assert sorted(r.d for r in got2) == ["http://ex.org/d1"]


def test_filter_not_exists_and_exists(spark, graph):
    # NOT EXISTS: docs with no title — the skeleton/J6 anti-join shape,
    # same answer as the !bound(OPTIONAL) formulation in test_filters
    got = sparql_select(
        graph,
        PREFIX
        + "SELECT DISTINCT ?d WHERE { ?d ?p ?o . "
        + "FILTER NOT EXISTS { ?d dcterms:title ?t } }",
    ).collect()
    assert [r.d for r in got] == ["http://ex.org/d3"]
    # EXISTS: semi join — docs that both reference something and have a title
    got2 = sparql_select(
        graph,
        PREFIX
        + "SELECT DISTINCT ?d WHERE { ?d dcterms:references ?r . "
        + "FILTER EXISTS { ?d dcterms:title ?t } }",
    ).collect()
    assert [r.d for r in got2] == ["http://ex.org/d2"]
    # anti join physically (no row multiplication from multiple titles)
    plan = sparql_select(
        graph,
        PREFIX
        + "SELECT ?d WHERE { ?d ?p ?o . "
        + "FILTER NOT EXISTS { ?d dcterms:title ?t } }",
    )._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan


def test_minus(spark, graph):
    got = sparql_select(
        graph,
        PREFIX
        + "SELECT DISTINCT ?d WHERE { ?d ?p ?o . "
        + "MINUS { ?d dcterms:references ?r } }",
    ).collect()
    assert sorted(r.d for r in got) == ["http://ex.org/d1"]
    # no shared variables → nothing removed (SPARQL domain-overlap rule)
    got2 = sparql_select(
        graph,
        PREFIX
        + "SELECT DISTINCT ?d WHERE { ?d dcterms:title ?t . "
        + "MINUS { ?x dcterms:language ?l } }",
    )
    assert got2.count() == 2


def test_nested_group_splice_keeps_exists_and_minus(spark, graph):
    # regression: splicing a single-branch nested group must not drop its
    # EXISTS/MINUS constraints
    q = parse_sparql(
        PREFIX
        + "SELECT ?d WHERE { { ?d ?p ?o . "
        + "FILTER NOT EXISTS { ?d dcterms:title ?t } MINUS { ?d a ?c } } }"
    )
    assert len(q.where.exists) == 1 and len(q.where.minuses) == 1
    got = sparql_select(
        graph,
        PREFIX
        + "SELECT DISTINCT ?d WHERE { { ?d ?p ?o . "
        + "FILTER NOT EXISTS { ?d dcterms:title ?t } } }",
    ).collect()
    assert [r.d for r in got] == ["http://ex.org/d3"]


def test_maybe_null_correlation_refused(spark, graph):
    # EXISTS correlated on an OPTIONAL-introduced variable: SPARQL treats
    # the unbound var as FREE inside EXISTS (substitution semantics) —
    # supported since round 3 for the single-maybe-null-var case. d2's two
    # titles both exist somewhere (their own rows); d3 has no title → ?t
    # unbound → EXISTS degenerates to pattern non-emptiness → kept.
    got = sparql_select(
        graph,
        PREFIX
        + "SELECT ?d WHERE { ?d dcterms:references ?r . "
        + "OPTIONAL { ?d dcterms:title ?t } "
        + "FILTER EXISTS { ?x dcterms:title ?t } }",
    ).collect()
    assert sorted(r.d for r in got) == [
        "http://ex.org/d2", "http://ex.org/d2",
        "http://ex.org/d3", "http://ex.org/d3",
    ]
    # NOT EXISTS flips every row of the same shape → empty
    got = sparql_select(
        graph,
        PREFIX
        + "SELECT ?d WHERE { ?d dcterms:references ?r . "
        + "OPTIONAL { ?d dcterms:title ?t } "
        + "FILTER NOT EXISTS { ?x dcterms:title ?t } }",
    ).collect()
    assert got == []
    # TWO maybe-null correlated vars: null-mask leg enumeration (supported
    # since round 3). d2 rows bind ?t (?l unbound) → leg joins on ?t alone:
    # no ?x carries BOTH a Beta* title and a language → dropped. d3 rows
    # leave both unbound → non-emptiness probe: d1 has title+language → kept.
    got = sparql_select(
        graph,
        PREFIX
        + "SELECT ?d WHERE { ?d dcterms:references ?r . "
        + "OPTIONAL { ?d dcterms:title ?t } "
        + "OPTIONAL { ?d dcterms:language ?l } "
        + "FILTER EXISTS { ?x dcterms:title ?t . ?x dcterms:language ?l } }",
    ).collect()
    assert sorted(r.d for r in got) == ["http://ex.org/d3", "http://ex.org/d3"]
    # VALUES joined on a union-padded (maybe-null) variable: same refusal
    with pytest.raises(SparqlUnsupportedError):
        sparql_select(
            graph,
            PREFIX
            + "SELECT ?d ?v WHERE { { ?d dcterms:title ?v } "
            + 'UNION { ?d dcterms:language ?l } VALUES ?v { "Alpha doc" } }',
        )
    # single-var MINUS on a maybe-null var stays supported (null-never-
    # matches coincides with the domain-overlap rule): d3 has no title →
    # ?t unbound → domains disjoint → kept; d1/d2 titles never match "X"
    got = sparql_select(
        graph,
        PREFIX
        + "SELECT DISTINCT ?d WHERE { ?d ?p ?o . "
        + "OPTIONAL { ?d dcterms:title ?t } "
        + 'MINUS { ?x dcterms:title ?t . FILTER(?t = "Alpha doc") } }',
    ).collect()
    assert sorted(r.d for r in got) == ["http://ex.org/d2", "http://ex.org/d3"]


def test_group_by_without_aggregates_and_distinct(spark, graph):
    # GROUP BY with no aggregate in SELECT = one row per group
    got = sparql_select(
        graph,
        PREFIX + "SELECT ?d WHERE { ?d dcterms:title ?t } GROUP BY ?d",
    ).collect()
    assert sorted(r.d for r in got) == ["http://ex.org/d1", "http://ex.org/d2"]
    # DISTINCT applies when the projection is narrower than the grouping
    got2 = sparql_select(
        graph,
        PREFIX
        + "SELECT DISTINCT ?p (COUNT(*) AS ?n) "
        + "WHERE { ?s ?p ?o } GROUP BY ?p ?s HAVING(?n >= 1)",
    ).collect()
    rows = sorted((r.p, r.n) for r in got2)
    assert len(rows) == len(set(rows))


@pytest.fixture(scope="module")
def chain(spark):
    """d1→d2→d3→d4 reference chain + titles + a self-loop (d5→d5)."""
    rows = [
        ("d1", "ref", "d2", True), ("d2", "ref", "d3", True),
        ("d3", "ref", "d4", True), ("d4", "t", "T4", False),
        ("d2", "t", "T2", False), ("d5", "ref", "d5", True),
    ]
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_uri boolean"
    )


def test_property_path_seq_alt_inv(spark, chain):
    got = sparql_select(chain, "SELECT ?s ?v WHERE { ?s <ref>/<t> ?v }").collect()
    assert sorted((r.s, r.v) for r in got) == [("d1", "T2"), ("d3", "T4")]
    got2 = sparql_select(chain, "SELECT ?s ?v WHERE { ?s <t>|<ref> ?v }")
    assert got2.count() == 6
    got3 = sparql_select(chain, "SELECT ?o ?s WHERE { ?o ^<ref> ?s }").collect()
    assert ("d2", "d1") in {(r.o, r.s) for r in got3}


def test_property_path_transitive_closure(spark, chain):
    # closure from a constant endpoint
    got = sparql_select(chain, "SELECT ?x WHERE { <d1> <ref>+ ?x }").collect()
    assert sorted(r.x for r in got) == ["d2", "d3", "d4"]
    # cycles terminate (the self-loop must not spin the doubling loop)
    got2 = sparql_select(chain, "SELECT ?x WHERE { <d5> <ref>+ ?x }").collect()
    assert [r.x for r in got2] == ["d5"]
    # a path pattern joins with ordinary patterns on its endpoint vars
    got3 = sparql_select(
        chain, "SELECT ?s ?v WHERE { ?s <ref>+ ?m . ?m <t> ?v }"
    ).collect()
    assert sorted((r.s, r.v) for r in got3) == [
        ("d1", "T2"), ("d1", "T4"), ("d2", "T4"), ("d3", "T4"),
    ]
    # grouped paths compose with modifiers
    got4 = sparql_select(
        chain, "SELECT ?x WHERE { <d1> (<ref>/<ref>)+ ?x }"
    ).collect()
    assert [r.x for r in got4] == ["d3"]


def test_property_path_star_quest_nps(spark, chain):
    # zero-or-more: identity over graph terms ∪ transitive closure
    got = sparql_select(chain, "SELECT ?x WHERE { <d1> <ref>* ?x }").collect()
    assert sorted(r.x for r in got) == ["d1", "d2", "d3", "d4"]
    # zero-or-one
    got2 = sparql_select(chain, "SELECT ?x WHERE { <d2> <ref>? ?x }").collect()
    assert sorted(r.x for r in got2) == ["d2", "d3"]
    # the zero-length leg relates literal terms too (T2 occurs in the graph)
    got3 = sparql_select(chain, 'SELECT ?x WHERE { ?x <t>? "T2" }').collect()
    assert sorted(r.x for r in got3) == ["T2", "d2"]
    # negated property set
    got4 = sparql_select(
        chain, "SELECT ?s ?o WHERE { ?s !(<ref>|<x:nope>) ?o }"
    ).collect()
    assert sorted((r.s, r.o) for r in got4) == [("d2", "T2"), ("d4", "T4")]
    with pytest.raises(SparqlUnsupportedError):
        parse_sparql("SELECT ?s WHERE { ?s !(^<ref>) ?o }")


def test_construct_template_path_rejected():
    with pytest.raises(SparqlSyntaxError):
        parse_sparql(
            "CONSTRUCT { ?s <a>/<b> ?o } WHERE { ?s <p> ?o }"
        )


def test_select_star_and_var_reuse(spark, graph):
    got = sparql_select(
        graph, PREFIX + "SELECT * WHERE { ?d dcterms:references ?r }"
    )
    assert sorted(got.columns) == ["d", "r"]
    assert got.count() == 3
    # same var in two positions of one pattern → equality within the row
    refl = sparql_select(graph, "SELECT ?x WHERE { ?x ?p ?x }")
    assert refl.count() == 0


def test_disconnected_pattern_is_cross_product(spark, graph):
    # SPARQL semantics for a disconnected BGP: cartesian product of the
    # component solution sets. 2 docs with rdf:type? only d1 is typed, so
    # component one has 1 solution; component two (references d2) has 1.
    out = sparql_select(
        graph,
        PREFIX
        + "SELECT ?a ?b WHERE { ?a a <http://ex.org/Doc> . "
        + "?b dcterms:references <http://ex.org/d2> }",
    ).collect()
    assert [(r.a, r.b) for r in out] == [("http://ex.org/d1", "http://ex.org/d3")]
    # 3 references total × 1 typed doc = 3 product rows
    out2 = sparql_select(
        graph,
        PREFIX + "SELECT ?a ?b ?r WHERE { ?a a <http://ex.org/Doc> . "
        "?b dcterms:references ?r }",
    )
    assert out2.count() == 3


# ---------------------------------------------------------------- construct


def test_construct_graph_semantics(spark, graph):
    out = sparql_construct(
        graph,
        PREFIX
        + "CONSTRUCT { ?d <http://ex.org/cites> ?r . ?r a <http://ex.org/Cited> } "
        + "WHERE { ?d dcterms:references ?r }",
    )
    rows = {(r["subj"], r["pred"], r["obj"], r["obj_is_uri"]) for r in out.collect()}
    # 3 cites edges + 2 DISTINCT type assertions (d1 cited twice → one triple)
    assert len(rows) == 5
    assert ("http://ex.org/d1", RDF_NS + "type", "http://ex.org/Cited", True) in rows
    assert out.count() == 5  # no duplicate triples: graph set semantics


# ------------------------------------------- equivalence on pipeline triples


def test_annotations_query_matches_dataframe_form(spark):
    """The reference's annotations.rq shape ([ref: ferenda/res/sparql/
    annotations.rq]) compiled by us == the hand-built J2 join in rollups."""
    from ferenda_spark.operators.linking import _exact_broadcast
    from ferenda_spark.operators.parse import parse_stage, split_parsed
    from ferenda_spark.operators.triples import assemble_triples
    from ferenda_spark.schemas import P_REFERENCES, P_TITLE
    from ferenda_spark.sources.corpus import dictionary_df, generate_corpus

    corpus = generate_corpus(spark, 80)
    docs, _ = split_parsed(parse_stage(corpus, n_parts=4))
    mentions = docs.select("url", "part_key", F.explode("mentions").alias("m")).select(
        "url", "part_key", F.col("m.*")
    )
    triples = assemble_triples(docs, _exact_broadcast(mentions, dictionary_df(spark))).cache()

    sparql = (
        PREFIX
        + "SELECT ?target ?src ?title WHERE { "
        + "?src dcterms:references ?target . ?src dcterms:title ?title . }"
    )
    got = sparql_select(triples, sparql)

    refs = triples.filter(F.col("pred") == P_REFERENCES).select(
        F.col("obj").alias("target"), F.col("subj").alias("src")
    )
    titles = triples.filter(F.col("pred") == P_TITLE).select(
        F.col("subj").alias("src"), F.col("obj").alias("title")
    )
    want = refs.join(titles, "src").select("target", "src", "title")

    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    triples.unpersist()


# ------------------------------------------- expressions / BIND / forms


def test_expression_builtins(spark, graph):
    got = sparql_select(
        graph,
        PREFIX + 'SELECT ?t WHERE { ?d dcterms:title ?t . '
        'FILTER(contains(?t, "doc") && strstarts(?t, "A")) }',
    ).collect()
    assert [r.t for r in got] == ["Alpha doc"]

    got2 = sparql_select(
        graph,
        PREFIX + 'SELECT ?t WHERE { ?d dcterms:title ?t . '
        'FILTER(strends(ucase(?t), "DOC")) }',
    ).collect()
    assert sorted(r.t for r in got2) == ["Alpha doc", "Beta doc"]

    # arithmetic over strlen, with a negative literal on the right
    got3 = sparql_select(
        graph,
        PREFIX + "SELECT ?t WHERE { ?d dcterms:title ?t . "
        "FILTER(strlen(?t) + 1 = 10) }",
    ).collect()
    assert [r.t for r in got3] == ["Alpha doc"]
    got4 = sparql_select(
        graph,
        PREFIX + "SELECT ?t WHERE { ?d dcterms:title ?t . "
        "FILTER(8 - strlen(?t) < -1 && strlen(?t) * 2 > 17) }",
    ).collect()
    assert sorted(r.t for r in got4) == ["Beta-Dokument"]

    # IN / NOT IN
    got5 = sparql_select(
        graph,
        PREFIX + 'SELECT ?l WHERE { ?d dcterms:language ?l . '
        'FILTER(?l IN ("en", "sv")) }',
    ).collect()
    assert [r.l for r in got5] == ["en"]
    got6 = sparql_select(
        graph,
        PREFIX + 'SELECT ?t WHERE { ?d dcterms:title ?t . '
        'FILTER(lang(?t) NOT IN ("de")) }',
    ).collect()
    assert sorted(r.t for r in got6) == ["Alpha doc", "Beta doc"]

    # IF / COALESCE / REPLACE / SUBSTR / isLiteral
    got7 = sparql_select(
        graph,
        PREFIX + 'SELECT ?d ?k WHERE { ?d dcterms:title ?t . '
        'FILTER(isLiteral(?t)) '
        'BIND(IF(lang(?t) = "de", "translated", substr(replace(?t, " doc", ""), 1, 4)) AS ?k) }',
    ).collect()
    assert sorted((r.d, r.k) for r in got7) == [
        ("http://ex.org/d1", "Alph"),
        ("http://ex.org/d2", "Beta"),
        ("http://ex.org/d2", "translated"),
    ]


def test_bind(spark, graph):
    got = sparql_select(
        graph,
        PREFIX + 'SELECT ?d ?u WHERE { ?d dcterms:title ?t . '
        'FILTER(lang(?t) = "de") BIND(ucase(?t) AS ?u) }',
    ).collect()
    assert [(r.d, r.u) for r in got] == [("http://ex.org/d2", "BETA-DOKUMENT")]
    # the bound var is usable in a later FILTER of the same group
    got2 = sparql_select(
        graph,
        PREFIX + "SELECT ?t ?n WHERE { ?d dcterms:title ?t . "
        "BIND(strlen(?t) AS ?n) FILTER(?n < 9) }",
    ).collect()
    assert [(r.t, r.n) for r in got2] == [("Beta doc", "8")]
    with pytest.raises(SparqlSyntaxError):
        sparql_select(
            graph,
            PREFIX + "SELECT ?t WHERE { ?d dcterms:title ?t . BIND(1 AS ?t) }",
        )


def test_ask(spark, graph):
    from ferenda_spark.operators.sparql import sparql_ask

    t = sparql_ask(
        graph, PREFIX + "ASK { ?d dcterms:references <http://ex.org/d1> }"
    ).collect()
    assert len(t) == 1 and t[0].ask is True
    f = sparql_ask(
        graph, PREFIX + 'ASK WHERE { ?d dcterms:title "Nope" }'
    ).collect()
    assert len(f) == 1 and f[0].ask is False


def test_describe(spark, graph):
    from ferenda_spark.operators.sparql import sparql_describe

    got = sparql_describe(graph, "DESCRIBE <http://ex.org/d1>").collect()
    assert len(got) == 3 and all(r.subj == "http://ex.org/d1" for r in got)
    got2 = sparql_describe(
        graph,
        PREFIX + "DESCRIBE ?d WHERE { ?d dcterms:references <http://ex.org/d2> }",
    ).collect()
    assert {r.subj for r in got2} == {"http://ex.org/d3"} and len(got2) == 2
    got3 = sparql_describe(
        graph,
        PREFIX + "DESCRIBE ?d <http://ex.org/d1> "
        "WHERE { ?d dcterms:references <http://ex.org/d2> }",
    ).collect()
    assert {r.subj for r in got3} == {"http://ex.org/d1", "http://ex.org/d3"}
    # solution modifiers scope the described-resource set
    got4 = sparql_describe(
        graph,
        PREFIX + "DESCRIBE ?d WHERE { ?d dcterms:references ?r } "
        "ORDER BY ?d ?r LIMIT 1",
    ).collect()
    assert {r.subj for r in got4} == {"http://ex.org/d2"} and len(got4) == 3


def test_subquery(spark, graph):
    got = sparql_select(
        graph,
        PREFIX + "SELECT ?d ?n WHERE { "
        '?d dcterms:title ?t . FILTER(lang(?t) = "en") '
        "{ SELECT ?d (COUNT(?r) AS ?n) WHERE { ?d dcterms:references ?r } "
        "GROUP BY ?d } }",
    ).collect()
    assert [(r.d, r.n) for r in got] == [("http://ex.org/d2", 1)]

    # ORDER/LIMIT scoped inside the subquery
    got2 = sparql_select(
        graph,
        PREFIX + "SELECT ?t WHERE { "
        "{ SELECT ?d WHERE { ?d dcterms:references <http://ex.org/d1> } "
        "ORDER BY ?d LIMIT 1 } "
        "?d dcterms:title ?t . }",
    ).collect()
    assert sorted(r.t for r in got2) == ["Beta doc", "Beta-Dokument"]


def test_graph_clause(spark):
    from ferenda_spark.operators.sparql import sparql_select

    rows = [
        ("d1", "p:t", "One", False, "https://a.example/1"),
        ("d2", "p:t", "Two", False, "https://b.example/2"),
        ("d2", "p:r", "d1", True, "https://b.example/2"),
    ]
    g = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_uri boolean, src_url string",
    )
    # constant graph label prunes to that context
    got = sparql_select(
        g, 'SELECT ?t WHERE { GRAPH <a.example> { ?d <p:t> ?t } }'
    ).collect()
    assert [r.t for r in got] == ["One"]
    # variable graph binds the label and joins across the body's patterns
    got2 = sparql_select(
        g, "SELECT ?g ?t WHERE { GRAPH ?g { ?d <p:t> ?t . ?d <p:r> ?r } }"
    ).collect()
    assert [(r.g, r.t) for r in got2] == [("b.example", "Two")]
    # the graph var is joinable with patterns outside the GRAPH group
    got3 = sparql_select(
        g,
        "SELECT ?g WHERE { GRAPH ?g { ?d <p:r> ?r } }",
    ).collect()
    assert [r.g for r in got3] == ["b.example"]
    # frames without provenance refuse GRAPH instead of guessing
    bare = g.drop("src_url")
    with pytest.raises(SparqlUnsupportedError):
        sparql_select(
            bare, "SELECT ?t WHERE { GRAPH ?g { ?d <p:t> ?t } }"
        ).collect()
    # unsupported body shapes raise at parse time
    with pytest.raises(SparqlUnsupportedError):
        parse_sparql(
            "SELECT ?t WHERE { GRAPH ?g { OPTIONAL { ?d <p:t> ?t } } }"
        )


def test_aggregate_expressions_and_order_expr(spark, graph):
    got = sparql_select(
        graph,
        PREFIX + "SELECT ?d (SUM(strlen(?t)) AS ?chars) "
        "(MAX(strlen(?t) * 2) AS ?mx) "
        "WHERE { ?d dcterms:title ?t } GROUP BY ?d "
        "ORDER BY DESC(?chars) LIMIT 1",
    ).collect()
    assert [(r.d, r.chars, r.mx) for r in got] == [("http://ex.org/d2", 21.0, 26.0)]
    # bare function expression as a sort key
    got2 = sparql_select(
        graph,
        PREFIX + "SELECT ?t WHERE { ?d dcterms:title ?t } "
        "ORDER BY strlen(?t) LIMIT 1",
    ).collect()
    assert [r.t for r in got2] == ["Beta doc"]
    # parenthesized arithmetic sort key
    got3 = sparql_select(
        graph,
        PREFIX + "SELECT ?t WHERE { ?d dcterms:title ?t } "
        "ORDER BY (strlen(?t) * -1) LIMIT 1",
    ).collect()
    assert [r.t for r in got3] == ["Beta-Dokument"]
    with pytest.raises(SparqlUnsupportedError):
        sparql_select(
            graph,
            PREFIX + "SELECT ?d WHERE { ?d dcterms:title ?t } ORDER BY strlen(?t)",
        )


def test_trailing_values(spark, graph):
    got = sparql_select(
        graph,
        PREFIX + "SELECT ?d ?t WHERE { ?d dcterms:title ?t } "
        'VALUES ?t { "Alpha doc" }',
    ).collect()
    assert [(r.d, r.t) for r in got] == [("http://ex.org/d1", "Alpha doc")]
    with pytest.raises(SparqlUnsupportedError):
        parse_sparql(
            PREFIX + "SELECT (COUNT(*) AS ?n) WHERE { ?d dcterms:title ?t } "
            'VALUES ?t { "x" }'
        )


def test_select_expressions(spark, graph):
    got = sparql_select(
        graph,
        PREFIX + "SELECT ?d (ucase(?t) AS ?u) (strlen(?t) + 1 AS ?n) "
        'WHERE { ?d dcterms:title ?t . FILTER(lang(?t) = "de") }',
    ).collect()
    assert [(r.d, r.u, r.n) for r in got] == [
        ("http://ex.org/d2", "BETA-DOKUMENT", "14.0")
    ]
    # post-aggregation expression over group keys / aggregate aliases
    got2 = sparql_select(
        graph,
        PREFIX + 'SELECT ?d (COUNT(?t) AS ?n) (concat(?d, "#x") AS ?k) '
        "WHERE { ?d dcterms:title ?t } GROUP BY ?d HAVING(?n >= 2)",
    ).collect()
    assert [(r.d, r.n, r.k) for r in got2] == [
        ("http://ex.org/d2", 2, "http://ex.org/d2#x")
    ]
    # expression over an ungrouped variable is refused
    with pytest.raises(SparqlUnsupportedError):
        sparql_select(
            graph,
            PREFIX + "SELECT (ucase(?t) AS ?u) (COUNT(*) AS ?n) "
            "WHERE { ?d dcterms:title ?t } GROUP BY ?d",
        )
    with pytest.raises(SparqlSyntaxError):
        parse_sparql("SELECT ?d (str(?d) AS ?d) WHERE { ?d <p:x> ?o }")


def test_having_inline_aggregates(spark, graph):
    got = sparql_select(
        graph,
        PREFIX + "SELECT ?d WHERE { ?d dcterms:title ?t } "
        "GROUP BY ?d HAVING(COUNT(*) >= 2)",
    ).collect()
    assert [r.d for r in got] == ["http://ex.org/d2"]
    # mixed: aliased aggregate in SELECT + two inline aggregates in HAVING
    got2 = sparql_select(
        graph,
        PREFIX + "SELECT ?d (COUNT(?t) AS ?n) WHERE { ?d dcterms:title ?t } "
        "GROUP BY ?d HAVING(SUM(strlen(?t)) > 20 && COUNT(*) >= 2)",
    ).collect()
    assert [(r.d, r.n) for r in got2] == [("http://ex.org/d2", 2)]
    # aggregate calls outside HAVING stay illegal
    with pytest.raises((SparqlSyntaxError, SparqlUnsupportedError)):
        parse_sparql("SELECT ?s WHERE { ?s <p:x> ?o . FILTER(SUM(?o) > 1) }")


def test_strbefore_strafter_and_construct_where(spark, graph):
    got = sparql_select(
        graph,
        PREFIX + 'SELECT ?d (strbefore(?t, " ") AS ?w1) '
        '(strafter(?t, "Beta") AS ?rest) WHERE { ?d dcterms:title ?t . '
        'FILTER(lang(?t) = "en") } ORDER BY ?d',
    ).collect()
    assert [(r.d, r.w1, r.rest) for r in got] == [
        ("http://ex.org/d1", "Alpha", ""),
        ("http://ex.org/d2", "Beta", " doc"),
    ]
    got2 = sparql_construct(
        graph,
        PREFIX + "CONSTRUCT WHERE { ?d dcterms:references ?r }",
    ).collect()
    assert len(got2) == 3 and all(
        r.pred == DCTERMS + "references" for r in got2
    )
    with pytest.raises(SparqlUnsupportedError):
        parse_sparql(
            PREFIX + "CONSTRUCT WHERE { ?d dcterms:title ?t . "
            'FILTER(?t = "x") }'
        )


def test_langmatches_and_sameterm(spark, graph):
    got = sparql_select(
        graph,
        PREFIX + "SELECT ?t WHERE { ?d dcterms:title ?t . "
        'FILTER(langMatches(lang(?t), "DE")) }',
    ).collect()
    assert [r.t for r in got] == ["Beta-Dokument"]
    got2 = sparql_select(
        graph,
        PREFIX + "SELECT ?t WHERE { ?d dcterms:title ?t . "
        'FILTER(langMatches(lang(?t), "*")) }',
    ).collect()
    assert len(got2) == 3  # every title is lang-tagged

    # sameTerm distinguishes a URI from a literal with the same lexical form
    rows = [
        ("s1", "p:x", "v", True, None),
        ("s2", "p:x", "v", False, None),
        ("s3", "p:x", "v", False, "en"),
    ]
    g = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_uri boolean, obj_lang string",
    )
    same_uri = sparql_select(
        g, "SELECT ?s WHERE { ?s <p:x> ?o . FILTER(sameTerm(?o, <v>)) }"
    ).collect()
    assert [r.s for r in same_uri] == ["s1"]
    same_lit = sparql_select(
        g, 'SELECT ?s WHERE { ?s <p:x> ?o . FILTER(sameTerm(?o, "v")) }'
    ).collect()
    assert [r.s for r in same_lit] == ["s2"]  # plain literal, no lang tag
    same_tagged = sparql_select(
        g, 'SELECT ?s WHERE { ?s <p:x> ?o . FILTER(sameTerm(?o, "v"@en)) }'
    ).collect()
    assert [r.s for r in same_tagged] == ["s3"]


def test_iri_constructor_and_hashes(spark, graph):
    import hashlib

    got = sparql_select(
        graph,
        PREFIX + 'SELECT ?d ?u ?h WHERE { ?d dcterms:language "en" . '
        'BIND(IRI(concat(str(?d), "#meta")) AS ?u) '
        "BIND(sha256(?d) AS ?h) FILTER(isIRI(?u)) }",
    ).collect()
    assert [(r.d, r.u) for r in got] == [
        ("http://ex.org/d1", "http://ex.org/d1#meta")
    ]
    assert got[0].h == hashlib.sha256(b"http://ex.org/d1").hexdigest()
    # a minted IRI is term-identical to the equivalent constant IRI
    got2 = sparql_select(
        graph,
        PREFIX + 'SELECT ?d WHERE { ?d dcterms:language "en" . '
        'BIND(IRI(concat(str(?d), "#meta")) AS ?u) '
        "FILTER(sameTerm(?u, <http://ex.org/d1#meta>)) }",
    ).collect()
    assert [r.d for r in got2] == ["http://ex.org/d1"]


def test_numeric_ops_drop_nonnumeric_rows(spark):
    """SPARQL expression-error semantics under ANSI Spark: a numeric op on
    a non-numeric term eliminates the ROW (try_cast → NULL), it must not
    abort the job."""
    rows = [
        ("s1", "p:n", "5", False),
        ("s2", "p:n", "abc", False),
        ("s3", "p:n", "40", False),
    ]
    g = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_uri boolean"
    )
    got = sparql_select(
        g, "SELECT ?s WHERE { ?s ?p ?n . FILTER(?n > 9) }"
    ).collect()
    assert [r.s for r in got] == ["s3"]
    got2 = sparql_select(
        g,
        "SELECT (SUM(?n) AS ?t) (COUNT(*) AS ?c) WHERE { ?s ?p ?n } "
        "GROUP BY ?p",
    ).collect()
    assert [(r.t, r.c) for r in got2] == [(45.0, 3)]  # 'abc' → NULL, skipped
    got3 = sparql_select(
        g,
        "SELECT ?s ?d WHERE { ?s ?p ?n . BIND(?n * 2 AS ?d) }",
    ).collect()
    assert sorted((r.s, r.d) for r in got3) == [
        ("s1", "10.0"), ("s2", None), ("s3", "80.0"),
    ]


def test_bind_var_in_exists_refused(spark, graph):
    with pytest.raises(SparqlUnsupportedError):
        sparql_select(
            graph,
            PREFIX + "SELECT ?d WHERE { ?d dcterms:title ?t . "
            "BIND(ucase(?t) AS ?u) "
            "FILTER EXISTS { ?d dcterms:title ?u } }",
        )
    with pytest.raises(SparqlUnsupportedError):
        sparql_select(
            graph,
            PREFIX + "SELECT ?d WHERE { ?d dcterms:title ?t . "
            "BIND(ucase(?t) AS ?u) MINUS { ?d dcterms:title ?u } }",
        )
