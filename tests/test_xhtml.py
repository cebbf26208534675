"""XHTML+RDFa rendering (S7/T9): well-formedness + the distill round-trip —
re-extracting triples from the emitted XHTML must reproduce exactly the
grammar triples assemble_triples derives from the same parsed docs (the
reference's render_xhtml → distill contract, the XML/RDF analog of
assertEqualGraphs)."""

import xml.etree.ElementTree as ET

from pyspark.sql import functions as F

from ferenda_spark.operators.parse import parse_stage, split_parsed
from ferenda_spark.operators.triples import assemble_triples
from ferenda_spark.operators.xhtml import render_xhtml
from ferenda_spark.schemas import (
    KG_BASE,
    P_IS_PART_OF,
    P_ISSUED,
    P_LANGUAGE,
    P_REFERENCES,
    P_TITLE,
    P_TYPE,
    T_DOCPART,
    T_DOCUMENT,
)
from ferenda_spark.sources.corpus import generate_corpus

XNS = "{http://www.w3.org/1999/xhtml}"
CURIE = {
    "dcterms:title": P_TITLE,
    "dcterms:issued": P_ISSUED,
    "dcterms:language": P_LANGUAGE,
    "dcterms:isPartOf": P_IS_PART_OF,
    "dcterms:references": P_REFERENCES,
    "bibo:Document": T_DOCUMENT,
    "bibo:DocumentPart": T_DOCPART,
}


def _distill(xhtml: str) -> set[tuple]:
    """Minimal RDFa extractor for the subset the renderer emits."""
    root = ET.fromstring(xhtml)
    doc_uri = root.attrib["about"]
    triples = {(doc_uri, P_TYPE, T_DOCUMENT)}
    head = root.find(f"{XNS}head")
    title = head.find(f"{XNS}title")
    triples.add((doc_uri, CURIE[title.attrib["property"]], title.text or ""))
    for meta in head.findall(f"{XNS}meta"):
        triples.add(
            (doc_uri, CURIE[meta.attrib["property"]], meta.attrib["content"])
        )
    for sec in root.find(f"{XNS}body").findall(f"{XNS}section"):
        sec_uri = sec.attrib["about"]
        triples.add((sec_uri, P_TYPE, CURIE[sec.attrib["typeof"]]))
        triples.add((sec_uri, CURIE[sec.attrib["rel"]], sec.attrib["resource"]))
        hx = next(
            h for lvl in ("h2", "h3", "h4") for h in sec.findall(f"{XNS}{lvl}")
        )
        triples.add((sec_uri, CURIE[hx.attrib["property"]], hx.text or ""))
        for a in sec.iter(f"{XNS}a"):
            triples.add((sec_uri, CURIE[a.attrib["rel"]], a.attrib["href"]))
    return triples


def test_xhtml_wellformed_and_roundtrip(spark):
    n = 40
    docs, _ = split_parsed(
        parse_stage(generate_corpus(spark, n), n_parts=4, with_sections=True)
    )
    docs = docs.cache()
    rendered = {r["url"]: r["xhtml"] for r in render_xhtml(docs).collect()}
    assert len(rendered) == n

    # grammar triples (entity edges excluded: linking runs after parse, and
    # the XHTML is the parsed layer) — empty links frame
    links = spark.createDataFrame(
        [],
        "url string, part_key int, section_ordinal string, canonical_uri string",
    )
    want: dict[str, set] = {}
    for row in assemble_triples(docs, links).collect():
        want.setdefault(row["src_url"], set()).add(
            (row["subj"], row["pred"], row["obj"])
        )

    for url, xhtml in rendered.items():
        got = _distill(xhtml)  # ET.fromstring also proves well-formedness
        assert got == want[url], url
    docs.unpersist()


def test_xhtml_escapes_special_chars(spark):
    from ferenda_spark.operators.parse import parse_stage as ps

    import datetime as dt

    corpus = spark.createDataFrame(
        [(
            "https://ex.org/x",
            dt.datetime(2020, 1, 2, 3, 4, 5),
            b"<html><body><h2>Section 1. A & B <tag></h2>"
            b'<p>q "quoted" &amp; 5 < 6 see https://t.example/a?b=1&c=2</p>'
            b"</body></html>",
            "",
            "en",
        )],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    docs, _ = split_parsed(ps(corpus, n_parts=2))
    xhtml = render_xhtml(docs).collect()[0]["xhtml"]
    root = ET.fromstring(xhtml)  # must stay well-formed despite & < > "
    assert "A &amp; B" in xhtml
    hrefs = [a.attrib["href"] for a in root.iter(f"{XNS}a")]
    # the parsed (unescaped) attribute carries the original URL bytes
    assert hrefs == ["https://t.example/a?b=1&c=2"]
