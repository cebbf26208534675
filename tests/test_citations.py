"""Citation grammar tests — port of the reference's testCitationParser
pattern: string → alternating [str, (match, uri)] segmentation."""

from ferenda_spark.operators.citations import scan_paragraph, segment


def test_url_citation():
    segs = segment("see https://x.example.com/a.html, ok")
    assert segs == [
        "see ",
        ("https://x.example.com/a.html", "https://x.example.com/a.html"),
        ", ok",
    ]


def test_directive_and_regulation():
    segs = segment("per Directive 95/46/EC and Regulation (EU) 2016/679 rules")
    assert segs[1] == ("Directive 95/46/EC", "https://kg.example.org/eu/directive/1995/46")
    assert segs[3] == (
        "Regulation (EU) 2016/679",
        "https://kg.example.org/eu/regulation/2016/679",
    )


def test_article_contextual_carryover():
    """LegalRef-shape contextual state: Article resolves against the most
    recent act, carried across paragraphs of the same document."""
    state = {"act": None}
    r1 = scan_paragraph("under Directive 95/46/EC data", state)
    r2 = scan_paragraph("see Article 12(1) and Article 7 thereof", state)
    assert [r.uri for r in r2] == [
        "https://kg.example.org/eu/directive/1995/46#art12.1",
        "https://kg.example.org/eu/directive/1995/46#art7",
    ]
    assert r1[0].kind == "eulaw"


def test_article_without_context_dropped():
    refs = scan_paragraph("see Article 12(1) alone", {"act": None})
    assert refs == []


def test_article_paren_not_swallowed():
    (r,) = scan_paragraph("x Article 2(5) y", {"act": "https://a"})
    assert r.text == "Article 2(5)" and r.uri == "https://a#art2.5"


def test_act_updates_context_in_span_order():
    state = {"act": None}
    refs = scan_paragraph(
        "Directive 90/1/EC then Article 3 then Regulation (EU) 2020/5 then Article 4",
        state,
    )
    assert refs[1].uri.endswith("directive/1990/1#art3")
    assert refs[3].uri.endswith("regulation/2020/5#art4")


def test_entity_mention_detected_not_resolved():
    (r,) = scan_paragraph("met Acme Vector Corp E0042 today", {"act": None})
    assert r.kind == "entity" and r.uri is None
    assert r.text == "Acme Vector Corp E0042"


def test_abbreviation_mention():
    (r,) = scan_paragraph("per AVC E0042 filing", {"act": None})
    assert r.text == "AVC E0042"


def test_url_trailing_punct_stripped():
    (r,) = scan_paragraph("at https://d0.example.com/x.html. next", {"act": None})
    assert r.text == "https://d0.example.com/x.html"
