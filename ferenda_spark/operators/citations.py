"""Citation scanning + contextual reference resolution.

Ports the behavior of the reference's CitationParser + uriformatter
([ref: ferenda/citationparser.py :: CitationParser.parse_string — text →
alternating [str, (match, uri)] segmentation], [ref: ferenda/uriformatter.py])
and the *shape* of its stateful refparser ([ref:
ferenda/sources/legal/se/legalref.py :: LegalRef] — contextual carry-over:
"Article 12(1)" resolves against the most recently cited act in the same
document).

Pure Python, precompiled regex grammars (sandbox note: pyparsing is
available, but compiled regex is 5-10× faster inside the Arrow batch loop
and these grammars are regular — the CitationParser contract is preserved
by the segmentation API + tests/test_citations.py). Runs inside the parse
stage's pandas UDF; document-local state only — embarrassingly parallel
across docs (SURVEY T6).
"""

from __future__ import annotations

import re
from typing import NamedTuple

from ferenda_spark.functions.uris import article_uri, eu_act_uri, normalize_alias

URL_RE = re.compile(r"https?://[^\s<>\"']+")
DIRECTIVE_RE = re.compile(r"\bDirective (\d{1,4})/(\d+)/(?:EC|EEC|EU)\b")
REGULATION_RE = re.compile(r"\bRegulation \((?:EU|EC)\) (\d{4})/(\d+)\b")
# no trailing \b: ")"→" " is non-word→non-word (no boundary), which would
# backtrack the paragraph group away and emit "Article 2" for "Article 2(5)"
ARTICLE_RE = re.compile(r"\bArticle (\d+)(?:\((\d+)\))?(?![\w(])")
# entity surface form: 1-5 capitalized words then an E#### designator
ENTITY_RE = re.compile(r"\b(?:[A-Z][A-Za-z]*(?: [A-Z][A-Za-z]*){0,4}) E\d{4}\b")
_TRAIL_PUNCT = ".,;:!?)\"'"


class Ref(NamedTuple):
    text: str
    uri: str | None  # None → needs dictionary linking (entity mentions)
    kind: str  # url | eulaw | entity
    start: int
    end: int


def scan_paragraph(text: str, state: dict) -> list[Ref]:
    """All citation/mention hits in one paragraph, in span order.

    ``state`` is the document-local refparser context ({'act': uri|None});
    the caller MUST feed paragraphs in document order for the Article
    carry-over to resolve like the reference's LegalRef.
    """
    # substring gates: a C-speed `in` check is a necessary condition for each
    # regex, so skipping the finditer when it fails changes nothing and saves
    # most of the scan cost on typical paragraphs.
    hits: list[Ref] = []
    if "http" in text:
        for m in URL_RE.finditer(text):
            t = m.group(0).rstrip(_TRAIL_PUNCT)
            hits.append(Ref(t, t, "url", m.start(), m.start() + len(t)))
    if "Directive" in text:
        for m in DIRECTIVE_RE.finditer(text):
            hits.append(
                Ref(m.group(0), eu_act_uri("directive", m.group(1), m.group(2)),
                    "eulaw", m.start(), m.end())
            )
    if "Regulation" in text:
        for m in REGULATION_RE.finditer(text):
            hits.append(
                Ref(m.group(0), eu_act_uri("regulation", m.group(1), m.group(2)),
                    "eulaw", m.start(), m.end())
            )
    if "Article" in text:
        for m in ARTICLE_RE.finditer(text):
            hits.append(Ref(m.group(0), "", "article", m.start(), m.end()))
    if " E" in text:
        for m in ENTITY_RE.finditer(text):
            hits.append(Ref(m.group(0), None, "entity", m.start(), m.end()))
    hits.sort(key=lambda r: (r.start, r.end))

    resolved: list[Ref] = []
    for h in hits:
        if h.kind == "eulaw":
            state["act"] = h.uri
            resolved.append(h)
        elif h.kind == "article":
            act = state.get("act")
            if act is None:
                continue  # unresolvable without context — reference drops too
            am = ARTICLE_RE.match(h.text)
            uri = article_uri(act, am.group(1), am.group(2))
            resolved.append(Ref(h.text, uri, "eulaw", h.start, h.end))
        else:
            resolved.append(h)
    return resolved


def segment(text: str, state: dict | None = None) -> list:
    """CitationParser.parse_string parity API: text → alternating
    [str, (match_text, uri_or_key)] segments covering the whole input."""
    state = state if state is not None else {"act": None}
    refs = scan_paragraph(text, state)
    out: list = []
    pos = 0
    for r in refs:
        if r.start < pos:  # overlapping hit (shouldn't happen) — skip
            continue
        if r.start > pos:
            out.append(text[pos : r.start])
        out.append((r.text, r.uri if r.uri is not None else normalize_alias(r.text)))
        pos = r.end
    if pos < len(text):
        out.append(text[pos:])
    return out
