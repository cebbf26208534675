"""Finite-state document-structure recovery.

Ports the *shape* of the reference's FSMParser
([ref: ferenda/fsmparser.py :: FSMParser]: ``set_recognizers`` /
``set_transitions`` / ``parse(chunks)`` driving constructors over a peekable
chunk reader) as a small pure-Python engine executed *inside* the parse
stage's pandas UDF — SURVEY §2.3 T2: structure recovery is irreducibly
per-document sequential, so it runs vectorized-across-docs /
sequential-within-doc. No Spark imports here: this module must be cheap to
ship to executors and trivially unit-testable (tests/test_fsm.py ports the
testFSMParser micro-grammar style).

State never leaks across documents: ``FSMParser.parse`` builds all state
locally per call (SURVEY §7.4 batch-composition risk).
"""

from __future__ import annotations

import re
from typing import Any, Callable

Recognizer = Callable[[str], Any]  # chunk -> falsy | match-info
Handler = Callable[[dict, str, Any], None]  # (state-dict, chunk, match) -> None


class FSMParser:
    """Generic chunk-stream FSM.

    transitions: {(state, recognizer_name): (handler|None, new_state|None)}
    Recognizers are tried in registration order; the first one that (a)
    matches the chunk and (b) has a transition from the current state wins.
    A ``None`` handler skips the chunk; a ``None`` new_state keeps the state.
    """

    def __init__(self, initial_state: str):
        self.initial_state = initial_state
        self._recognizers: list[tuple[str, Recognizer]] = []
        self._transitions: dict[tuple[str, str], tuple[Handler | None, str | None]] = {}

    def set_recognizers(self, *named: tuple[str, Recognizer]) -> None:
        self._recognizers = list(named)

    def set_transitions(
        self, t: dict[tuple[str, str], tuple[Handler | None, str | None]]
    ) -> None:
        self._transitions = dict(t)

    def parse(self, chunks: list[str], ctx: dict | None = None) -> dict:
        ctx = ctx if ctx is not None else {}
        state = self.initial_state
        for chunk in chunks:
            for name, rec in self._recognizers:
                key = (state, name)
                if key not in self._transitions:
                    continue
                m = rec(chunk)
                if not m:
                    continue
                handler, new_state = self._transitions[key]
                if handler is not None:
                    handler(ctx, chunk, m)
                if new_state is not None:
                    state = new_state
                break
            # unmatched chunks are dropped (reference behavior: unrecognized
            # chunks fall through to the closest paragraph recognizer; our
            # grammars always include a catch-all so this is unreachable
            # unless a grammar is deliberately partial).
        return ctx


# ---------------------------------------------------------------------------
# the web-page grammar (matches the corpus template, FIXTURES §1)
# ---------------------------------------------------------------------------
# Section headings carry dotted ("Section 2.1.3. Title") or lettered
# ("Section 2 a. Title" — the reference's testFSMParser "1 a" subsection
# ordinal style) ordinals; both canonicalize to a dotted ``ordinal_path``
# ("2.1.3", letters a→1, b→2, …). The recovered structure is a FLAT list in
# document order — the Spark struct schema is bounded-depth by design
# (SURVEY §7.4), so nesting lives in the path string, losslessly; use
# ``nest_sections`` to rebuild the tree when a consumer wants recursion.

SECTION_RE = re.compile(r"^Section (\d+(?:\.\d+)*|\d+(?: [a-z])+)\. (.*)$")


def _canonical_path(raw: str) -> str:
    if "." in raw or " " not in raw:
        return raw
    parts = raw.split(" ")
    return ".".join(
        [parts[0]] + [str(ord(p) - ord("a") + 1) for p in parts[1:]]
    )


def _is_section(chunk: str):
    return SECTION_RE.match(chunk)


def _is_any(chunk: str):
    return True


def _h_title(ctx: dict, chunk: str, m) -> None:
    ctx["title"] = chunk
    ctx["sections"] = []


def _h_section(ctx: dict, chunk: str, m) -> None:
    path = _canonical_path(m.group(1))
    ctx["sections"].append(
        {
            "ordinal": int(path.split(".", 1)[0]),
            "ordinal_path": path,
            "title": m.group(2),
            "paras": [],
        }
    )


def _h_para(ctx: dict, chunk: str, m) -> None:
    secs = ctx["sections"]
    if not secs:  # paragraph before any heading → implicit section 0
        secs.append({"ordinal": 0, "ordinal_path": "0", "title": "", "paras": []})
    paras = secs[-1]["paras"]
    paras.append({"idx": len(paras), "text": chunk})


def nest_sections(flat: list[dict]) -> list[dict]:
    """Flat ordinal_path-ordered section list → recursive tree (each node
    gains a ``subsections`` list). A node whose path extends the previous
    node's path nests under it; otherwise it pops to the matching ancestor.
    Orphans (no matching parent prefix) attach at the top level — grammar
    recovery must never drop content."""
    roots: list[dict] = []
    stack: list[dict] = []  # ancestors, outermost first
    for s in flat:
        node = {**s, "subsections": []}
        path = node["ordinal_path"]
        while stack and not path.startswith(stack[-1]["ordinal_path"] + "."):
            stack.pop()
        (stack[-1]["subsections"] if stack else roots).append(node)
        stack.append(node)
    return roots


def make_webpage_parser() -> FSMParser:
    p = FSMParser(initial_state="preamble")
    p.set_recognizers(("section", _is_section), ("para", _is_any))
    p.set_transitions(
        {
            # first chunk is the <title> text regardless of shape
            ("preamble", "section"): (_h_title, "body"),
            ("preamble", "para"): (_h_title, "body"),
            ("body", "section"): (_h_section, "body"),
            ("body", "para"): (_h_para, "body"),
        }
    )
    return p


_WEBPAGE_PARSER = make_webpage_parser()


def parse_structure(text: str) -> dict:
    """Extracted text → {title, sections:[{ordinal,title,paras:[{idx,text}]}]}."""
    chunks = [c for c in text.split("\n\n") if c]
    ctx = _WEBPAGE_PARSER.parse(chunks)
    ctx.setdefault("title", "")
    ctx.setdefault("sections", [])
    return ctx


# ---------------------------------------------------------------------------
# the styled-chunk grammar (DOCX heading styles → Section/Subsection FSM)
# ---------------------------------------------------------------------------
# Word documents carry structure in paragraph STYLES (Title, Heading1..9),
# not in "Section 2.1." text ordinals — the reference's WordReader emits the
# style names into its intermediate XML and repo grammars key off them
# ([ref: ferenda/wordreader.py :: WordReader]). This grammar drives the SAME
# FSMParser engine over (style, text) chunks and emits the SAME flat
# sections shape as the webpage grammar, with ordinal_path synthesized from
# running per-level heading counters ("2", "2.1", "2.1.3") — so DOCX corpora
# get nested doc_struct and isPartOf triples identical in shape to HTML.

_HEADING_STYLE_RE = re.compile(r"^[Hh]eading ?([1-9])$")
_MAX_HEADING_DEPTH = 3  # bounded-depth schema (SURVEY §7.4); deeper
# headings clamp to the deepest tracked level rather than being dropped


def _is_title_style(chunk):
    return chunk[0] == "Title"


def _is_heading_style(chunk):
    return _HEADING_STYLE_RE.match(chunk[0])


def _h_doc_title(ctx: dict, chunk, m) -> None:
    if not ctx.get("title"):
        ctx["title"] = chunk[1]


def _h_styled_heading(ctx: dict, chunk, m) -> None:
    level = min(int(m.group(1)), _MAX_HEADING_DEPTH)
    counters = ctx["_counters"]
    # a level-N heading under a document with no open level-(N-1) ancestor
    # clamps upward (an orphan Heading2 opens "1"-style top paths) — grammar
    # recovery must never drop content
    level = min(level, ctx["_depth"] + 1)
    counters[level - 1] += 1
    for i in range(level, _MAX_HEADING_DEPTH):
        counters[i] = 0
    ctx["_depth"] = level
    path = ".".join(str(c) for c in counters[:level])
    ctx["sections"].append(
        {
            "ordinal": counters[0],
            "ordinal_path": path,
            "title": chunk[1],
            "paras": [],
        }
    )
    if not ctx.get("title"):  # first heading doubles as the doc title when
        ctx["title"] = chunk[1]  # no Title-styled paragraph exists


def _h_styled_para(ctx: dict, chunk, m) -> None:
    _h_para(ctx, chunk[1], m)


def make_styled_parser() -> FSMParser:
    p = FSMParser(initial_state="body")
    p.set_recognizers(
        ("title", _is_title_style),
        ("heading", _is_heading_style),
        ("para", _is_any),
    )
    p.set_transitions(
        {
            ("body", "title"): (_h_doc_title, None),
            ("body", "heading"): (_h_styled_heading, None),
            ("body", "para"): (_h_styled_para, None),
        }
    )
    return p


_STYLED_PARSER = make_styled_parser()


def parse_styled_structure(paras: list[tuple[str, str]]) -> dict:
    """(style, text) chunks → the same {title, sections} shape as
    ``parse_structure`` — nesting lives in ``ordinal_path``."""
    ctx = {
        "title": "",
        "sections": [],
        "_counters": [0] * _MAX_HEADING_DEPTH,
        "_depth": 0,
    }
    _STYLED_PARSER.parse(paras, ctx)
    del ctx["_counters"], ctx["_depth"]
    return ctx
