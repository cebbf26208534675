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
