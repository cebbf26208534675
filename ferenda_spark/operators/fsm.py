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

SECTION_RE = re.compile(r"^Section (\d+)\. (.*)$")


def _is_section(chunk: str):
    return SECTION_RE.match(chunk)


def _is_any(chunk: str):
    return True


def _h_title(ctx: dict, chunk: str, m) -> None:
    ctx["title"] = chunk
    ctx["sections"] = []


def _h_section(ctx: dict, chunk: str, m) -> None:
    ctx["sections"].append(
        {"ordinal": int(m.group(1)), "title": m.group(2), "paras": []}
    )


def _h_para(ctx: dict, chunk: str, m) -> None:
    secs = ctx["sections"]
    if not secs:  # paragraph before any heading → implicit section 0
        secs.append({"ordinal": 0, "title": "", "paras": []})
    paras = secs[-1]["paras"]
    paras.append({"idx": len(paras), "text": chunk})


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
