"""Deterministic HTML → text extraction (the parse stage's first step).

Ports the *behavior* of the reference's soup-based extraction
([ref: ferenda/documentrepository.py :: parse_document_from_soup],
[ref: ferenda/textreader.py :: TextReader]) onto stdlib ``html.parser`` —
the sandbox has no lxml/bs4 (SURVEY §7.1), and the north_star's per-row
invariant is "byte-identical extracted text per url", so this module IS the
specification. Behavior is pinned by golden sha256 fixtures
(tests/test_extract.py); never change it without regenerating goldens
deliberately.

EXTRACTION SPEC (normative)
---------------------------
1. Charset: scan the first 2048 bytes (ASCII-decoded, lossy) for
   ``charset=XXX`` (case-insensitive, optional quotes). Accepted:
   utf-8, iso-8859-1/latin-1, us-ascii, windows-1252. Anything else or
   nothing → utf-8. Decode with errors='replace'.
2. Drop ``<script>``/``<style>`` subtrees and all comments/processing
   instructions entirely.
3. Block boundaries: opening OR closing any of
   {title, h1..h6, p, div, li, ul, ol, table, tr, blockquote, pre, section,
   article, header, footer} flushes the pending inline buffer as one chunk;
   ``<br>`` also flushes. Inline tags (a, b, i, em, strong, span, code, …)
   do not break the chunk.
4. Character references are decoded (convert_charrefs=True).
5. Within a chunk, all whitespace runs collapse to a single ASCII space and
   the chunk is stripped; empty chunks are dropped.
6. Output = chunks joined by "\\n\\n". Output is a str; the byte-identity
   contract is over its UTF-8 encoding.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_BLOCK_TAGS = frozenset(
    "title h1 h2 h3 h4 h5 h6 p div li ul ol table tr blockquote pre "
    "section article header footer".split()
)
_SKIP_TAGS = frozenset(("script", "style"))
_WS_RE = re.compile(r"\s+")
_CHARSET_RE = re.compile(r"charset\s*=\s*['\"]?\s*([A-Za-z0-9_\-]+)", re.IGNORECASE)
_CHARSET_ALIASES = {
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "iso-8859-1": "iso-8859-1",
    "iso8859-1": "iso-8859-1",
    "latin-1": "iso-8859-1",
    "latin1": "iso-8859-1",
    "us-ascii": "ascii",
    "ascii": "ascii",
    "windows-1252": "cp1252",
    "cp1252": "cp1252",
}


def sniff_charset(raw: bytes) -> str:
    head = raw[:2048].decode("ascii", errors="replace")
    m = _CHARSET_RE.search(head)
    if m:
        return _CHARSET_ALIASES.get(m.group(1).lower(), "utf-8")
    return "utf-8"


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self._buf: list[str] = []
        self._skip_depth = 0

    def _flush(self) -> None:
        if not self._buf:
            return
        text = _WS_RE.sub(" ", "".join(self._buf)).strip()
        self._buf = []
        if text:
            self.chunks.append(text)

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag in _BLOCK_TAGS or tag == "br":
            self._flush()

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in _BLOCK_TAGS or tag == "br":
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            if self._skip_depth > 0:
                self._skip_depth -= 1
            return
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0 and data:
            self._buf.append(data)


def extract_text(raw: bytes) -> str:
    """bytes → extracted text per the spec above. Pure, deterministic."""
    charset = sniff_charset(raw)
    try:
        html = raw.decode(charset, errors="replace")
    except LookupError:  # pragma: no cover - alias table prevents this
        html = raw.decode("utf-8", errors="replace")
    p = _TextExtractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        # html.parser is tolerant; a hard failure still must be deterministic:
        # fall back to whatever chunks were recovered before the error.
        pass
    p._flush()
    return "\n\n".join(p.chunks)
