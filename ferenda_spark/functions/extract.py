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
        # " ".join(split()) ≡ _WS_RE.sub(" ", s).strip() — the \s set and the
        # str.split() whitespace set are identical over all of Unicode
        # (verified exhaustively, 0x0..0x10FFFF) and split() is ~4× faster.
        text = " ".join("".join(self._buf).split())
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


# ---------------------------------------------------------------------------
# Fast path: a regex tokenizer emitting the SAME event stream as
# ``html.parser`` for a conservatively-defined well-formed subset of HTML,
# falling back to the stdlib parser (the normative implementation of the
# spec) the moment anything outside that subset appears. Equivalence is
# enforced by differential tests: every golden corpus doc plus a hypothesis
# fuzz sweep must produce byte-identical output from both paths
# (tests/test_extract.py). Motivation: html.parser is ~75% of parse-stage
# wall time; this tokenizer is ~4× faster and parse throughput (triples/sec)
# is the headline metric.
# ---------------------------------------------------------------------------

from html import unescape as _unescape

# attribute-free tag — the overwhelmingly common case, matched first
_PLAIN_TAG_RE = re.compile(r"<([a-zA-Z][a-zA-Z0-9]*)(/?)>")
# strict start tag: alnum name, conventional attributes, optional />
_FAST_TAG_RE = re.compile(
    r"<([a-zA-Z][a-zA-Z0-9]*)"
    r"((?:\s+[a-zA-Z_:][-a-zA-Z0-9_:.]*"
    r"(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|[^\s\"'=<>`]+))?"
    r")*)\s*(/?)>"
)
_FAST_ENDTAG_RE = re.compile(r"</([a-zA-Z][a-zA-Z0-9]*)\s*>")
# stdlib closes comments on '--\s*>' (_markupbase._commentclose)
_COMMENT_CLOSE_RE = re.compile(r"--\s*>")
_CDATA_END_RE = {
    t: re.compile(r"</\s*%s" % t, re.IGNORECASE) for t in ("script", "style")
}
# full endtag as stdlib endtagfind (used when leaving cdata mode)
_ENDTAG_FULL_RE = re.compile(r"</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>")


def _fast_scan(html: str, ex: _TextExtractor) -> bool:
    """Produce on ``ex`` the same end state ``ex.feed(html)`` would,
    restricted to the verified subset. Returns False when the input leaves
    the subset — caller must rerun on a fresh extractor via stdlib.

    The handler effects of ``_TextExtractor`` are INLINED here (buffering,
    block flushes, script/style skipping) — ~2× fewer Python calls than
    dispatching handle_* per event, and this loop is the single hottest
    code in the parse stage. Invariant exploited: ``_skip_depth > 0`` ⟺
    cdata mode (skip is only ever entered via a <script>/<style> start tag,
    whose raw content produces no further tag events), so "drop data while
    skipping" becomes "never append while cdata is set". Equivalence with
    the stdlib event stream is enforced by the differential tests in
    tests/test_extract.py (adversarial + corpus + hypothesis fuzz)."""
    i, n = 0, len(html)
    cdata: str | None = None
    find = html.find
    startswith = html.startswith
    chunks_append = ex.chunks.append
    buf = ex._buf
    buf_append = buf.append

    def _fl() -> None:
        if buf:
            # " ".join(split()) ≡ collapse \s runs + strip (see _flush)
            text = " ".join("".join(buf).split())
            del buf[:]
            if text:
                chunks_append(text)

    while i < n:
        if cdata is not None:
            m = _CDATA_END_RE[cdata].search(html, i)
            if m is None:
                # unterminated script/style: stdlib drops the tail
                ex._skip_depth = 1
                return True
            em = _ENDTAG_FULL_RE.match(html, m.start())
            if em is None or em.group(1).lower() != cdata:
                return False
            cdata = None
            i = em.end()
            continue
        j = find("<", i)
        if j < 0:
            seg = html[i:]
            buf_append(_unescape(seg) if "&" in seg else seg)
            return True
        if i < j:
            seg = html[i:j]
            buf_append(_unescape(seg) if "&" in seg else seg)
        i = j
        c = html[i + 1] if i + 1 < n else ""
        if c.isascii() and c.isalpha():
            # string-slice fast path for the dominant cases: '<name>' and
            # '<name/>' (no attributes) — avoids the regex machinery
            k = find(">", i + 1)
            if k < 0:
                return False
            name = html[i + 1 : k]
            selfclose = name.endswith("/")
            if selfclose:
                name = name[:-1]
            if name.isascii() and name.isalnum():
                tag = name.lower()
                i = k + 1
            else:
                m = _FAST_TAG_RE.match(html, i)
                if m is None:
                    return False
                tag = m.group(1).lower()
                selfclose = bool(m.group(3))
                i = m.end()
            if selfclose:
                if tag in _BLOCK_TAGS or tag == "br":  # handle_startendtag
                    _fl()
            elif tag in _SKIP_TAGS:  # handle_starttag
                cdata = tag
            elif tag in _BLOCK_TAGS or tag == "br":
                _fl()
        elif c == "/":
            k = find(">", i + 2)
            if k < 0:
                return False
            name = html[i + 2 : k]
            # str.rstrip()'s whitespace set equals regex \s (verified
            # exhaustively — see _flush), so this mirrors _FAST_ENDTAG_RE
            stripped = name.rstrip()
            if (
                stripped
                and stripped[0].isascii()
                and stripped[0].isalpha()
                and stripped.isascii()
                and stripped.isalnum()
            ):
                tag = stripped.lower()
                i = k + 1
            else:
                m = _FAST_ENDTAG_RE.match(html, i)
                if m is None:
                    return False
                tag = m.group(1).lower()
                i = m.end()
            # handle_endtag: skip-tag close is a no-op outside cdata
            if tag in _BLOCK_TAGS:
                _fl()
        elif startswith("<!--", i):
            m = _COMMENT_CLOSE_RE.search(html, i + 4)
            if m is None:
                return False
            i = m.end()
        elif c == "?":
            k = find(">", i + 2)
            if k < 0:
                return False
            i = k + 1
        elif c == "!":
            return False  # declarations/doctype/marked sections: stdlib path
        else:
            # bare '<' (including a lone one at EOF): stdlib emits it as data
            buf_append("<")
            i += 1
    return True


def _extract_stdlib(html: str) -> str:
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


def _decode(raw: bytes) -> str:
    charset = sniff_charset(raw)
    try:
        return raw.decode(charset, errors="replace")
    except LookupError:  # pragma: no cover - alias table prevents this
        return raw.decode("utf-8", errors="replace")


def extract_text(raw: bytes) -> str:
    """bytes → extracted text per the spec above. Pure, deterministic."""
    html = _decode(raw)
    p = _TextExtractor()
    try:
        ok = _fast_scan(html, p)
    except Exception:  # pragma: no cover - belt and braces
        ok = False
    if not ok:
        return _extract_stdlib(html)
    p._flush()
    return "\n\n".join(p.chunks)
