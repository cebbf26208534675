"""Structured-data extraction from web pages: JSON-LD + HTML microdata
→ (subj, pred, obj) triples.

This is the schema.org harvest every web-scale KG-construction pipeline
runs over Common-Crawl-style HTML (the reference's parse stage recovers
structure from prose; real web pages ALSO carry machine-readable graphs
embedded by publishers — both feed the same triple store). Public specs:
W3C JSON-LD 1.1 (we implement the pragmatic flattening subset below) and
WHATWG HTML microdata.

Subset implemented (documented, deterministic):

* JSON-LD: every ``<script type="application/ld+json">`` block is parsed
  with stdlib ``json``; parse failures emit nothing (errors-as-absence —
  corrupt publisher markup must never kill a partition). A node is a JSON
  object; its id is ``@id`` if present else a fresh document-local blank
  node ``_:b<n>`` (counter in document order, so output is deterministic
  and partitioning-independent). ``@type`` (string or list) emits
  rdf:type triples. A string ``@context`` value is treated as a vocabulary
  base: bare term keys/types (no ``:`` and no ``://``) expand against it
  (``https://schema.org`` + ``name`` → ``https://schema.org/name``).
  Scalar values → literal triples (ints/floats via ``str``, bools →
  ``true``/``false``); ``{"@value": v}`` objects → literal; nested objects
  → edge to the child id + recursion; arrays → one triple per element in
  order; ``@graph`` → iterate nodes. Other ``@``-keywords are ignored.

* Microdata: ``itemscope`` opens a node (``itemid`` or fresh blank);
  ``itemtype`` emits rdf:type. ``itemprop`` on the same tag links the
  child node into the enclosing scope; ``itemprop`` without ``itemscope``
  takes its value from ``content``, from ``href``/``src`` on a/area/link/
  img/audio/video/source/embed/iframe, else the element's text content
  (nested text included, per spec's textContent). Bare prop names expand
  against the enclosing scope's itemtype base (``…/WebPage`` → ``…/``).
  Space-separated multi-props emit one triple each.

Scale shape: one vectorized pandas UDF over the html column (Arrow
batches), explode — map-only, zero shuffle; the html column is read once
and never leaves the executor. Blank-node ids are DOCUMENT-local (RDF
blank scoping): downstream cross-doc joins must key on (src, subj).
"""

from __future__ import annotations

import json
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

# tags that never take a closing tag — popping on these would desync the
# microdata scope stack
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
_URL_ATTR = {
    "a": "href", "area": "href", "link": "href", "img": "src",
    "audio": "src", "video": "src", "source": "src", "embed": "src",
    "iframe": "src",
}


def _expand(term: str, vocab: str | None) -> str:
    """Bare term → vocab-expanded IRI; terms with a scheme/prefix pass
    through unchanged."""
    if not vocab or ":" in term:
        return term
    if vocab.endswith(("/", "#")):
        return vocab + term
    return vocab + "/" + term


def _literal(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


class _Extractor(HTMLParser):
    """One linear pass: collects JSON-LD script bodies AND walks the
    microdata scope stack. Triples are appended in document order."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.triples: list[tuple[str, str, str]] = []
        self._blank = 0
        # each open element: [tag, scope_id|None, prop_capture|None]
        # prop_capture = (subj, [expanded prop names], text buffer list)
        self._stack: list[list] = []
        self._scope_ids: list[str] = []   # enclosing itemscope ids
        self._scope_vocab: list[str | None] = []  # their itemtype bases
        self._in_ldjson = False
        self._ld_buf: list[str] = []

    # ---------------------------------------------------------- blanks
    def _fresh(self) -> str:
        b = f"_:b{self._blank}"
        self._blank += 1
        return b

    # ---------------------------------------------------------- JSON-LD
    def _emit_node(self, node: dict, vocab: str | None) -> str | None:
        if not isinstance(node, dict):
            return None
        ctx = node.get("@context")
        if isinstance(ctx, str):
            vocab = ctx
        if "@value" in node:  # value object, handled by caller
            return None
        if "@graph" in node and isinstance(node["@graph"], list):
            for sub in node["@graph"]:
                if isinstance(sub, dict):
                    self._emit_node(sub, vocab)
            if "@id" not in node and len(node) <= 2:  # pure graph wrapper
                return None
        nid = node.get("@id")
        if not isinstance(nid, str):
            nid = self._fresh()
        types = node.get("@type")
        if isinstance(types, str):
            types = [types]
        if isinstance(types, list):
            for t in types:
                if isinstance(t, str):
                    self.triples.append((nid, RDF_TYPE, _expand(t, vocab)))
        for k, v in node.items():
            if k.startswith("@"):
                continue
            pred = _expand(k, vocab)
            for item in v if isinstance(v, list) else [v]:
                if isinstance(item, dict):
                    if "@value" in item:
                        self.triples.append(
                            (nid, pred, _literal(item["@value"]))
                        )
                    else:
                        cid = self._emit_node(item, vocab)
                        if cid is not None:
                            self.triples.append((nid, pred, cid))
                elif isinstance(item, (str, int, float, bool)):
                    self.triples.append((nid, pred, _literal(item)))
        return nid

    def _flush_ldjson(self) -> None:
        raw = "".join(self._ld_buf)
        self._ld_buf = []
        try:
            data = json.loads(raw)
        except Exception:
            return
        for node in data if isinstance(data, list) else [data]:
            if isinstance(node, dict):
                self._emit_node(node, None)

    # --------------------------------------------------------- microdata
    def handle_starttag(self, tag, attrs):
        a = dict(attrs)
        if tag == "script":
            if (a.get("type") or "").strip().lower() == "application/ld+json":
                self._in_ldjson = True
            return
        scope_id = None
        capture = None
        props = a.get("itemprop")
        vocab = self._scope_vocab[-1] if self._scope_vocab else None
        expanded = (
            [_expand(p, vocab) for p in props.split()] if props else []
        )
        parent = self._scope_ids[-1] if self._scope_ids else None
        if "itemscope" in a:
            scope_id = a.get("itemid") or self._fresh()
            itype = a.get("itemtype")
            new_vocab = None
            if itype:
                for t in itype.split():
                    self.triples.append((scope_id, RDF_TYPE, t))
                base = itype.split()[0].rsplit("/", 1)
                new_vocab = base[0] + "/" if len(base) == 2 else None
            if expanded and parent is not None:
                for p in expanded:
                    self.triples.append((parent, p, scope_id))
            self._scope_ids.append(scope_id)
            self._scope_vocab.append(new_vocab)
        elif expanded and parent is not None:
            url_attr = _URL_ATTR.get(tag)
            if "content" in a:
                for p in expanded:
                    self.triples.append((parent, p, a["content"] or ""))
            elif url_attr and a.get(url_attr) is not None:
                for p in expanded:
                    self.triples.append((parent, p, a[url_attr]))
            else:
                capture = (parent, expanded, [])
        if tag not in _VOID:
            self._stack.append([tag, scope_id, capture])

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag not in _VOID:
            self.handle_endtag(tag)

    def handle_endtag(self, tag):
        if tag == "script":
            if self._in_ldjson:
                self._in_ldjson = False
                self._flush_ldjson()
            return
        # pop to the matching open tag (tolerate publisher tag soup)
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i][0] == tag:
                for _t, scope_id, capture in reversed(self._stack[i:]):
                    if capture is not None:
                        subj, preds, buf = capture
                        text = " ".join("".join(buf).split())
                        for p in preds:
                            self.triples.append((subj, p, text))
                    if scope_id is not None:
                        self._scope_ids.pop()
                        self._scope_vocab.pop()
                del self._stack[i:]
                return

    def handle_data(self, data):
        if self._in_ldjson:
            self._ld_buf.append(data)
            return
        for frame in self._stack:
            if frame[2] is not None:
                frame[2][2].append(data)


def extract_structured(html) -> list[tuple[str, str, str]]:
    """html (str or bytes) → [(subj, pred, obj)] in document order.
    Never raises on malformed input: tag soup and bad JSON emit what can
    be salvaged (possibly nothing)."""
    if html is None:
        return []
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    ex = _Extractor()
    try:
        ex.feed(html)
        ex.close()
    except Exception:
        pass  # keep whatever was emitted before the parser gave up
    # close any still-open captures/scopes at EOF (unclosed tag soup)
    for _t, scope_id, capture in reversed(ex._stack):
        if capture is not None:
            subj, preds, buf = capture
            text = " ".join("".join(buf).split())
            for p in preds:
                ex.triples.append((subj, p, text))
    return ex.triples


_TRIPLES_SCHEMA = "array<struct<subj:string,pred:string,obj:string>>"


def structured_triples(
    docs: DataFrame, html_col: str = "html", src_col: str = "url"
) -> DataFrame:
    """(src, subj, pred, obj) — one row per extracted triple. Map-only:
    one Arrow-batched pandas UDF + explode, zero shuffle; blank-node ids
    are document-local so src is part of the key."""

    @pandas_udf(_TRIPLES_SCHEMA)
    def _ex(htmls: pd.Series) -> pd.Series:
        return htmls.map(extract_structured)

    return (
        docs.select(
            F.col(src_col).alias("src"), _ex(F.col(html_col)).alias("_t")
        )
        .select("src", F.explode("_t").alias("t"))
        .select("src", "t.subj", "t.pred", "t.obj")
    )


def structured_as_triples(st: DataFrame, n_parts: int = 64) -> DataFrame:
    """Adapt the harvest (src, subj, pred, obj) to the TRIPLES schema so
    publisher-asserted graphs can feed the enrichment stage (owl:sameAs
    canonicalization / RDFS inference / validation) alongside grammar
    triples. URI-ness is recovered heuristically — the harvest keeps no
    node/literal flag: an object is a URI iff it starts with a scheme
    (``foo:``-style, RFC 3986) or a blank-node prefix ``_:``. That is
    exact for the values that matter to enrichment (sameAs targets and
    type/class URIs are always schemed); a literal that happens to start
    with a scheme pattern would be mis-flagged, which costs nothing worse
    than a failed join. Provenance: src_url = the harvesting page,
    part_key = its domain hash (same layout as grammar triples)."""
    from ferenda_spark.functions.uris import part_key_col

    is_uri = F.col("obj").rlike(r"^([a-z][a-z0-9+.-]*:|_:)")
    return st.select(
        "subj",
        "pred",
        "obj",
        is_uri.alias("obj_is_uri"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit(None).cast("string").alias("obj_dtype"),
        F.col("src").alias("src_url"),
        part_key_col(F.col("src"), n_parts).alias("part_key"),
    )
