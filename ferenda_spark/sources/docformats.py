"""PDF / Word document sources (SURVEY §2.1 S4 PDFReader, S5 WordReader).

Reference analogs: ``PDFReader`` parses PDF page streams into text elements
([ref: ferenda/pdfreader.py :: PDFReader]) and ``WordReader`` converts
.doc/.docx into an XML the parse stage consumes
([ref: ferenda/wordreader.py :: WordReader]). Both reference readers shell
out to external tools (pdftotext / antiword / soffice); this module is the
Spark-native restatement with PURE-STDLIB decoders, so the ingest runs
inside executors with zero external processes:

- **DOCX (real)**: a .docx file is a zip of XML — ``zipfile`` +
  ``xml.etree`` extract ``word/document.xml`` paragraphs with their
  heading levels. ``read_documents`` keeps the flat (style, text)
  paragraphs; ``read_documents_parsed`` drives the styled FSM grammar
  (operators/fsm.parse_styled_structure — Heading1/2/3 →
  Section/Subsection with synthesized ordinal_path) so DOCX corpora get
  the same nested doc_struct + isPartOf/type/title triples as HTML.
- **PDF (real, common subset)**: text is pulled from page content streams
  — Flate-compressed (zlib, stdlib) or plain — by scanning BT/ET text
  blocks for ``Tj``/``TJ``/``'`` show operators with PDF string-literal
  unescaping. This covers the dominant "digitally-born simple text PDF"
  class; encrypted, CID-keyed, or exotic-filter PDFs yield an
  errors-as-data row (``doc_error``), the same convention as
  ``warc_error`` rows in sources/warc.py — ingest loss is counted, never
  thrown.

Scale design: ``spark.read.format("binaryFile")`` (one row per file,
parallelism = file count, same as sources/warc.py) → one ``mapInPandas``
decode pass; output is the corpus-ish table ``(url, kind, title, text,
n_parts, doc_error)`` so the downstream stages see the same shape as the
HTML corpus. Decoding is per-document independent — map-only, no shuffle.
"""

from __future__ import annotations

import io
import re
import zipfile
import zlib
from collections.abc import Iterator
from xml.etree import ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_W_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"

DOC_SCHEMA = (
    "url string, kind string, title string, text string, "
    "n_parts int, doc_error string"
)


# ------------------------------------------------------------------- docx


def parse_docx_bytes(blob: bytes) -> dict:
    """.docx bytes → {title, paras: [(style, text)], error}.

    Paragraph style comes from ``w:pStyle`` (e.g. Heading1/Heading2);
    ``title`` is the first Heading1/Title paragraph, else ''."""
    try:
        with zipfile.ZipFile(io.BytesIO(blob)) as z:
            xml = z.read("word/document.xml")
    except (zipfile.BadZipFile, KeyError, OSError) as e:
        return {"title": "", "paras": [], "error": f"not a docx: {e}"}
    try:
        root = ET.fromstring(xml)
    except ET.ParseError as e:
        return {"title": "", "paras": [], "error": f"bad document.xml: {e}"}
    paras: list[tuple[str, str]] = []
    title = ""
    for p in root.iter(f"{_W_NS}p"):
        style_el = p.find(f"{_W_NS}pPr/{_W_NS}pStyle")
        style = style_el.get(f"{_W_NS}val", "") if style_el is not None else ""
        text = "".join(t.text or "" for t in p.iter(f"{_W_NS}t"))
        if not text:
            continue
        paras.append((style, text))
        if not title and style in ("Title", "Heading1"):
            title = text
    return {"title": title, "paras": paras, "error": None}


# -------------------------------------------------------------------- pdf

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)\r?\nendstream", re.S)
# string show operators inside BT/ET: (…) Tj, (…) ', [ (…) -n (…) ] TJ
_BT_RE = re.compile(rb"BT(.*?)ET", re.S)
_SHOW_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)\s*(?:Tj|')|\[(?:[^\]\\]|\\.)*?\]\s*TJ", re.S)
_LIT_RE = re.compile(rb"\((?:[^()\\]|\\.)*\)", re.S)
_TD_RE = re.compile(rb"(?:Td|TD|T\*)")

_ESC = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape_pdf_literal(lit: bytes) -> bytes:
    body = lit[1:-1]
    out = bytearray()
    i = 0
    while i < len(body):
        c = body[i : i + 1]
        if c == b"\\" and i + 1 < len(body):
            nxt = body[i + 1 : i + 2]
            if nxt.isdigit():  # octal escape \ddd (1-3 digits)
                j = i + 1
                while j < min(i + 4, len(body)) and body[j : j + 1].isdigit():
                    j += 1
                out.append(int(body[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            out += _ESC.get(nxt, nxt)
            i += 2
            continue
        out += c
        i += 1
    return bytes(out)


def parse_pdf_bytes(blob: bytes) -> dict:
    """PDF bytes → {pages: [page_text], error}.

    Decodes Flate/plain content streams and concatenates Tj/'/TJ string
    shows inside BT/ET blocks (a Td/TD/T* line move becomes '\\n', adjacent
    shows a space). Streams that fail to inflate or contain no text ops are
    skipped; a PDF yielding zero text returns an errors-as-data row."""
    if not blob.startswith(b"%PDF-"):
        return {"pages": [], "error": "not a pdf (no %PDF- header)"}
    if b"/Encrypt" in blob[:2048] or b"/Encrypt" in blob[-2048:]:
        return {"pages": [], "error": "encrypted pdf unsupported"}
    pages: list[str] = []
    for m in _STREAM_RE.finditer(blob):
        hdr, data = m.group(1), m.group(2)
        if b"/FlateDecode" in hdr:
            try:
                data = zlib.decompress(data)
            except zlib.error:
                continue
        elif b"/Filter" in hdr:
            continue  # unsupported filter — skip, count via zero-text check
        chunks: list[str] = []
        for bt in _BT_RE.finditer(data):
            block = bt.group(1)
            # interleave text shows and line moves in operator order;
            # (pos, prio, text) so a '-operator's implied line move sorts
            # before its own shown text at the same position
            events: list[tuple[int, int, str]] = []
            lit_spans: list[tuple[int, int]] = []
            for sm in _SHOW_RE.finditer(block):
                lits = _LIT_RE.findall(sm.group(0))
                s = b"".join(_unescape_pdf_literal(x) for x in lits)
                if sm.group(0).rstrip().endswith(b"'"):
                    # ' = move-to-next-line-and-show (PDF 32000 9.4.3)
                    events.append((sm.start(), 0, "\n"))
                events.append((sm.start(), 1, s.decode("latin-1")))
                lit_spans.append((sm.start(), sm.end()))
            # a 'Td'/'TD'/'T*' byte sequence INSIDE a string literal is
            # shown text (e.g. "(Limited TD Holdings) Tj"), not a line
            # move — only count operator matches outside the show spans
            for tm in _TD_RE.finditer(block):
                p = tm.start()
                if not any(lo <= p < hi for lo, hi in lit_spans):
                    events.append((p, 0, "\n"))
            events.sort()
            text = "".join(t for _, _, t in events)
            if text.strip():
                chunks.append(text)
        if chunks:
            pages.append("\n".join(chunks))
    if not pages:
        return {"pages": [], "error": "no extractable text streams"}
    return {"pages": pages, "error": None}


# ----------------------------------------------------------- spark facing


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for path, blob in zip(pdf["path"], pdf["content"]):
            b = bytes(blob)
            low = path.lower()
            if low.endswith(".docx"):
                d = parse_docx_bytes(b)
                text = "\n\n".join(t for _, t in d["paras"])
                rows.append(
                    dict(url=path, kind="docx", title=d["title"], text=text,
                         n_parts=len(d["paras"]), doc_error=d["error"])
                )
            elif low.endswith(".pdf"):
                d = parse_pdf_bytes(b)
                text = "\n\n".join(d["pages"])
                rows.append(
                    dict(url=path, kind="pdf", title="", text=text,
                         n_parts=len(d["pages"]), doc_error=d["error"])
                )
            else:  # legacy .doc (OLE container) — needs antiword-class codec
                rows.append(
                    dict(url=path, kind="doc", title="", text="",
                         n_parts=0,
                         doc_error="legacy .doc unsupported (no OLE codec)")
                )
        yield pd.DataFrame(rows) if rows else pd.DataFrame(
            columns=["url", "kind", "title", "text", "n_parts", "doc_error"]
        )


def read_documents(spark: SparkSession, path: str) -> DataFrame:
    """Directory/glob of .pdf/.docx/.doc files → (url, kind, title, text,
    n_parts, doc_error) rows. Parallelism = file count (binaryFile source,
    same ingest shape as read_warc); decode is map-only."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.{pdf,docx,doc}")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "content")
    )
    return files.mapInPandas(_decode_batches, schema=DOC_SCHEMA)


# ------------------------------------------------- structured (FSM) ingest


def _structured_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib

    from ferenda_spark.operators.fsm import parse_styled_structure
    from ferenda_spark.operators.parse import doc_row_from_ctx

    for pdf in batches:
        rows = []
        for path, blob, mtime, pk in zip(
            pdf["path"], pdf["content"], pdf["modificationTime"], pdf["part_key"]
        ):
            b = bytes(blob)
            low = path.lower()
            if low.endswith(".docx"):
                d = parse_docx_bytes(b)
                if d["error"] is not None:
                    continue  # read_documents is the errors-as-data surface
                ctx = parse_styled_structure(d["paras"])
                text = "\n\n".join(t for _, t in d["paras"])
            elif low.endswith(".pdf"):
                d = parse_pdf_bytes(b)
                if d["error"] is not None:
                    continue
                # PDFs carry no styles; the page is the structural unit
                # (the reference's PDFReader yields page-structured docs) —
                # one section per page, paragraphs split on blank lines
                ctx = {
                    "title": "",
                    "sections": [
                        {
                            "ordinal": i + 1,
                            "ordinal_path": str(i + 1),
                            "title": f"Page {i + 1}",
                            "paras": [
                                {"idx": j, "text": t}
                                for j, t in enumerate(
                                    c for c in page.split("\n\n") if c.strip()
                                )
                            ],
                        }
                        for i, page in enumerate(d["pages"])
                    ],
                }
                text = "\n\n".join(d["pages"])
            else:
                continue
            sha = hashlib.sha256(text.encode("utf-8")).hexdigest()
            rows.append(
                doc_row_from_ctx(
                    path, pd.Timestamp(mtime), "und", int(pk), ctx, sha
                )
            )
        yield pd.DataFrame(rows) if rows else pd.DataFrame(
            columns=[
                "kind", "url", "part_key", "title", "lang", "issued",
                "text_sha256", "n_sections", "n_paras", "sections",
                "triples", "mentions", "m_partition_id", "m_n_in",
                "m_n_triples", "m_bytes_in", "m_wall_ms",
            ]
        )


def read_documents_parsed(
    spark: SparkSession, path: str, n_parts: int = 64
) -> DataFrame:
    """Structured DOCX/PDF ingest: heading styles drive the styled FSM
    grammar (operators/fsm.parse_styled_structure), so Word corpora get the
    SAME nested doc_struct (ordinal_path) + structure triples (rdf:type /
    isPartOf / titles) + citation refs + entity mentions as the HTML parse
    stage — drop the result straight into assemble_triples / the rollups.
    PDFs structure per page. Undecodable files are SKIPPED here; run
    ``read_documents`` over the same directory for the errors-as-data
    accounting rows. Map-only (binaryFile → one mapInPandas), parallelism =
    file count; ``issued`` is the file modification time (Word/PDF bytes
    carry no crawl timestamp)."""
    from ferenda_spark.schemas import PARSED

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.{pdf,docx,doc}")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select(
            "path", "content", "modificationTime",
            # per-FILE hash spread (file corpora have no crawl domain to
            # co-locate on — the webpage part_key_col hashes the domain)
            F.pmod(F.xxhash64("path"), F.lit(n_parts)).cast("int").alias(
                "part_key"
            ),
        )
    )
    parsed = files.mapInPandas(_structured_batches, schema=PARSED)
    return parsed.filter(F.col("kind") == "doc").drop(
        "kind", *[c for c in parsed.columns if c.startswith("m_")]
    )
