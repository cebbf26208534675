"""WARC source: Common-Crawl-style archives → the corpus table.

Reference analog: the download stage fetches pages one HTTP GET at a time
into ``downloaded/`` files ([ref: ferenda/documentrepository.py ::
download_single, download_if_needed]). At web scale the corpus arrives
instead as WARC archives (the Common Crawl distribution format — the
north_star's "Common-Crawl-style web pages"); this module turns a
directory of ``.warc`` / ``.warc.gz`` files into the input_hint corpus
schema ``(url, warc_ts, html:binary, text, lang)``.

Design:

- ``spark.read.format("binaryFile")`` — one row per archive file. This is
  the right granularity: Common Crawl ships ~1 GB WARCs, thousands per
  crawl, so parallelism = number of files and each task streams one
  archive; no byte-range splitting is attempted (gzip members are not
  seekable without an index).
- record parsing runs in ``mapInPandas`` (the S1 ingest UDF slot): a
  strict sequential WARC parser — header block to CRLFCRLF, declared
  Content-Length body, record separator — keeping only ``response``
  records; the HTTP envelope is stripped so ``html`` is the raw payload.
- malformed tails are truncated, not fatal: a crawl archive with a
  corrupted record yields the records before it plus a ``warc_error`` row
  (url = file path) so lineage can count ingest losses — same
  error-as-data convention as patch_error rows in operators/patches.py.
- ``text``/``lang`` are left NULL — the extract stage owns them; WARC
  ingest is IO, not parsing.
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

_CORPUS_OUT = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "warc_error string"
)


def _decompress(name: str, blob: bytes) -> bytes:
    if name.endswith(".gz"):
        # Common Crawl WARCs are concatenated gzip members (one per record);
        # GzipFile iterates members, unlike gzip.decompress
        with gzip.GzipFile(fileobj=io.BytesIO(blob)) as f:
            return f.read()
    return blob


def parse_warc_bytes(
    raw: bytes, source: str, keep_types: tuple[str, ...] = ("response",)
) -> Iterator[dict]:
    """Strict sequential parse of one WARC archive. Yields dicts in the
    corpus schema; a structural error yields one final warc_error dict."""
    pos = 0
    n = len(raw)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and raw[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        if not raw.startswith(b"WARC/", pos):
            yield {
                "url": source,
                "warc_ts": None,
                "html": None,
                "text": None,
                "lang": None,
                "warc_error": f"bad record marker at byte {pos}",
            }
            return
        hdr_end = raw.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            yield {
                "url": source, "warc_ts": None, "html": None, "text": None,
                "lang": None, "warc_error": "truncated header block",
            }
            return
        # Fold RFC continuation lines (leading SP/HT continues the previous
        # header value — allowed by the WARC/HTTP header grammar) BEFORE
        # partitioning on ':', else a folded warc-target-uri/content-length
        # splits into bogus keys and a spurious truncation error.
        lines: list[bytes] = []
        for line in raw[pos:hdr_end].split(b"\r\n")[1:]:
            if line[:1] in (b" ", b"\t") and lines:
                lines[-1] += b" " + line.strip()
            else:
                lines.append(line)
        headers: dict[str, str] = {}
        for line in lines:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = (
                v.strip().decode("latin-1")
            )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            yield {
                "url": source, "warc_ts": None, "html": None, "text": None,
                "lang": None, "warc_error": "missing Content-Length",
            }
            return
        if length < 0:
            # a negative length would move pos BACKWARDS — a crafted or
            # corrupt record must not be able to loop the parser forever
            yield {
                "url": source, "warc_ts": None, "html": None, "text": None,
                "lang": None, "warc_error": "negative Content-Length",
            }
            return
        body_start = hdr_end + 4
        body_end = body_start + length
        if body_end > n:
            yield {
                "url": source, "warc_ts": None, "html": None, "text": None,
                "lang": None, "warc_error": "truncated record body",
            }
            return
        if headers.get("warc-type") in keep_types:
            body = raw[body_start:body_end]
            # strip the HTTP envelope when present (response records carry
            # status line + headers + payload)
            if body.startswith(b"HTTP/"):
                http_end = body.find(b"\r\n\r\n")
                payload = body[http_end + 4 :] if http_end >= 0 else b""
            else:
                payload = body
            ts = None
            wd = headers.get("warc-date")
            if wd:
                try:
                    ts = datetime.fromisoformat(wd.replace("Z", "+00:00"))
                    if ts.tzinfo is not None:
                        ts = ts.astimezone(timezone.utc).replace(tzinfo=None)
                except ValueError:
                    ts = None
            yield {
                "url": headers.get("warc-target-uri"),
                "warc_ts": ts,
                "html": payload,
                "text": None,
                "lang": None,
                "warc_error": None,
            }
        pos = body_end


def read_warc(
    spark: SparkSession, path: str,
    keep_types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """Directory (or glob) of .warc/.warc.gz files → corpus-schema frame
    plus a ``warc_error`` column (NULL on good rows). Drop the error column
    after routing errors to lineage to get the exact input_hint schema."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: list[dict] = []
            for name, blob in zip(pdf["path"], pdf["content"]):
                try:
                    raw = _decompress(name, bytes(blob))
                except OSError as exc:
                    out.append({
                        "url": name, "warc_ts": None, "html": None,
                        "text": None, "lang": None,
                        "warc_error": f"bad gzip: {exc}",
                    })
                    continue
                out.extend(parse_warc_bytes(raw, name, keep_types))
            yield pd.DataFrame(
                out,
                columns=[
                    "url", "warc_ts", "html", "text", "lang", "warc_error",
                ],
            )

    files = spark.read.format("binaryFile").load(path)
    return files.select("path", "content").mapInPandas(
        batches, schema=_CORPUS_OUT
    )


def read_warc_ranges(spark: SparkSession, plan: DataFrame, warc_dir: str) -> DataFrame:
    """Range-read archives per a CDX fetch plan (sources/cdx.py): one task
    per (WARC file, range batch) seeks each record's byte offset, reads
    exactly its length, and parses that single record — the 100 TB read
    path where you touch only the bytes the index selected instead of
    scanning archives.

    ``plan`` is cdx_fetch_plan's output (warc_filename, …, ranges). Ranges
    are offset-sorted per file, so reads are forward-only within a task.
    Per-record gzip members (the Common Crawl layout) decompress
    independently; a range that fails to parse yields a warc_error row
    keyed by ``file#offset`` — errors-as-data, same as the full reader."""
    import os

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: list[dict] = []
            for fname, ranges in zip(pdf["warc_filename"], pdf["ranges"]):
                full = os.path.join(warc_dir, fname)
                try:
                    f = open(full, "rb")
                except OSError as exc:
                    out.append({
                        "url": fname, "warc_ts": None, "html": None,
                        "text": None, "lang": None,
                        "warc_error": f"missing archive: {exc}",
                    })
                    continue
                with f:
                    for r in ranges:
                        f.seek(int(r["offset"]))
                        blob = f.read(int(r["length"]))
                        try:
                            raw = _decompress(fname, blob)
                        except OSError as exc:
                            out.append({
                                "url": f"{fname}#{r['offset']}",
                                "warc_ts": None, "html": None, "text": None,
                                "lang": None,
                                "warc_error": f"bad gzip member: {exc}",
                            })
                            continue
                        out.extend(
                            parse_warc_bytes(raw, f"{fname}#{r['offset']}")
                        )
            yield pd.DataFrame(
                out,
                columns=[
                    "url", "warc_ts", "html", "text", "lang", "warc_error",
                ],
            )

    return plan.select("warc_filename", "ranges").mapInPandas(
        batches, schema=_CORPUS_OUT
    )
