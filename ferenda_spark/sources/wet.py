"""WET sink/source: extracted-text WARC ``conversion`` records — the
Common-Crawl WET distribution format (public spec: ISO 28500 WARC +
Common Crawl's WET convention: one text/plain conversion record per
page). The extract stage's output becomes shareable crawl-derivative
archives, and ``read_wet`` round-trips them through the same strict
parser as response WARCs (sources/warc.py, keep_types=("conversion",)).

Determinism: record bytes are a pure function of (url, ts, text) — the
record ID is ``urn:sha256:<payload+url digest>``, never a uuid — so the
same corpus produces byte-identical records on any cluster size. FILE
grouping (which records share one .warc.wet) follows the input
partitioning: archives are a sink, equality is record-level (the
round-trip driver query compares per-url content, not file layout);
file names are content-hashes, so rewrites are idempotent.

Scale shape: record assembly is one mapInPandas pass (map-only); each
task writes ONE archive file for its partition — the same
file-per-task granularity Common Crawl itself ships (~1 GB WETs), and
the natural object-store upload unit. The local ``open()`` write is the
sandbox stand-in for that object-store PUT."""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ferenda_spark.sources.warc import read_warc

_CRLF = "\r\n"


def wet_record_bytes(url: str, ts, text: str) -> bytes:
    """One WARC/1.0 conversion record, deterministic."""
    payload = (text or "").encode("utf-8")
    if ts is None or (isinstance(ts, float) and ts != ts) or pd.isna(ts):
        # None, NaN epoch, or pandas NaT (NULL timestamps arrive as NaT
        # through Arrow — the round-2 streaming lesson)
        iso = "1970-01-01T00:00:00Z"
    else:
        if isinstance(ts, datetime):
            dt = ts if ts.tzinfo is None else ts.astimezone(
                timezone.utc
            ).replace(tzinfo=None)
        else:  # epoch seconds
            dt = datetime.fromtimestamp(int(ts), tz=timezone.utc).replace(
                tzinfo=None
            )
        iso = dt.strftime("%Y-%m-%dT%H:%M:%SZ")
    rid = hashlib.sha256(payload + b"\x00" + (url or "").encode()).hexdigest()
    head = _CRLF.join(
        [
            "WARC/1.0",
            "WARC-Type: conversion",
            f"WARC-Target-URI: {url}",
            f"WARC-Date: {iso}",
            f"WARC-Record-ID: <urn:sha256:{rid}>",
            "Content-Type: text/plain",
            f"Content-Length: {len(payload)}",
        ]
    )
    return head.encode("latin-1") + b"\r\n\r\n" + payload + b"\r\n\r\n"


def write_wet(
    docs: DataFrame,
    out_dir: str,
    url_col: str = "url",
    text_col: str = "text",
    ts_col: str | None = "warc_ts",
) -> None:
    """Write one .warc.wet archive per input partition under out_dir."""
    os.makedirs(out_dir, exist_ok=True)
    cols = [url_col, text_col] + ([ts_col] if ts_col else [])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks: list[bytes] = []
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                url = getattr(row, url_col)
                text = getattr(row, text_col)
                ts = getattr(row, ts_col) if ts_col else None
                chunks.append(wet_record_bytes(url, ts, text))
        if chunks:
            blob = b"".join(chunks)
            name = f"part-{hashlib.sha256(blob).hexdigest()[:16]}.warc.wet"
            with open(os.path.join(out_dir, name), "wb") as f:
                f.write(blob)
            yield pd.DataFrame({"name": [name], "n_records": [len(chunks)]})

    # the action IS the write; collect() returns the vocabulary-sized
    # (file, record-count) manifest
    docs.select(*cols).mapInPandas(
        gen, schema="name string, n_records long"
    ).collect()


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Directory of .warc.wet files → corpus-schema frame (text payload
    arrives in the ``html`` binary column — it is the record payload;
    decode utf-8 to recover the text column)."""
    return read_warc(spark, path, keep_types=("conversion",))
