"""WARC source (sources/warc.py): response records → corpus rows, HTTP
envelope stripped, per-record-gzip archives handled, malformed tails
surfaced as warc_error rows, and WARC→extract integration byte-identical."""

from __future__ import annotations

import gzip
from datetime import datetime

from pyspark.sql import functions as F

from ferenda_spark.sources.warc import read_warc


def _rec(rtype, uri=None, date=None, payload=b"", http=True):
    body = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + payload
        if http
        else payload
    )
    hdrs = (
        "WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        + (f"WARC-Target-URI: {uri}\r\n" if uri else "")
        + (f"WARC-Date: {date}\r\n" if date else "")
        + f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    return hdrs + body + b"\r\n\r\n"


def _archive():
    return (
        _rec("warcinfo", payload=b"software: test\r\n", http=False)
        + _rec("request", uri="https://a.example/1", payload=b"GET / HTTP/1.1", http=False)
        + _rec(
            "response", uri="https://a.example/1",
            date="2026-03-04T05:06:07Z", payload=b"<html><p>one</p></html>",
        )
        + _rec(
            "response", uri="https://b.example/2",
            date="2026-03-04T06:00:00Z", payload=b"<html><p>two</p></html>",
        )
    )


def test_plain_and_gzip_archives(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(_archive())
    # Common-Crawl style: one gzip member per record, concatenated
    gz = b"".join(
        gzip.compress(r)
        for r in (
            _rec("response", uri="https://c.example/3",
                 date="2026-03-04T07:00:00Z", payload=b"<html>three</html>"),
        )
    )
    (tmp_path / "b.warc.gz").write_bytes(gz)
    got = read_warc(spark, str(tmp_path)).collect()
    rows = {r.url: r for r in got}
    assert all(r.warc_error is None for r in got)
    assert set(rows) == {
        "https://a.example/1", "https://b.example/2", "https://c.example/3",
    }
    # HTTP envelope stripped; payload byte-exact
    assert bytes(rows["https://a.example/1"].html) == b"<html><p>one</p></html>"
    assert rows["https://a.example/1"].warc_ts == datetime(2026, 3, 4, 5, 6, 7)
    assert bytes(rows["https://c.example/3"].html) == b"<html>three</html>"


def test_truncated_archive_yields_error_row(spark, tmp_path):
    good = _rec(
        "response", uri="https://a.example/1",
        date="2026-03-04T05:06:07Z", payload=b"<html>ok</html>",
    )
    bad = good + b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 999\r\n\r\nshort"
    (tmp_path / "t.warc").write_bytes(bad)
    got = read_warc(spark, str(tmp_path)).collect()
    oks = [r for r in got if r.warc_error is None]
    errs = [r for r in got if r.warc_error is not None]
    assert len(oks) == 1 and oks[0].url == "https://a.example/1"
    assert len(errs) == 1 and "truncated" in errs[0].warc_error


def test_warc_to_extract_integration(spark, tmp_path):
    """Corpus html wrapped in a WARC, read back, and parsed must match the
    direct pipeline byte-for-byte (url, text_sha256)."""
    from ferenda_spark.operators.parse import parse_stage, split_parsed
    from ferenda_spark.sources.corpus import generate_corpus

    corpus = generate_corpus(spark, 6).collect()
    arch = b"".join(
        _rec("response", uri=r.url,
             date=r.warc_ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
             payload=bytes(r.html))
        for r in corpus
    )
    (tmp_path / "c.warc").write_bytes(arch)
    warc_corpus = (
        read_warc(spark, str(tmp_path))
        .filter(F.col("warc_error").isNull())
        .drop("warc_error")
    )
    got, _ = split_parsed(parse_stage(warc_corpus, n_parts=4))
    want, _ = split_parsed(parse_stage(generate_corpus(spark, 6), n_parts=4))
    g = {(r.url, r.text_sha256) for r in got.select("url", "text_sha256").collect()}
    w = {(r.url, r.text_sha256) for r in want.select("url", "text_sha256").collect()}
    assert g == w and len(g) == 6


def test_cdx_index_and_fetch_plan(spark, tmp_path):
    from ferenda_spark.sources.cdx import cdx_fetch_plan, read_cdx_index

    lines = [
        'com,example,a)/1 20260301120000 {"url": "https://a.example/1", '
        '"mime": "text/html", "status": "200", "digest": "AAA", '
        '"length": "500", "offset": "0", "filename": "crawl-00.warc.gz"}',
        'com,example,a)/2 20260301120500 {"url": "https://a.example/2", '
        '"mime": "text/html", "status": "200", "digest": "BBB", '
        '"length": "700", "offset": "900", "filename": "crawl-00.warc.gz"}',
        'com,example,b)/ 20260301121000 {"url": "https://b.example/", '
        '"mime": "text/html", "status": "404", "digest": "CCC", '
        '"length": "300", "offset": "0", "filename": "crawl-01.warc.gz"}',
        'com,example,c)/ 20260301121500 {"url": "https://c.example/", '
        '"mime": "image/png", "status": "200", "digest": "DDD", '
        '"length": "900", "offset": "400", "filename": "crawl-01.warc.gz"}',
        "garbage line without json",
    ]
    p = tmp_path / "cdx-00000"
    p.write_text("\n".join(lines))
    idx = read_cdx_index(spark, str(p))
    rows = {r.urlkey: r for r in idx.collect()}
    assert len(rows) == 5
    ok = rows["com,example,a)/1"]
    assert ok.url == "https://a.example/1" and ok.status == 200
    assert ok.warc_offset == 0 and ok.warc_length == 500
    from datetime import datetime
    assert ok.capture_ts == datetime(2026, 3, 1, 12, 0, 0)
    # malformed line → NULL fields, not a crash
    assert rows["garbage"].url is None

    plan = {r.warc_filename: r for r in cdx_fetch_plan(idx).collect()}
    # 404 and non-html captures are excluded → only crawl-00 remains
    assert set(plan) == {"crawl-00.warc.gz"}
    p0 = plan["crawl-00.warc.gz"]
    assert p0.n_records == 2 and p0.total_bytes == 1200
    assert [(r.offset, r.length) for r in p0.ranges] == [(0, 500), (900, 700)]


def test_cdx_plan_range_read_roundtrip(spark, tmp_path):
    """CDX index → fetch plan → range-read must yield exactly the captures
    the index selected, byte-identical to a full archive scan."""
    import gzip as _gzip
    import json as _json

    from ferenda_spark.sources.cdx import cdx_fetch_plan, read_cdx_index
    from ferenda_spark.sources.warc import read_warc, read_warc_ranges

    members, cdx_lines, offset = [], [], 0
    for i in range(5):
        rec = _rec(
            "response", uri=f"https://a.example/{i}",
            date=f"2026-03-0{i + 1}T05:06:07Z",
            payload=f"<html><p>page {i}</p></html>".encode(),
        )
        gz = _gzip.compress(rec)
        if i != 3:  # capture 3 is deliberately NOT in the wanted set
            cdx_lines.append(
                f"com,example,a)/{i} 2026030{i + 1}050607 "
                + _json.dumps({
                    "url": f"https://a.example/{i}",
                    "mime": "text/html" if i != 3 else "image/png",
                    "status": "200", "digest": f"D{i}",
                    "length": str(len(gz)), "offset": str(offset),
                    "filename": "crawl-xy.warc.gz",
                })
            )
        members.append(gz)
        offset += len(gz)
    (tmp_path / "crawl-xy.warc.gz").write_bytes(b"".join(members))
    (tmp_path / "cdx-0").write_text("\n".join(cdx_lines))

    plan = cdx_fetch_plan(read_cdx_index(spark, str(tmp_path / "cdx-0")))
    got = read_warc_ranges(spark, plan, str(tmp_path)).collect()
    assert all(r.warc_error is None for r in got)
    assert sorted(r.url for r in got) == [
        f"https://a.example/{i}" for i in (0, 1, 2, 4)
    ]
    # byte-identical to the full scan, for the selected subset
    full = {
        r.url: bytes(r.html)
        for r in read_warc(spark, str(tmp_path / "crawl-xy.warc.gz")).collect()
    }
    for r in got:
        assert bytes(r.html) == full[r.url]


def test_negative_content_length_terminates(spark):
    """A crafted negative Content-Length must yield an error row, not loop
    the parser (pos would move backwards)."""
    from ferenda_spark.sources.warc import parse_warc_bytes

    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://a.example/x\r\n"
        b"Content-Length: -46\r\n\r\nHTTP/1.1 200 OK\r\n\r\nboom"
    )
    out = list(parse_warc_bytes(rec, "evil.warc"))
    assert len(out) == 1 and out[0]["warc_error"] == "negative Content-Length"


def test_cdx_short_and_revisit_lines(spark, tmp_path):
    """Short lines (fewer than 3 fields) and revisit-style '-' status must
    become NULL-field rows under ANSI Spark, not job failures."""
    from ferenda_spark.sources.cdx import read_cdx_index

    lines = [
        "short",
        "two tokens",
        'com,example,r)/ 20260301120000 {"url": "https://r.example/", '
        '"mime": "warc/revisit", "status": "-", "digest": "RRR", '
        '"length": "not-a-number", "offset": "10", "filename": "c.warc.gz"}',
    ]
    p = tmp_path / "cdx-short"
    p.write_text("\n".join(lines))
    rows = read_cdx_index(spark, str(p)).collect()
    assert len(rows) == 3
    by_key = {r.urlkey: r for r in rows}
    assert by_key["short"].url is None and by_key["short"].capture_ts is None
    rv = by_key["com,example,r)/"]
    assert rv.status is None and rv.warc_length is None and rv.warc_offset == 10


def test_folded_header_continuation_lines(spark, tmp_path):
    """RFC-folded WARC headers (continuation lines starting with SP/HT)
    must join onto the previous value, not become bogus keys."""
    payload = b"<html><p>folded</p></html>"
    body = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + payload
    hdrs = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        "WARC-Target-URI: https://folded.example/\r\n"
        "  long/path.html\r\n"
        "WARC-Date: 2026-03-04T05:06:07Z\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode()
    p = tmp_path / "folded.warc"
    p.write_bytes(hdrs + body + b"\r\n\r\n")
    rows = read_warc(spark, str(p)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["warc_error"] is None
    assert r["url"] == "https://folded.example/ long/path.html"
    assert r["html"] == payload


def test_warc_parser_never_raises_on_fuzz():
    """Ingest robustness: arbitrary bytes must produce rows (possibly
    warc_error rows), never an exception — a corrupt archive in a 100 TB
    crawl must cost one error row, not the stage."""
    import random

    from ferenda_spark.sources.warc import parse_warc_bytes

    rng = random.Random("warcfuzz")
    seeds = [
        b"",
        b"\r\n\r\n\r\n",
        b"WARC/1.0\r\n",
        b"WARC/1.0\r\nContent-Length: 5\r\n\r\nhi",
        b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 99999999\r\n\r\nx",
    ]
    base = _rec("response", uri="https://f.example/x",
                date="2026-01-01T00:00:00Z", payload=b"<p>ok</p>")
    for i in range(60):
        if i < len(seeds):
            blob = seeds[i]
        else:
            blob = bytearray(base * rng.randint(1, 3))
            for _ in range(rng.randint(1, 12)):  # random corruption
                if blob:
                    blob[rng.randrange(len(blob))] = rng.randrange(256)
            blob = bytes(blob[: rng.randint(0, len(blob))])
        rows = list(parse_warc_bytes(bytes(blob), "fuzz"))
        assert all(isinstance(r, dict) for r in rows)
