"""WET conversion-record sink/source (sources/wet.py)."""

from datetime import datetime

from ferenda_spark.sources.wet import read_wet, wet_record_bytes, write_wet


def test_record_bytes_deterministic_and_parseable():
    a = wet_record_bytes("https://x.example/1", 42, "hello wörld")
    b = wet_record_bytes("https://x.example/1", 42, "hello wörld")
    assert a == b
    assert a.startswith(b"WARC/1.0\r\nWARC-Type: conversion\r\n")
    assert b"WARC-Date: 1970-01-01T00:00:42Z" in a
    body = a.split(b"\r\n\r\n", 1)[1]
    assert body == "hello wörld".encode() + b"\r\n\r\n"
    # utf-8 payload length is byte length, not char length
    assert f"Content-Length: {len('hello wörld'.encode())}".encode() in a


def test_roundtrip_through_strict_parser(spark, tmp_path):
    rows = [
        ("https://a.example/1", datetime(2024, 5, 1, 12, 0, 0), "first text"),
        ("https://a.example/2", None, "second text with åäö"),
        ("https://b.example/3", datetime(2024, 5, 2, 0, 0, 1), ""),
    ]
    docs = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string"
    )
    out = str(tmp_path / "wet")
    write_wet(docs.repartition(2), out)
    back = read_wet(spark, out)
    got = {
        r["url"]: (r["warc_ts"], bytes(r["html"]).decode("utf-8"))
        for r in back.collect()
    }
    assert len(got) == 3
    assert got["https://a.example/1"] == (
        datetime(2024, 5, 1, 12, 0, 0), "first text"
    )
    assert got["https://a.example/2"][1] == "second text with åäö"
    assert got["https://a.example/2"][0] == datetime(1970, 1, 1, 0, 0, 0)
    assert got["https://b.example/3"][1] == ""
    # no error rows
    assert back.filter("warc_error is not null").count() == 0
    # response-mode reader sees NO records in a WET archive (type filter)
    from ferenda_spark.sources.warc import read_warc

    assert read_warc(spark, out).filter("url is not null").count() == 0
