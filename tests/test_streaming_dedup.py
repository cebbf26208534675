"""Streaming exact dedup (streaming/dedup.py): duplicates by content
fingerprint are dropped within a micro-batch AND across micro-batches /
restarts (state store + checkpoint), while distinct docs all pass."""

from __future__ import annotations

from datetime import datetime

import pytest

from ferenda_spark.streaming.dedup import run_dedup_stream

TS = datetime(2026, 1, 1, 12, 0, 0)
SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _rows(spec):
    return [(u, TS, b"<p>x</p>", t, "en") for (u, t) in spec]


@pytest.fixture()
def dirs(tmp_path):
    return (
        str(tmp_path / "input"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )


def test_dedup_within_and_across_batches(spark, dirs):
    input_dir, out_dir, ckpt = dirs
    drop1 = _rows(
        [("u1", "alpha text"), ("u2", "beta text"),
         ("u3", "gamma text"), ("u4", "alpha text")]  # u4 dups u1 in-batch
    )
    spark.createDataFrame(drop1, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(input_dir)
    run_dedup_stream(spark, input_dir, out_dir, ckpt)
    out1 = spark.read.parquet(out_dir)
    assert out1.count() == 3
    assert sorted(r.text for r in out1.collect()) == [
        "alpha text", "beta text", "gamma text",
    ]

    # second drop: one cross-batch duplicate (vs u2), one genuinely new doc.
    # Re-invoking processes ONLY the new files against checkpointed state.
    drop2 = _rows([("u5", "beta text"), ("u6", "delta text")])
    spark.createDataFrame(drop2, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(input_dir)
    run_dedup_stream(spark, input_dir, out_dir, ckpt)
    out2 = spark.read.parquet(out_dir)
    assert out2.count() == 4
    assert sorted(r.text for r in out2.collect()) == [
        "alpha text", "beta text", "delta text", "gamma text",
    ]
    # the cross-batch duplicate was dropped by state, not by luck: the
    # surviving "beta text" row is the FIRST arrival (u2)
    assert {r.url for r in out2.filter("text = 'beta text'").collect()} == {"u2"}


def test_normalized_fingerprint_dedup(spark, dirs):
    """The streaming key is the same normalized fingerprint the batch op
    uses — whitespace/case variants are duplicates."""
    input_dir, out_dir, ckpt = dirs
    rows = _rows([("u1", "Hello  World"), ("u2", "hello world")])
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(input_dir)
    run_dedup_stream(spark, input_dir, out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == 1
