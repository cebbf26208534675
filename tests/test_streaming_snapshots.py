"""Streaming → snapshot sink (streaming/snapshots.py): exactly-once
commits under batch replay, incremental drains, whole-batch visibility."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ferenda_spark.sources.snapshots import (
    current_version,
    read_snapshot,
    snapshot_history,
)
from ferenda_spark.streaming.snapshots import (
    run_stream_to_snapshots,
    snapshot_sink,
)

SCHEMA = "doc_id long, lang string"


def _write_batch(spark, path, lo, hi):
    spark.range(lo, hi).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    ).write.mode("append").parquet(path)


@pytest.fixture()
def dirs(tmp_path):
    return str(tmp_path / "src"), str(tmp_path / "tbl"), str(tmp_path / "ckpt")


def _stream(spark, src):
    return spark.readStream.schema(SCHEMA).parquet(src)


def test_drain_then_incremental_drain(spark, dirs):
    src, root, ckpt = dirs
    _write_batch(spark, src, 0, 10)
    run_stream_to_snapshots(_stream(spark, src), root, ckpt)
    assert read_snapshot(spark, root).count() == 10
    v_after_first = current_version(spark, root)

    # nothing new → a re-run commits nothing
    run_stream_to_snapshots(_stream(spark, src), root, ckpt)
    assert current_version(spark, root) == v_after_first

    # new files → only the delta lands, as new snapshot(s)
    _write_batch(spark, src, 10, 15)
    run_stream_to_snapshots(_stream(spark, src), root, ckpt)
    assert read_snapshot(spark, root).count() == 15
    ids = {r.doc_id for r in read_snapshot(spark, root).collect()}
    assert ids == set(range(15))


def test_batch_replay_is_idempotent(spark, dirs):
    _, root, _ = dirs
    sink = snapshot_sink(root)
    batch = spark.range(0, 7).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    )
    sink(batch, 42)
    v1 = current_version(spark, root)
    sink(batch, 42)  # at-least-once redelivery of the SAME batch
    assert current_version(spark, root) == v1
    assert read_snapshot(spark, root).count() == 7
    sink(batch, 43)  # a genuinely new batch still commits
    assert current_version(spark, root) == v1 + 1
    assert read_snapshot(spark, root).count() == 14
    metas = [m["meta"]["batch_id"] for m in snapshot_history(spark, root)]
    assert metas == [42, 43]
