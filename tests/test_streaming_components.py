"""Streaming entity-component maintenance (streaming/components.py):
incremental folds across micro-batches, exactly-once under replay,
equivalence with one-shot clustering of the full history."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ferenda_spark.operators.graph import connected_components
from ferenda_spark.sources.snapshots import current_version, read_snapshot
from ferenda_spark.streaming.components import (
    components_sink,
    run_stream_to_components,
)

SCHEMA = "src long, dst long"


@pytest.fixture()
def dirs(tmp_path):
    return str(tmp_path / "src"), str(tmp_path / "map"), str(tmp_path / "ckpt")


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, SCHEMA)


def _map(spark, root):
    return {
        r["node"]: r["comp"] for r in read_snapshot(spark, root).collect()
    }


def test_incremental_fold_equals_one_shot(spark, dirs):
    src, root, ckpt = dirs
    b1 = [(1, 2), (3, 4)]
    b2 = [(2, 3), (10, 11)]  # merges {1,2} with {3,4}; new cluster
    _edges(spark, b1).write.mode("append").parquet(src)
    run_stream_to_components(
        spark.readStream.schema(SCHEMA).parquet(src), root, ckpt
    )
    assert _map(spark, root) == {1: 1, 2: 1, 3: 3, 4: 3}

    _edges(spark, b2).write.mode("append").parquet(src)
    run_stream_to_components(
        spark.readStream.schema(SCHEMA).parquet(src), root, ckpt
    )
    got = _map(spark, root)
    oneshot = {
        r["node"]: r["comp"]
        for r in connected_components(_edges(spark, b1 + b2)).collect()
    }
    assert got == oneshot
    assert got[4] == 1  # merged cluster keeps the global min label


def test_replayed_batch_is_skipped(spark, dirs):
    _, root, _ = dirs
    sink = components_sink(root)
    sink(_edges(spark, [(1, 2)]), batch_id=0)
    v1 = current_version(spark, root)
    sink(_edges(spark, [(5, 6)]), batch_id=0)  # replay of batch 0
    assert current_version(spark, root) == v1
    assert 5 not in _map(spark, root)
    sink(_edges(spark, [(5, 6)]), batch_id=1)
    assert _map(spark, root)[6] == 5


def test_time_travel_over_map_versions(spark, dirs):
    _, root, _ = dirs
    sink = components_sink(root)
    sink(_edges(spark, [(1, 2), (3, 4)]), batch_id=0)
    sink(_edges(spark, [(2, 3)]), batch_id=1)
    old = {
        r["node"]: r["comp"]
        for r in read_snapshot(spark, root, version=1).collect()
    }
    new = _map(spark, root)
    assert old[3] == 3 and new[3] == 1  # the merge is visible only in v2
