"""Iceberg-lite snapshot layer (sources/snapshots.py): atomic commits,
time travel, partition pruning through snapshot reads, expiry GC."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from ferenda_spark.sources.snapshots import (
    commit_snapshot,
    current_version,
    expire_snapshots,
    read_snapshot,
    snapshot_history,
)


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, lo, hi, lang="en"):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"), F.lit(lang).alias("lang")
    )


def test_append_and_time_travel(spark, root):
    v1 = commit_snapshot(_df(spark, 0, 10), root)
    v2 = commit_snapshot(_df(spark, 10, 15), root)
    assert (v1, v2) == (1, 2)
    assert current_version(spark, root) == 2
    assert read_snapshot(spark, root).count() == 15
    assert read_snapshot(spark, root, version=1).count() == 10
    ids = {r.doc_id for r in read_snapshot(spark, root, version=2).collect()}
    assert ids == set(range(15))


def test_overwrite_keeps_old_versions_readable(spark, root):
    commit_snapshot(_df(spark, 0, 10), root)
    commit_snapshot(_df(spark, 100, 103), root, mode="overwrite")
    assert read_snapshot(spark, root).count() == 3
    assert read_snapshot(spark, root, version=1).count() == 10
    hist = snapshot_history(spark, root)
    assert [h["mode"] for h in hist] == ["append", "overwrite"]
    assert hist[1]["parent"] == 1


def test_partitioned_commit_restores_columns_and_prunes(spark, root):
    df = spark.range(0, 20).select(
        F.col("id").alias("doc_id"), (F.col("id") % 4).alias("bucket")
    )
    commit_snapshot(df, root, partition_by=("bucket",))
    commit_snapshot(
        spark.range(20, 28).select(
            F.col("id").alias("doc_id"), (F.col("id") % 4).alias("bucket")
        ),
        root,
        partition_by=("bucket",),
    )
    out = read_snapshot(spark, root)
    assert set(out.columns) == {"doc_id", "bucket"}
    q = out.filter(F.col("bucket") == 2)
    assert q.count() == 7
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(bucket" in plan


def test_crashed_commit_invisible_then_gced(spark, root):
    commit_snapshot(_df(spark, 0, 10), root)
    # simulate a crash AFTER data landed but BEFORE the manifest rename:
    # durable orphan data dir, no manifest
    orphan = f"{root}/data/v00002-deadbeef0000"
    _df(spark, 50, 60).write.parquet(orphan)
    assert current_version(spark, root) == 1
    assert read_snapshot(spark, root).count() == 10  # orphan invisible
    res = expire_snapshots(spark, root, keep_last=1)
    assert res["deleted_dirs"] == ["data/v00002-deadbeef0000"]
    assert not os.path.exists(orphan)
    assert read_snapshot(spark, root).count() == 10


def test_expire_drops_old_versions_and_their_files(spark, root):
    commit_snapshot(_df(spark, 0, 10), root)
    commit_snapshot(_df(spark, 100, 103), root, mode="overwrite")
    commit_snapshot(_df(spark, 200, 204), root)  # append on top of v2
    res = expire_snapshots(spark, root, keep_last=2)
    assert res["expired_versions"] == [1]
    assert len(res["deleted_dirs"]) == 1  # v1's files: only v1 referenced them
    assert read_snapshot(spark, root, version=2).count() == 3
    assert read_snapshot(spark, root, version=3).count() == 7
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, root, version=1)


def test_version_collision_retries(spark, root):
    commit_snapshot(_df(spark, 0, 5), root)
    v1_dirs = snapshot_history(spark, root)[0]["dirs"]
    # a foreign writer publishes v2 out from under us
    foreign = f"{root}/data/v00002-aaaaaaaaaaaa"
    _df(spark, 5, 8).write.parquet(foreign)
    with open(f"{root}/snapshots/v00002.json", "w") as f:
        json.dump(
            {
                "version": 2,
                "parent": 1,
                "mode": "append",
                "dirs": v1_dirs + ["data/v00002-aaaaaaaaaaaa"],
                "partition_by": [],
            },
            f,
        )
    # our append must land at v3, not clobber v2 — and must chain on the
    # CURRENT manifest (the foreign v2), not the stale parent we started at
    v = commit_snapshot(_df(spark, 8, 10), root)
    assert v == 3
    m3 = snapshot_history(spark, root)[-1]
    assert m3["version"] == 3 and m3["parent"] == 2
    assert "data/v00002-aaaaaaaaaaaa" in m3["dirs"]
    assert all(d in m3["dirs"] for d in v1_dirs)
    assert read_snapshot(spark, root).count() == 5 + 3 + 2


def test_empty_table_reads_raise(spark, root):
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, root)
    assert current_version(spark, root) == 0


def test_snapshot_diff_added_and_removed(spark, root):
    from ferenda_spark.sources.snapshots import snapshot_diff

    commit_snapshot(_df(spark, 0, 10), root)
    commit_snapshot(_df(spark, 5, 12), root, mode="overwrite")
    d = snapshot_diff(spark, root, 1, 2)
    added = {r.doc_id for r in d.filter("change = 'added'").collect()}
    removed = {r.doc_id for r in d.filter("change = 'removed'").collect()}
    assert added == {10, 11}
    assert removed == {0, 1, 2, 3, 4}


def test_snapshot_diff_multiset_counts(spark, root):
    """Duplicate-count changes are count-preserving (exceptAll)."""
    from ferenda_spark.sources.snapshots import snapshot_diff

    one = _df(spark, 0, 3)
    commit_snapshot(one.unionAll(one).unionAll(one), root)  # 3 copies each
    commit_snapshot(one, root, mode="overwrite")  # 1 copy each
    d = snapshot_diff(spark, root, 1, 2)
    assert d.filter("change = 'added'").count() == 0
    rem = d.filter("change = 'removed'").groupBy("doc_id").count().collect()
    assert {r["doc_id"]: r["count"] for r in rem} == {0: 2, 1: 2, 2: 2}


def test_snapshot_diff_identical_versions_empty(spark, root):
    from ferenda_spark.sources.snapshots import snapshot_diff

    commit_snapshot(_df(spark, 0, 5), root)
    commit_snapshot(_df(spark, 5, 6), root)  # append
    d = snapshot_diff(spark, root, 2, 2)
    assert d.count() == 0
