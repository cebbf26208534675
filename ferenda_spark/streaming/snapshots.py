"""Streaming → snapshot-table sink: exactly-once materialization of a
stream into the Iceberg-lite snapshot layer (sources/snapshots.py).

Spark's ``foreachBatch`` contract is at-least-once: after a failure the
SAME batch (same ``batch_id``) can be re-offered, so a plain append sink
duplicates rows. The public Iceberg/Delta recipe is idempotent commits
keyed on the batch id; here the batch_id rides the snapshot manifest's
``meta`` and a replayed batch is recognized and skipped BEFORE any data is
written — the stream's effect on the table is exactly-once even though
delivery is at-least-once.

Why this beats a plain parquet append sink even batch-by-batch: a crash
mid-write leaves a plain sink with a half-visible batch (some task files
committed, some not), while a snapshot commit is invisible until its
manifest renames in — readers only ever see whole batches, and time travel
gives per-batch table states for free (one snapshot per micro-batch;
``expire_snapshots`` bounds the manifest log).

The replay probe scans the manifest log newest-first — O(live manifests)
tiny JSON reads per micro-batch, bounded by the expiry policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ferenda_spark.sources.snapshots import (
    commit_snapshot,
    snapshot_history,
)


def batch_already_committed(
    spark: SparkSession, root: str, batch_id: int
) -> bool:
    """True when a snapshot manifest already records this batch_id."""
    try:
        history = snapshot_history(spark, root)
    except FileNotFoundError:
        return False
    return any(
        m.get("meta", {}).get("batch_id") == batch_id for m in reversed(history)
    )


def snapshot_sink(root: str, partition_by: tuple[str, ...] = ()):
    """A foreachBatch callable committing each micro-batch as one append
    snapshot, replay-safe via batch_id dedup."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_already_committed(spark, root, batch_id):
            return
        commit_snapshot(
            batch_df,
            root,
            mode="append",
            partition_by=partition_by,
            meta={"batch_id": batch_id},
        )

    return sink


def run_stream_to_snapshots(
    stream_df: DataFrame,
    root: str,
    checkpoint_dir: str,
    partition_by: tuple[str, ...] = (),
) -> None:
    """Drain everything currently available from ``stream_df`` into the
    snapshot table at ``root`` (Trigger.AvailableNow — the incremental
    nightly build as a stream), one atomic snapshot per micro-batch.
    Re-invoking after new source files land commits only the new batches
    (streaming checkpoint tracks consumed files; batch_id dedup absorbs
    replays after checkpoint/commit races)."""
    q = (
        stream_df.writeStream.foreachBatch(snapshot_sink(root, partition_by))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
