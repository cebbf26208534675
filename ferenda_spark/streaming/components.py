"""Streaming entity-resolution state: fold alias-pair micro-batches into
the connected-component map, exactly-once.

Composition of three audited pieces: ``graph.update_components`` (star-
edge incremental merge — history never rescanned), the Iceberg-lite
snapshot layer (atomic commits, time travel), and the streaming
``batch_id`` replay guard (streaming/snapshots.py). The component map IS
the state — the same discipline as dedup_store's fingerprint-only
snapshots: the raw alias-pair history is never stored, each micro-batch
of new pair evidence merges into the O(nodes) map and publishes one
snapshot, and a replayed batch (foreachBatch is at-least-once) is
recognized by its batch_id and skipped before any compute.

This is the 10^12-document deployment shape for entity canonicalization
under a live crawl: MinHash-LSH alias candidates stream out of ingest,
and the canonical-URI map stays current without ever re-clustering the
full history — per batch, cost is O(batch + nodes-touched), rounds
O(log diameter) of the batch's quotient graph (update_components
docstring). Label stability (component id = min member id) means
downstream rewrites only ever REFINE: a merge can change labels only to
a smaller id, and time travel over the map snapshots gives the exact
canonicalization any past batch saw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ferenda_spark.operators.graph import connected_components, update_components
from ferenda_spark.sources.snapshots import commit_snapshot, read_snapshot
from ferenda_spark.streaming.snapshots import batch_already_committed


def components_sink(root: str):
    """A ``foreachBatch`` callable maintaining the (node, comp) map at
    ``root``: first batch bootstraps with ``connected_components``, later
    batches fold in via ``update_components``; each result is one atomic
    OVERWRITE snapshot tagged with the batch_id (the map is a full
    replacement state, not an append log — but prior versions stay
    time-travelable until expiry)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_already_committed(spark, root, batch_id):
            return
        edges = batch_df.select("src", "dst")
        try:
            prev = read_snapshot(spark, root)
            merged = update_components(prev, edges)
        except FileNotFoundError:
            merged = connected_components(edges)
        commit_snapshot(
            merged,
            root,
            mode="overwrite",
            meta={"batch_id": batch_id},
        )

    return sink


def run_stream_to_components(
    stream_df: DataFrame, root: str, checkpoint_dir: str
) -> None:
    """Drain the available alias-pair stream (columns ``src, dst``) into
    the component map at ``root`` — Trigger.AvailableNow, one map
    snapshot per micro-batch, replay-safe."""
    q = (
        stream_df.writeStream.foreachBatch(components_sink(root))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
