"""Streaming truth-discovery state: fold claim micro-batches into the
persistent fusion state (source trust + fact beliefs), exactly-once.

Composition of three audited pieces — the same deployment shape as
streaming/components.py: ``fusion.fold_claims`` (amortized incremental
fold — claim history never rescanned), the Iceberg-lite snapshot layer
(atomic commits, time travel), and the ``batch_id`` replay guard.

The live-crawl story: structured-data and grammar triples stream out of
ingest as (source, subj, pred, obj) claims; each micro-batch folds into
the trust/fact state and publishes one snapshot of all three tables
(trust, facts, resolved upserts applied to the resolved map). A replayed
batch (foreachBatch is at-least-once) is recognized by its batch_id and
skipped before any compute — folding a batch twice would double-count
its belief contributions, so the guard is load-bearing, not hygiene.

State roots (three sibling snapshot dirs under ``root``):
``trust/`` (source, n_claims, sum_conf), ``facts/`` (subj, pred, obj,
belief, n_sources), ``resolved/`` (subj, pred, obj, confidence,
n_sources, n_candidates — upserted per touched key). Time travel over
any of them reconstructs the fusion view any past batch saw.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ferenda_spark.operators.fusion import fold_claims
from ferenda_spark.sources.snapshots import commit_snapshot, read_snapshot
from ferenda_spark.streaming.snapshots import batch_already_committed


def fusion_sink(root: str):
    """``foreachBatch`` callable maintaining the fusion state under
    ``root`` — one atomic snapshot per sub-table per micro-batch."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        trust_root = os.path.join(root, "trust")
        facts_root = os.path.join(root, "facts")
        resolved_root = os.path.join(root, "resolved")
        if batch_already_committed(spark, trust_root, batch_id):
            return
        try:
            trust_prev = read_snapshot(spark, trust_root)
            facts_prev = read_snapshot(spark, facts_root)
        except FileNotFoundError:
            trust_prev = facts_prev = None
        trust2, facts2, delta = fold_claims(
            batch_df.select("source", "subj", "pred", "obj"),
            trust_prev, facts_prev,
        )
        try:
            resolved_prev = read_snapshot(spark, resolved_root)
            untouched = resolved_prev.join(
                delta.select("subj", "pred"), ["subj", "pred"],
                "left_anti",
            )
            resolved2 = untouched.unionByName(delta)
        except FileNotFoundError:
            resolved2 = delta
        # trust committed LAST: its batch_id tag is the replay guard, so
        # it must only land once every sibling table has committed
        for df, r in ((facts2, facts_root), (resolved2, resolved_root),
                      (trust2, trust_root)):
            commit_snapshot(df, r, mode="overwrite",
                            meta={"batch_id": batch_id})

    return sink


def run_stream_to_fusion(
    stream_df: DataFrame, root: str, checkpoint_dir: str
) -> None:
    """Drain the available claim stream (columns ``source, subj, pred,
    obj``) into the fusion state at ``root`` — Trigger.AvailableNow, one
    state snapshot per micro-batch, replay-safe."""
    q = (
        stream_df.writeStream.foreachBatch(fusion_sink(root))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
