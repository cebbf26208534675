"""Streaming truth-discovery state: fold claim micro-batches into the
persistent fusion state (source trust + fact beliefs), exactly-once.

Composition of three audited pieces — the same deployment shape as
streaming/components.py: ``fusion.fold_claims`` (amortized incremental
fold — claim history never rescanned), the Iceberg-lite snapshot layer
(atomic commits, time travel), and the ``batch_id`` replay guard.

The live-crawl story: structured-data and grammar triples stream out of
ingest as (source, subj, pred, obj) claims; each micro-batch folds into
the trust/fact state and publishes one snapshot. A replayed batch
(foreachBatch is at-least-once) is recognized by its batch_id and
skipped before any compute — folding a batch twice would DOUBLE-COUNT
its belief contributions, so the guard is load-bearing, not hygiene.

Atomicity: all three logical tables — trust (source, n_claims,
sum_conf), facts (subj, pred, obj, belief, n_sources) and the resolved
map (subj, pred, obj, confidence, n_sources, n_candidates) — travel in
ONE physical snapshot table discriminated by a ``part`` column
(partitioned on it, so a reader's ``part = 'facts'`` filter prunes to
one directory). Three sibling snapshot roots would re-open the
double-count hole the batch_id guard closes: a crash between the facts
commit and the guard-carrying trust commit leaves facts already folded
while the guard says the batch never ran, and the retry folds it again.
One commit = one atomic transition = replay-safe under any crash point.
Time travel over the single root reconstructs the complete fusion view
any past batch saw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ferenda_spark.operators.fusion import fold_claims
from ferenda_spark.sources.snapshots import commit_snapshot, read_snapshot
from ferenda_spark.streaming.snapshots import batch_already_committed

_STATE_COLS = [
    "part", "source", "subj", "pred", "obj", "n_claims", "sum_conf",
    "belief", "n_sources", "confidence", "n_candidates",
]


def _pack(trust: DataFrame, facts: DataFrame, resolved: DataFrame) -> DataFrame:
    null = lambda t: F.lit(None).cast(t)  # noqa: E731

    t = trust.select(
        F.lit("trust").alias("part"), "source", null("string").alias("subj"),
        null("string").alias("pred"), null("string").alias("obj"),
        "n_claims", "sum_conf", null("double").alias("belief"),
        null("bigint").alias("n_sources"),
        null("double").alias("confidence"),
        null("bigint").alias("n_candidates"),
    )
    f = facts.select(
        F.lit("facts").alias("part"), null("string").alias("source"),
        "subj", "pred", "obj", null("bigint").alias("n_claims"),
        null("double").alias("sum_conf"), "belief", "n_sources",
        null("double").alias("confidence"),
        null("bigint").alias("n_candidates"),
    )
    r = resolved.select(
        F.lit("resolved").alias("part"), null("string").alias("source"),
        "subj", "pred", "obj", null("bigint").alias("n_claims"),
        null("double").alias("sum_conf"), null("double").alias("belief"),
        "n_sources", "confidence", "n_candidates",
    )
    return t.unionByName(f).unionByName(r)


def read_fusion_state(
    spark, root: str, version: int | None = None
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(trust, facts, resolved) as of ``version`` (default newest) —
    each a partition-pruned filter of the single state table."""
    st = read_snapshot(spark, root, version)
    trust = st.where(F.col("part") == "trust").select(
        "source", "n_claims", "sum_conf")
    facts = st.where(F.col("part") == "facts").select(
        "subj", "pred", "obj", "belief", "n_sources")
    resolved = st.where(F.col("part") == "resolved").select(
        "subj", "pred", "obj", "confidence", "n_sources", "n_candidates")
    return trust, facts, resolved


def fusion_sink(root: str):
    """``foreachBatch`` callable maintaining the fusion state under
    ``root`` — ONE atomic snapshot per micro-batch (see module
    docstring for why a single commit is load-bearing)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_already_committed(spark, root, batch_id):
            return
        try:
            trust_prev, facts_prev, resolved_prev = read_fusion_state(
                spark, root)
        except FileNotFoundError:
            trust_prev = facts_prev = resolved_prev = None
        trust2, facts2, delta = fold_claims(
            batch_df.select("source", "subj", "pred", "obj"),
            trust_prev, facts_prev,
        )
        if resolved_prev is not None:
            untouched = resolved_prev.join(
                delta.select("subj", "pred"), ["subj", "pred"], "left_anti"
            )
            resolved2 = untouched.unionByName(delta)
        else:
            resolved2 = delta
        commit_snapshot(
            _pack(trust2, facts2, resolved2),
            root,
            mode="overwrite",
            partition_by=("part",),
            meta={"batch_id": batch_id},
        )

    return sink


def run_stream_to_fusion(
    stream_df: DataFrame, root: str, checkpoint_dir: str
) -> None:
    """Drain the available claim stream (columns ``source, subj, pred,
    obj``) into the fusion state at ``root`` — Trigger.AvailableNow, one
    atomic state snapshot per micro-batch, replay-safe."""
    q = (
        stream_df.writeStream.foreachBatch(fusion_sink(root))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
