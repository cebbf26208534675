"""Cross-batch incremental deduplication against a persistent
fingerprint store — the operator that lets a 10^12-document pipeline
dedup each NEW crawl batch against ALL history without ever rescanning
history's text: the store holds only 64-bit fingerprints (snapshot-
committed, columnar), so "history" is a skinny uniform-key table the
new batch anti-joins in one shuffle.

Crash-safety/idempotence contract (the checkpoint-resume story of the
north rule, extended across batches): each batch commit records its
``batch_id`` in the snapshot manifest meta. A RETRY of a batch whose
commit already landed must not dedup the batch against its own
fingerprints — the store view excludes the dirs that batch itself
committed (manifest dirs are append-only, so version v's own dirs are
``dirs(v) − dirs(v−1)``) and the re-commit is skipped. Other batches'
later commits remain visible, so concurrent ingest lines converge.

Scale shape: in-batch winner selection is one fp-keyed groupBy (64-bit
uniform, skew-free); the history anti-join is one hash join against an
fp-only column-pruned scan; the commit appends O(batch) bytes (never
rewrites history — same discipline as the POS batch appends,
plans/pipeline.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ferenda_spark.functions.textstats import doc_fingerprint
from ferenda_spark.sources.snapshots import (
    _read_manifest,
    commit_snapshot,
    current_version,
    snapshot_history,
)


def _store_view(
    spark, root: str, batch_id: str
) -> tuple[DataFrame | None, int | None]:
    """(history fingerprints excluding this batch's own commit, the
    already-committed version for this batch_id if any)."""
    head = current_version(spark, root)
    if head == 0:
        return None, None
    own_version = None
    own_dirs: set[str] = set()
    for m in snapshot_history(spark, root):
        if (m.get("meta") or {}).get("batch_id") == batch_id:
            own_version = m["version"]
            parent_dirs = (
                set(_read_manifest(spark, root, own_version - 1)["dirs"])
                if own_version > 1
                else set()
            )
            own_dirs = set(m["dirs"]) - parent_dirs
            break
    dirs = [
        d
        for d in _read_manifest(spark, root, head)["dirs"]
        if d not in own_dirs
    ]
    if not dirs:
        return None, own_version
    return (
        spark.read.parquet(*[f"{root}/{d}" for d in dirs]).select("fp"),
        own_version,
    )


def dedup_against_store(
    batch: DataFrame,
    store_root: str,
    batch_id: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, int]:
    """Dedup ``batch`` in-batch (keep min id per fingerprint) AND against
    every previously committed batch, then commit the survivors'
    fingerprints as a new append snapshot tagged ``batch_id``.

    Returns (surviving rows of ``batch``, store version holding this
    batch's fingerprints). Re-running with the same batch_id returns the
    identical survivor set and commits nothing new."""
    spark = batch.sparkSession
    keyed = batch.withColumn("_fp", doc_fingerprint(F.col(text_col)))
    winners = keyed.groupBy("_fp").agg(F.min(id_col).alias(id_col))

    history, own_version = _store_view(spark, store_root, batch_id)
    if history is not None:
        winners = winners.join(
            history.withColumnRenamed("fp", "_fp"), "_fp", "left_anti"
        )

    survivors = keyed.join(
        winners.select(id_col), id_col, "left_semi"
    ).drop("_fp")
    if own_version is not None:
        return survivors, own_version
    version = commit_snapshot(
        winners.select(F.col("_fp").alias("fp")),
        store_root,
        mode="append",
        meta={"batch_id": batch_id},
    )
    return survivors, version
