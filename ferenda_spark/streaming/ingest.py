"""Structured-Streaming ingest: the idiomatic-Spark upgrade of the
reference's incremental batch downloads (SURVEY §2.9).

The reference has NO streaming operators — `download_if_needed` +
`list_basefiles_for` is incremental *batch* ([ref:
ferenda/documentrepository.py :: download_if_needed], [ref:
ferenda/documentstore.py :: list_basefiles_for]); the batch restatement is
the ledger anti-join (operators/ledger.py, SURVEY J9). This module is the
optional streaming form of the same semantics, claimed as an upgrade and
not as reference parity:

- `stream_corpus` — file-source `readStream` over a corpus directory
  (input_hint schema). Spark's streaming checkpoint tracks which files
  each epoch consumed: exactly-once progress without our ledger.
- `run_streaming_ingest` — `foreachBatch` runs the SAME parse → link →
  assemble operators per micro-batch and appends to the same stage-table
  layout the batch pipeline writes; `Trigger.AvailableNow` drains all
  currently-available files then stops (the "nightly incremental build" as
  a stream). Re-invoking after new files land processes ONLY the new
  files — the streaming restatement of `list_basefiles_for("parse")`.
- `streaming_feed_counts` — watermarked event-time rollup over `warc_ts`
  (the streaming form of the A-family feed aggregates): late pages beyond
  the watermark are dropped, state is bounded.

Scale: each micro-batch is a normal Spark job over the new files only, so
all batch-side partitioning/broadcast decisions (parse mapInPandas, exact
broadcast linking, prefix-filtered fuzzy tier) apply unchanged. State on
the driver is O(tracked files) for the file source and O(open windows) for
the watermark agg — both bounded.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ferenda_spark.schemas import CORPUS


def stream_corpus(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source readStream over a corpus parquet directory. Schema must
    be declared (streaming sources do no inference): input_hint schema."""
    return (
        spark.readStream.schema(CORPUS)
        # bound per-epoch work: a micro-batch is at most this many files
        .option("maxFilesPerTrigger", 64)
        .parquet(input_dir)
    )


def run_streaming_ingest(
    spark: SparkSession,
    input_dir: str,
    dictionary: DataFrame,
    out_dir: str,
    n_parts: int = 64,
) -> dict[str, str]:
    """Drain all available corpus files through parse → link → assemble,
    appending to stage tables under `out_dir`. Returns table paths.

    Exactly-once contract: the streaming checkpoint (under
    `out_dir/_stream_checkpoint`) commits the file-source offsets only
    after the epoch's foreachBatch returns, and foreachBatch appends are
    the only writes — a crash mid-epoch replays that epoch's files on
    restart. (Appends make replays at-least-once per table; with Iceberg
    the append becomes an atomic commit keyed on epoch_id for true
    exactly-once. The ledger-based batch pipeline stays the strict-
    idempotence path.)
    """
    from ferenda_spark.operators.linking import link_mentions_onepass
    from ferenda_spark.operators.parse import parse_stage, split_parsed
    from ferenda_spark.operators.triples import assemble_triples

    paths = {
        "docs": os.path.join(out_dir, "docs"),
        "lineage": os.path.join(out_dir, "lineage"),
        "triples": os.path.join(out_dir, "triples"),
        "checkpoint": os.path.join(out_dir, "_stream_checkpoint"),
    }

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        docs, lineage = split_parsed(parse_stage(batch_df, n_parts=n_parts))
        docs = docs.cache()
        try:
            docs.write.mode("append").parquet(paths["docs"])
            lineage.withColumn("epoch_id", F.lit(epoch_id)).write.mode(
                "append"
            ).parquet(paths["lineage"])
            mentions = docs.select(
                "url", "part_key", F.explode("mentions").alias("m")
            ).select("url", "part_key", F.col("m.*"))
            # one-pass linking: a micro-batch pays the link DAG's *fixed*
            # stage costs every epoch, so the single-resolve+single-join
            # form matters even more here than in the batch job
            links = link_mentions_onepass(mentions, dictionary)
            assemble_triples(docs, links).write.mode("append").parquet(
                paths["triples"]
            )
        finally:
            docs.unpersist()

    q = (
        stream_corpus(spark, input_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", paths["checkpoint"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return paths


def streaming_feed_counts(
    corpus_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked event-time rollup: pages per (time window, lang).
    The streaming form of the feed aggregates — append-mode capable
    (windows finalize once the watermark passes), bounded state."""
    return (
        corpus_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("lang"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_docs",
        )
    )
