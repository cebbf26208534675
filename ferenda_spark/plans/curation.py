"""The training-data curation DAG: the LLM-pipeline operators composed
end-to-end (documents → audit/filter → boilerplate removal → PII redaction
→ split → token-budget shard packing → manifest).

No reference analog (ferenda publishes documents; it does not prepare
training corpora) — this plan is the "large-scale training-data pipeline"
composition of the curation operators the engine ships, each of which is
individually oracle-backed in the driver contract (`dedup_exact_stats`,
`chunk_dedup_*`, `pii_redact`, `text_quality`, `corpus_hash_split`,
`pack_training_shards`). The value of the plan is the WIRING: verdicts are
written as an audit table (never silently filtered), boilerplate removal
feeds the curation threshold that depends on it, and packing runs per
(split, group, bucket) stream so shard assignment is deterministic across
cluster sizes.

Shuffle budget (the whole DAG, at any scale):
  1. chunk-fingerprint window  (duplicate_chunk_fraction — skew-free 64-bit key)
  2. chunk-fingerprint window  (drop_duplicate_chunks inside dedup_clean_text)
  3. groupBy(id) reassembly    (dedup_clean_text)
  4. (split, group, bucket) window  (pack_documents)
  5. manifest HashAggregate    (pack_stats — O(packs) rows)
Everything else — verdicts, redaction, splits, token counts — is
whole-stage-codegen'd column math on the way through.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ferenda_spark.functions.packing import pack_documents, pack_stats
from ferenda_spark.functions.pii import redact_pii
from ferenda_spark.functions.splits import hash_split
from ferenda_spark.functions.textstats import token_count
from ferenda_spark.operators.curation import apply_curation, reason_histogram
from ferenda_spark.operators.dedup import (
    dedup_clean_text,
    duplicate_chunk_fraction,
)
from ferenda_spark.sources import catalog

DEFAULT_SPLITS = {"train": 0.98, "val": 0.01, "test": 0.01}


def curate_corpus(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_cols: tuple[str, ...] = ("source",),
    chunk_n: int = 64,
    budget: int = 2048,
    n_buckets: int = 32,
    splits: dict[str, float] | None = None,
    min_clean_tokens: int = 10,
    materialize=None,
    decontam_eval: DataFrame | None = None,
    decontam_n: int = 8,
    decontam_threshold: float = 0.5,
    lm_model=None,
    max_avg_nll: float = 8.0,
    quality_model=None,
    min_quality_prob: float = 0.5,
    **thresholds,
) -> dict[str, DataFrame]:
    """Pure-DataFrame form of the DAG — returns the four output frames
    without writing (run_curation_pipeline materializes them):

    - ``verdicts``: every input doc + keep/reasons (+dup_fraction) — the
      audit table; filtering is ALWAYS derived from this, never implicit.
    - ``reasons``: (reason, n_docs) histogram over dropped docs.
    - ``shards``: kept docs with boilerplate-removed, PII-redacted text,
      split label and (bucket, pack_id, start_offset) shard assignment.
    - ``manifest``: per (split, group, bucket, pack) token-fill stats —
      what a data loader consumes.

    ``materialize`` (optional): ``(name, df) -> df`` hook called at the two
    stage boundaries whose outputs feed multiple consumers (``verdicts``
    feeds the reasons histogram AND the kept-docs path; ``shards`` feeds
    the manifest). run_curation_pipeline passes a write-then-read-back
    hook so the expensive upstream (verdict projection + the two
    chunk-fingerprint windows + reassembly) executes ONCE per run instead
    of once per downstream output — the same stage-table discipline as the
    KG DAG (plans/pipeline.py). Default: identity (pure lazy frames)."""
    splits = DEFAULT_SPLITS if splits is None else splits
    mat = materialize or (lambda _name, df: df)

    # C1: corpus-level repetition signal first — the curation verdict's
    # `repetitive` rule needs it, so it cannot run after filtering
    dup = duplicate_chunk_fraction(documents, text_col, id_col, chunk_n)
    with_dup = documents.join(
        dup.select(F.col("id").alias(id_col), "dup_fraction"), id_col, "left"
    ).withColumn("dup_fraction", F.coalesce("dup_fraction", F.lit(0.0)))

    # C1.5: opt-in webtext gates — each computes its signal in its own
    # bounded pass (shuffle shapes documented in the operator modules) and
    # joins ONE column back on the id; the verdict then reads plain
    # columns, so the audit table records these reasons like any other.
    # Defaults off: the driver-contract queries pin the default reason
    # set, and each gate's cost is only paid when its model/eval set is
    # supplied.
    extra_rules: list[tuple[str, F.Column]] = []
    if decontam_eval is not None:
        from ferenda_spark.operators.decontam import decontaminate

        dec = decontaminate(
            documents, decontam_eval, id_col, text_col,
            n=decontam_n, threshold=decontam_threshold,
        )
        with_dup = with_dup.join(
            dec.select(F.col("id").alias(id_col),
                       F.col("contaminated").alias("_contaminated")),
            id_col, "left",
        )
        extra_rules.append(
            ("contaminated", F.coalesce("_contaminated", F.lit(False)))
        )
    if lm_model is not None:
        from ferenda_spark.functions.lm import score_perplexity

        ppl = score_perplexity(documents, lm_model, id_col, text_col)
        with_dup = with_dup.join(
            ppl.select(F.col("id").alias(id_col),
                       F.col("avg_nll").alias("_avg_nll")),
            id_col, "left",
        )
        # NULL avg_nll (< 2 tokens) adds no reason — too_short covers it
        extra_rules.append(
            ("high_perplexity", F.col("_avg_nll") > F.lit(max_avg_nll))
        )
    if quality_model is not None:
        from ferenda_spark.functions.quality_clf import score_quality

        qs = score_quality(documents, quality_model, id_col, text_col)
        with_dup = with_dup.join(
            qs.select(F.col("id").alias(id_col),
                      F.col("quality_score").alias("_quality_prob")),
            id_col, "left",
        )
        extra_rules.append(
            (
                "low_quality_model",
                F.coalesce("_quality_prob", F.lit(0.0))
                < F.lit(min_quality_prob),
            )
        )

    # C2: verdicts (audit form)
    verdicts = mat(
        "verdicts",
        apply_curation(
            with_dup,
            text_col=text_col,
            dup_fraction_col=F.col("dup_fraction"),
            extra_rules=extra_rules or None,
            **thresholds,
        ).drop("_contaminated", "_avg_nll", "_quality_prob"),
    )
    reasons = reason_histogram(verdicts.filter(~F.col("keep")))

    # C3: boilerplate removal on the KEPT docs only (dropped docs must not
    # influence which chunk copy survives), then PII redaction on the
    # reassembled text
    kept = verdicts.filter(F.col("keep"))
    clean = dedup_clean_text(kept, text_col, id_col, chunk_n).withColumnRenamed(
        "id", id_col
    )
    cleaned = (
        kept.drop("keep", "reasons")
        .join(clean, id_col)
        .withColumn("clean_text", redact_pii(F.col("clean_text")))
    )
    # docs reduced to (near-)nothing by boilerplate removal leave the
    # training set here — recorded via n_kept_chunks in the shards table's
    # lineage, not silently (the verdict table still has the doc)
    # token_count = the one shared token definition (same as the verdict's
    # n_tokens and the pack budget) — a plain split(' ') would undercount
    # newline-joined text and count empty text as 1
    cleaned = cleaned.filter(token_count(F.col("clean_text")) >= min_clean_tokens)

    # C4: deterministic split + packing per (split, group, bucket) stream
    with_split = cleaned.withColumn("split", hash_split(F.col(id_col), splits))
    shards = mat(
        "shards",
        pack_documents(
            with_split,
            id_col=id_col,
            text_col="clean_text",
            budget=budget,
            group_cols=("split", *group_cols),
            n_buckets=n_buckets,
        ),
    )
    manifest = pack_stats(shards, budget, ("split", *group_cols))
    return {
        "verdicts": verdicts,
        "reasons": reasons,
        "shards": shards,
        "manifest": manifest,
    }


def run_curation_pipeline(
    spark: SparkSession,
    documents: DataFrame,
    out_dir: str,
    **kwargs,
) -> dict[str, str]:
    """Materialize the curation DAG under ``out_dir`` through the catalog
    seam. Shards are partitioned by (split, bucket) so a loader reading
    one split's shards prunes to its directories; verdicts ride the same
    partition-by-nothing audit-table convention as the lineage table.

    Stage-table reuse (measured at 1M docs, tools/curation_job.py): the
    verdicts and shards tables are written ONCE and read back for their
    downstream consumers, so the verdict projection and the two
    chunk-fingerprint windows never recompute per output — without the
    hook, four lazy writes re-execute the shared upstream four times."""
    paths = {
        name: os.path.join(out_dir, name)
        for name in ("verdicts", "reasons", "shards", "manifest")
    }

    def _mat(name: str, df: DataFrame) -> DataFrame:
        if name == "shards":
            catalog.write_table(
                df.repartition("split", "bucket"),
                paths[name],
                partition_by=("split", "bucket"),
            )
        else:
            catalog.write_table(df, paths[name])
        return catalog.read_table(spark, paths[name])

    frames = curate_corpus(documents, materialize=_mat, **kwargs)
    catalog.write_table(frames["reasons"], paths["reasons"])
    catalog.write_table(frames["manifest"], paths["manifest"])
    return paths
