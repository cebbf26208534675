"""Training-shard sequence packing (LLM-data-pipeline operator).

No reference analog (ferenda stops at publishing); this is the operator a
training-data pipeline needs between curation and the data loader: assign
documents to fixed token-budget packs ("concat-then-chunk" packing — the
standard pretraining shard layout where documents are concatenated into a
stream and split at budget boundaries).

Semantics: within each (group, bucket) stream, documents are ordered
deterministically by id, the running token offset is computed, and a
document belongs to pack ``floor(start_offset / budget)``. Packs therefore
fill to ~budget with spillover bounded by one document (a straddling doc
counts toward the pack its first token lands in) — exactly the loader-side
chunking approximation, bit-deterministic across runs and cluster sizes.

Scale design: packing is a WINDOW cumulative sum, which executes one task
per window partition — so the stream is sharded by ``pmod(xxhash64(id),
n_buckets)`` inside each group and each (group, bucket) packs
independently in parallel. n_buckets scales the parallelism (10^4 buckets
→ 10^4 independent pack streams at 100 TB); determinism is preserved
because bucket assignment is a pure function of the id. One shuffle
(the window partitioning), everything else is codegen'd column math.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ferenda_spark.functions.textstats import token_count


def whitespace_tokens(text_col: Column) -> Column:
    """Cheap deterministic token proxy: whitespace-run split count (the
    SAME estimator as textstats.token_count / curation_verdict — one
    definition of "token" across the pack budget, the min_clean_tokens
    gate and the verdict, so pack fill can't exceed the nominal budget on
    newline-joined text; empty/blank text counts 0, not 1). Swap in a BPE
    count column when the corpus carries one."""
    return token_count(text_col)


def pack_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    text_col: str = "text",
    budget: int = 4096,
    group_cols: tuple[str, ...] = (),
    n_buckets: int = 32,
    bucket_expr: str | None = None,
) -> DataFrame:
    """Assign every document a (bucket, pack_id, start_offset) under the
    token ``budget``. ``tokens_col`` names a precomputed token count; when
    None, ``whitespace_tokens(text_col)`` is used. ``bucket_expr``
    overrides the default xxhash64 bucketing with any deterministic SQL
    expression over the row (e.g. ``"cast(pmod(doc_id, 4) as int)"`` when
    an external system must reproduce the assignment)."""
    tokens = (
        F.col(tokens_col) if tokens_col else whitespace_tokens(F.col(text_col))
    ).cast("long")
    bucket = (
        F.expr(bucket_expr)
        if bucket_expr
        else F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)).cast("int")
    )
    out = df.withColumn("n_tokens", tokens).withColumn("bucket", bucket)
    w = (
        Window.partitionBy(*group_cols, "bucket")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = out.withColumn(
        "start_offset", (F.sum("n_tokens").over(w) - F.col("n_tokens"))
    ).withColumn("pack_id", F.floor(F.col("start_offset") / budget).cast("long"))
    return out


def pack_stats(
    packed: DataFrame, budget: int, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Per-(group, bucket, pack) fill statistics — the shard manifest a
    loader consumes and the audit a curation report wants (pack count,
    token fill, fill ratio)."""
    return (
        packed.groupBy(*group_cols, "bucket", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .withColumn(
            "fill_ratio",
            (F.col("n_tokens") / F.lit(float(budget))).cast("double"),
        )
    )


def token_budget_sample(
    df: DataFrame,
    budgets: dict[str, int] | int,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Data-mixture construction: a deterministic per-stratum sample under
    a token budget — the step that turns per-source/per-language token
    TARGETS (the mixture recipe of every public pretraining report: e.g.
    "30% web, 4.5% code" in LLaMA's table 1) into an actual document set.

    Within each stratum, documents are taken in md5(id) order (uniform,
    engine-independent, reproducible) while their cumulative token START
    offset is below the stratum's budget — greedy prefix: the straddling
    document is INCLUDED, so a stratum reaches ≥ budget tokens when it has
    them (overshoot bounded by one document), and a stratum with fewer
    tokens than budget is taken whole.

    ``budgets``: one int for all strata, or {stratum_value: budget} (strata
    absent from the dict are dropped entirely — an explicit recipe).

    Returns df's columns + ``n_tokens`` + ``start_offset``. One window
    shuffle keyed on the stratum; at web scale strata (languages, source
    buckets) are few and big, so shard hot strata first (see
    pack_documents' n_buckets pattern) if a single stratum's stream
    exceeds one task's comfort — for budget SELECTION the order must stay
    global per stratum, so the scale path is: pre-filter with a cheap
    per-bucket quantile of md5 order, then exact-window the survivors."""
    ntok = (
        F.col(tokens_col) if tokens_col else whitespace_tokens(F.col(text_col))
    ).cast("bigint")
    base = df.withColumn("n_tokens", ntok)
    if isinstance(budgets, int):
        budget_expr = F.lit(budgets).cast("bigint")
    else:
        pairs = [x for k, v in budgets.items() for x in (F.lit(k), F.lit(v))]
        budget_expr = F.element_at(
            F.create_map(*pairs), F.col(strata_col).cast("string")
        ).cast("bigint")
    w = (
        Window.partitionBy(strata_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = base.withColumn(
        "start_offset", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return out.filter(
        budget_expr.isNotNull() & (F.col("start_offset") < budget_expr)
    )
