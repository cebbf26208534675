"""Composite curation filter: the keep/drop decision pass of a
training-data pipeline, with machine-readable drop reasons.

No reference analog (ferenda curates by source, not by content); this
composes the existing signals — token counts, quality heuristics
(functions/textstats.py), PII density (functions/pii.py), chunk-level
repetition (operators/dedup.py) — into ONE verdict column plus a reasons
array, the way production cleaning pipelines (C4, Gopher, RefinedWeb) do:

- every rule is a named, independently-evaluated predicate; a doc collects
  EVERY reason it violates (not just the first) so the reason histogram is
  a faithful audit of the corpus, not an artifact of rule order;
- everything is column expressions over one projection — the verdict pass
  adds no shuffle; only the optional repetition rule needs the
  duplicate-chunk join (explicitly opt-in via ``dup_fraction_col``);
- thresholds are keyword arguments with documented defaults, because every
  corpus re-tunes them; the DEFAULTS are deliberately permissive (drop
  only clear garbage).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ferenda_spark.functions.pii import pii_counts
from ferenda_spark.functions.textstats import (
    mean_token_len,
    quality_score,
    token_count,
)


def curation_verdict(
    text: Column,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_quality: float = 0.4,
    max_pii_per_kchar: float = 5.0,
    dup_fraction_col: Column | None = None,
    max_dup_fraction: float = 0.6,
    line_repetition: bool = False,
    max_dup_line_fraction: float = 0.30,
    max_bullet_fraction: float = 0.90,
    max_ellipsis_fraction: float = 0.30,
    ngram_flag_col: Column | None = None,
    extra_rules: list[tuple[str, Column]] | None = None,
) -> Column:
    """STRUCT(keep: boolean, reasons: array<string>) for one text column.

    Rules (each contributes its name to ``reasons`` when violated):
    ``too_short`` / ``too_long`` (token count), ``low_quality``
    (quality_score below threshold), ``gibberish`` (mean token length
    outside [1.5, 14] — binary junk or no word separators), ``pii_dense``
    (recognized PII spans per 1000 chars above threshold), and
    ``repetitive`` when a duplicate-chunk fraction column is supplied.

    Gopher-style repetition rules (operators/repetition.py) are opt-in:
    ``line_repetition=True`` adds ``dup_lines`` / ``listy`` from the
    zero-shuffle line signals inline in the same projection; the n-gram
    signals need their own explode-groupBy pass, so callers compute them
    with ``repetition_signals()`` and pass the gate as ``ngram_flag_col``
    (reason ``ngram_repetition``). Off by default: thresholds assume
    real-page lengths and the driver-contract queries pin the default
    reason set."""
    # NULL text (extraction failed / never ran) must not sail through: a
    # NULL token count would make every rule condition NULL → no reasons →
    # keep. Treat missing text as zero tokens so too_short fires.
    n = F.coalesce(token_count(text), F.lit(0))
    mtl = F.coalesce(mean_token_len(text), F.lit(0.0))
    pii_total = None
    for c in pii_counts(text).values():
        pii_total = c if pii_total is None else (pii_total + c)
    pii_density = F.when(
        F.length(text) > 0,
        pii_total.cast("double") * 1000.0 / F.length(text),
    ).otherwise(F.lit(0.0))

    rules: list[tuple[str, Column]] = [
        ("too_short", n < min_tokens),
        ("too_long", n > max_tokens),
        ("low_quality", quality_score(text) < min_quality),
        ("gibberish", (n >= 1) & ((mtl < 1.5) | (mtl > 14.0))),
        ("pii_dense", pii_density > max_pii_per_kchar),
    ]
    if dup_fraction_col is not None:
        rules.append(("repetitive", dup_fraction_col > max_dup_fraction))
    if line_repetition:
        from ferenda_spark.operators.repetition import (
            bullet_start_fraction,
            duplicate_line_fraction,
            ellipsis_end_fraction,
        )

        rules.append(
            ("dup_lines", duplicate_line_fraction(text) > max_dup_line_fraction)
        )
        rules.append(
            (
                "listy",
                (bullet_start_fraction(text) > max_bullet_fraction)
                | (ellipsis_end_fraction(text) > max_ellipsis_fraction),
            )
        )
    if ngram_flag_col is not None:
        rules.append(("ngram_repetition", F.coalesce(ngram_flag_col, F.lit(False))))
    if extra_rules:
        # caller-computed gate columns (decontamination, LM perplexity,
        # classifier score, …) — each (reason_name, boolean Column); a
        # NULL condition contributes no reason, same as every rule above
        rules.extend(extra_rules)

    reasons = F.filter(
        F.array(
            *[
                F.when(cond, F.lit(name)).otherwise(F.lit(None))
                for name, cond in rules
            ]
        ),
        lambda r: r.isNotNull(),
    )
    return F.struct(
        (F.size(reasons) == 0).alias("keep"), reasons.alias("reasons")
    )


def apply_curation(
    df: DataFrame, text_col: str = "text", **thresholds
) -> DataFrame:
    """df + ``keep``/``reasons`` columns (the audit form — write this,
    don't filter silently; the kept view is ``.filter("keep")``)."""
    v = curation_verdict(F.col(text_col), **thresholds)
    return df.withColumn("_v", v).select(
        "*", F.col("_v.keep").alias("keep"), F.col("_v.reasons").alias("reasons")
    ).drop("_v")


def reason_histogram(df: DataFrame) -> DataFrame:
    """(reason, n_docs) — the corpus-cleaning audit table. A doc counts
    once per violated rule (reasons are independent, see module doc)."""
    return (
        df.select(F.explode("reasons").alias("reason"))
        .groupBy("reason")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
