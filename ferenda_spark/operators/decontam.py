"""Eval-set decontamination: flag training documents whose word n-grams
overlap a benchmark/eval corpus (the GPT-3-appendix-C-style n-gram
overlap check every serious training-data pipeline runs before
releasing a corpus).

Definitions (shared with the rest of the repo so the driver oracle can
replay them): tokens are ``functions.textstats.tokens`` (trimmed ``\\s+``
split, empty → []); an n-gram is n consecutive tokens joined by a single
space; a document's gram set is DISTINCT; overlap = |doc grams ∩ eval
grams| / |doc grams|; contaminated = (matched ≥ min_hits) AND
(overlap ≥ threshold). Docs with no grams (shorter than n tokens) are
kept with n_grams=0, never flagged.

Scale shape at 100 TB: the gram explode is map-side; the per-doc
DISTINCT is one (doc, gram) shuffle with uniform 2-part keys; the eval
side is DISTINCT'd once and joined on the gram — per (doc, gram) the
eval side contributes at most one row, so fan-out is bounded regardless
of how common a gram is in the corpus (no all-pairs blowup). Small eval
sets broadcast (AQE decides); a billion-gram eval set degrades to an
ordinary uniform hash join. The token/line arrays are pre-projected as
real columns BEFORE entering higher-order-function lambdas — a free
expression inside a Spark HOF lambda re-evaluates per array element
(measured 4-12x on the repetition operator, SURVEY §10.1)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ferenda_spark.functions.textstats import tokens


def _gram_col(toks: str, n: int) -> F.Column:
    """token-array column name → array<string> of its word n-grams."""
    t = F.col(toks)
    return F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - n + 1),
            lambda i: F.array_join(F.slice(t, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def doc_ngrams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    lowercase: bool = True,
) -> DataFrame:
    """(id, gram) — DISTINCT word n-grams per document."""
    txt = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    return (
        df.select(F.col(id_col).alias("id"), tokens(txt).alias("_toks"))
        .select("id", F.explode(_gram_col("_toks", n)).alias("gram"))
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
    n: int = 8,
    threshold: float = 0.5,
    min_hits: int = 1,
    lowercase: bool = True,
) -> DataFrame:
    """Per-document overlap report: (id, n_grams, n_matched,
    overlap_frac, contaminated). Every input doc appears exactly once;
    ``eval_docs`` only needs ``eval_text_col``."""
    dg = doc_ngrams(docs, id_col, text_col, n, lowercase)
    ev = (
        doc_ngrams(
            eval_docs.select(F.col(eval_text_col).alias("text")).withColumn(
                "_i", F.monotonically_increasing_id()
            ),
            "_i", "text", n, lowercase,
        )
        .select("gram")
        .distinct()
    )
    totals = dg.groupBy("id").agg(F.count(F.lit(1)).alias("n_grams"))
    matched = (
        dg.join(ev, "gram", "inner")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    base = docs.select(F.col(id_col).alias("id")).distinct()
    out = (
        base.join(totals, "id", "left")
        .join(matched, "id", "left")
        .select(
            "id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_matched", F.lit(0)).alias("n_matched"),
        )
    )
    frac = F.when(
        F.col("n_grams") > 0, F.col("n_matched") / F.col("n_grams")
    ).otherwise(F.lit(0.0))
    return out.select(
        "id", "n_grams", "n_matched",
        frac.alias("overlap_frac"),
        (
            (F.col("n_matched") >= F.lit(min_hits))
            & (frac >= F.lit(threshold))
        ).alias("contaminated"),
    )
