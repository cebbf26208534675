"""Trained character-n-gram language identification — the supervised
tier above ``textstats.detect_lang``'s stopword heuristic. Public
lineage: Cavnar & Trenkle 1994 (char-n-gram profiles) / the Naive-Bayes
formulation every fastText-era langid tool uses.

Everything is RELATIONAL (same design rule as functions/lm.py): the
model is two DataFrames of counts-turned-logprobs, training is two
map-side-combined groupBys over the labeled corpus, scoring is one
explode + one gram join + one (doc, lang) aggregate — so the driver
oracle replays training AND scoring in SQL, and a 100 TB labeled corpus
trains without anything touching the driver.

Pinned semantics (oracle-visible):

* grams: ALL char n-grams (default n=3) of ``lower(text)``, duplicates
  kept; docs shorter than n chars have none (score = prior alone).
* V = distinct grams across the whole training corpus (shared vocab).
* logp(lang, gram) = ln((c(lang, gram) + 1) / (N_lang + V))  [add-one]
* fallback(lang)   = ln(1 / (N_lang + V))   [unseen gram in this lang]
* prior(lang)      = ln(docs_lang / docs_total)
* score(doc, lang) = prior + Σ_grams (logp or fallback)
* prediction: row_number over (round(score, 9) DESC, lang ASC) — the
  rounding pins FP summation-order skew (~1e-16 relative) below the
  comparison, and the lang tie-break makes exact ties deterministic in
  both engines.

Scale shape: scoring's gram join fans out to at most |langs that saw
the gram| rows per doc-gram (bounded by the language count, not the
corpus); the (doc, lang) aggregate is map-side combined; the langs
dimension broadcasts."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class LangIDModel:
    gram_probs: DataFrame  # (lang, gram, logp)
    lang_stats: DataFrame  # (lang, log_prior, log_fallback)
    n: int


def char_ngrams(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, gram) — duplicates kept, document order irrelevant."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.lower(F.col(text_col)).alias("_s"),
        )
        .filter(F.length("_s") >= n)
        .select(
            "id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, length(_s) - {n - 1}),"
                    f" i -> substring(_s, i, {n}))"
                )
            ).alias("gram"),
        )
    )


def train_langid(
    labeled: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    n: int = 3,
) -> LangIDModel:
    base = labeled.select(
        F.monotonically_increasing_id().alias("_id"),
        F.col(lang_col).alias("lang"),
        F.col(text_col).alias("text"),
    )
    grams = char_ngrams(base, "_id", "text", n).join(
        base.select(F.col("_id").alias("id"), "lang"), "id"
    )
    counts = grams.groupBy("lang", "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    vocab = counts.select("gram").distinct().agg(
        F.count(F.lit(1)).alias("v")
    )
    n_lang = counts.groupBy("lang").agg(F.sum("c").alias("n_lang"))
    doc_counts = base.groupBy("lang").agg(F.count(F.lit(1)).alias("nd"))
    total_docs = base.agg(F.count(F.lit(1)).alias("ndt"))
    gram_probs = (
        counts.join(n_lang, "lang")
        .crossJoin(F.broadcast(vocab))
        .select(
            "lang", "gram",
            F.log((F.col("c") + 1) / (F.col("n_lang") + F.col("v"))).alias(
                "logp"
            ),
        )
    )
    lang_stats = (
        doc_counts.join(n_lang, "lang", "left")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(total_docs))
        .select(
            "lang",
            F.log(F.col("nd") / F.col("ndt")).alias("log_prior"),
            F.log(
                F.lit(1.0)
                / (F.coalesce(F.col("n_lang"), F.lit(0)) + F.col("v"))
            ).alias("log_fallback"),
        )
    )
    return LangIDModel(gram_probs=gram_probs, lang_stats=lang_stats, n=n)


def predict_lang(
    docs: DataFrame,
    model: LangIDModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, lang_pred, score) — one row per input doc."""
    dg = char_ngrams(docs, id_col, text_col, model.n)
    totals = dg.groupBy("id").agg(F.count(F.lit(1)).alias("n_grams"))
    matched = (
        dg.join(model.gram_probs, "gram")
        .groupBy("id", "lang")
        .agg(
            F.sum("logp").alias("m_sum"),
            F.count(F.lit(1)).alias("m_cnt"),
        )
    )
    base = (
        docs.select(F.col(id_col).alias("id"))
        .distinct()
        .crossJoin(F.broadcast(model.lang_stats))
        .join(totals, "id", "left")
    )
    scored = base.join(matched, ["id", "lang"], "left").select(
        "id", "lang",
        (
            F.col("log_prior")
            + F.coalesce(F.col("m_sum"), F.lit(0.0))
            + (
                F.coalesce(F.col("n_grams"), F.lit(0))
                - F.coalesce(F.col("m_cnt"), F.lit(0))
            )
            * F.col("log_fallback")
        ).alias("score"),
    )
    w = Window.partitionBy("id").orderBy(
        F.desc(F.round("score", 9)), F.asc("lang")
    )
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("id", F.col("lang").alias("lang_pred"), "score")
    )
