"""N-gram language-model perplexity scoring — the CCNet-style quality
signal (Wenzek et al. 2020 filter Common-Crawl text by LM perplexity;
Brants et al. 2007 "stupid backoff" shows the inexpensive score that
works at web scale). A document whose word sequences look nothing like
the reference corpus (boilerplate, lorem-ipsum farms, non-language) gets
high perplexity and is down-weighted or dropped at curation time.

Everything here is RELATIONAL — counts live in DataFrames, scoring is
explode + hash joins — so (a) no model ever sits on the driver, (b) the
driver oracle can replay both training and scoring in plain SQL, and
(c) the same code trains on a 100 TB reference slice where the vocab
tables are far beyond broadcast size.

Pinned semantics (oracle-visible):

* tokens: ``textstats.tokens`` over lowercased text (trim + ``\\s+``
  split, empty fragments filtered).
* bigram score, stupid backoff with factor ``alpha``:
  S(w2|w1) = c(w1 w2) / c(w1)           if the bigram was seen,
  S(w2|w1) = alpha * (c(w2)+1) / (N+1)  otherwise
  — the +1 add-one keeps unseen-vocabulary words finite (a pinned,
  documented choice; CCNet maps them to <unk> instead). N = total
  training tokens.
* doc score: nll = mean over the doc's bigrams of −ln S; ppl = e^nll.
  Docs with < 2 tokens have no bigrams → NULL nll/ppl (both engines).

Scale shape: training is two map-side-combined groupBys (unigrams,
bigrams). Scoring explodes each doc's bigrams once and hash-joins the
two count tables; the unigram key is Zipf-skewed (``the`` …) — at small
scale the dims broadcast, at 100 TB AQE's skew-join split handles the
hot keys; fan-out per joined row is exactly 1 (count tables are keyed
DISTINCT by construction). N rides along as a one-row broadcast, never
a driver constant."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ferenda_spark.functions.textstats import tokens


@dataclass
class NgramLM:
    unigrams: DataFrame  # (tok, c_uni)
    bigrams: DataFrame   # (w1, w2, c_bi)
    total: DataFrame     # one row: (n_tokens)
    alpha: float = 0.4


def _doc_bigrams(
    df: DataFrame, id_col: str, text_col: str, lowercase: bool = True
) -> DataFrame:
    """(id, w1, w2) — one row per bigram OCCURRENCE (duplicates kept:
    scoring averages over positions, not types)."""
    txt = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    t = df.select(
        F.col(id_col).alias("id"), tokens(txt).alias("_toks")
    ).filter(F.size("_toks") >= 2)
    return t.select(
        "id",
        F.explode(
            F.sequence(F.lit(1), F.size("_toks") - 1)
        ).alias("_i"),
        "_toks",
    ).select(
        "id",
        F.element_at("_toks", F.col("_i")).alias("w1"),
        F.element_at("_toks", F.col("_i") + 1).alias("w2"),
    )


def train_ngram_lm(
    corpus: DataFrame,
    text_col: str = "text",
    alpha: float = 0.4,
    lowercase: bool = True,
) -> NgramLM:
    """Count tables from a reference corpus; nothing is collected."""
    txt = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    toks = corpus.select(
        F.monotonically_increasing_id().alias("id"),
        tokens(txt).alias("_toks"),
    )
    uni = (
        toks.select(F.explode("_toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c_uni"))
    )
    bi = (
        _doc_bigrams(
            corpus.select(
                F.monotonically_increasing_id().alias("_id"), text_col
            ),
            "_id", text_col, lowercase,
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_bi"))
    )
    total = uni.agg(F.sum("c_uni").alias("n_tokens"))
    return NgramLM(unigrams=uni, bigrams=bi, total=total, alpha=alpha)


def score_perplexity(
    docs: DataFrame,
    lm: NgramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """(id, n_bigrams, avg_nll, ppl) — one row per input doc; docs with
    fewer than two tokens keep NULL avg_nll/ppl."""
    db = _doc_bigrams(docs, id_col, text_col, lowercase)
    scored = (
        db.join(lm.bigrams, ["w1", "w2"], "left")
        .join(
            lm.unigrams.select(
                F.col("tok").alias("w1"), F.col("c_uni").alias("c_w1")
            ),
            "w1", "left",
        )
        .join(
            lm.unigrams.select(
                F.col("tok").alias("w2"), F.col("c_uni").alias("c_w2")
            ),
            "w2", "left",
        )
        .crossJoin(F.broadcast(lm.total))
        .select(
            "id",
            F.when(
                F.col("c_bi").isNotNull(),
                F.col("c_bi") / F.col("c_w1"),
            )
            .otherwise(
                F.lit(lm.alpha)
                * (F.coalesce(F.col("c_w2"), F.lit(0)) + 1)
                / (F.col("n_tokens") + 1)
            )
            .alias("_s"),
        )
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg(-F.log("_s")).alias("avg_nll"),
        )
    )
    base = docs.select(F.col(id_col).alias("id")).distinct()
    return base.join(scored, "id", "left").select(
        "id",
        F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
        "avg_nll",
        F.exp("avg_nll").alias("ppl"),
    )
