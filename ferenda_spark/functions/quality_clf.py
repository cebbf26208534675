"""Model-based quality filtering — the fastText-style classifier filter
of GPT-3/LLaMA-class pipelines (train on a trusted reference corpus as
positives vs raw crawl as negatives, keep crawl docs the model scores
reference-like). Public lineage: Brown et al. 2020 appendix A
(quality classifier over Common Crawl), Joulin et al. 2016 (fastText:
linear model over hashed bag-of-words).

Design split — train tiny, score big:

* TRAINING collects a DETERMINISTIC hash-smallest sample per class
  (ordered by xxhash64 of the text — partitioning-independent), builds
  L1-normalized hashed bag-of-words vectors, and runs full-batch
  logistic-regression gradient descent in driver numpy: zero init,
  fixed epochs/learning rate, no randomness → bit-reproducible weights
  on any cluster size.
* SCORING never touches Python: tokens explode JVM-side, bucket =
  pmod(xxhash64(token), n_buckets), per-doc bucket counts are one
  map-side-combined groupBy, the weight table (n_buckets rows) joins
  broadcast, and the sigmoid is a column expression. One shuffle keyed
  on (doc, bucket) — uniform by construction.

The token definition is ``textstats.tokens`` over lowercased text, same
as the LM/decontam operators."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ferenda_spark.functions.textstats import tokens


@dataclass
class QualityModel:
    weights: DataFrame  # (bucket, weight) — exactly n_buckets rows
    bias: float
    n_buckets: int


def _bucket_counts(
    df: DataFrame, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    """(id, bucket, c, total) — hashed bag-of-words, one groupBy."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
    )
    per = toks.select(
        "id", F.pmod(F.xxhash64("tok"), F.lit(n_buckets)).alias("bucket")
    ).groupBy("id", "bucket").agg(F.count(F.lit(1)).alias("c"))
    tot = per.groupBy("id").agg(F.sum("c").alias("total"))
    return per.join(tot, "id")


def train_quality_classifier(
    positives: DataFrame,
    negatives: DataFrame,
    text_col: str = "text",
    n_buckets: int = 4096,
    sample_per_class: int = 2000,
    epochs: int = 200,
    lr: float = 0.5,
    l2: float = 1e-4,
) -> QualityModel:
    """Deterministic logistic regression over hashed features. The
    driver holds sample_per_class × n_buckets floats — the 100 TB corpus
    never leaves the executors (only the hash-smallest sample rows do,
    same discipline as IVF/BPE training)."""
    import numpy as np

    spark = positives.sparkSession

    def _sample_vectors(df: DataFrame) -> "np.ndarray":
        sm = (
            df.select(F.col(text_col).alias("text"))
            .withColumn("_h", F.xxhash64("text"))
            .orderBy("_h", "text")
            .limit(sample_per_class)
            .withColumn("_i", F.monotonically_increasing_id())
        )
        rows = (
            _bucket_counts(sm, "_i", "text", n_buckets)
            .select("id", "bucket", "c", "total")
            .collect()
        )
        ids = sorted({r["id"] for r in rows})
        idx = {v: i for i, v in enumerate(ids)}
        x = np.zeros((len(ids), n_buckets))
        for r in rows:
            x[idx[r["id"]], r["bucket"]] = r["c"] / r["total"]
        return x

    xp, xn = _sample_vectors(positives), _sample_vectors(negatives)
    x = np.vstack([xp, xn])
    y = np.concatenate([np.ones(len(xp)), np.zeros(len(xn))])
    w = np.zeros(n_buckets)
    b = 0.0
    for _ in range(epochs):
        z = x @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (x.T @ g / len(y) + l2 * w)
        b -= lr * float(g.mean())
    wdf = spark.createDataFrame(
        [(int(i), float(w[i])) for i in range(n_buckets)],
        "bucket bigint, weight double",
    )
    return QualityModel(weights=wdf, bias=float(b), n_buckets=n_buckets)


def score_quality(
    docs: DataFrame,
    model: QualityModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, quality_score) for every input doc; empty docs score
    sigmoid(bias)."""
    bc = _bucket_counts(docs, id_col, text_col, model.n_buckets)
    z = (
        bc.join(F.broadcast(model.weights), "bucket")
        .groupBy("id")
        .agg(
            F.sum(F.col("weight") * F.col("c") / F.col("total")).alias("_z")
        )
    )
    base = docs.select(F.col(id_col).alias("id")).distinct()
    logit = F.coalesce(F.col("_z"), F.lit(0.0)) + F.lit(model.bias)
    return base.join(z, "id", "left").select(
        "id", (F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))).alias(
            "quality_score"
        )
    )
