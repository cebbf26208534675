"""DSIR-style data selection: hashed-n-gram importance resampling of a
raw web corpus toward a target domain (Xie et al. 2023, "Data Selection
for Language Models via Importance Resampling").

The selection step a training-data pipeline runs between cleaning and
tokenization: given a small in-domain TARGET sample (the distribution you
want) and the huge RAW corpus (the distribution you have), estimate
per-document importance weights

    log w(doc) = Σ_{token t ∈ doc} [ log p̂_target(h(t)) − log p̂_raw(h(t)) ]

under hashed bag-of-words feature distributions (h = 60-bit hash mod
``n_buckets``; add-one smoothing), then sample documents ∝ w^(1/T) with
Gumbel top-k — the exact without-replacement sampler for softmax weights.

Everything is relational and oracle-replayable:

- feature extraction is the repo's shared whitespace tokenizer
  (functions/textstats.tokens) + ``hash60`` bucketing — codegen'd,
  map-only. The paper also hashes bigrams; this implementation is
  deliberately unigram (parameter-free, and the bucket distribution at
  n_buckets ≪ vocab already behaves like the paper's hashed features) —
  documented simplification, not an accident.
- the bucket distributions are ``n_buckets``-sized frames (default 1024)
  — broadcast to the scoring join, so the corpus-wide pass is ONE
  map-side-combined (doc, bucket) count + one broadcast join + one
  doc-keyed sum. No corpus-sized shuffle beyond the per-doc aggregation.
- the Gumbel draw is the deterministic hash-uniform
  u = (hash60(id ‖ salt)+1) / (2^60+1), g = −ln(−ln u) — bit-replayable
  across engines and cluster sizes, same trick as
  functions/splits.weighted_sample (Efraimidis-Spirakis there, Gumbel
  here; both are the same exponential-race idea).
- top-k is a TakeOrderedAndProject, never a global sort.

At 10^12 docs: the target sample is small by definition (in-domain
exemplars), the raw bucket histogram is a single map-side-combined
aggregation, scoring is map-only — the only full shuffle is the per-doc
token→bucket count, shuffling ~tokens-per-doc rows keyed by doc id.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ferenda_spark.functions.sketches import TWO_POW_60, hash60
from ferenda_spark.functions.textstats import tokens


def bucket_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str | None = None,
    n_buckets: int = 1024,
) -> DataFrame:
    """Hashed-unigram bucket counts: ``(bucket, cnt)`` globally, or
    ``(id, bucket, cnt)`` per document when ``id_col`` is given."""
    tok = df.select(
        *([F.col(id_col).alias("id")] if id_col else []),
        F.explode(tokens(F.col(text_col))).alias("t"),
    ).select(
        *(["id"] if id_col else []),
        (hash60(F.col("t")) % n_buckets).alias("bucket"),
    )
    keys = (["id"] if id_col else []) + ["bucket"]
    return tok.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    checkpoint: bool = True,
) -> DataFrame:
    """Per-raw-document importance estimate → ``(id, log_weight)``.

    ``log_weight = Σ_buckets cnt_doc(b) · [log p̂_t(b) − log p̂_r(b)]``
    with add-one smoothing: ``p̂(b) = (count(b) + 1) / (total + n_buckets)``.
    Documents with zero tokens are absent (no features ⇒ no weight row).
    """
    tgt = bucket_counts(target, text_col, None, n_buckets)
    # one tokenize pass over the raw corpus: the global histogram is the
    # per-doc counts re-aggregated (map-side combined), not a second scan.
    # Persist only on the checkpoint path — with checkpoint=False we hand
    # the caller an unmaterialized plan and must not leave an orphan cache
    # the caller has no handle to release.
    per_doc = bucket_counts(raw, text_col, id_col, n_buckets)
    if checkpoint:
        per_doc = per_doc.persist()
    rawg = per_doc.groupBy("bucket").agg(F.sum("cnt").alias("cnt"))
    t_tot = tgt.agg(F.sum("cnt").alias("tt"))
    r_tot = rawg.agg(F.sum("cnt").alias("rt"))
    ratio = (
        rawg.withColumnRenamed("cnt", "rc")
        .join(tgt.withColumnRenamed("cnt", "tc"), "bucket", "full_outer")
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce("tc", F.lit(0)) + 1.0)
                    / (F.col("tt") + float(n_buckets))
                )
                - F.log(
                    (F.coalesce("rc", F.lit(0)) + 1.0)
                    / (F.col("rt") + float(n_buckets))
                )
            ).alias("lr"),
        )
    )
    out = (
        per_doc.join(F.broadcast(ratio), "bucket")
        .groupBy("id")
        .agg(F.sum(F.col("cnt") * F.col("lr")).alias("log_weight"))
    )
    if not checkpoint:
        # composition/plan-audit path: caller gets the raw plan; per_doc
        # is NOT persisted on this path (Spark recomputes the tokenize
        # pass twice in one job — acceptable for plan audits, and there
        # is no dangling cache nobody can unpersist)
        return out
    from ferenda_spark.checkpoint import truncate_checkpoint

    out = truncate_checkpoint(out)
    per_doc.unpersist()
    return out


def gumbel_key(id_col, log_weight_col, temperature: float = 1.0,
               salt: str = "dsir"):
    """Deterministic Gumbel race key: ``log_w / T − ln(−ln u)`` with the
    hash-uniform u — a pure Column expression."""
    u = (hash60(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
         + F.lit(1.0)) / F.lit(TWO_POW_60 + 1.0)
    return F.col(log_weight_col) / float(temperature) - F.log(-F.log(u))


def dsir_resample(
    weights: DataFrame,
    k: int,
    temperature: float = 1.0,
    salt: str = "dsir",
    id_col: str = "id",
    log_weight_col: str = "log_weight",
) -> DataFrame:
    """Gumbel top-k without-replacement sample ∝ w^(1/T) →
    ``(id, log_weight, key)``, the k winners. TakeOrderedAndProject."""
    return (
        weights.withColumn(
            "key", gumbel_key(id_col, log_weight_col, temperature, salt)
        )
        .orderBy(F.col("key").desc(), F.col(id_col).asc())
        .limit(k)
    )


def dsir_sql_fragments(n_buckets: int = 1024) -> dict[str, str]:
    """DuckDB spellings of the shared primitives, so oracles and the
    Spark code can never drift silently: callers format these into their
    WITH-chains. ``tok(src)`` yields (…, t); ``bucket(expr)`` maps a
    token to its bucket; ``u(expr)`` is the hash-uniform."""
    return {
        "tokens": (
            "list_filter(string_split_regex(trim({col}), '\\s+'),"
            " t -> t != '')"
        ),
        "bucket": (
            "(try_cast('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"
            f" % {n_buckets})"
        ),
        "uniform": (
            "((try_cast('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"
            f" + 1.0) / {TWO_POW_60 + 1.0!r})"
        ),
        "smooth_log": (
            "ln((coalesce({cnt}, 0) + 1.0) / ({tot} + "
            f"{float(n_buckets)!r}))"
        ),
    }
