"""Context-based entity disambiguation: score ambiguous mention →
candidate-entity pairs by idf-weighted token overlap between the
mention's CONTEXT and each candidate's textual PROFILE, pick the argmax,
and report the top-1/top-2 margin as the abstain signal.

Where it sits in this repo's linking stack (the classic three-stage NED
shape — candidate generation / scoring / decision): ``linking.py``
resolves SURFACE FORMS (exact dictionary + n-gram fuzzy + MinHash-LSH
blocking) and is deliberately context-blind — "Paris" resolves to
whichever entity owns the alias. When a surface form legitimately maps
to SEVERAL entities (the dictionary's homonyms: Paris-the-city vs
Paris-the-person), only the surrounding text can break the tie. That is
this operator: cosine over idf-weighted bag-of-words between context and
entity profile (the Bunescu-Pasca / TAC-KBP baseline every production
linker ships before anything neural), with the margin column telling the
caller when NOT to trust the answer (small margin → route to human / NIL).

Relational shape (no all-pairs anywhere):

1. idf comes from the PROFILE corpus: idf(t) = ln((N+1)/(df+1)) + 1 —
   smoothed, positive, replayable.
2. profile norms: one map-side-combined aggregate per entity.
3. the candidate table (mention_id, entity) — produced upstream by the
   alias dictionary — already bounds the join: score rows =
   Σ_mention |candidates(mention)|, never |mentions| × |entities|.
4. overlap join keyed on (entity, token): candidates × context tokens
   joined against profile tokens — equi-join, map-side-combined sum.
5. argmax per mention via ONE struct-min aggregation (no window); the
   margin needs top-2, computed from the score table with a second
   struct-min over the non-winning rows (still no sorted-list window).

Determinism: ties broken by minimum entity id; scores are double sums
rounded by callers (same 1e-15 commutation argument as fusion.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ferenda_spark.functions.textstats import tokens


def profile_index(
    profiles: DataFrame,
    entity_col: str = "entity",
    text_col: str = "profile",
) -> tuple[DataFrame, DataFrame]:
    """Entity profiles → ``(index, idf)`` pair of DataFrames:
    ``index`` is the idf-weighted token index ``(entity, tok, w, norm)``
    with ``norm`` the entity's L2 norm over its weighted tokens (token
    weight = tf · idf, tf = in-profile count); ``idf`` is the
    ``(tok, idf)`` table, returned so :func:`disambiguate` can weight
    mention-context tokens with the SAME idf the profiles were built
    under.
    """
    tok = profiles.select(
        F.col(entity_col).alias("entity"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
    )
    tf = tok.groupBy("entity", "tok").agg(F.count(F.lit(1)).alias("tf"))
    n_ent = profiles.select(entity_col).distinct().count()
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idf = df_.select(
        "tok",
        (F.log((float(n_ent) + 1.0) / (F.col("df") + 1.0)) + 1.0)
        .alias("idf"),
    )
    w = tf.join(idf, "tok").select(
        "entity", "tok", (F.col("tf") * F.col("idf")).alias("w")
    )
    norm = w.groupBy("entity").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm")
    )
    return w.join(norm, "entity"), idf


def disambiguate(
    mentions: DataFrame,
    candidates: DataFrame,
    profiles: DataFrame,
    mention_col: str = "mention_id",
    context_col: str = "context",
    entity_col: str = "entity",
    profile_col: str = "profile",
) -> DataFrame:
    """→ ``(mention_id, entity, score, margin, n_candidates)`` — one row
    per mention that has ≥1 candidate; ``score`` is the winner's cosine,
    ``margin`` = score − runner-up score (0.0 when only one candidate —
    a single candidate is also a low-evidence answer, and callers
    threshold margin, not candidate count).

    mentions: (mention_id, context text); candidates:
    (mention_id, entity); profiles: (entity, profile text).
    """
    pidx, idf = profile_index(profiles, entity_col, profile_col)

    ctok = mentions.select(
        F.col(mention_col).alias("mention_id"),
        F.explode(tokens(F.lower(F.col(context_col)))).alias("tok"),
    ).groupBy("mention_id", "tok").agg(F.count(F.lit(1)).alias("ctf"))
    cw = ctok.join(idf, "tok").select(
        "mention_id", "tok", (F.col("ctf") * F.col("idf")).alias("cw")
    )
    cnorm = cw.groupBy("mention_id").agg(
        F.sqrt(F.sum(F.col("cw") * F.col("cw"))).alias("cnorm")
    )

    cand = candidates.select(
        F.col(mention_col).alias("mention_id"),
        F.col(entity_col).alias("entity"),
    ).distinct()
    pairs = (
        cand.join(cw, "mention_id")
        .join(pidx, ["entity", "tok"])
        .groupBy("mention_id", "entity")
        .agg(F.sum(F.col("cw") * F.col("w")).alias("dot"),
             F.first("norm").alias("norm"))
    )
    scored = (
        cand.join(pairs, ["mention_id", "entity"], "left")
        .join(cnorm, "mention_id", "left")
        .select(
            "mention_id", "entity",
            F.when(
                F.col("dot").isNotNull() & (F.col("cnorm") > 0)
                & (F.col("norm") > 0),
                F.col("dot") / (F.col("cnorm") * F.col("norm")),
            ).otherwise(F.lit(0.0)).alias("score"),
        )
    )
    best = (
        scored.groupBy("mention_id")
        .agg(
            F.min(F.struct((-F.col("score")).alias("ns"),
                           F.col("entity").alias("entity"))).alias("_m"),
            F.count(F.lit(1)).alias("n_candidates"),
        )
        .select(
            "mention_id", F.col("_m.entity").alias("entity"),
            (-F.col("_m.ns")).alias("score"), "n_candidates",
        )
    )
    runner = (
        scored.join(
            best.select("mention_id", F.col("entity").alias("_win")),
            "mention_id",
        )
        .where(F.col("entity") != F.col("_win"))
        .groupBy("mention_id")
        .agg(F.max("score").alias("second"))
    )
    return (
        best.join(runner, "mention_id", "left")
        .select(
            "mention_id", "entity", "score",
            (F.col("score") - F.coalesce("second", F.col("score")))
            .alias("margin"),
            "n_candidates",
        )
    )
