"""Vocabulary / ontology alignment-lite: match classes & properties of
two emergent schemas by token overlap, with inverted-index blocking.

Reference analog: ferenda configures one vocabulary per repo (dcterms/
bibo/rpubl — [public ferenda docs]); nothing ever needs to DISCOVER that
two vocabularies mean the same thing. A Common-Crawl harvest does
constantly: publishers emit schema.org, Dublin Core, OpenGraph and
home-grown terms for the same concepts, and the KG wants ONE canonical
term per concept. Full ontology matching is a research field (PARIS,
LogMap); the workhorse first pass every production system runs is
string/token similarity over the term names with candidate BLOCKING —
which is exactly the relational shape implemented here.

Algorithm (deterministic, oracle-replayable):

1. localname extraction: the IRI fragment after the last '#' or '/'.
2. tokenization: split on non-alphanumerics AND lowerCamelCase
   boundaries, lowercased ("NewsArticle" → {news, article}).
3. candidate generation by inverted-index join on shared tokens — the
   scale move: |left|×|right| never materializes; only pairs sharing ≥1
   token appear, each exactly once per shared token then aggregated.
   A df-style cap (``max_token_df``) drops stop-tokens ("has", "id")
   whose posting lists would quadratically explode the block — same
   discipline as dedup.py's inverted index.
4. scoring: token Jaccard |∩| / (|A| + |B| − |∩|).
5. assignment: per left term the argmax-score right term, ties broken
   by minimum right IRI; ``min_score`` thresholds the junk tail.

Shape: two map-only tokenizations + one token-keyed equi-join + one
(left, right) map-side-combined count + one struct-min argmax
aggregation. No window over the candidate set, no cross join anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _localname(iri: Column) -> Column:
    return F.element_at(F.split(iri, r"[#/]"), -1)


def name_tokens(iri: Column) -> Column:
    """IRI → array of lowercase name tokens (camelCase split + non-alnum
    split, empties dropped)."""
    ln = _localname(iri)
    # break lowerUpper camel boundaries with a space, then split
    spaced = F.regexp_replace(ln, r"([a-z0-9])([A-Z])", r"$1 $2")
    toks = F.split(F.lower(spaced), r"[^a-z0-9]+")
    return F.filter(toks, lambda t: t != "")


def align_vocabularies(
    left: DataFrame,
    right: DataFrame,
    iri_col: str = "iri",
    *,
    min_score: float = 0.5,
    max_token_df: int = 100,
) -> DataFrame:
    """Best token-Jaccard match per left term →
    ``(left_iri, right_iri, n_shared, n_left, n_right, score)``.

    ``left``/``right``: one row per term (any extra columns ignored).
    Terms whose every token exceeds ``max_token_df`` postings on either
    side simply produce no candidates (documented blocking loss — the
    tokens that frequent carry no discriminative signal anyway)."""

    def side(df: DataFrame, tag: str) -> tuple[DataFrame, DataFrame]:
        terms = df.select(F.col(iri_col).alias(f"{tag}_iri")).distinct()
        toks = terms.select(
            f"{tag}_iri",
            F.explode(name_tokens(F.col(f"{tag}_iri"))).alias("tok"),
        ).distinct()
        sizes = toks.groupBy(f"{tag}_iri").agg(
            F.count(F.lit(1)).alias(f"n_{tag}")
        )
        # df-cap the posting lists (stop-token guard)
        docfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("_df"))
        toks = (
            toks.join(docfreq.where(F.col("_df") <= max_token_df), "tok")
            .drop("_df")
        )
        return toks, sizes

    ltoks, lsizes = side(left, "left")
    rtoks, rsizes = side(right, "right")
    shared = (
        ltoks.join(rtoks, "tok")
        .groupBy("left_iri", "right_iri")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    scored = (
        shared.join(lsizes, "left_iri")
        .join(rsizes, "right_iri")
        .select(
            "left_iri", "right_iri", "n_shared", "n_left", "n_right",
            (
                F.col("n_shared")
                / (F.col("n_left") + F.col("n_right") - F.col("n_shared"))
            ).alias("score"),
        )
        .where(F.col("score") >= min_score)
    )
    best = (
        scored.groupBy("left_iri")
        .agg(
            F.min(
                F.struct(
                    (-F.col("score")).alias("ns"),
                    F.col("right_iri").alias("right_iri"),
                    F.col("n_shared").alias("n_shared"),
                    F.col("n_left").alias("n_left"),
                    F.col("n_right").alias("n_right"),
                )
            ).alias("_m")
        )
        .select(
            "left_iri",
            F.col("_m.right_iri").alias("right_iri"),
            F.col("_m.n_shared").alias("n_shared"),
            F.col("_m.n_left").alias("n_left"),
            F.col("_m.n_right").alias("n_right"),
            (-F.col("_m.ns")).alias("score"),
        )
    )
    return best
