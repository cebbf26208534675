"""Entity co-occurrence PMI — the association signal between entities
that share documents.

Reference analog: ferenda's ``relate`` stage builds the dependency /
annotation joins between documents (SURVEY §2 J1-J2); at web scale the
complementary signal is STATISTICAL — two entities that co-occur in far
more documents than chance predicts are related even when no explicit
triple says so. Pointwise mutual information over the (doc, entity)
bipartite table is the classic estimator, and its output feeds entity
embedding training, alias-candidate ranking (with linking.py's string
tiers), and "related entities" panels.

    pmi(a, b) = ln( n_ab · N / (n_a · n_b) )

Scale shape: the only super-linear step is the per-document pair
expansion (a doc with m entities emits m(m-1)/2 pairs). The
``max_doc_entities`` cap drops mega-documents before the self-join —
standard practice (a page listing 10^4 entities carries ~0 association
information per pair but would emit 10^8 rows). Everything else is
map-side-combined aggregation; N travels as a broadcast single-row
crossJoin, never a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def entity_pmi(
    mentions: DataFrame,
    doc_col: str = "doc",
    ent_col: str = "ent",
    *,
    min_pair: int = 2,
    max_doc_entities: int = 1000,
) -> DataFrame:
    """→ ``(a, b, n_ab, pmi)`` for unordered entity pairs (a < b) that
    co-occur in ≥ ``min_pair`` documents; pmi rounded to 6, fully
    deterministic."""
    # lazy end-to-end: the distinct/join Exchanges behind `kept` are
    # reused across its four consumers (n_docs, ent_counts, both pair
    # sides) by Spark's exchange reuse inside the one evaluating action —
    # no persist needed (same stance as graph_analytics.adamic_adar)
    de = mentions.select(
        F.col(doc_col).alias("doc"), F.col(ent_col).alias("ent")
    ).distinct()
    doc_sizes = de.groupBy("doc").agg(F.count(F.lit(1)).alias("m"))
    kept = de.join(
        doc_sizes.filter(F.col("m") <= max_doc_entities).select("doc"), "doc"
    )
    n_docs = kept.select("doc").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("n_docs")
    )
    ent_counts = kept.groupBy("ent").agg(F.count(F.lit(1)).alias("n_e"))
    pairs = (
        kept.alias("l")
        .join(kept.alias("r"), F.col("l.doc") == F.col("r.doc"))
        .filter(F.col("l.ent") < F.col("r.ent"))
        .groupBy(F.col("l.ent").alias("a"), F.col("r.ent").alias("b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair)
    )
    return (
        pairs.join(ent_counts.select(F.col("ent").alias("a"),
                                     F.col("n_e").alias("n_a")), "a")
        .join(ent_counts.select(F.col("ent").alias("b"),
                                F.col("n_e").alias("n_b")), "b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "a", "b", "n_ab",
            F.round(
                F.log(
                    F.col("n_ab") * F.col("n_docs")
                    / (F.col("n_a") * F.col("n_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )
