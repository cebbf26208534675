"""Taxonomy / concept-hierarchy rollup: aggregate item counts up a
SKOS-style ``broader`` hierarchy so every concept counts the items of its
whole descendant subtree.

Reference analog: ferenda's toc pagesets group documents by FLAT facet
values (SURVEY §2 A1); public vocabularies at web scale (schema.org types,
SKOS concept schemes, category trees harvested by the structured-data
stage) are hierarchies, and the question "how many documents per concept
INCLUDING its narrower concepts" is the hierarchical version of the same
rollup. RDFS ``subClassOf`` entailment (operators/inference.py) already
computes the closure machinery; this operator reuses it for the aggregate
side.

Scale shape: the ``broader`` edge set is vocabulary-sized (thousands to
low millions — schema.org is ~900 types, Wikipedia's category graph ~2M),
so the transitive closure runs iterative doubling over broadcast-sized
frames, while the corpus-sized ``membership`` table is touched exactly
twice: one groupBy for direct counts, one closure-join + groupBy for
rolled-up counts. The closure join multiplies each membership row by its
concept's ancestor-path length (bounded by hierarchy depth — single
digits in practice), never by corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .inference import transitive_closure


def taxonomy_rollup(
    membership: DataFrame,
    broader: DataFrame,
    item_col: str = "item",
    concept_col: str = "concept",
    child_col: str = "child",
    parent_col: str = "parent",
) -> DataFrame:
    """Counts per concept, direct and subtree-inclusive.

    ``membership``: (item, concept) — an item may carry several concepts.
    ``broader``: (child, parent) hierarchy edges; a DAG (poly-hierarchy is
    fine — an item reaching an ancestor through two paths still counts
    once, because the closure is a set and the rollup counts DISTINCT
    items).

    Returns ``(concept, n_items_direct, n_items_closure)`` for every
    concept mentioned anywhere (membership or either edge endpoint);
    concepts with no items in their subtree report zeros rather than
    disappearing — a TOC page for an empty category must render empty,
    not 404.
    """
    m = membership.select(
        F.col(item_col).alias("item"), F.col(concept_col).alias("concept")
    )
    edges = broader.select(
        F.col(child_col).alias("sub"), F.col(parent_col).alias("sup")
    )
    concepts = (
        m.select("concept")
        .unionByName(edges.select(F.col("sub").alias("concept")))
        .unionByName(edges.select(F.col("sup").alias("concept")))
        .distinct()
    )
    # reflexive-transitive closure: strict closure (iterative doubling,
    # vocabulary-sized) + identity pairs
    closure = transitive_closure(edges).unionByName(
        concepts.select(
            F.col("concept").alias("sub"), F.col("concept").alias("sup")
        )
    ).distinct()
    direct = m.groupBy("concept").agg(
        F.countDistinct("item").alias("n_items_direct")
    )
    rolled = (
        m.join(closure, m["concept"] == closure["sub"])
        .groupBy("sup")
        .agg(F.countDistinct("item").alias("n_items_closure"))
        .withColumnRenamed("sup", "concept")
    )
    return (
        concepts.join(direct, "concept", "left")
        .join(rolled, "concept", "left")
        .select(
            "concept",
            F.coalesce("n_items_direct", F.lit(0)).cast("bigint").alias(
                "n_items_direct"
            ),
            F.coalesce("n_items_closure", F.lit(0)).cast("bigint").alias(
                "n_items_closure"
            ),
        )
    )
