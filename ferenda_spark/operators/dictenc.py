"""RDF dictionary encoding: URI/literal terms → fixed-width integer ids.

Reference analog: ferenda stores triples as text in whatever store it
talks to ([ref: ferenda/triplestore.py — SPARQL endpoints handle their
own encoding]); every serious triple store (Virtuoso, Jena TDB, HDT,
Blazegraph) dictionary-encodes terms first, because a 10^12-triple table
keyed by ~80-byte URI strings shuffles 10-20× more bytes on every
join/groupBy than the same table keyed by int64 — at 100 TB the string
SPO table's JOIN is the bottleneck and the encoded table's isn't.

Hash-assigned ids, NOT row_number: ``term_id = hash60(term)`` (the
sketches.py 60-bit md5 idiom) gives every engine, executor, and
incremental batch the SAME id for the same term with zero coordination —
no global sort, no id-assignment shuffle, no dictionary lookup join on
encode (encode is a map-only projection). The price is a collision risk:
~n²/2^61 expected pairs (10^9 distinct terms → ~0.4 expected collisions);
``collision_audit`` finds them with one groupBy so a run can fail loudly
or switch the colliding terms to a salted escape id. Decode is a
broadcast-or-shuffle join against the terms table, needed only at the
presentation edge — the whole query plan runs on int64s.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.sketches import hash60

TERM_COLS = ("subj", "pred", "obj")


def encode_triples(
    triples: DataFrame, cols: tuple[str, ...] = TERM_COLS
) -> tuple[DataFrame, DataFrame]:
    """→ (terms, encoded).

    ``encoded``: the input with each term column replaced by
    ``<col>_id`` (int64), all other columns untouched — a map-only
    projection, no shuffle, no action.
    ``terms``: the distinct ``(term_id, term)`` dictionary across all
    encoded columns — ONE explode + distinct shuffle, keyed by the
    uniform 60-bit id (skew-free by construction).
    """
    enc = triples
    for c in cols:
        enc = enc.withColumn(f"{c}_id", hash60(F.col(c)))
    enc = enc.drop(*cols)
    terms = (
        triples.select(
            F.explode(F.array(*[F.col(c) for c in cols])).alias("term")
        )
        .distinct()
        .select(hash60(F.col("term")).alias("term_id"), "term")
    )
    return terms, enc


def decode_triples(
    encoded: DataFrame, terms: DataFrame, cols: tuple[str, ...] = TERM_COLS
) -> DataFrame:
    """Join the term strings back onto ``<col>_id`` columns — the
    presentation-edge inverse of ``encode_triples``."""
    out = encoded
    for c in cols:
        out = out.join(
            terms.select(
                F.col("term_id").alias(f"{c}_id"), F.col("term").alias(c)
            ),
            f"{c}_id",
        ).drop(f"{c}_id")
    return out


def collision_audit(terms: DataFrame) -> DataFrame:
    """ids carrying more than one distinct term — expected empty; one
    map-side-combined groupBy over the vocabulary-sized terms table."""
    return (
        terms.groupBy("term_id")
        .agg(F.countDistinct("term").alias("n_terms"))
        .filter(F.col("n_terms") > 1)
    )
