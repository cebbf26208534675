"""Fulltext index + ranked search as Spark tables (SURVEY §2.1 S7, A4).

Reference analog: ``FulltextIndex`` with Whoosh/ElasticSearch backends —
``update(uri, repo, basefile, title, text, **facets)`` indexes one doc,
``query(q)`` returns ranked hits with per-facet counts for the search
sidebar ([ref: ferenda/fulltextindex.py :: FulltextIndex.update, query],
[ref: ferenda/wsgiapp.py] for the faceted search UI). SURVEY §1.1 scoped
this out of v1; this module closes the gap Spark-natively: the index is a
**postings table** (an inverted index as data, not a service) and a query
is a join+aggregate over it — no external search engine.

Design for 100 TB:

- the postings build is one explode + one groupBy(term, doc) — shuffle
  volume is O(tokens) once, then the table is written partitioned by
  ``pmod(xxhash64(term), P)`` so a query's term lookups prune to ≤|terms|
  partitions.
- stopword-class terms (document frequency above ``max_df_ratio``) are
  dropped at build time — the standard trade (they carry ~no tf-idf mass)
  and the skew guard: a term present in every doc would otherwise put the
  whole corpus in one posting list.
- a query never scans docs: it filters the postings to its terms (isin over
  the partition key → pruned), aggregates per doc, and ranks with
  TakeOrderedAndProject. AND semantics = count(distinct matched term) =
  n(query terms) — a semi-join-shaped HAVING, not an N-way self-join.
- scoring is classic tf-idf, ``(1+ln(tf)) · ln(n_docs/df)``, computed with
  integer inputs and rounded — deterministic across engines (the DuckDB
  oracle reproduces it bit-for-bit after round-to-6).

The analyzer (lowercase, split on non-alphanumeric) is deliberately the
simplest deterministic choice; both the Spark build and any oracle must use
the same one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokens_col(text_col) -> F.Column:
    """Analyzer: lowercase, split on runs of non-alphanumerics, drop empties.
    One definition shared by the index build and (conceptually) any oracle."""
    c = text_col if not isinstance(text_col, str) else F.col(text_col)
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda t: t != "")


def tokenize_query(q: str) -> list[str]:
    """Driver-side analyzer for query strings — must mirror ``tokens_col``."""
    import re

    return sorted({t for t in re.split(TOKEN_SPLIT_RE, q.lower()) if t})


def build_fulltext_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_df_ratio: float = 0.5,
    n_part: int = 32,
) -> tuple[DataFrame, int]:
    """docs → (postings, n_docs). Postings schema:
    ``(term, id, tf, df)`` with df = number of docs containing the term,
    already joined in (build-time denormalization: one small self-aggregate
    at build beats a per-query groupBy at read). Terms with
    df > max_df_ratio·n_docs are dropped (stopword/skew guard).

    ``part_key`` = pmod(xxhash64(term), n_part) is the partition column —
    at scale, write via ``catalog`` partitioned by it so term lookups prune.
    """
    n_docs = df.count()
    tf = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(tokens_col(F.col(text_col))).alias("term"),
        )
        .groupBy("term", "id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    keep = dfreq.filter(F.col("df") <= F.lit(int(max_df_ratio * n_docs)))
    postings = (
        tf.join(keep, "term")  # broadcast-able: vocabulary-sized right side
        .withColumn("part_key", F.pmod(F.xxhash64("term"), F.lit(n_part)).cast("int"))
    )
    return postings, n_docs


def search(
    postings: DataFrame,
    n_docs: int,
    query: str,
    top_k: int = 10,
    require_all: bool = True,
) -> DataFrame:
    """Ranked fulltext search: (id, n_matched, score) — score =
    Σ_terms (1+ln(tf))·ln(n_docs/df), rounded to 6 places; ties broken by
    id so the top-k set is deterministic. ``require_all`` = AND semantics
    (every query term present), else OR."""
    terms = tokenize_query(query)
    if not terms:
        # mirror the postings table's actual id type — a hardcoded string
        # id would make the empty-query path schema-incompatible with
        # every non-empty result (union/join type mismatch)
        id_t = postings.schema["id"].dataType.simpleString()
        return postings.sparkSession.createDataFrame(
            [], f"id {id_t}, n_matched int, score double"
        )
    hits = postings.filter(F.col("term").isin(terms))
    scored = hits.groupBy("id").agg(
        F.count(F.lit(1)).cast("int").alias("n_matched"),
        F.round(
            F.sum(
                (F.lit(1.0) + F.log(F.col("tf").cast("double")))
                * F.log(F.lit(float(n_docs)) / F.col("df").cast("double"))
            ),
            6,
        ).alias("score"),
    )
    if require_all:
        scored = scored.filter(F.col("n_matched") == F.lit(len(terms)))
    return scored.orderBy(F.desc("score"), F.asc("id")).limit(top_k)


def bm25_search(
    postings: DataFrame,
    n_docs: int,
    query: str,
    top_k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    require_all: bool = True,
) -> DataFrame:
    """Okapi BM25 ranking over the same postings table ``search`` uses —
    the modern default scorer (tf saturation + document-length
    normalization, the two things the plain tf-idf score lacks):

        score(d) = Σ_t ln(1 + (N - df + 0.5)/(df + 0.5))
                       · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))

    ``dl`` is the INDEXED document length (Σ tf over the doc's kept
    postings — stopword-dropped terms don't count, consistently for dl
    and avgdl, so the normalization is self-consistent). Returns
    ``(id, n_matched, score)``, score rounded to 6, ties by id.

    Scale shape: dl is one map-side-combined groupBy over the postings
    (build it once and persist alongside the index at real scale); avgdl
    is a broadcast single-row crossJoin — no driver collect; the query
    itself touches only the query terms' postings (partition-pruned when
    the index is written ``part_key``-partitioned) and ends in
    TakeOrderedAndProject.
    """
    terms = tokenize_query(query)
    if not terms:
        # mirror the postings table's actual id type — a hardcoded string
        # id would make the empty-query path schema-incompatible with
        # every non-empty result (union/join type mismatch)
        id_t = postings.schema["id"].dataType.simpleString()
        return postings.sparkSession.createDataFrame(
            [], f"id {id_t}, n_matched int, score double"
        )
    dl = postings.groupBy("id").agg(F.sum("tf").alias("dl"))
    avgdl = dl.agg(F.avg("dl").alias("avgdl"))
    hits = (
        postings.filter(F.col("term").isin(terms))
        .join(dl, "id")
        .crossJoin(F.broadcast(avgdl))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tfn = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    scored = hits.groupBy("id").agg(
        F.count(F.lit(1)).cast("int").alias("n_matched"),
        F.round(F.sum(idf * tfn), 6).alias("score"),
    )
    if require_all:
        scored = scored.filter(F.col("n_matched") == F.lit(len(terms)))
    return scored.orderBy(F.desc("score"), F.asc("id")).limit(top_k)


def facet_counts(
    hits: DataFrame, docmeta: DataFrame, id_col: str, facet_cols: list[str]
) -> DataFrame:
    """Search-sidebar facet counts over a hit set (A4): one grouping-sets
    aggregate after a broadcast-able join hits⋈docmeta — (facet, value,
    n_hits). Mirrors FulltextIndex's per-facet bucket counts."""
    joined = hits.join(
        docmeta.withColumnRenamed(id_col, "id"), "id"
    )
    out = None
    for fc in facet_cols:
        part = joined.groupBy(F.col(fc).cast("string").alias("value")).agg(
            F.count(F.lit(1)).alias("n_hits")
        ).select(F.lit(fc).alias("facet"), "value", "n_hits")
        out = part if out is None else out.unionByName(part)
    return out
