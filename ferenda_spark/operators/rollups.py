"""Toc/feed aggregates, status rollups and the join-shaped computations
(SURVEY §2.4 J1–J8, §2.5 A1–A4, §2.6 W1–W4, §2.7 U1–U3).

Reference analogs: toc pagesets / news feeds / relate / keyword / skeleton
([ref: ferenda/documentrepository.py :: toc_pagesets, toc_select_for_pages,
news, news_facet_entries, relate_dependencies, prep_annotation_file],
[ref: ferenda/facet.py :: Facet], [ref: ferenda/sources/general/keyword.py],
[ref: ferenda/sources/general/skeleton.py],
[ref: ferenda/compositerepository.py]). The reference computes all of these
either as SPARQL queries against an external store or as per-file driver
loops; here each is ONE declarative DataFrame plan so Catalyst picks the
physical strategy (partial aggregation, broadcast vs sort-merge joins,
TakeOrderedAndProject for global top-k).

Scale notes (100 TB):
- facet rollups are map-side-combinable HashAggregates over low-cardinality
  grouping keys (letter×year×lang) — shuffle volume is O(groups), not
  O(docs).
- feeds top-k uses row_number over (feed) partitions; the feed key space is
  facet-sized, so skew is bounded by design. The global "main" feed is a
  TakeOrderedAndProject (no full sort).
- all dimension-sided joins (docmeta is O(docs) but title-only projections
  are narrow) rely on AQE to choose broadcast when the filtered side is
  small; `relate_dependencies` pre-projects to (uri) before joining so the
  shuffle carries minimal bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ferenda_spark.facets import DEFAULT_FACETS, Facet, feed_facets, toc_facets
from ferenda_spark.schemas import P_REFERENCES, P_SUBJECT


# --------------------------------------------------------------------- A1/A4
def facet_columns(
    docmeta: DataFrame, facets: tuple[Facet, ...] = DEFAULT_FACETS
) -> DataFrame:
    """Attach one column per declared Facet ([ref: ferenda/facet.py ::
    Facet; selector exprs evaluated JVM-side — adding a facet adds a
    codegen'd projection column, never a UDF]). Defaults reproduce the
    reference's firstletter/year/lang trio."""
    out = docmeta
    for facet in facets:
        out = out.withColumn(facet.name, facet.col())
    return out


def toc_per_facet(
    docmeta: DataFrame, facets: tuple[Facet, ...] = DEFAULT_FACETS
) -> DataFrame:
    """The per-facet half of the toc rollup: GROUPING SETS ((f1), (f2), …)
    in one Expand+HashAggregate pass, grouping_id() labeling each row's
    facet so NULL facet values get their own bucket. Factored out so
    incremental maintenance (operators/incremental.py) can recompute
    affected buckets WITHOUT paying toc_rollup's global-row legs, whose
    output it discards anyway."""
    tf = toc_facets(facets)
    f = facet_columns(docmeta, facets)
    docs_struct = F.struct(
        F.col("title").alias("sort_key"), F.col("uri"), F.col("title")
    )
    # gid of grouping set [[f_i]] over columns (f_0..f_{n-1}): every bit set
    # except bit i (bit k = 1 means column k is aggregated away)
    n = len(tf)
    gid_of = {((1 << n) - 1) ^ (1 << (n - 1 - i)): fc.name for i, fc in enumerate(tf)}
    facet_lbl = F.lit(None).cast("string")
    value_col = F.lit(None).cast("string")
    for gid, name in gid_of.items():
        facet_lbl = F.when(F.col("_gid") == gid, F.lit(name)).otherwise(facet_lbl)
        value_col = F.when(
            F.col("_gid") == gid, F.col(name).cast("string")
        ).otherwise(value_col)
    return (
        f.groupingSets(
            [[F.col(fc.name)] for fc in tf], *[F.col(fc.name) for fc in tf]
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sort_array(F.collect_list(docs_struct)).alias("page_docs"),
            F.grouping_id().alias("_gid"),
        )
        .select(
            facet_lbl.alias("facet"),
            value_col.alias("value"),
            "n_docs",
            "page_docs",
        )
    )


def toc_rollup(
    docmeta: DataFrame,
    facets: tuple[Facet, ...] = DEFAULT_FACETS,
    global_cap: int = 10_000,
) -> DataFrame:
    """A1: toc pagesets as a grouping-sets rollup (north_star: "toc/feed
    aggregates as groupBy rollups"). One row per (facet, value) bucket with
    the sorted doc list for the bucket's page set, parameterized by the
    user's Facet list (reference: toc_pagesets iterates Facet objects).

    GROUPING SETS ((f1), (f2), …) in one pass — a single
    Expand+HashAggregate; shuffle keyed on the tiny facet-value space.
    grouping_id() (not isNotNull chains) identifies the bucket's facet, so
    NULL facet values land in their own facet's bucket instead of leaking
    into the global row.

    The global ('all', '*') row is computed SEPARATELY and bounded: its
    count is an exact corpus count, but its ``page_docs`` list is the
    ``global_cap`` first docs by sort key via orderBy+limit — a
    TakeOrderedAndProject (per-partition heap, driver merge), never an
    unbounded collect_list: at 10^12 docs a whole-corpus doc list in one
    aggregation row OOMs the executor. Browsing past ``global_cap`` rows
    of an undifferentiated everything-list is not a toc use case; the
    per-facet buckets stay complete.
    """
    f = facet_columns(docmeta, facets)
    docs_struct = F.struct(
        F.col("title").alias("sort_key"), F.col("uri"), F.col("title")
    )
    per_facet = toc_per_facet(docmeta, facets)
    top_global = (
        f.select(docs_struct.alias("d"))
        .orderBy("d")
        .limit(global_cap)
        .agg(F.sort_array(F.collect_list("d")).alias("page_docs"))
    )
    global_row = (
        f.agg(F.count(F.lit(1)).alias("n_docs"))
        .crossJoin(F.broadcast(top_global))
        .select(
            F.lit("all").alias("facet"),
            F.lit("*").alias("value"),
            "n_docs",
            "page_docs",
        )
    )
    return per_facet.unionByName(global_row)


# --------------------------------------------------------------------- W1/W4
def feeds_topk(
    docmeta: DataFrame,
    page_size: int = 25,
    facets: tuple[Facet, ...] = DEFAULT_FACETS,
) -> DataFrame:
    """W1: news feedsets — ONE FEED PER (facet, value) of the feed facets
    (reference: news_feedsets iterates the repo's Facet list, not just
    language), newest first, paginated. Top-k per group via row_number;
    page number = floor((rn-1)/page_size).

    Multi-facet form: each doc is exploded into one row per feed facet
    (|feed facets| ≈ 1-3, a constant fan-out), then a single window over
    (facet, feed) ranks all feedsets in one shuffle. Feed keys are facet
    values — vocabulary-sized, skew bounded by design."""
    ff = feed_facets(facets)
    f = facet_columns(docmeta, facets)
    legs = F.array(
        *[
            F.struct(
                F.lit(fc.name).alias("facet"),
                F.col(fc.name).cast("string").alias("feed"),
            )
            for fc in ff
        ]
    )
    w = Window.partitionBy("facet", "feed").orderBy(F.desc("issued"), F.asc("uri"))
    return (
        f.select(
            F.explode(legs).alias("_fv"), "uri", "title", "issued"
        )
        .select(F.col("_fv.facet").alias("facet"), F.col("_fv.feed").alias("feed"),
                "uri", "title", "issued")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("page", ((F.col("rn") - 1) / page_size).cast("int"))
        .select("facet", "feed", "rn", "page", "uri", "title", "issued")
    )


def feed_main(docmeta: DataFrame, k: int = 25) -> DataFrame:
    """W4: the global "main" feed — orderBy+limit compiles to
    TakeOrderedAndProject (per-partition top-k then merge; no global sort)."""
    return (
        docmeta.orderBy(F.desc("issued"), F.asc("uri"))
        .limit(k)
        .select("uri", "title", "issued")
    )


# ------------------------------------------------------------------------ A2
def status_rollup(ledger: DataFrame) -> DataFrame:
    """A2: per-stage status counts + last finish + failures
    [ref: ferenda/documentrepository.py :: status]."""
    return (
        ledger.groupBy("stage")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("n_ok"),
            F.sum(F.when(F.col("status") != "ok", 1).otherwise(0)).alias("n_failed"),
            F.sum("n_in").alias("rows_in"),
            F.sum("n_out").alias("rows_out"),
            F.max("finished").alias("last_finished"),
        )
    )


# ------------------------------------------------------------------------ A3
def triple_stats(triples: DataFrame) -> DataFrame:
    """A3: dataset statistics [ref: ferenda/triplestore.py :: triple_count].
    approx_count_distinct for metrics-grade cardinalities (exact countDistinct
    is a double shuffle; tests that need exact use countDistinct directly)."""
    return triples.groupBy("pred").agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.approx_count_distinct("subj").alias("approx_subjects"),
        F.approx_count_distinct("obj").alias("approx_objects"),
    )


# ------------------------------------------------------------------------ J1
def relate_dependencies(triples: DataFrame, docmeta: DataFrame) -> DataFrame:
    """J1: outbound reference edges whose target is a known document —
    the dependency graph for cache invalidation
    [ref: ferenda/documentrepository.py :: relate_dependencies].

    Projected to narrow columns before the join; AQE broadcasts the doc-URI
    side when it fits, else sort-merge on uri."""
    refs = triples.filter(F.col("pred") == P_REFERENCES).select(
        F.col("subj").alias("from_part"),
        F.col("src_url").alias("from_doc"),
        F.col("obj").alias("to_doc"),
    )
    known = docmeta.select(F.col("uri").alias("to_doc"))
    return refs.join(known, "to_doc", "inner").select(
        "from_doc", "from_part", "to_doc"
    ).distinct()


# ------------------------------------------------------------------------ J2
def annotations(triples: DataFrame, docmeta: DataFrame) -> DataFrame:
    """J2: per-document incoming references annotated with the citing doc's
    title — the CONSTRUCT in [ref: ferenda/res/sparql/annotations.rq] /
    prep_annotation_file. POS layout makes the pred=references scan a single
    partition; the title join is a narrow projection of docmeta."""
    incoming = triples.filter(F.col("pred") == P_REFERENCES).select(
        F.col("obj").alias("uri"), F.col("src_url").alias("citing_doc")
    )
    titles = docmeta.select(F.col("uri").alias("citing_doc"), F.col("title"))
    return (
        incoming.join(titles, "citing_doc", "inner")
        .groupBy("uri")
        .agg(
            F.count(F.lit(1)).alias("n_incoming"),
            F.sort_array(
                F.collect_set(F.struct("citing_doc", "title"))
            ).alias("citers"),
        )
    )


# ------------------------------------------------------------------------ J5
def keyword_index(triples: DataFrame) -> DataFrame:
    """J5: subject keyword → referring docs
    [ref: ferenda/sources/general/keyword.py] — join-free aggregate."""
    return (
        triples.filter(F.col("pred") == P_SUBJECT)
        .groupBy(F.col("obj").alias("keyword"))
        .agg(
            F.sort_array(F.collect_set("subj")).alias("docs"),
            F.count_distinct("subj").alias("n_docs"),
        )
    )


# ------------------------------------------------------------------------ J6
def skeleton_uris(triples: DataFrame, docmeta: DataFrame) -> DataFrame:
    """J6: referenced-but-nonexistent URIs → stub entries
    [ref: ferenda/sources/general/skeleton.py]. LEFT ANTI join."""
    targets = (
        triples.filter(F.col("pred") == P_REFERENCES)
        .select(F.col("obj").alias("uri"))
        .distinct()
    )
    return targets.join(docmeta.select("uri"), "uri", "left_anti")


# ------------------------------------------------------------------------ J7
def composite_precedence(frames: list[DataFrame], key: str = "uri") -> DataFrame:
    """J7: several sources can supply the same document; first successful
    (lowest priority index) wins [ref: ferenda/compositerepository.py].
    Union + row_number precedence dedup (W3)."""
    tagged = [
        df.withColumn("priority", F.lit(i)) for i, df in enumerate(frames)
    ]
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t, allowMissingColumns=True)
    w = Window.partitionBy(key).orderBy(F.asc("priority"))
    return (
        u.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "priority")
    )


# ------------------------------------------------------------------------ J8
def merge_descriptions(docmeta: DataFrame, wiki: DataFrame) -> DataFrame:
    """J8: left-outer broadcast merge of auxiliary description text onto
    docs by normalized title [ref: ferenda/sources/general/wiki.py]."""
    key = F.lower(F.trim(F.regexp_replace(F.col("title"), r"\s+", " ")))
    d = docmeta.withColumn("_tkey", key)
    w = wiki.withColumn("_tkey", key).select("_tkey", "description")
    return d.join(F.broadcast(w), "_tkey", "left").drop("_tkey")
