"""KG schema profiling — (subject class, predicate, object class) usage
statistics over the triple tables.

Reference analog: ferenda assumes its vocabulary (dcterms/bibo/prov per
repo configuration); nothing discovers what a graph ACTUALLY contains.
Over a harvested Common-Crawl-scale graph the schema is emergent —
publishers use whatever types/predicates they like — and the first
question every consumer asks is "which classes exist, which predicates
connect them, with what cardinalities". That summary (the ABSTAT /
LODStats lineage) is also what drives shape AUTHORING: profile first,
then pin the observed patterns as SHACL-lite shapes
(operators/validation.py).

Output, one row per (subj_class, pred, obj_kind):

    subj_class: rdf:type of the subject, NULL when untyped
    pred:       the predicate
    obj_kind:   object's rdf:type for typed URI objects; '@IRI' for
                untyped URI objects; the literal datatype for typed
                literals; '@Literal' for plain literals
    n:          assertion count
    n_subj:     distinct subjects
    n_obj:      distinct objects

Multi-typed nodes contribute one row per type (standard profiling
semantics — the summary is a bag of class-usage observations, not a
partition). rdf:type rows themselves are excluded from the profiled
assertions (they ARE the class dimension).

Scale shape: the type map is projected once and joined twice (subj, obj)
— corpus-sized equi-joins, AQE-handled; the final groupBy is
vocabulary-sized with map-side combine. No UDFs, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def profile_schema(triples: DataFrame) -> DataFrame:
    types = triples.filter(
        (F.col("pred") == RDF_TYPE) & F.col("obj_is_uri")
    ).select(F.col("subj").alias("node"), F.col("obj").alias("cls")).distinct()

    props = triples.filter(F.col("pred") != RDF_TYPE).select(
        "subj", "pred", "obj", "obj_is_uri", "obj_dtype"
    )

    with_s = props.join(
        types.select(F.col("node").alias("subj"), F.col("cls").alias("subj_class")),
        "subj",
        "left",
    )
    # join condition includes obj_is_uri: a LITERAL whose lexical form
    # happens to equal a typed node's URI must not fan out through the
    # type map (k types would duplicate the row k times)
    omap = types.select(F.col("node").alias("_on"), F.col("cls").alias("_obj_cls"))
    with_o = with_s.join(
        omap,
        (F.col("obj") == F.col("_on")) & F.col("obj_is_uri"),
        "left",
    ).drop("_on").withColumn(
        "obj_kind",
        F.when(F.col("obj_is_uri") & F.col("_obj_cls").isNotNull(), F.col("_obj_cls"))
        .when(F.col("obj_is_uri"), F.lit("@IRI"))
        .when(F.col("obj_dtype").isNotNull(), F.col("obj_dtype"))
        .otherwise(F.lit("@Literal")),
    )
    # a URI object with k types must profile as k rows, but an UNTYPED or
    # literal object must contribute exactly once — the left join above
    # already yields exactly one row in those cases
    return with_o.groupBy("subj_class", "pred", "obj_kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("subj").alias("n_subj"),
        F.countDistinct("obj").alias("n_obj"),
    )


def profile_keys(df: DataFrame, key_col: str, top_k: int = 10) -> DataFrame:
    """Key-skew profile: the top-``top_k`` heaviest values of ``key_col``
    with absolute counts and corpus fractions — the diagnostic that
    decides whether a join/groupBy on this key needs salting, AQE skew
    handling, or a broadcast rewrite (north_rule: "partitioning / shuffle
    / skew handled explicitly" — this is the measuring instrument).

    Returns ``(rank, key, cnt, frac)`` (frac rounded to 6); deterministic
    tie-break by key. One map-side-combined groupBy + a global top-k
    (TakeOrderedAndProject over the distinct-key-sized aggregate) — the
    corpus is touched once."""
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    total = counts.agg(F.sum("cnt").alias("_total"))
    top = (
        counts.orderBy(F.desc("cnt"), F.asc("key"))
        .limit(top_k)
        .crossJoin(F.broadcast(total))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("cnt"), F.asc("key"))
    return top.select(
        F.row_number().over(w).alias("rank"),
        "key",
        "cnt",
        F.round(F.col("cnt") / F.col("_total"), 6).alias("frac"),
    )


def host_report(
    docs: DataFrame,
    host_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-host corpus report card → one row per host:

        (host, n_docs, total_chars, n_langs, top_lang,
         n_distinct_texts, exact_dup_share, mean_quality)

    The triage table a crawl/curation operator actually reads: which
    hosts dominate the corpus, which are single-language, which are
    mostly duplicated boilerplate (exact_dup_share = 1 − distinct
    fingerprints / docs), and the mean heuristic quality
    (functions/textstats.quality_score). In the reference's world this
    is the per-repo status report (ferenda's status/TOC summaries); at
    Common-Crawl scale it is the host-level prior every downstream
    weight (sampling, crawl budget, trust) keys on.

    Shape: one map-only projection (md5 fingerprint + codegen'd quality
    terms), one (host, lang) count for the language mode, one host-keyed
    aggregation — two shuffles, both map-side combined, both on the host
    key (Zipf-skewed by construction: AQE splits the head host). The
    language mode's argmax is a min(struct(-cnt, lang)) aggregation, not
    a window — no per-host sorted candidate list materializes."""
    from ferenda_spark.functions.textstats import quality_score

    per = docs.select(
        F.col(host_col).alias("host"),
        F.col(lang_col).alias("lang"),
        F.length(F.col(text_col)).alias("nchar"),
        F.md5(F.trim(F.col(text_col))).alias("fp"),
        quality_score(F.col(text_col)).alias("q"),
    )
    base = per.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nchar").alias("total_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("fp").alias("n_distinct_texts"),
        F.avg("q").alias("_mq"),
    )
    mode = (
        per.groupBy("host", "lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("host")
        .agg(
            F.min(F.struct((-F.col("cnt")).alias("nc"),
                           F.col("lang").alias("lang"))).alias("_m")
        )
        .select("host", F.col("_m.lang").alias("top_lang"))
    )
    return base.join(mode, "host").select(
        "host", "n_docs", "total_chars", "n_langs", "top_lang",
        "n_distinct_texts",
        F.round(1.0 - F.col("n_distinct_texts") / F.col("n_docs"), 6)
        .alias("exact_dup_share"),
        F.round("_mq", 6).alias("mean_quality"),
    )


def graph_summary(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """One-row structural profile of a directed graph:

        (n_nodes, n_edges, n_self_loops, reciprocity, out_gini,
         max_out_share, dangling_share)

    The cheap whole-graph health gauges a crawl operator reads before
    spending on the iterative family: ``reciprocity`` (share of directed
    edges whose reverse also exists — organic link neighborhoods are
    partially reciprocal, link farms are near-1.0, feed aggregators
    near-0.0), ``out_gini`` (Gini coefficient of the out-degree
    distribution — how hub-dominated the graph is; drives the
    salting/cap decisions the skew profiler makes per-key),
    ``max_out_share`` (largest single source's share of all edges) and
    ``dangling_share`` (nodes with no out-edges — sizes pagerank's
    dangling-mass term).

    Shape: edges deduped once; reciprocity is ONE self-equi-join on the
    swapped key; the Gini is computed from the out-degree table with a
    rank window over DEGREE VALUES (degree-distinct rows, not nodes —
    the window input is bounded by the number of DISTINCT degrees, never
    corpus-sized, because equal degrees share a mean rank analytically:
    Gini = Σ deg·(2·midrank − n − 1) / (n·Σ deg) computed per degree
    GROUP). Everything else is map-side-combined aggregates; the final
    assembly is scalar one-row joins (annotated single-partition)."""
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .distinct()
        .persist()
    )
    loops = e.where(F.col("a") == F.col("b"))
    clean = e.where(F.col("a") != F.col("b"))
    nodes = (
        clean.select(F.col("a").alias("n"))
        .unionAll(clean.select(F.col("b").alias("n")))
        .distinct()
    )
    recip = clean.join(
        clean.select(F.col("b").alias("a"), F.col("a").alias("b")),
        ["a", "b"], "left_semi",
    )
    outdeg = clean.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    # Gini over node out-degrees, dangling nodes counted as degree 0.
    # Per-degree-VALUE groups with analytic mid-ranks keep the window
    # input |distinct degrees|-sized.
    from pyspark.sql import Window

    ddist = (
        nodes.join(outdeg.withColumnRenamed("a", "n"), "n", "left")
        .select(F.coalesce("deg", F.lit(0)).alias("deg"))
        .groupBy("deg")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wd = Window.orderBy("deg").rowsBetween(Window.unboundedPreceding, -1)
    ranked = ddist.select(
        "deg", "cnt",
        (F.coalesce(F.sum("cnt").over(wd), F.lit(0)) + (F.col("cnt") + 1) / 2.0
         ).alias("midrank"),
    )
    totals = ranked.agg(
        F.sum("cnt").alias("n"),
        F.sum(F.col("deg") * F.col("cnt")).alias("sdeg"),
        F.sum(F.col("deg") * F.col("cnt") * (2.0 * F.col("midrank")))
        .alias("wsum"),
    )
    gini = totals.select(
        "n",
        F.when(
            F.col("sdeg") > 0,
            (F.col("wsum") - (F.col("n") + 1) * F.col("sdeg"))
            / (F.col("n") * F.col("sdeg")),
        ).otherwise(F.lit(0.0)).alias("out_gini"),
    )
    counts = (
        clean.agg(F.count(F.lit(1)).alias("n_edges"))
        .crossJoin(F.broadcast(loops.agg(
            F.count(F.lit(1)).alias("n_self_loops"))))
        .crossJoin(F.broadcast(recip.agg(
            F.count(F.lit(1)).alias("n_recip"))))
        .crossJoin(F.broadcast(outdeg.agg(
            F.coalesce(F.max("deg"), F.lit(0)).alias("max_out"))))
        .crossJoin(F.broadcast(outdeg.agg(
            F.count(F.lit(1)).alias("n_sources"))))
        .crossJoin(F.broadcast(gini))
    )
    out = counts.select(
        F.col("n").alias("n_nodes"),
        "n_edges",
        "n_self_loops",
        F.when(F.col("n_edges") > 0,
               F.col("n_recip") / F.col("n_edges"))
         .otherwise(F.lit(0.0)).alias("reciprocity"),
        F.col("out_gini"),
        F.when(F.col("n_edges") > 0,
               F.col("max_out") / F.col("n_edges"))
         .otherwise(F.lit(0.0)).alias("max_out_share"),
        ((F.col("n") - F.col("n_sources")) / F.col("n"))
        .alias("dangling_share"),
    )
    e.unpersist()
    return out
