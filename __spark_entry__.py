"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship KG query (smoke check).
`queries()` / `oracle_sql()` — one entry per implemented operator family
from SURVEY.md §2 plus the corpus-curation operators; oracle-backed where
DuckDB can express the semantics, rows-only for parse/linking/LSH/ANN
(their real verification is the golden-fixture pytest suite, SURVEY §5.2).

Float-parity rules used throughout (driver hashes values sorted by column
name): money aggregates go through DECIMAL casts (order-independent exact
sums) and back to DOUBLE; ratio aggregates are rounded to 6 places (input
error ~1e-13 ≪ round grain); cosine similarities rounded to 4 with both
engines computing in double.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

STOP_SQL = "['the','and','of','to','is','that','with','for','a','in','on','it','as','at','by']"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------- entry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the M1 end-to-end slice — synthetic web corpus → parse
    (mapInPandas extract+FSM+citations) → exact entity linking (broadcast
    hash join) → triples → top referenced entities per domain (groupBy +
    window top-k). Exercises scan→UDF→explode→join→agg→window."""
    from ferenda_spark.operators.linking import _exact_broadcast
    from ferenda_spark.operators.parse import parse_stage, split_parsed
    from ferenda_spark.operators.triples import assemble_triples
    from ferenda_spark.schemas import P_REFERENCES
    from ferenda_spark.sources.corpus import dictionary_df, generate_corpus

    corpus = generate_corpus(spark, 120)
    docs, _ = split_parsed(parse_stage(corpus, n_parts=8))
    mentions = docs.select(
        "url", "part_key", F.explode("mentions").alias("m")
    ).select("url", "part_key", F.col("m.*"))
    links = _exact_broadcast(mentions, dictionary_df(spark))
    triples = assemble_triples(docs, links)
    refs = triples.filter(F.col("pred") == P_REFERENCES).select(
        F.regexp_extract("src_url", r"https://([^/]+)/", 1).alias("domain"),
        F.col("obj").alias("entity"),
    )
    counts = refs.groupBy("domain", "entity").agg(F.count(F.lit(1)).alias("n_refs"))
    w = Window.partitionBy("domain").orderBy(F.desc("n_refs"), F.asc("entity"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("domain", "rank", "entity", "n_refs")
    )


# ------------------------------------------------------------------- queries


def _q_toc_rollup_docs(spark, sf_dir):
    """A1: toc pagesets as grouping-sets rollup (SURVEY §2.5)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupingSets([[F.col("source")], [F.col("lang")], []],
                       F.col("source"), F.col("lang"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .select(
            F.coalesce(F.col("source"), F.lit("ALL")).alias("source_g"),
            F.coalesce(F.col("lang"), F.lit("ALL")).alias("lang_g"),
            "n_docs",
            "sum_chars",
        )
    )


def _q_feed_topk_events(spark, sf_dir):
    """W1: per-feed top-k newest-first + page number (SURVEY §2.6)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("ts"), F.asc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 25)
        .withColumn("page", ((F.col("rn") - 1) / 5).cast("int"))
        .select("event_type", "rn", "page", "event_id", "ts")
    )


def _q_feed_main_topk(spark, sf_dir):
    """W4: global newest-first top-k → TakeOrderedAndProject."""
    e = _t(spark, sf_dir, "events")
    return (
        e.orderBy(F.desc("ts"), F.asc("event_id"))
        .limit(25)
        .select("event_id", "event_type", "ts")
    )


def _q_deps_join_agg(spark, sf_dir):
    """J1-shaped equi join + agg: orders ⋈ customer → per-nation rollup.
    DECIMAL sum for exact float parity."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


def _q_skeleton_anti(spark, sf_dir):
    """J6: LEFT ANTI — customers that never ordered (skeleton entries)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


def _q_precedence_latest(spark, sf_dir):
    """J7/W3: precedence dedup — latest order per customer wins."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_orderdate").alias("latest_date"),
        )
    )


def _q_keyword_counts(spark, sf_dir):
    """J5-shaped join-free aggregate: per keyword (event_type), doc and
    referrer counts."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
    )


def _q_annotations_agg(spark, sf_dir):
    """J2-shaped: per-target incoming detail rollup (lineitem → orders)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    agg = (
        li.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
        .filter(F.col("n_items") >= 6)
    )
    return agg.join(o, agg.l_orderkey == o.o_orderkey, "inner").select(
        F.col("l_orderkey").alias("orderkey"),
        "n_items",
        "sum_qty",
        F.year("o_orderdate").alias("order_year"),
    )


def _q_exists_semijoin(spark, sf_dir):
    """Correlated EXISTS → LEFT SEMI join: customers with at least one
    urgent order."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_nationkey"
    )


def _q_priority_pivot(spark, sf_dir):
    """Static pivot by conditional aggregation (stays ONE HashAggregate —
    never DataFrame.pivot for a known category set)."""
    o = _t(spark, sf_dir, "orders")
    pri = lambda p: F.sum(
        F.when(F.col("o_orderpriority").startswith(p), 1).otherwise(0)
    )
    return o.groupBy(F.year("o_orderdate").alias("order_year")).agg(
        pri("1").alias("n_urgent"),
        pri("2").alias("n_high"),
        pri("3").alias("n_medium"),
        F.count(F.lit(1)).alias("n_total"),
    )


def _q_acctbal_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per market segment (Spark
    `percentile` == DuckDB `quantile_cont`; rounded for float parity)."""
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.round(F.percentile(F.col("c_acctbal"), F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile(F.col("c_acctbal"), F.lit(0.9)), 4).alias("p90"),
        F.count(F.lit(1)).alias("n_cust"),
    )


def _q_union_nations(spark, sf_dir):
    """U1/U2: union + distinct across sources."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.union(s).distinct()


def _q_except_nations(spark, sf_dir):
    """U3: EXCEPT ≡ left anti on distinct sets."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    ).distinct()
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    ).distinct()
    return c.exceptAll(s)


def _q_scalar_surface(spark, sf_dir):
    """T11 scalar function surface: regexp/trim/upper/substr/length."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") >= 40)
    return p.select(
        "p_partkey",
        F.upper(F.col("p_brand")).alias("brand_u"),
        F.trim(F.regexp_replace(F.col("p_name"), r"\s+", " ")).alias("name_norm"),
        F.upper(F.substring(F.col("p_name"), 1, 1)).alias("letter"),
        F.length(F.col("p_name")).cast("bigint").alias("name_len"),
    )


def _q_tpch_q1ish(spark, sf_dir):
    """A-family pricing summary (TPC-H Q1 shape): DECIMAL-exact sums."""
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                dec("l_extendedprice")
                * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _q_tpch_q3ish(spark, sf_dir):
    """3-way join + agg + top-k (TPC-H Q3 shape). Revenue summed in DECIMAL
    so the top-10 ordering is engine-independent."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda col: F.col(col).cast("decimal(18,2)")
    rev = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(
                dec("l_extendedprice")
                * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
            ).alias("rev_d")
        )
    )
    return (
        rev.orderBy(F.desc("rev_d"), F.asc("o_orderkey"))
        .limit(10)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("rev_d").cast("double").alias("revenue"),
            F.col("o_orderdate").alias("orderdate"),
        )
    )


def _q_filter_pushdown_part(spark, sf_dir):
    """P3/P4: predicate + projection pushdown to the parquet scan."""
    p = _t(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_type").contains("STANDARD") & (F.col("p_size") <= 20))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(F.col("p_retailprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


def _q_events_hourly(spark, sf_dir):
    """Time-bucketed rollup: date_trunc + DECIMAL-exact value sum."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


def _q_region_nation_leftjoin(spark, sf_dir):
    """J8-shaped LEFT OUTER broadcast join with coalesce default."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_regionkey") <= 2)
    return n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey, "left_outer"
    ).select(
        F.col("n_nationkey").alias("nationkey"),
        F.col("n_name").alias("nation"),
        F.coalesce(F.col("r_name"), F.lit("UNKNOWN")).alias("region"),
    )


def _q_rollup_customer_geo(spark, sf_dir):
    """A1 hierarchical ROLLUP: customer counts by region → nation."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    geo = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        geo.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_bal"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region_g"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation_g"),
            "n_cust",
            "sum_bal",
        )
    )


def _q_events_running_total(spark, sf_dir):
    """Window frame (ROWS UNBOUNDED PRECEDING): running DECIMAL sum per
    event_type in (ts, event_id) order, on a deterministic subset."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_id") % 50 == 0)
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_type",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_value"),
    )


def _q_events_lag_delta(spark, sf_dir):
    """lag(): per-user inter-event value delta in (ts, event_id) order."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    prev = F.lag(F.col("value").cast("decimal(18,2)")).over(w)
    return e.select(
        "user_id",
        "event_id",
        (F.col("value").cast("decimal(18,2)") - prev)
        .cast("double")
        .alias("value_delta"),
    )


def _q_natural_sort_priorities(spark, sf_dir):
    """W2 natural-sort keys (split_numalpha): numeric + alpha parts of
    o_orderpriority ('1-URGENT') as a sortable (int, str) pair."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderpriority")
        .distinct()
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.regexp_extract("o_orderpriority", r"^(\d+)", 1)
            .cast("bigint")
            .alias("num_part"),
            F.regexp_extract("o_orderpriority", r"([A-Za-z]+)", 1).alias(
                "alpha_part"
            ),
        )
    )


def _q_toc_page_lists(spark, sf_dir):
    """A1 toc page lists: per (source, lang) the ordered member list as a
    join-stable string (sort_array(collect_list) ≡ ORDER BY string_agg)."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("doc_id")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("members"),
    )


def _q_orders_monthly(spark, sf_dir):
    """T11 date surface: month bucketing via date_format + year/month."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("ym"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


def _q_doc_point_lookup(spark, sf_dir):
    """P2 single-key selection: one doc_id, projection pushdown."""
    d = _t(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") == 42).select(
        "doc_id", "source", "lang", "n_chars"
    )


# --------------------------------------------------- curation: dedup / text


def _q_dedup_exact_stats(spark, sf_dir):
    """Exact-dedup statistics per source over sha256(normalized text)."""
    d = _t(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    return (
        d.withColumn("fp", F.sha2(norm, 256))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("fp").alias("n_distinct"),
            (F.count(F.lit(1)) - F.count_distinct("fp")).alias("n_dupes"),
        )
    )


def _q_dedup_jaccard_pairs(spark, sf_dir):
    """Word-set Jaccard near-dup pairs (n-gram dedup operator, k=1) over a
    doc_id<200 block."""
    from ferenda_spark.operators.dedup import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = ngram_jaccard_pairs(d, "text", "doc_id", k=1, threshold=0.5)
    return pairs.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


def _q_url_canonical_dedup(spark, sf_dir):
    """URL-level crawl dedup (functions/urls.py: canonicalize_url +
    surt_key + registrable_domain — the identity layer that merges
    byte-distinct fetch URLs of the same page BEFORE any text is
    shingled). Deterministic messy-URL synthesis from doc_id: scheme
    case, www. prefix, default ports, /./ and /../ dot segments,
    shuffled-in tracking params (utm_source, gclid) and fragments all
    vary by doc_id residues; the oracle constructs the CANONICAL form
    directly from the same residues (ground truth, not a SQL
    re-implementation — the canonicalizer is tested against what the
    URLs MEAN). Grouped by canonical URL: collision count + first doc."""
    from ferenda_spark.functions.urls import (
        canonicalize_url, registrable_domain, surt_key,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id")
    k = F.col("doc_id")
    messy = d.select(
        "doc_id",
        F.concat(
            F.when(k % 2 == 0, F.lit("HTTP")).otherwise(F.lit("https")),
            F.lit("://"),
            F.when(k % 3 == 0, F.lit("WWW.")).otherwise(F.lit("")),
            F.lit("Site"), (k % 7).cast("string"),
            F.lit(".Example."),
            F.when(k % 4 == 0, F.lit("CO.UK")).otherwise(F.lit("com")),
            F.when(
                k % 5 == 0,
                F.when(k % 2 == 0, F.lit(":80")).otherwise(F.lit(":443")),
            ).otherwise(F.lit("")),
            F.lit("/s"), (k % 5).cast("string"),
            F.lit("/./x/../p"), (k % 4).cast("string"),
            F.lit("?utm_source=t&b="), (k % 3).cast("string"),
            F.lit("&a=1"),
            F.when(k % 6 == 0, F.lit("&gclid=g")).otherwise(F.lit("")),
            F.lit("#h"), k.cast("string"),
        ).alias("url"),
    )
    return (
        messy.select(
            "doc_id",
            canonicalize_url(F.col("url")).alias("canonical_url"),
            surt_key(F.col("url")).alias("surt"),
            registrable_domain(F.col("url")).alias("domain"),
        )
        .groupBy("canonical_url", "surt", "domain")
        .agg(
            F.count(F.lit(1)).alias("n_fetches"),
            F.min("doc_id").alias("first_doc"),
        )
    )


_URL_CANONICAL_ORACLE = """
    WITH g AS (
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END AS sch,
               doc_id % 7 AS k7, doc_id % 5 AS k5,
               doc_id % 4 AS k4, doc_id % 3 AS k3,
               CASE WHEN doc_id % 4 = 0 THEN 'co.uk' ELSE 'com' END AS tld
        FROM documents
    ),
    c AS (
        SELECT doc_id,
               sch || '://site' || k7 || '.example.' || tld
                   || '/s' || k5 || '/p' || k4
                   || '?a=1&b=' || k3 AS canonical_url,
               (CASE WHEN tld = 'co.uk' THEN 'uk,co' ELSE 'com' END)
                   || ',example,site' || k7
                   || ')/s' || k5 || '/p' || k4
                   || '?a=1&b=' || k3 AS surt,
               'example.' || tld AS domain
        FROM g
    )
    SELECT canonical_url, surt, domain,
           count(*) AS n_fetches, min(doc_id) AS first_doc
    FROM c GROUP BY 1, 2, 3"""


def _q_line_dedup_docs(spark, sf_dir):
    """C4-style intra-document line dedup (operators/dedup.py:
    dedup_lines_stats — repeated nav/banner lines dropped per page as
    the first text filter, map-only). Multi-line docs synthesized
    deterministically: 6 three-word lines sliced from the doc's text,
    then lines 0, 2, 1 re-appended as the 'boilerplate repeats'; natural
    line collisions from the word-salad corpus are kept (the oracle
    replays them). Output: per-doc line counts + md5 of the deduped
    body."""
    from ferenda_spark.operators.dedup import dedup_lines_stats

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.split(F.col("text"), " ")

    def line(i: int):
        return F.array_join(F.slice(words, i * 3 + 1, 3), " ")

    order = [0, 1, 2, 3, 4, 5, 0, 2, 1]
    multi = d.select(
        "doc_id",
        F.array_join(F.array(*[line(i) for i in order]), "\n").alias("text"),
    )
    out = dedup_lines_stats(multi, "text", "doc_id")
    return out.select(
        F.col("id").alias("doc_id"),
        "n_lines",
        "n_unique",
        F.md5(F.col("text")).alias("text_hash"),
    )


_LINE_DEDUP_ORACLE = """
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    l AS (
        SELECT doc_id,
               -- COALESCE: DuckDB's array_to_string([]) is NULL, Spark's
               -- array_join([]) is '' — a doc short of 18 words has empty
               -- trailing lines that must survive the agg on both sides
               [coalesce(
                    array_to_string(list_slice(ws, i * 3 + 1, i * 3 + 3), ' '),
                    '')
                FOR i IN [0, 1, 2, 3, 4, 5, 0, 2, 1]] AS lines
        FROM w
    ),
    e AS (
        SELECT doc_id, lines[o] AS line, o
        FROM l CROSS JOIN generate_series(1, 9) AS g(o)
    ),
    u AS (
        SELECT doc_id, line, min(o) AS mo
        FROM e GROUP BY doc_id, line
    )
    SELECT doc_id,
           CAST(9 AS BIGINT) AS n_lines,
           CAST(count(*) AS BIGINT) AS n_unique,
           md5(string_agg(line, chr(10) ORDER BY mo)) AS text_hash
    FROM u GROUP BY doc_id"""


def _q_span_dedup_docs(spark, sf_dir):
    """Exact duplicated-substring removal (operators/spandedup.py:
    remove_duplicate_spans — the ExactSubstr tier of Lee et al. 2022,
    expressed relationally: L-gram posting list → global occurrence
    count → mark duplicated windows → gaps-and-islands merge → cut).
    L=4 on the word-salad corpus yields partial removal with multiple
    islands per doc. The oracle replays the whole pipeline on the gram
    TEXT where Spark groups on its xxhash64 (identical output absent a
    64-bit collision, which the value-hash compare would expose)."""
    from ferenda_spark.operators.spandedup import remove_duplicate_spans

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = remove_duplicate_spans(d, "text", "doc_id", length=4)
    return out.select(
        F.col("id").alias("doc_id"),
        "n_tokens",
        "n_dup_windows",
        "n_spans",
        "n_removed",
        F.md5(F.col("text")).alias("cleaned_md5"),
    )


def _q_span_dedup_stride1(spark, sf_dir):
    """ExactSubstr ``stride=1`` equivalence (round-5, closes round-4
    next-round #4): the approximate-mode knob at stride=1 must be the
    exact path bit-for-bit, replayed against the SAME DuckDB oracle as
    span_dedup_docs. Guards the winnowing refactor of span_postings:
    any deviation the selection pass introduces into the exact route
    value-hash-mismatches here."""
    from ferenda_spark.operators.spandedup import remove_duplicate_spans

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = remove_duplicate_spans(d, "text", "doc_id", length=4, stride=1)
    return out.select(
        F.col("id").alias("doc_id"),
        "n_tokens",
        "n_dup_windows",
        "n_spans",
        "n_removed",
        F.md5(F.col("text")).alias("cleaned_md5"),
    )


def _q_span_dedup_winnow(spark, sf_dir):
    """Winnowed approximate span dedup (round-5): stride=3 selects the
    content-minimal gram per 3-window (Schleimer et al. 2003), the 100 TB
    posting-bound mode with the deterministic ≥ L+stride−1 detection
    guarantee. Rows-only (a SQL replay of winnowing would re-implement
    the operator); pinned rows + per-doc span aggregates so selection
    drift (not just row-count drift) breaks the pin. Only docs with ≥1
    detected span emit."""
    from ferenda_spark.operators.spandedup import duplicate_spans

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    spans = duplicate_spans(d, "text", "doc_id", length=4, stride=3)
    return (
        spans.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.col("span_end") - F.col("span_start")).alias("span_toks"),
            F.sum("n_windows").alias("n_sel_windows"),
        )
        .select(F.col("id").alias("doc_id"), "n_spans", "span_toks",
                "n_sel_windows")
    )


_SPAN_DEDUP_ORACLE = r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(trim(text), '\s+'),
                           t -> t != '') AS t
        FROM documents
    ),
    posts AS (
        SELECT doc_id, u AS pos, array_to_string(t[u+1 : u+4], ' ') AS gram
        FROM toks, unnest(range(0, greatest(len(t) - 3, 0))) AS r(u)
    ),
    dupg AS (SELECT gram FROM posts GROUP BY gram HAVING count(*) >= 2),
    marked AS (SELECT p.doc_id, p.pos FROM posts p JOIN dupg d USING (gram)),
    isl AS (
        SELECT doc_id, pos,
               CASE WHEN pos > coalesce(max(pos + 4) OVER (
                    PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                    THEN 1 ELSE 0 END AS brk
        FROM marked
    ),
    isl2 AS (
        SELECT doc_id, pos, sum(brk) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM isl
    ),
    spans AS (
        SELECT doc_id, island, min(pos) AS s, max(pos) + 4 AS e,
               count(*) AS nw
        FROM isl2 GROUP BY doc_id, island
    ),
    pos_tab AS (
        SELECT doc_id, u AS pos, t[u+1] AS tok
        FROM toks, unnest(range(0, len(t))) AS r(u)
    ),
    kept AS (
        SELECT p.doc_id, p.pos, p.tok
        FROM pos_tab p LEFT JOIN spans sp
          ON p.doc_id = sp.doc_id AND p.pos >= sp.s AND p.pos < sp.e
        WHERE sp.doc_id IS NULL
    ),
    cleaned AS (
        SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS ctext
        FROM kept GROUP BY doc_id
    ),
    stats AS (
        SELECT doc_id, sum(nw) AS n_dup_windows, count(*) AS n_spans,
               sum(e - s) AS n_removed
        FROM spans GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.t) AS BIGINT) AS n_tokens,
           CAST(coalesce(st.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
           CAST(coalesce(st.n_spans, 0) AS BIGINT) AS n_spans,
           CAST(coalesce(st.n_removed, 0) AS BIGINT) AS n_removed,
           md5(coalesce(c.ctext, '')) AS cleaned_md5
    FROM toks t
    LEFT JOIN stats st USING (doc_id)
    LEFT JOIN cleaned c ON t.doc_id = c.doc_id"""


def _q_corpus_hash_split(spark, sf_dir):
    """Deterministic content-hash train/val/test split (training-pipeline
    op, no reference analog): md5-prefix bucketing — pure projection, no
    shuffle, bit-identical in any engine. Per-split/lang doc counts."""
    from ferenda_spark.functions.splits import hash_split

    d = _t(spark, sf_dir, "documents")
    return (
        d.select("lang", hash_split(F.col("doc_id"), _SPLIT_FRACS))
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_SPLIT_FRACS = {"train": 0.8, "val": 0.1, "test": 0.1}

# shared by the dedup_jaccard_pairs and dedup_components oracles — one
# definition of the word-set Jaccard similarity graph (RECURSIVE so the
# components oracle can extend it with the reachability CTE)
_JACCARD_PAIRS_CTE = """
            WITH RECURSIVE s AS (
                SELECT DISTINCT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
                FROM documents WHERE doc_id < 200
            ),
            sz AS (SELECT doc_id, count(*) AS sz FROM s GROUP BY doc_id),
            common AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
                FROM s a JOIN s b ON a.w = b.w AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id
            ),
            pairs AS (
                SELECT id_a, id_b, c / (sa.sz + sb.sz - c) AS jaccard
                FROM common
                JOIN sz sa ON sa.doc_id = id_a
                JOIN sz sb ON sb.doc_id = id_b
                WHERE c / (sa.sz + sb.sz - c) >= 0.5
            )
"""


def _q_dedup_components(spark, sf_dir):
    """Near-dup pairs clustered into entities: connected components over the
    Jaccard similarity graph (min-label propagation + pointer jumping),
    canonical representative = min doc_id. Oracle = DuckDB recursive CTE
    computing min over the transitive closure."""
    from ferenda_spark.operators.dedup import ngram_jaccard_pairs
    from ferenda_spark.operators.graph import connected_components

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = ngram_jaccard_pairs(d, "text", "doc_id", k=1, threshold=0.5)
    return connected_components(pairs, "id_a", "id_b").select(
        F.col("node").alias("doc_id"), F.col("comp").alias("component")
    )


def _q_embedding_topk(spark, sf_dir):
    """Brute-force cosine top-20 vs vec_id=0 (similarity-search baseline)."""
    from ferenda_spark.operators.similarity import brute_force_topk

    e = _t(spark, sf_dir, "embeddings")
    q = [float(x) for x in e.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    top = brute_force_topk(e, "embedding", "vec_id", q, k=20)
    return top.select("id", F.round("cosine", 4).alias("cosine"))


def _q_dedup_embedding_exact(spark, sf_dir):
    """Embedding-cosine near-dup pairs, exact brute-force baseline (the
    oracle-comparable form; sign-LSH blocking is the scale path, rows-only
    as dedup_embedding_lsh)."""
    from ferenda_spark.operators.dedup import embedding_exact_pairs

    e = _t(spark, sf_dir, "embeddings")
    pairs = embedding_exact_pairs(e, "embedding", "vec_id", threshold=0.35)
    return pairs.select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))


def _q_shingle_fingerprint_stats(spark, sf_dir):
    """Document fingerprinting: per-source distinct word-3-gram rolling-hash
    fingerprints (xxhash64 shingles). Oracle counts distinct shingle strings
    — equal under 64-bit hash injectivity (collision odds ~n²/2⁶⁴)."""
    from ferenda_spark.functions.textstats import shingle_fingerprints

    d = _t(spark, sf_dir, "documents")
    sh = d.select(
        "source", F.explode(shingle_fingerprints(F.col("text"), 3)).alias("sh")
    )
    return sh.groupBy("source").agg(
        F.count_distinct("sh").alias("n_distinct_shingles"),
        F.count(F.lit(1)).alias("n_shingle_rows"),
    )


def _q_text_quality(spark, sf_dir):
    """Quality-score + token-count rollup per source (curation filters)."""
    from ferenda_spark.functions import textstats as ts

    d = _t(spark, sf_dir, "documents")
    per = d.select(
        "source",
        ts.quality_score(F.col("text")).alias("q"),
        ts.token_count(F.col("text")).alias("ntok"),
    )
    return per.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.sum("q"), 6).alias("sum_quality"),
        F.sum("ntok").alias("sum_tokens"),
    )


def _q_lang_id_counts(spark, sf_dir):
    """Stopword-marker language ID distribution over documents."""
    from ferenda_spark.functions import textstats as ts

    d = _t(spark, sf_dir, "documents")
    return (
        d.select(ts.detect_lang(F.col("text")).alias("lang_detected"))
        .groupBy("lang_detected")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _q_token_count_bpe(spark, sf_dir):
    """BPE-style regex token counts per lang."""
    from ferenda_spark.functions import textstats as ts

    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.sum(ts.bpe_ish_token_count(F.col("text"))).alias("sum_bpe_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def _doc_triples_view(spark, sf_dir):
    """documents table exploded to a (subj, pred, obj, obj_is_uri) graph —
    the input both SPARQL driver queries and their DuckDB oracles share."""
    d = _t(spark, sf_dir, "documents")
    subj = F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("subj")

    def leg(pred, obj_col, is_uri=False):
        return d.select(
            subj,
            F.lit(pred).alias("pred"),
            obj_col.alias("obj"),
            F.lit(is_uri).alias("obj_is_uri"),
        )

    # chain edges doc N → N-1 within blocks of 50 (the property-path leg)
    prev = d.filter((F.col("doc_id") % 50) != 0).select(
        subj,
        F.lit("doc:prev").alias("pred"),
        F.concat(F.lit("doc://"), (F.col("doc_id") - 1).cast("string")).alias("obj"),
        F.lit(True).alias("obj_is_uri"),
    )
    return (
        leg("doc:source", F.col("source"))
        .unionByName(leg("doc:lang", F.col("lang")))
        .unionByName(leg("doc:nchars", F.col("n_chars").cast("string")))
        .unionByName(prev)
    )


_DOC_TRIPLES_SQL = """
            WITH RECURSIVE t AS (
                SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS subj,
                       'doc:source' AS pred, source AS obj FROM documents
                UNION ALL
                SELECT 'doc://' || CAST(doc_id AS VARCHAR),
                       'doc:lang', lang FROM documents
                UNION ALL
                SELECT 'doc://' || CAST(doc_id AS VARCHAR),
                       'doc:nchars', CAST(n_chars AS VARCHAR) FROM documents
                UNION ALL
                SELECT 'doc://' || CAST(doc_id AS VARCHAR),
                       'doc:prev', 'doc://' || CAST(doc_id - 1 AS VARCHAR)
                FROM documents WHERE doc_id % 50 <> 0
            )
"""


def _q_sparql_docs(spark, sf_dir):
    """TripleStore.select parity: SPARQL text compiled to DataFrame joins
    (3-pattern BGP + numeric/regex FILTER) — oracle is the same graph as
    explicit SQL self-joins."""
    from ferenda_spark.operators.sparql import sparql_select

    return sparql_select(
        _doc_triples_view(spark, sf_dir),
        """
        SELECT ?d ?src ?nc WHERE {
          ?d <doc:source> ?src .
          ?d <doc:lang> "en" .
          ?d <doc:nchars> ?nc .
          FILTER(?nc >= 400 && regex(?src, "^src1[0-9]$"))
        }
        """,
    )


def _q_sparql_optional(spark, sf_dir):
    """TripleStore.select parity: OPTIONAL → left join with a filter scoped
    inside the optional group (the annotations.rq shape)."""
    from ferenda_spark.operators.sparql import sparql_select

    return sparql_select(
        _doc_triples_view(spark, sf_dir),
        """
        SELECT ?d ?nc ?de WHERE {
          ?d <doc:nchars> ?nc . FILTER(?nc < 60)
          OPTIONAL { ?d <doc:lang> ?de . FILTER(?de = "de") }
        }
        """,
    )


def _q_sparql_groupby(spark, sf_dir):
    """TripleStore facet-count parity: SPARQL GROUP BY + COUNT/SUM/MAX with
    HAVING compiled to a Catalyst HashAggregate (partial agg map-side)."""
    from ferenda_spark.operators.sparql import sparql_select

    return sparql_select(
        _doc_triples_view(spark, sf_dir),
        """
        SELECT ?src (COUNT(*) AS ?n_docs) (SUM(?nc) AS ?sum_nc)
               (MAX(?lang) AS ?max_lang)
        WHERE { ?d <doc:source> ?src ; <doc:nchars> ?nc ; <doc:lang> ?lang }
        GROUP BY ?src HAVING(?n_docs >= 2) ORDER BY ?src
        """,
    )


def _q_sparql_union_values(spark, sf_dir):
    """SPARQL UNION (null-padded unionByName) + VALUES (inline broadcast
    dictionary) joined against the BGP — the annotations.rq multi-branch
    shape over two predicates."""
    from ferenda_spark.operators.sparql import sparql_select

    return sparql_select(
        _doc_triples_view(spark, sf_dir),
        """
        SELECT ?d ?v WHERE {
          VALUES ?src { "src3" "src7" }
          ?d <doc:source> ?src .
          { ?d <doc:lang> ?v } UNION { ?d <doc:nchars> ?v }
        }
        """,
    )


def _q_sparql_triple_count(spark, sf_dir):
    """TripleStore.triple_count parity (SURVEY A3): global aggregation
    without GROUP BY — one HashAggregate over the whole graph."""
    from ferenda_spark.operators.sparql import sparql_select

    return sparql_select(
        _doc_triples_view(spark, sf_dir),
        """
        SELECT (COUNT(*) AS ?n_triples) (COUNT(DISTINCT ?s) AS ?n_subjects)
               (COUNT(DISTINCT ?p) AS ?n_preds)
        WHERE { ?s ?p ?o }
        """,
    )


def _q_sparql_path_closure(spark, sf_dir):
    """Property path <doc:prev>+ — transitive closure by iterative doubling
    (O(log chain-length) checkpointed self-joins). Oracle = DuckDB
    recursive CTE over the same chain edges."""
    from ferenda_spark.operators.sparql import sparql_select

    return sparql_select(
        _doc_triples_view(spark, sf_dir),
        "SELECT ?d ?anc WHERE { ?d <doc:prev>+ ?anc }",
    )


def _q_sparql_bind_if(spark, sf_dir):
    """BIND + IF/concat/ucase expression surface, with an IN filter — all
    compiled to column expressions (no UDFs)."""
    from ferenda_spark.operators.sparql import sparql_select

    return sparql_select(
        _doc_triples_view(spark, sf_dir),
        """
        SELECT ?d ?tag WHERE {
          ?d <doc:lang> ?l . FILTER(?l IN ("en", "de"))
          ?d <doc:nchars> ?nc .
          BIND(IF(?nc >= 500, concat(ucase(?l), "-LONG"), ?l) AS ?tag)
        }
        """,
    )


def _q_sparql_ask(spark, sf_dir):
    """ASK form: LIMIT-1 existence probes (one hit, one guaranteed miss),
    labeled and unioned so both outcomes are oracle-checked."""
    from pyspark.sql import functions as F

    from ferenda_spark.operators.sparql import sparql_ask

    g = _doc_triples_view(spark, sf_dir)
    hit = sparql_ask(
        g, 'ASK { ?d <doc:source> ?s . FILTER(strstarts(?s, "src")) }'
    ).withColumn("probe", F.lit("hit"))
    miss = sparql_ask(g, 'ASK { ?d <doc:lang> "xx-nope" }').withColumn(
        "probe", F.lit("miss")
    )
    return hit.unionByName(miss)


def _q_sparql_describe(spark, sf_dir):
    """DESCRIBE form: subject-rows of the resources bound by the WHERE
    pattern (subject-only CBD — the graph mints no blank nodes)."""
    from ferenda_spark.operators.sparql import sparql_describe

    return sparql_describe(
        _doc_triples_view(spark, sf_dir),
        "DESCRIBE ?d WHERE { ?d <doc:prev> <doc://41> }",
    )


def _q_sparql_subquery(spark, sf_dir):
    """{ SELECT … } subquery: per-source doc counts aggregated in the inner
    query, joined to the outer English-doc pattern on ?src."""
    from ferenda_spark.operators.sparql import sparql_select

    return sparql_select(
        _doc_triples_view(spark, sf_dir),
        """
        SELECT DISTINCT ?src ?n WHERE {
          ?d <doc:source> ?src . ?d <doc:lang> "en" .
          { SELECT ?src (COUNT(?d2) AS ?n)
            WHERE { ?d2 <doc:source> ?src } GROUP BY ?src }
        }
        """,
    )


def _q_sparql_path_star(spark, sf_dir):
    """Zero-or-more path <doc:prev>* from a constant endpoint — identity
    over the graph's term set ∪ transitive closure; oracle = recursive CTE
    seeded with the endpoint itself."""
    from ferenda_spark.operators.sparql import sparql_select

    return sparql_select(
        _doc_triples_view(spark, sf_dir),
        "SELECT ?x WHERE { <doc://45> <doc:prev>* ?x }",
    )


def _q_sparql_nps(spark, sf_dir):
    """Negated property set !(p1|p2|p3) — predicate-exclusion scan keeping
    only the n_chars leg of the doc graph."""
    from ferenda_spark.operators.sparql import sparql_select

    return sparql_select(
        _doc_triples_view(spark, sf_dir),
        "SELECT ?s ?o WHERE { ?s !(<doc:source>|<doc:lang>|<doc:prev>) ?o }",
    )


def _q_sparql_construct(spark, sf_dir):
    """TripleStore.construct parity: template instantiation with graph
    (set) semantics — forward + inverse neighbor edges from the prev
    chain, deduplicated."""
    from ferenda_spark.operators.sparql import sparql_construct

    return sparql_construct(
        _doc_triples_view(spark, sf_dir),
        """
        CONSTRUCT { ?d <doc:neighbor> ?p . ?p <doc:neighborOf> ?d }
        WHERE { ?d <doc:prev> ?p }
        """,
    )


def _pii_augmented_text():
    """documents.text with synthetic PII appended (the corpus itself is
    clean word-soup) — both the Spark query and the DuckDB oracle build the
    same augmented column, so the redaction regexes are exercised for real."""
    return F.concat(
        F.col("text"),
        F.lit(" reach user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" at 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7"),
    )


_PII_AUG_SQL = """
            SELECT doc_id, lang,
                   text || ' reach user' || CAST(doc_id AS VARCHAR) ||
                   '@mail.example or +1-555-' ||
                   lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
                   ' at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS t
            FROM documents
"""


def _q_pii_redact(spark, sf_dir):
    """PII scrub pass: per-lang match counts (email/phone/IPv4) and the
    total redacted length — all regexp column expressions, no UDFs."""
    from ferenda_spark.functions.pii import pii_counts, redact_pii

    d = _t(spark, sf_dir, "documents")
    aug = _pii_augmented_text()
    c = pii_counts(aug)
    return (
        d.select(
            "lang",
            c["email"].alias("e"),
            c["phone"].alias("p"),
            c["ipv4"].alias("i"),
            F.length(redact_pii(aug)).cast("bigint").alias("lr"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("e").alias("n_emails"),
            F.sum("p").alias("n_phones"),
            F.sum("i").alias("n_ipv4"),
            F.sum("lr").alias("sum_redacted_len"),
        )
    )


def _q_chunk_dedup(spark, sf_dir):
    """Chunk-level (boilerplate) dedup: per-lang total vs kept 8-token
    chunks after global keep-first dedup — ONE skew-free shuffle on the
    chunk fingerprint."""
    from ferenda_spark.operators.dedup import chunk_rows, drop_duplicate_chunks

    d = _t(spark, sf_dir, "documents")
    kept = (
        drop_duplicate_chunks(d, "text", "doc_id", n=8)
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("kept"))
    )
    tot = (
        chunk_rows(d, "text", "doc_id", n=8)
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("tot"))
    )
    per_doc = tot.join(kept, "id", "left").na.fill(0, ["kept"])
    return (
        per_doc.join(
            d.select(F.col("doc_id").alias("id"), "lang"), "id"
        )
        .groupBy("lang")
        .agg(
            F.sum("tot").alias("n_chunks"),
            F.sum("kept").alias("n_kept"),
        )
    )


def _q_chunk_dedup_clean(spark, sf_dir):
    """Boilerplate-removed text reassembly: every doc's surviving 8-token
    chunks re-joined in order — the oracle reproduces the kept-set AND the
    reassembled bytes exactly."""
    from ferenda_spark.operators.dedup import dedup_clean_text

    d = _t(spark, sf_dir, "documents")
    return dedup_clean_text(d, "text", "doc_id", n=8)


def _q_dup_chunk_topk(spark, sf_dir):
    """Top-10 most boilerplate-heavy docs by duplicate-chunk fraction
    (Gopher/C4-style repetition signal at chunk granularity)."""
    from ferenda_spark.operators.dedup import duplicate_chunk_fraction

    d = _t(spark, sf_dir, "documents")
    return (
        duplicate_chunk_fraction(d, "text", "doc_id", n=8)
        .orderBy(F.desc("dup_fraction"), F.asc("id"))
        .limit(10)
    )


def _q_url_normalize(spark, sf_dir):
    """Crawl URL canonicalization: messy synthetic URLs (mixed case,
    default port, fragment) normalized then rolled up per domain. The
    oracle derives the expected normalized form independently (string
    construction, not the same regex) — a real cross-check."""
    from ferenda_spark.functions.uris import domain_col, normalize_url

    d = _t(spark, sf_dir, "documents")
    messy = F.concat(
        F.lit("HTTP://WWW.Site"),
        (F.col("doc_id") % 5).cast("string"),
        F.lit(".Example.COM:80/p/"),
        F.col("doc_id").cast("string"),
        F.lit("#s"),
    )
    norm = normalize_url(messy)
    return (
        d.select(norm.alias("u"), domain_col(norm).alias("dom"))
        .groupBy("dom")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.sum(F.length("u")).alias("sum_len"),
        )
    )


def _q_incremental_toc(spark, sf_dir):
    """Incremental toc maintenance vs full recompute: every 25th doc is
    'updated' (title prefixed, lang moved to pt); the incremental result's
    bucket counts must equal DuckDB's independent GROUPING SETS rollup of
    the post-change corpus."""
    from ferenda_spark.operators.incremental import incremental_toc
    from ferenda_spark.operators.rollups import toc_rollup

    d = _t(spark, sf_dir, "documents")

    def dm(df, changed):
        title = F.substring("text", 1, 16)
        if changed:
            title = F.concat(F.lit("X"), title)
        return df.select(
            F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias(
                "uri"
            ),
            title.alias("title"),
            F.concat(
                F.lit("20"),
                F.lpad((F.col("doc_id") % 20 + 5).cast("string"), 2, "0"),
                F.lit("-01-01"),
            ).alias("issued"),
            (F.lit("pt") if changed else F.col("lang")).alias("lang"),
        )

    is_changed = (F.col("doc_id") % 25) == 0
    out = incremental_toc(
        dm(d.filter(~is_changed), False).unionByName(
            dm(d.filter(is_changed), True)
        ),
        dm(d.filter(is_changed), False),
        dm(d.filter(is_changed), True),
        toc_rollup(dm(d, False)),
    )
    return out.select("facet", "value", "n_docs")


def _q_curation_report(spark, sf_dir):
    """Composite curation filter audit: reason histogram over the documents
    table at a strict quality threshold (rows-only — quality_score composes
    array-aggregate HOFs DuckDB does not reproduce 1:1; the operator's
    correctness lives in tests/test_curation_jsonl.py)."""
    from ferenda_spark.operators.curation import (
        apply_curation,
        reason_histogram,
    )

    d = _t(spark, sf_dir, "documents")
    return reason_histogram(
        apply_curation(d, "text", min_quality=0.9)
    ).orderBy("reason")


def _q_fulltext_search(spark, sf_dir):
    """FulltextIndex.query parity: inverted-index build + tf-idf ranked
    AND-search, top-10 deterministic by (score desc, id)."""
    from ferenda_spark.operators.fulltext import build_fulltext_index, search

    d = _t(spark, sf_dir, "documents")
    postings, n = build_fulltext_index(d, "text", "doc_id", max_df_ratio=1.0)
    return search(postings, n, "spark window agg", top_k=10)


def _q_fulltext_facets(spark, sf_dir):
    """FulltextIndex facet sidebar parity: per-facet hit counts over the
    same top-10 hit set (A4 machinery)."""
    from ferenda_spark.operators.fulltext import (
        build_fulltext_index,
        facet_counts,
        search,
    )

    d = _t(spark, sf_dir, "documents")
    postings, n = build_fulltext_index(d, "text", "doc_id", max_df_ratio=1.0)
    hits = search(postings, n, "spark window agg", top_k=10)
    return facet_counts(hits, d, "doc_id", ["lang", "source"])


_FULLTEXT_HITS_SQL = """
            WITH tok AS (
                SELECT doc_id,
                       unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
                FROM documents
            ), tf AS (
                SELECT term, doc_id, count(*) AS tf
                FROM tok WHERE term <> '' GROUP BY term, doc_id
            ), dfreq AS (
                SELECT term, count(*) AS df FROM tf GROUP BY term
            ), hits AS (
                SELECT tf.doc_id AS id,
                       CAST(count(*) AS INTEGER) AS n_matched,
                       round(sum((1.0 + ln(CAST(tf.tf AS DOUBLE)))
                                 * ln((SELECT CAST(count(*) AS DOUBLE) FROM documents)
                                      / CAST(dfreq.df AS DOUBLE))), 6) AS score
                FROM tf JOIN dfreq USING (term)
                WHERE tf.term IN ('agg', 'spark', 'window')
                GROUP BY tf.doc_id
                HAVING count(*) = 3
                ORDER BY score DESC, id ASC
                LIMIT 10
            )
"""


def _q_atom_feeds(spark, sf_dir):
    """news_generate_feeds parity: events → per-type paginated feeds →
    complete Atom XML documents rendered as column expressions. Oracle
    reconstructs the byte-identical XML with string_agg."""
    from ferenda_spark.operators.atom import atom_feeds

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("ts"), F.asc("event_id"))
    eid = F.col("event_id").cast("string")
    feeds = (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .withColumn("page", ((F.col("rn") - 1) / 5).cast("int"))
        .select(
            F.col("event_type").alias("feed"), "rn", "page",
            F.concat(F.lit("evt://"), eid).alias("uri"),
            F.concat(F.lit("event "), eid).alias("title"),
            F.col("ts").alias("issued"),
        )
    )
    return atom_feeds(feeds, "https://ex.org")


# ------------------------------------------------ rows-only (non-SQL) queries


def _q_kg_triples(spark, sf_dir):
    """Parse stage + exact linking + triple assembly on the synthetic web
    corpus (not SQL-expressible: FSM/citation grammars inside mapInPandas).
    Verified against golden truth triples in tests (P/R = 1.0)."""
    from ferenda_spark.operators.linking import _exact_broadcast
    from ferenda_spark.operators.parse import parse_stage, split_parsed
    from ferenda_spark.operators.triples import assemble_triples
    from ferenda_spark.sources.corpus import dictionary_df, generate_corpus

    corpus = generate_corpus(spark, 150)
    docs, _ = split_parsed(parse_stage(corpus, n_parts=8))
    mentions = docs.select(
        "url", "part_key", F.explode("mentions").alias("m")
    ).select("url", "part_key", F.col("m.*"))
    links = _exact_broadcast(mentions, dictionary_df(spark))
    return assemble_triples(docs, links).select(
        "subj", "pred", "obj", "obj_is_uri"
    )


def _q_kg_fused_pipeline(spark, sf_dir):
    """Opt-in fusion stage on the resumable pipeline path (round-5,
    closes round-4 next-round #7): run_pipeline(harvest_structured=True,
    fuse=True) over a 40-doc corpus whose pages carry JSON-LD claims
    with a planted conflict (1/3 of hosts assert 'minority' for the
    shared subject), then read the `fused` stage table back. Rows-only
    (the stage composes harvest + trust fixed point + partitioned stage
    write — the pieces are individually oracle-backed via
    `fact_fusion`); pinned rows, with obj/n_sources/n_candidates and
    6-decimal confidence projected so a resolution flip breaks the pin,
    not just a count change."""
    import hashlib as _hashlib
    import os as _os
    import shutil as _shutil

    from ferenda_spark.plans.pipeline import run_pipeline
    from ferenda_spark.sources.corpus import dictionary_df, generate_corpus

    claim_val = F.when(
        F.crc32(F.col("url")) % 3 == 0, F.lit("minority")
    ).otherwise(F.lit("majority"))
    extra = F.encode(
        F.concat(
            F.lit('<script type="application/ld+json">'
                  '{"@id": "e:topic", "claim": "'),
            claim_val,
            F.lit('"}</script>'),
        ),
        "UTF-8",
    )
    corpus = generate_corpus(spark, 40).withColumn(
        "html", F.concat(F.col("html"), extra)
    )
    _dirtag = _hashlib.sha256(
        _os.path.abspath(sf_dir.rstrip("/")).encode()).hexdigest()[:16]
    out = f"/tmp/ferenda_spark_fusedpipe_q_{_dirtag}"
    _shutil.rmtree(out, ignore_errors=True)
    paths = run_pipeline(
        spark, corpus, dictionary_df(spark), out, n_parts=4,
        with_lsh=False, harvest_structured=True, fuse=True,
    )
    return (
        spark.read.parquet(paths["fused"])
        .select(
            "subj", "pred", "obj", "n_sources", "n_candidates",
            F.round("confidence", 6).alias("confidence"),
        )
    )


def _q_kg_entity_links(spark, sf_dir):
    """Tiered entity linking incl. MinHash-LSH tier (not SQL-expressible)."""
    from ferenda_spark.operators.linking import link_mentions
    from ferenda_spark.operators.parse import parse_stage, split_parsed
    from ferenda_spark.sources.corpus import dictionary_df, generate_corpus

    corpus = generate_corpus(spark, 100)
    docs, _ = split_parsed(parse_stage(corpus, n_parts=8))
    mentions = docs.select(
        "url", "part_key", F.explode("mentions").alias("m")
    ).select("url", "part_key", F.col("m.*"))
    return link_mentions(mentions, dictionary_df(spark)).select(
        "url", "mention", "canonical_uri", "tier"
    )


def _q_dedup_embedding_lsh(spark, sf_dir):
    """Embedding near-dups via sign-LSH bucket blocking (the scale path —
    approx: recall vs the exact baseline asserted in tests; rows-only)."""
    from ferenda_spark.operators.dedup import embedding_near_dup_pairs

    e = _t(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(
        e, "embedding", "vec_id", threshold=0.35, n_planes=4
    )


def _q_dedup_minhash(spark, sf_dir):
    """MinHash-LSH near-dup pairs over documents (approx — rows-only)."""
    from ferenda_spark.operators.dedup import minhash_pairs

    d = _t(spark, sf_dir, "documents")
    return minhash_pairs(d, "text", "doc_id", k=3, threshold=0.5)


def _q_dedup_simhash(spark, sf_dir):
    """SimHash band-blocked near-dup pairs (xxhash64-based — rows-only)."""
    from ferenda_spark.operators.dedup import simhash_pairs

    d = _t(spark, sf_dir, "documents")
    return simhash_pairs(d, "text", "doc_id", max_hamming=6)


def _q_similarity_ivf(spark, sf_dir):
    """IVF cell-probed ANN top-10 (approx — rows-only; recall vs brute
    force asserted in tests)."""
    from ferenda_spark.operators.similarity import build_ivf_index, ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    q = [float(x) for x in e.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    indexed, cents = build_ivf_index(e, "embedding", "vec_id", n_cells=16)
    return ivf_topk(indexed, cents, "embedding", "vec_id", q, k=10, n_probe=4)


def _q_similarity_pq(spark, sf_dir):
    """Product-quantization ANN top-10 with exact re-rank (approx —
    rows-only; recall floors pinned in tests/test_similarity_multimodal).
    32x-compressed code table, map-only ADC scan, TakeOrderedAndProject."""
    from ferenda_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )

    e = _t(spark, sf_dir, "embeddings")
    q = [float(x) for x in e.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    books = train_pq_codebooks(e, "embedding", "vec_id", m=8, k=16)
    enc = pq_encode(e, "embedding", books)
    return pq_topk(enc, books, "vec_id", q, k=10, vec_col="embedding", rerank=16)


def _q_bpe_token_stats(spark, sf_dir):
    """Real trained-BPE token accounting (functions/bpe.py — rows-only:
    the merge loop is not SQL-expressible; the tokenizer is pytest'd
    against hand-computed merges and a reconstruction invariant). Per-lang
    sum of BPE tokens and the compression ratio vs whitespace tokens —
    the number an LLM data pipeline actually budgets with."""
    from ferenda_spark.functions.bpe import bpe_token_count, train_bpe_merges
    from ferenda_spark.functions.textstats import token_count

    d = _t(spark, sf_dir, "documents")
    merges = train_bpe_merges(d, n_merges=200, sample_docs=512)
    per = d.select(
        "lang",
        bpe_token_count(merges)(F.col("text")).alias("bpe"),
        token_count(F.col("text")).alias("ws"),
    )
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("bpe").alias("sum_bpe_tokens"),
        F.sum("ws").alias("sum_ws_tokens"),
        F.round(
            F.sum("bpe").cast("double") / F.sum("ws").cast("double"), 4
        ).alias("bpe_per_word"),
    )


def _q_kg_xhtml(spark, sf_dir):
    """Parsed-layer XHTML+RDFa rendering (render_xhtml port — rows-only:
    the serializer is column-expression string assembly over nested
    structs; distill round-trip asserted in tests/test_xhtml.py)."""
    from ferenda_spark.operators.parse import parse_stage, split_parsed
    from ferenda_spark.operators.xhtml import render_xhtml
    from ferenda_spark.sources.corpus import generate_corpus

    docs, _ = split_parsed(parse_stage(generate_corpus(spark, 100), n_parts=8))
    return render_xhtml(docs).select(
        "url", F.length("xhtml").alias("n_chars"), F.sha2("xhtml", 256).alias("sha")
    )


def _q_kg_patched_parse(spark, sf_dir):
    """Patch-before-parse (patch_if_needed port — rows-only: unified-diff
    application inside the Arrow batch loop). Patches one known doc and
    parses the corpus; returns per-doc patch status + parse output size."""
    from ferenda_spark.operators.parse import parse_stage, split_parsed
    from ferenda_spark.operators.patches import patch_corpus
    from ferenda_spark.sources.corpus import gen_doc, generate_corpus

    n = 60
    corpus = generate_corpus(spark, n)
    target = gen_doc(7, n)
    lines = target["html"].decode("latin-1").split("\n")
    li = next(i for i, l in enumerate(lines) if "<p>" in l)
    patch = (
        f"@@ -{li + 1},1 +{li + 1},1 @@\n-{lines[li]}\n"
        f"+<p>Patched by the S8 stage.</p>"
    )
    patches = spark.createDataFrame(
        [(target["url"], patch)], "url string, patch string"
    )
    patched = patch_corpus(corpus, patches)
    docs, _ = split_parsed(parse_stage(patched, n_parts=8))
    status = patched.select("url", "patched", "patch_error")
    return docs.select("url", "n_paras", "text_sha256").join(status, "url")


def _q_generate_html(spark, sf_dir):
    """T10 generate step (operators/transformer.py::generate_html — the
    reference's generic.xsl slot): parse the deterministic corpus, render
    XHTML+RDFa, transform with GENERIC_XSL through the stdlib XSLT-subset
    engine, and emit per-doc structural counts + content digest. Rows-only
    (DuckDB cannot replay an XSLT transform); pinned at 100 rows, and the
    nav/section counts are cross-checked per row inside the query: a doc's
    nav has exactly one entry per top-level section, and n_errors must be
    0 everywhere (asserted by the n_transform_errors column being 0)."""
    from ferenda_spark.operators.parse import parse_stage, split_parsed
    from ferenda_spark.operators.transformer import generate_html
    from ferenda_spark.operators.xhtml import render_xhtml
    from ferenda_spark.sources.corpus import generate_corpus

    docs, _ = split_parsed(parse_stage(generate_corpus(spark, 100), n_parts=8))
    html = generate_html(render_xhtml(docs))

    def occurrences(marker: str):
        return (
            (F.length("html")
             - F.length(F.replace(F.col("html"), F.lit(marker), F.lit(""))))
            / len(marker)
        ).cast("int")

    return html.select(
        "url",
        occurrences('<li><a href="#').alias("n_nav_entries"),
        occurrences('<div class="section"').alias("n_sections"),
        F.when(F.col("transform_error").isNotNull(), 1).otherwise(0)
        .alias("n_transform_errors"),
        F.col("n_bytes"),
        F.sha2("html", 256).alias("sha"),
    )


def _q_streaming_components(spark, sf_dir):
    """Streaming entity-component maintenance
    (streaming/components.py::run_stream_to_components) under the oracle:
    two deterministic alias-pair micro-batches derived from doc_id — batch
    1 pairs each 4k with 4k+1, batch 2 merges in 4k+2 — drained through
    Trigger.AvailableNow foreachBatch folds into the snapshot-backed
    component map. The final map has closed form comp = node - node%4,
    which the DuckDB oracle replays relationally, making the streaming
    fold the first stream operator with a full value-hash check (round-3
    verdict, next-round #8)."""
    import hashlib as _hashlib
    import os as _os
    import shutil as _shutil

    from ferenda_spark.sources.snapshots import read_snapshot
    from ferenda_spark.streaming.components import run_stream_to_components

    d = _t(spark, sf_dir, "documents")
    mx = d.agg(F.max("doc_id").alias("m")).collect()[0]["m"]  # scalar probe
    hubs = d.filter((F.col("doc_id") % 4 == 0) & (F.col("doc_id") + 2 <= mx))
    b1 = hubs.select(
        F.col("doc_id").alias("src"), (F.col("doc_id") + 1).alias("dst"))
    b2 = hubs.select(
        F.col("doc_id").alias("src"), (F.col("doc_id") + 2).alias("dst"))

    _dirtag = _hashlib.sha256(
        _os.path.abspath(sf_dir.rstrip("/")).encode()).hexdigest()[:16]
    base = f"/tmp/ferenda_spark_streamcomp_q_{_dirtag}"
    _shutil.rmtree(base, ignore_errors=True)
    src_dir, root, ckpt = f"{base}/src", f"{base}/map", f"{base}/ckpt"

    b1.write.mode("append").parquet(src_dir)
    stream = spark.readStream.schema("src long, dst long").parquet(src_dir)
    run_stream_to_components(stream, root, ckpt)
    b2.write.mode("append").parquet(src_dir)
    run_stream_to_components(
        spark.readStream.schema("src long, dst long").parquet(src_dir),
        root, ckpt)
    return read_snapshot(spark, root).select("node", "comp")


def _q_incremental_void(spark, sf_dir):
    """Incremental VoID maintenance under the oracle
    (operators/void_stats.py::void_sketch_state / void_merge_states /
    void_estimate): build per-batch mergeable states over two disjoint
    halves of a deterministic triple table, merge, and read the estimates
    out. Every distinct-counted vocabulary here is < k=256 (subjects are
    doc_id%200), so the KMV estimator is in its EXACT regime and DuckDB
    can replay each metric as a plain COUNT(DISTINCT) over the union —
    a full value-hash check of the merge algebra, not just a row probe
    (round-3 verdict, next-round #8)."""
    from ferenda_spark.operators.void_stats import (
        void_estimate,
        void_merge_states,
        void_sketch_state,
    )

    d = _t(spark, sf_dir, "documents")
    subj = F.concat(F.lit("ent:"), (F.col("doc_id") % 200).cast("string"))
    t = d.select(
        subj.alias("subj"), F.lit("p:lang").alias("pred"),
        F.col("lang").alias("obj"),
    ).unionByName(
        d.select(
            subj.alias("subj"), F.lit("rdf:type").alias("pred"),
            F.concat(F.lit("c:"), (F.col("doc_id") % 7).cast("string"))
            .alias("obj"),
        )
    )
    b1 = t.filter(F.crc32(F.col("subj")) % 2 == 0)
    b2 = t.filter(F.crc32(F.col("subj")) % 2 == 1)
    merged = void_merge_states(
        void_sketch_state(b1).unionByName(void_sketch_state(b2))
    )
    return void_estimate(merged).select(
        "metric", F.col("value").cast("bigint").alias("value")
    )


_INCREMENTAL_VOID_ORACLE = """
    WITH t AS (
        SELECT 'ent:' || CAST(doc_id % 200 AS VARCHAR) AS subj,
               'p:lang' AS pred, lang AS obj FROM documents
        UNION ALL
        SELECT 'ent:' || CAST(doc_id % 200 AS VARCHAR), 'rdf:type',
               'c:' || CAST(doc_id % 7 AS VARCHAR) FROM documents
    )
    SELECT 'triples' AS metric, CAST(count(*) AS BIGINT) AS value FROM t
    UNION ALL
    SELECT 'subjects', CAST(count(DISTINCT subj) AS BIGINT) FROM t
    UNION ALL
    SELECT 'objects', CAST(count(DISTINCT obj) AS BIGINT) FROM t
    UNION ALL
    SELECT 'predicates', CAST(count(DISTINCT pred) AS BIGINT) FROM t
    UNION ALL
    SELECT 'classes', CAST(count(DISTINCT obj) AS BIGINT) FROM t
    WHERE pred = 'rdf:type'
"""


_STREAMING_COMPONENTS_ORACLE = """
    WITH m AS (SELECT max(doc_id) AS mx FROM documents),
    hubs AS (
        SELECT doc_id FROM documents, m
        WHERE doc_id % 4 = 0 AND doc_id + 2 <= mx
    ),
    nodes AS (
        SELECT doc_id AS node FROM hubs
        UNION ALL SELECT doc_id + 1 FROM hubs
        UNION ALL SELECT doc_id + 2 FROM hubs
    )
    SELECT node, node - (node % 4) AS comp FROM nodes
"""


def _q_toc_html_pages(spark, sf_dir):
    """toc_generate_pages port (rows-only: HTML string assembly — structure
    well-formedness + pagination asserted in tests/test_toc_html.py). The
    underlying rollup is oracle-backed twice (toc_rollup_docs,
    toc_page_lists)."""
    from ferenda_spark.operators.rollups import toc_rollup
    from ferenda_spark.operators.toc_html import toc_pages

    d = _t(spark, sf_dir, "documents")
    docmeta = d.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("uri"),
        F.concat(F.lit("Doc "), F.col("doc_id").cast("string")).alias("title"),
        F.concat(F.lit("202"), (F.col("doc_id") % 3).cast("string"),
                 F.lit("-01-01")).alias("issued"),
        F.col("lang"),
    )
    return toc_pages(toc_rollup(docmeta), "https://ex.org", page_size=50).select(
        "facet", "value", "page", "n_page_docs",
        F.length("html").alias("n_chars"), F.sha2("html", 256).alias("sha"),
    )


def _q_curation_pipeline(spark, sf_dir):
    """End-to-end curation DAG (plans/curation.py): documents → verdict
    audit → boilerplate removal → PII redaction → split → shard packing →
    manifest. Rows-only: the composition chains two window shuffles and a
    reassembly whose exact interleaving DuckDB can't mirror 1:1, but every
    stage is individually oracle-backed (chunk_dedup_*, pii_redact,
    corpus_hash_split, pack_training_shards) and the wiring is pinned by
    tests/test_curation_pipeline.py."""
    from ferenda_spark.plans.curation import curate_corpus

    d = _t(spark, sf_dir, "documents")
    out = curate_corpus(d, budget=1024, n_buckets=4, min_clean_tokens=5)
    return out["manifest"].select(
        "split", "source", "bucket", "pack_id", "n_docs", "n_tokens"
    )


def _q_pack_training_shards(spark, sf_dir):
    """LLM-pipeline sequence packing: documents → token-budget shard
    manifest (concat-then-chunk pack assignment via bucket-parallel window
    cumsum). Oracle reproduces the window arithmetic independently."""
    from ferenda_spark.functions.packing import pack_documents, pack_stats

    d = _t(spark, sf_dir, "documents")
    packed = pack_documents(
        d,
        budget=512,
        group_cols=("source",),
        bucket_expr="cast(pmod(doc_id, 4) as int)",
    )
    return pack_stats(packed, 512, ("source",)).select(
        "source", "bucket", "pack_id", "n_docs", "n_tokens", "fill_ratio"
    )


def _q_docx_ingest_roundtrip(spark, sf_dir):
    """S5 WordReader path, driver-visible: synthesize one .docx per
    document (docs 200–299; stdlib zip+XML writer), ingest through
    sources.docformats.read_documents, emit one row per file with the
    extracted text's sha256. Oracle reconstructs the sha straight from the
    documents table — equality proves character-exact roundtrip through
    the OOXML writer + parser. Bounded 100-row driver synthesis, like
    warc_ingest_roundtrip."""
    import io as _io
    import os as _os
    import shutil as _shutil
    import zipfile as _zip
    from xml.sax.saxutils import escape as _esc

    from ferenda_spark.sources.docformats import read_documents

    d = _t(spark, sf_dir, "documents")
    rows = (
        d.filter((F.col("doc_id") >= 200) & (F.col("doc_id") < 300))
        .select("doc_id", "text")
        .orderBy("doc_id")
        .collect()
    )
    W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    out_dir = f"/tmp/ferenda_spark_docx_q_{_os.path.basename(sf_dir.rstrip('/'))}"
    # recreate from scratch: stale files from an older revision (different
    # doc-id range / filenames) would be co-ingested and flake the oracle
    _shutil.rmtree(out_dir, ignore_errors=True)
    _os.makedirs(out_dir)
    for r in rows:
        doc = (
            f'<?xml version="1.0"?><w:document xmlns:w="{W}"><w:body>'
            f'<w:p><w:pPr><w:pStyle w:val="Title"/></w:pPr>'
            f"<w:r><w:t>Doc {r['doc_id']}</w:t></w:r></w:p>"
            f"<w:p><w:r><w:t>{_esc(r['text'])}</w:t></w:r></w:p>"
            f"</w:body></w:document>"
        )
        buf = _io.BytesIO()
        with _zip.ZipFile(buf, "w") as z:
            z.writestr("word/document.xml", doc)
        with open(f"{out_dir}/{r['doc_id']:05d}.docx", "wb") as f:
            f.write(buf.getvalue())

    return (
        read_documents(spark, out_dir)
        .filter(F.col("doc_error").isNull())
        .select(
            F.element_at(F.split(F.col("url"), "/"), -1).alias("fname"),
            "title",
            F.col("n_parts").cast("long").alias("n_parts"),
            F.sha2(F.col("text"), 256).alias("text_sha"),
        )
    )


def _q_facet_rollup_custom(spark, sf_dir):
    """Declarative Facet rollup (SURVEY §1.1 / A1): toc_rollup driven by a
    USER-declared facet list — a publisher-style facet (source) plus a
    derived numeric bucket facet (n_chars div 1000) — proving new corpus
    dimensions need no operator edits. Counts compared against DuckDB's
    independent per-facet aggregation."""
    from ferenda_spark.facets import Facet
    from ferenda_spark.operators.rollups import toc_rollup

    d = _t(spark, sf_dir, "documents")
    docmeta = d.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("uri"),
        F.concat(F.lit("Doc "), F.col("doc_id").cast("string")).alias("title"),
        F.lit("2024-01-01").alias("issued"),
        "lang", "source", "n_chars",
    )
    facets = (
        Facet("publisher", "source"),
        Facet("size_kb", "cast(n_chars div 1000 as int)"),
    )
    return toc_rollup(docmeta, facets=facets).select("facet", "value", "n_docs")


def _q_warc_ingest_roundtrip(spark, sf_dir):
    """S1 WARC ingest, driver-visible: synthesize a plain + per-record-gzip
    WARC archive pair from the first 200 documents, ingest through
    sources.warc.read_warc, and emit one row per capture with the payload's
    byte length and sha256. The oracle reconstructs url / warc_ts / bytes /
    sha directly from the documents table, so a value match proves
    byte-exact roundtrip through the WARC writer + parser (header parse,
    Content-Length body, HTTP-envelope strip, gzip member handling).

    The synthesis collects 200 bounded rows driver-side (explicitly NOT the
    corpus-sized path — read_warc itself streams archives executor-side;
    this query only needs a deterministic fixture archive)."""
    import gzip as _gzip
    import os as _os
    import shutil as _shutil

    from ferenda_spark.sources.warc import read_warc

    d = _t(spark, sf_dir, "documents")
    rows = (
        d.filter(F.col("doc_id") < 200)
        .select("doc_id", "text")
        .orderBy("doc_id")
        .collect()
    )
    out_dir = f"/tmp/ferenda_spark_warc_q_{_os.path.basename(sf_dir.rstrip('/'))}"
    # recreate from scratch (same rationale as the docx fixture dir)
    _shutil.rmtree(out_dir, ignore_errors=True)
    _os.makedirs(out_dir)

    def rec(doc_id: int, text: str) -> bytes:
        payload = text.encode("utf-8")
        body = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + payload
        url = f"https://w{doc_id % 5}.example.com/doc/{doc_id}"
        mm, ss = divmod(doc_id, 60)
        hdr = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: 2026-01-01T00:{mm:02d}:{ss:02d}Z\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode()
        return hdr + body + b"\r\n\r\n"

    plain = b"".join(rec(r["doc_id"], r["text"]) for r in rows if r["doc_id"] % 2 == 0)
    gz = b"".join(
        _gzip.compress(rec(r["doc_id"], r["text"]), mtime=0)
        for r in rows
        if r["doc_id"] % 2 == 1
    )
    with open(f"{out_dir}/even.warc", "wb") as f:
        f.write(plain)
    with open(f"{out_dir}/odd.warc.gz", "wb") as f:
        f.write(gz)

    return (
        read_warc(spark, out_dir)
        .filter(F.col("warc_error").isNull())
        .select(
            "url",
            "warc_ts",
            F.length("html").cast("long").alias("n_bytes"),
            F.sha2("html", 256).alias("payload_sha"),
        )
    )


def _q_media_features(spark, sf_dir):
    """Multimodal plumbing: binary payloads → Arrow-batched features."""
    from ferenda_spark.operators.multimodal import (
        extract_media_features,
        synthetic_media,
    )

    return extract_media_features(synthetic_media(spark, 64)).select(
        "media_id", "kind", "n_bytes", "payload_sha256", "features"
    )


def _q_media_real_decode(spark, sf_dir):
    """Multimodal REAL decode (round-4): every payload is a genuine PNG
    (functions/png.py::encode_png), mode='real' runs the pure-stdlib
    zlib-inflate + scanline-unfilter decoder (decode_png) inside the
    Arrow-batched UDF, and the deterministic corruption slots
    (media_id % 8 == 3) surface as errors-as-data rows instead of
    killing the batch. Rows-only probe (no SQL replay of a PNG codec);
    pinned at 48 rows with the per-row invariants projected out so the
    pin catches a silent decode regression, not just a row-count one."""
    from ferenda_spark.operators.multimodal import (
        extract_media_features,
        synthetic_png_media,
    )

    feats = extract_media_features(synthetic_png_media(spark, 48), mode="real")
    return feats.select(
        "media_id",
        "width",
        "height",
        F.size("features").alias("n_features"),
        F.col("decode_error").isNotNull().alias("is_error"),
    )


def _q_media_real_decode_jpeg(spark, sf_dir):
    """Multimodal REAL JPEG decode (round-5, closes round-4 missing #2):
    every payload is a genuine baseline JFIF (functions/jpeg.py::
    encode_jpeg — grayscale/RGB, 4:4:4 and 4:2:0 subsampling, restart
    intervals), mode='real' runs the stdlib Huffman + dequant +
    vectorized-IDCT decoder inside the Arrow-batched UDF, and the two
    deterministic corruption slots (truncated scan at media_id % 8 == 3,
    SOF0→SOF2 flip at media_id % 16 == 9) surface as errors-as-data rows.
    Rows-only probe (no SQL replay of a JPEG codec); pinned at 48 rows
    with width/height/n_features/is_error projected out so the pin
    catches a silent decode regression, not just a row-count one."""
    from ferenda_spark.operators.multimodal import (
        extract_media_features,
        synthetic_jpeg_media,
    )

    feats = extract_media_features(
        synthetic_jpeg_media(spark, 48), mode="real")
    return feats.select(
        "media_id",
        "width",
        "height",
        F.size("features").alias("n_features"),
        F.col("decode_error").isNotNull().alias("is_error"),
    )


def _q_docx_struct_triples(spark, sf_dir):
    """S5 + T2 integrated (round-3): DOCX heading styles drive the styled
    Section/Subsection FSM (fsm.parse_styled_structure) through
    read_documents_parsed, and assemble_triples emits the nested structure
    graph (rdf:type / isPartOf / titles with ordinal_path subjects). The
    oracle reconstructs the exact expected graph per document from the
    documents table — equality is a P/R=1.0 check on the styled-grammar
    path. Docs 300-339; issued (file mtime) excluded as nondeterministic."""
    import io as _io
    import os as _os
    import shutil as _shutil
    import zipfile as _zip
    from xml.sax.saxutils import escape as _esc

    from ferenda_spark.operators.triples import assemble_triples
    from ferenda_spark.schemas import P_ISSUED
    from ferenda_spark.sources.docformats import read_documents_parsed

    d = _t(spark, sf_dir, "documents")
    rows = (
        d.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 340))
        .select("doc_id", "source")
        .orderBy("doc_id")
        .collect()
    )
    W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    out_dir = f"/tmp/ferenda_spark_docxs_q_{_os.path.basename(sf_dir.rstrip('/'))}"
    _shutil.rmtree(out_dir, ignore_errors=True)
    _os.makedirs(out_dir)

    def _p(style, text):
        st = f'<w:pPr><w:pStyle w:val="{style}"/></w:pPr>' if style else ""
        return f"<w:p>{st}<w:r><w:t>{_esc(text)}</w:t></w:r></w:p>"

    for r in rows:
        doc = (
            f'<?xml version="1.0"?><w:document xmlns:w="{W}"><w:body>'
            + _p("Title", f"Doc {r['doc_id']}")
            + _p("Heading1", "Part A")
            + _p("", "alpha beta gamma")
            + _p("Heading2", f"From {r['source']}")
            + _p("", "delta")
            + "</w:body></w:document>"
        )
        buf = _io.BytesIO()
        with _zip.ZipFile(buf, "w") as z:
            z.writestr("word/document.xml", doc)
        with open(f"{out_dir}/{r['doc_id']:05d}.docx", "wb") as f:
            f.write(buf.getvalue())

    docs = read_documents_parsed(spark, out_dir, n_parts=8)
    links = spark.createDataFrame(
        [],
        "url string, part_key int, section_ordinal string, canonical_uri string",
    )
    tr = assemble_triples(docs, links).filter(F.col("pred") != P_ISSUED)

    def _norm(col):  # file URI → stable "doc:<id>[#S…]" token
        return F.when(
            col.rlike(r"\.docx(#S[0-9.]+)?$"),
            F.concat(
                F.lit("doc:"),
                F.regexp_extract(col, r"/0*(\d+)\.docx", 1),
                F.regexp_extract(col, r"(#S[0-9.]+)$", 1),
            ),
        ).otherwise(col)

    return tr.select(
        F.regexp_extract("subj", r"/0*(\d+)\.docx", 1).cast("bigint").alias("doc_id"),
        F.regexp_extract("subj", r"#S([0-9.]+)$", 1).alias("sfx"),
        F.col("pred"),
        _norm(F.col("obj")).alias("obj"),
    )


def _q_gopher_quality_stats(spark, sf_dir):
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1, public
    paper) rolled up per language: duplicate-line / duplicate-line-char
    fractions + bullet/ellipsis line fractions (HOF branch, zero shuffle)
    and top-2-gram / duplicated-5-gram char fractions (linear
    explode-groupBy branch), plus the threshold-gate flag count.
    operators/repetition.py; per-doc values are exact int-ratio doubles in
    both engines, averages rounded to 6."""
    from ferenda_spark.operators.repetition import (
        repetition_flag,
        repetition_signals,
    )

    d = _t(spark, sf_dir, "documents")
    sig = repetition_signals(d).join(d.select("doc_id", "lang"), "doc_id")
    flagged = repetition_flag(
        F.col("dup_line_frac"),
        F.col("top_2gram_char_frac"),
        F.col("ellipsis_end_frac"),
        F.col("bullet_start_frac"),
    )
    return sig.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("dup_line_frac"), 6).alias("avg_dup_line_frac"),
        F.round(F.avg("dup_line_char_frac"), 6).alias("avg_dup_line_char_frac"),
        F.round(F.avg("bullet_start_frac"), 6).alias("avg_bullet_frac"),
        F.round(F.avg("ellipsis_end_frac"), 6).alias("avg_ellipsis_frac"),
        F.round(F.avg("top_2gram_char_frac"), 6).alias("avg_top_2gram_frac"),
        F.round(F.avg("dup_5gram_char_frac"), 6).alias("avg_dup_5gram_frac"),
        F.sum(F.when(flagged, 1).otherwise(0)).cast("bigint").alias("n_flagged"),
    )


def _q_domain_cap_sample(spark, sf_dir):
    """Per-domain document cap (Common-Crawl-style host-level
    down-sampling before training): keep at most 20 docs per source,
    chosen by a deterministic md5 'random' order so the sample is unbiased
    w.r.t. document order but reproducible across engines and cluster
    sizes. One window shuffle keyed on the domain; at 100 TB the same
    shape holds (domains are the natural partition key and the cap bounds
    per-group state)."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("source", F.col("rn").cast("int").alias("rn"), "doc_id")
    )


def _q_pagerank_hosts(spark, sf_dir):
    """Host-graph PageRank (operators/graph.py:pagerank — the hyperlink
    quality prior of web-corpus curation). Edges are derived
    DETERMINISTICALLY from doc_id so both engines build the identical
    graph with no external data: doc i links to (7i + 11j) mod C for
    j ∈ {1,2,3} (C = doc count, self-loops dropped). Every node is a
    source with outdegree ≥ 2, so the graph has no dangling nodes and the
    unrolled-SQL oracle can omit the dangling-mass term the Spark operator
    computes (it is exactly 0.0 here). 6 fixed iterations, damping 0.85,
    ranks rounded to 6 (per-iteration engine FP skew ~1e-16 ≪ grain)."""
    from ferenda_spark.operators.graph import pagerank

    d = _t(spark, sf_dir, "documents").select("doc_id")
    c = d.count()
    e = d.select(
        "doc_id",
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("j"),
    ).select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 11 * F.col("j")) % c).alias("dst"),
    )
    pr = pagerank(e, n_iter=6)
    return pr.select(
        F.col("node").alias("doc_id"), F.round("rank", 6).alias("rank")
    )


def _pagerank_oracle(n_iter: int = 6, damping: float = 0.85) -> str:
    """Unrolled fixed-iteration PageRank in ANSI SQL mirroring
    _q_pagerank_hosts exactly (same graph construction, same update rule;
    no dangling term — the constructed graph has none)."""
    head = f"""
        WITH cnt AS (SELECT count(*) AS c FROM documents),
        e AS (
            SELECT DISTINCT doc_id AS src,
                   (doc_id * 7 + 11 * j) % (SELECT c FROM cnt) AS dst
            FROM documents, unnest([1, 2, 3]) AS u(j)
            WHERE (doc_id * 7 + 11 * j) % (SELECT c FROM cnt) <> doc_id
        ),
        nodes AS (
            SELECT DISTINCT src AS node FROM e
            UNION SELECT DISTINCT dst FROM e
        ),
        nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)"""
    steps = []
    for k in range(1, n_iter + 1):
        steps.append(f"""
        r{k} AS (
            SELECT nd.node,
                   (1.0 - {damping}) / (SELECT n FROM nn)
                   + {damping} * COALESCE(m.mass, 0.0) AS rank
            FROM nodes nd LEFT JOIN (
                SELECT e.dst AS node, sum(r.rank / deg.deg) AS mass
                FROM e JOIN deg USING (src)
                JOIN r{k - 1} r ON r.node = e.src
                GROUP BY e.dst
            ) m ON m.node = nd.node
        )""")
    tail = f"""
        SELECT node AS doc_id, round(rank, 6) AS rank FROM r{n_iter}"""
    return head + "," + ",".join(steps) + tail


def _q_trustrank_hosts(spark, sf_dir):
    """Personalized PageRank / TrustRank (operators/graph.py:
    personalized_pagerank — the link-spam demotion signal: random walks
    restart at a trusted seed set, so spam farms unreachable from seeds
    score exactly 0.0). Same deterministic graph as pagerank_hosts
    (doc i links to (7i + 11j) mod C, j in {1,2,3}, self-loops dropped;
    every node has out-edges so the dangling term is exactly 0 and the
    unrolled-SQL oracle omits it). Seeds: doc_id % 17 == 0 — the
    "hand-vetted reputable hosts" list, ~6% of nodes. 6 fixed
    iterations, damping 0.85, scores rounded to 6 (per-iteration engine
    FP skew ~1e-16, far below the grain)."""
    from ferenda_spark.operators.graph import personalized_pagerank

    d = _t(spark, sf_dir, "documents").select("doc_id")
    c = d.count()
    e = d.select(
        "doc_id",
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("j"),
    ).select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 11 * F.col("j")) % c).alias("dst"),
    )
    seeds = d.filter(F.col("doc_id") % 17 == 0).select(
        F.col("doc_id").alias("node")
    )
    out = personalized_pagerank(e, seeds, n_iter=6)
    return out.select(
        F.col("node").alias("doc_id"), F.round("score", 6).alias("score")
    )


def _trustrank_oracle(n_iter: int = 6, damping: float = 0.85) -> str:
    """Unrolled fixed-iteration personalized PageRank in ANSI SQL
    mirroring _q_trustrank_hosts exactly (same graph, same seed rule,
    teleport-vector restart; no dangling term — the graph has none)."""
    head = f"""
        WITH cnt AS (SELECT count(*) AS c FROM documents),
        e AS (
            SELECT DISTINCT doc_id AS src,
                   (doc_id * 7 + 11 * j) % (SELECT c FROM cnt) AS dst
            FROM documents, unnest([1, 2, 3]) AS u(j)
            WHERE (doc_id * 7 + 11 * j) % (SELECT c FROM cnt) <> doc_id
        ),
        nodes AS (
            SELECT DISTINCT src AS node FROM e
            UNION SELECT DISTINCT dst FROM e
        ),
        ns AS (
            SELECT CAST(count(*) AS DOUBLE) AS s FROM nodes
            WHERE node % 17 = 0
        ),
        p AS (
            SELECT node,
                   CASE WHEN node % 17 = 0
                        THEN 1.0 / (SELECT s FROM ns)
                        ELSE 0.0 END AS tele
            FROM nodes
        ),
        deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        r0 AS (SELECT node, tele AS score FROM p)"""
    steps = []
    for k in range(1, n_iter + 1):
        steps.append(f"""
        r{k} AS (
            SELECT p.node,
                   (1.0 - {damping}) * p.tele
                   + {damping} * COALESCE(m.mass, 0.0) AS score
            FROM p LEFT JOIN (
                SELECT e.dst AS node, sum(r.score / deg.deg) AS mass
                FROM e JOIN deg USING (src)
                JOIN r{k - 1} r ON r.node = e.src
                GROUP BY e.dst
            ) m ON m.node = p.node
        )""")
    tail = f"""
        SELECT node AS doc_id, round(score, 6) AS score FROM r{n_iter}"""
    return head + "," + ",".join(steps) + tail


def _q_clustering_coeff(spark, sf_dir):
    """Local clustering coefficient (operators/graph.py:
    clustering_coefficient — triangle closure per host, the
    organic-vs-farm link-neighborhood diagnostic). Deterministic ring-
    with-chords graph: doc i links to (i+1) mod C and (i+2) mod C, so
    every consecutive triple closes a triangle (each node sits in 3,
    degree 4, cc = 0.5 — exact, engine-FP-free integers until the one
    final division, rounded to 6)."""
    from ferenda_spark.operators.graph import clustering_coefficient

    d = _t(spark, sf_dir, "documents").select("doc_id")
    c = d.count()
    e = d.select(
        "doc_id",
        F.explode(F.array(F.lit(1), F.lit(2))).alias("j"),
    ).select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") + F.col("j")) % c).alias("dst"),
    )
    out = clustering_coefficient(e)
    return out.select(
        F.col("node").alias("doc_id"),
        F.col("degree").cast("bigint").alias("degree"),
        F.col("n_triangles").cast("bigint").alias("n_triangles"),
        F.round("cc", 6).alias("cc"),
    )


_CLUSTERING_COEFF_ORACLE = """
    WITH cnt AS (SELECT count(*) AS c FROM documents),
    raw AS (
        SELECT doc_id AS a, (doc_id + j) % (SELECT c FROM cnt) AS b
        FROM documents, unnest([1, 2]) AS u(j)
        WHERE (doc_id + j) % (SELECT c FROM cnt) <> doc_id
    ),
    und AS (
        SELECT DISTINCT a, b FROM (
            SELECT a, b FROM raw UNION ALL SELECT b, a FROM raw
        )
    ),
    deg AS (SELECT a AS node, count(*) AS d FROM und GROUP BY a),
    t AS (
        SELECT u1.a AS node, count(*) AS tri
        FROM und u1
        JOIN und u2 ON u1.a = u2.a AND u1.b < u2.b
        JOIN und u3 ON u3.a = u1.b AND u3.b = u2.b
        GROUP BY u1.a
    )
    SELECT deg.node AS doc_id,
           deg.d AS degree,
           COALESCE(t.tri, 0) AS n_triangles,
           round(CASE WHEN deg.d >= 2
                      THEN 2.0 * COALESCE(t.tri, 0) / (deg.d * (deg.d - 1))
                      ELSE 0.0 END, 6) AS cc
    FROM deg LEFT JOIN t ON t.node = deg.node"""


def _q_hyperball_centrality(spark, sf_dir):
    """HyperBall harmonic/Lin centrality (operators/hyperball.py — the
    Boldi & Vigna sketch algorithm, the only centrality family that
    scales to 10^12-node graphs). Deterministic graph on 300 nodes:
    doc i → (3i + 13j) mod 300 for j ∈ {1,2}, self-loops dropped. At
    ≤300 distinct ids the Datasketches HLL stays in exact (coupon)
    mode, so the ball sizes — and hence every centrality — are exact
    integers and the recursive-CTE BFS oracle replays them VALUE-for-
    value: the one sketch operator with a full hash-match gate (the
    1M-scale runs exercise the estimating regime; tests pin tolerance
    there). max_iter=25 comfortably exceeds the graph's diameter, and
    the oracle's recursion bound mirrors it — a diameter regression
    past 25 would desynchronize both sides and fail the compare."""
    from ferenda_spark.operators.hyperball import hyperball

    d = _t(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 300
    )
    e = (
        d.select(
            "doc_id",
            F.explode(F.array(F.lit(1), F.lit(2))).alias("j"),
        )
        .select(
            F.col("doc_id").alias("src"),
            ((3 * F.col("doc_id") + 13 * F.col("j")) % 300).alias("dst"),
        )
    )
    hb = hyperball(e, max_iter=25)
    return hb.select(
        F.col("node").alias("doc_id"),
        F.round("reachable_est", 6).alias("reachable"),
        F.round("harmonic", 6).alias("harmonic"),
        F.round("sum_dist", 6).alias("sum_dist"),
        F.round("lin", 6).alias("lin"),
    )


_HYPERBALL_ORACLE = """
    WITH RECURSIVE
    e AS (
        SELECT DISTINCT doc_id AS src, (3 * doc_id + 13 * j) % 300 AS dst
        FROM documents, unnest([1, 2]) AS u(j)
        WHERE doc_id < 300 AND (3 * doc_id + 13 * j) % 300 <> doc_id
    ),
    nodes AS (SELECT src AS n FROM e UNION SELECT dst FROM e),
    -- transpose-BFS from every v over REVERSED edges = distances of the
    -- nodes that REACH v (harmonic centrality's direction); recursion
    -- bounded by the Spark side's max_iter
    r(s, n, d) AS (
        SELECT n, n, 0 FROM nodes
        UNION
        SELECT r.s, e.src, r.d + 1
        FROM r JOIN e ON e.dst = r.n
        WHERE r.d < 25
    ),
    dist AS (SELECT s, n, min(d) AS d FROM r GROUP BY s, n),
    agg AS (
        SELECT s,
               CAST(count(*) AS DOUBLE) AS reachable,
               sum(CASE WHEN d > 0 THEN 1.0 / d ELSE 0 END) AS harmonic,
               CAST(sum(d) AS DOUBLE) AS sum_dist
        FROM dist GROUP BY s
    )
    SELECT s AS doc_id,
           round(reachable, 6) AS reachable,
           round(harmonic, 6) AS harmonic,
           round(sum_dist, 6) AS sum_dist,
           round(CASE WHEN sum_dist > 0
                      THEN reachable * reachable / sum_dist
                      ELSE 1.0 END, 6) AS lin
    FROM agg"""


def _q_salsa_hosts(spark, sf_dir):
    """SALSA link analysis (operators/graph_analytics.py:salsa — the
    TKC-resistant HITS replacement, solved in CLOSED FORM: one
    connected-components run + degree shares, no power iteration).
    Deterministic blocked graph: doc i links to (i + 10j) mod C for
    j = 1..(1 + i mod 3) — residue classes mod 10 never mix, so the
    bipartite graph has 10 components and out/in-degrees vary 1..3;
    the oracle replays the component structure with a recursive-CTE
    transitive closure and the degree shares in plain aggregates."""
    from ferenda_spark.operators.graph_analytics import salsa

    d = _t(spark, sf_dir, "documents").select("doc_id")
    c = d.count()
    e = (
        d.select(
            "doc_id",
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("j"),
        )
        .filter(F.col("j") <= 1 + F.col("doc_id") % 3)
        .select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") + 10 * F.col("j")) % c).alias("dst"),
        )
    )
    out = salsa(e)
    return out.select(
        F.col("node").alias("doc_id"),
        F.round("hub", 6).alias("hub"),
        F.round("auth", 6).alias("auth"),
    )


_SALSA_ORACLE = """
    WITH RECURSIVE
    cnt AS (SELECT count(*) AS c FROM documents),
    e AS (
        SELECT DISTINCT doc_id AS src,
               (doc_id + 10 * j) % (SELECT c FROM cnt) AS dst
        FROM documents, unnest([1, 2, 3]) AS u(j)
        WHERE j <= 1 + doc_id % 3
          AND (doc_id + 10 * j) % (SELECT c FROM cnt) <> doc_id
    ),
    be AS (SELECT 'h|' || src AS a, 'a|' || dst AS b FROM e),
    und AS (SELECT a, b FROM be UNION SELECT b, a FROM be),
    reach(n, m) AS (
        SELECT a, a FROM (SELECT DISTINCT a FROM und)
        UNION
        SELECT reach.n, und.b FROM reach JOIN und ON und.a = reach.m
    ),
    comp AS (SELECT n, min(m) AS comp FROM reach GROUP BY n),
    hd AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY src),
    ad AS (SELECT dst AS node, count(*) AS deg FROM e GROUP BY dst),
    htot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM hd),
    atot AS (SELECT CAST(count(*) AS DOUBLE) AS t FROM ad),
    hcomp AS (
        SELECT comp.comp, hd.node, hd.deg
        FROM hd JOIN comp ON comp.n = 'h|' || hd.node
    ),
    hagg AS (
        SELECT comp, sum(deg) AS sdeg, count(*) AS nn
        FROM hcomp GROUP BY comp
    ),
    hs AS (
        SELECT node,
               (nn / (SELECT t FROM htot)) * (deg / sdeg) AS hub
        FROM hcomp JOIN hagg USING (comp)
    ),
    acomp AS (
        SELECT comp.comp, ad.node, ad.deg
        FROM ad JOIN comp ON comp.n = 'a|' || ad.node
    ),
    aagg AS (
        SELECT comp, sum(deg) AS sdeg, count(*) AS nn
        FROM acomp GROUP BY comp
    ),
    asc_ AS (
        SELECT node,
               (nn / (SELECT t FROM atot)) * (deg / sdeg) AS auth
        FROM acomp JOIN aagg USING (comp)
    )
    SELECT COALESCE(hs.node, asc_.node) AS doc_id,
           round(COALESCE(hub, 0.0), 6) AS hub,
           round(COALESCE(auth, 0.0), 6) AS auth
    FROM hs FULL OUTER JOIN asc_ ON hs.node = asc_.node"""


def _q_hits_hosts(spark, sf_dir):
    """Fixed-iteration HITS (operators/graph.py:hits — hub/authority link
    analysis, the complementary prior to pagerank for web-corpus
    curation). Same deterministic-graph trick as pagerank_hosts with
    different constants: doc i links to (5i + 13j) mod C for j ∈ {1,2}
    (self-loops dropped by the operator). 4 iterations, L2-normalized
    per half-step, scores rounded to 6 so per-engine FP summation-order
    skew (~1e-15) disappears below the grain."""
    from ferenda_spark.operators.graph import hits

    d = _t(spark, sf_dir, "documents").select("doc_id")
    c = d.count()
    e = d.select(
        "doc_id",
        F.explode(F.array(F.lit(1), F.lit(2))).alias("j"),
    ).select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 5 + 13 * F.col("j")) % c).alias("dst"),
    )
    out = hits(e, n_iter=4)
    return out.select(
        F.col("node").alias("doc_id"),
        F.round("hub", 6).alias("hub"),
        F.round("authority", 6).alias("authority"),
    )


def _hits_oracle(n_iter: int = 4) -> str:
    """Unrolled fixed-iteration HITS in ANSI SQL mirroring _q_hits_hosts
    exactly: same graph construction, Σ-then-L2-normalize per half-step,
    nodes without in(out)-edges coalesce to 0."""
    head = """
        WITH cnt AS (SELECT count(*) AS c FROM documents),
        e AS MATERIALIZED (
            SELECT DISTINCT doc_id AS src,
                   (doc_id * 5 + 13 * j) % (SELECT c FROM cnt) AS dst
            FROM documents, unnest([1, 2]) AS u(j)
            WHERE (doc_id * 5 + 13 * j) % (SELECT c FROM cnt) <> doc_id
        ),
        nodes AS MATERIALIZED (
            SELECT DISTINCT src AS node FROM e
            UNION SELECT DISTINCT dst FROM e
        ),
        h0 AS MATERIALIZED (SELECT node, 1.0 AS hub FROM nodes)"""
    steps = []
    for k in range(1, n_iter + 1):
        steps.append(f"""
        a{k}u AS MATERIALIZED (
            SELECT nd.node, COALESCE(m.v, 0.0) AS v
            FROM nodes nd LEFT JOIN (
                SELECT e.dst AS node, sum(h.hub) AS v
                FROM e JOIN h{k - 1} h ON h.node = e.src GROUP BY e.dst
            ) m ON m.node = nd.node
        ),
        a{k}n AS MATERIALIZED (SELECT sqrt(sum(v * v)) AS s FROM a{k}u),
        a{k} AS MATERIALIZED (
            SELECT node,
                   CASE WHEN (SELECT s FROM a{k}n) > 0
                        THEN v / (SELECT s FROM a{k}n) ELSE 0.0 END
                       AS authority
            FROM a{k}u
        ),
        h{k}u AS MATERIALIZED (
            SELECT nd.node, COALESCE(m.v, 0.0) AS v
            FROM nodes nd LEFT JOIN (
                SELECT e.src AS node, sum(a.authority) AS v
                FROM e JOIN a{k} a ON a.node = e.dst GROUP BY e.src
            ) m ON m.node = nd.node
        ),
        h{k}n AS MATERIALIZED (SELECT sqrt(sum(v * v)) AS s FROM h{k}u),
        h{k} AS MATERIALIZED (
            SELECT node,
                   CASE WHEN (SELECT s FROM h{k}n) > 0
                        THEN v / (SELECT s FROM h{k}n) ELSE 0.0 END AS hub
            FROM h{k}u
        )""")
    tail = f"""
        SELECT h.node AS doc_id, round(h.hub, 6) AS hub,
               round(a.authority, 6) AS authority
        FROM h{n_iter} h JOIN a{n_iter} a ON a.node = h.node"""
    return head + "," + ",".join(steps) + tail


def _q_snapshot_time_travel(spark, sf_dir):
    """Iceberg-lite snapshot layer (sources/snapshots.py) driver-visible:
    commit the first half of documents as snapshot v1, append the second
    half as v2, then read VERSION 1 via time travel and aggregate it. The
    oracle reconstructs v1's content relationally (doc_id < count/2), so
    equality proves the manifest-pinned read returns exactly the committed
    snapshot — nothing from v2 leaks in, nothing from v1 is lost."""
    import os as _os
    import shutil as _shutil

    from ferenda_spark.sources.snapshots import commit_snapshot, read_snapshot

    d = _t(spark, sf_dir, "documents")
    half = d.count() // 2
    root = f"/tmp/ferenda_spark_snap_q_{_os.path.basename(sf_dir.rstrip('/'))}"
    # recreate from scratch (stale snapshots from an older revision would
    # shift version numbers and flake the oracle)
    _shutil.rmtree(root, ignore_errors=True)
    commit_snapshot(d.filter(F.col("doc_id") < half), root)
    commit_snapshot(d.filter(F.col("doc_id") >= half), root)
    v1 = read_snapshot(spark, root, version=1)
    return v1.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.max("doc_id").alias("max_doc_id"),
    )


def _q_asof_purchase_attribution(spark, sf_dir):
    """As-of join (operators/asof.py — union-window form, one shuffle, no
    join node): each click event attributed to the user's newest purchase
    at-or-before it. Exact-timestamp ties among purchases resolve to the
    largest event_id — mirrored in the oracle by deduping to one purchase
    per (user_id, ts) before DuckDB's native ASOF LEFT JOIN."""
    from ferenda_spark.operators.asof import asof_join

    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value", "event_id"
    )
    out = asof_join(
        clicks,
        purchases,
        on="user_id",
        payload=["event_id", "value"],
        right_order="event_id",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("ts_right").alias("purchase_ts"),
        F.col("event_id_right").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )


def _q_token_budget_mix(spark, sf_dir):
    """Data-mixture construction (functions/packing.py:token_budget_sample):
    per-language greedy prefix sample in deterministic md5 order under a
    6000-token budget (straddling doc included), rolled up per lang. The
    oracle replays the identical window arithmetic."""
    from ferenda_spark.functions.packing import token_budget_sample

    d = _t(spark, sf_dir, "documents")
    kept = token_budget_sample(d, 6000, strata_col="lang")
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.max("start_offset").alias("max_start"),
    )


def _q_range_window_events(spark, sf_dir):
    """Range join (operators/ranges.py — interval bucketing: explode
    intervals to ≤2 width-w buckets, equi-join, filter; never a
    nested-loop join). Events land in 120 deterministic variable-width
    maintenance windows (6h spacing, 13min phase jitter, 30–150min
    lengths); both engines generate the identical window table and compare
    in integer MICROSECONDS (unix_micros vs epoch_us — no float boundary
    risk). Inner semantics: empty windows drop."""
    from ferenda_spark.operators.ranges import range_join

    t0 = 1704067200  # 2024-01-01T00:00:00Z, epoch seconds
    wins = spark.range(120).select(
        F.col("id").alias("win_id"),
        (
            (F.lit(t0) + F.col("id") * 21600 + (F.col("id") % 5) * 780)
            * 1_000_000
        ).alias("w_start"),
        (
            (
                F.lit(t0)
                + F.col("id") * 21600
                + (F.col("id") % 5) * 780
                + 1800
                + (F.col("id") % 7) * 1200
            )
            * 1_000_000
        ).alias("w_end"),
    )
    # ts is TIMESTAMP_NTZ; the session TZ is pinned UTC (session.py), so
    # the cast to TIMESTAMP is the same instant DuckDB's epoch_us assumes
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
    )
    hits = range_join(ev, wins, "t_us", "w_start", "w_end")
    return hits.groupBy("win_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_value"),
    )


def _q_event_sessions(spark, sf_dir):
    """Gap-based sessionization (operators/asof.py:sessionize — lag +
    cumulative-sum in ONE Window node, one key shuffle; 30-min gap,
    integer-microsecond comparisons). Per-session rollup; oracle replays
    the identical window arithmetic."""
    from ferenda_spark.operators.asof import sessionize

    e = _t(spark, sf_dir, "events")
    s = sessionize(e, key="user_id", ts="ts", gap_seconds=1800,
                   tiebreak="event_id")
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


def _q_robots_filtering(spark, sf_dir):
    """RFC 9309 robots-exclusion filter (operators/robots.py — rules
    parsed host-side via pandas UDF, URL matching JVM-side: broadcast
    join + regexp_like + ONE max-of-struct precedence agg). Robots texts
    and URLs are synthesized deterministically from the documents table
    (prefix-only rules so the oracle can replay precedence with CASE):
    disallow /private (len 8) < allow /private/ok (len 11); disallow
    /tmp/. Per-source allowed/blocked counts."""
    from ferenda_spark.operators.robots import (
        parse_robots_rules,
        robots_allowed,
    )

    d = _t(spark, sf_dir, "documents")
    robots = d.select("source").distinct().select(
        F.col("source").alias("host"),
        F.lit(
            "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"
            "Disallow: /tmp/"
        ).alias("robots_txt"),
    )
    rules = parse_robots_rules(robots, agent="ferenda-bot")
    path = (
        F.when(F.col("doc_id") % 5 == 0, F.concat(F.lit("/public/"), F.col("doc_id")))
        .when(F.col("doc_id") % 5 == 1, F.concat(F.lit("/private/"), F.col("doc_id")))
        .when(F.col("doc_id") % 5 == 2, F.concat(F.lit("/private/ok/"), F.col("doc_id")))
        .when(F.col("doc_id") % 5 == 3, F.concat(F.lit("/tmp/"), F.col("doc_id")))
        .otherwise(F.lit("/"))
    )
    urls = d.select(
        "doc_id",
        "source",
        F.concat(F.lit("https://"), F.col("source"), path).alias("url"),
    )
    out = robots_allowed(urls, rules)
    return out.groupBy("source").agg(
        F.sum(F.when(F.col("allowed"), 1).otherwise(0)).cast("bigint").alias("n_allowed"),
        F.sum(F.when(F.col("allowed"), 0).otherwise(1)).cast("bigint").alias("n_blocked"),
    )


def _q_structured_data_triples(spark, sf_dir):
    """schema.org structured-data harvest (operators/structured.py):
    JSON-LD script blocks AND microdata attributes → (src, subj, pred,
    obj), one map-only pandas-UDF pass, zero shuffle. HTML is synthesized
    deterministically from the documents columns (one JSON-LD Article
    with a nested blank-node Person + one microdata WebPage scope) so the
    oracle reconstructs the exact expected graph — exercises @context
    vocab expansion, nested-object blanks, @type, url-attr props and
    text-content props end-to-end."""
    from ferenda_spark.operators.structured import structured_triples

    d = _t(spark, sf_dir, "documents")
    pages = d.select(
        F.format_string(
            "https://%s/doc/%s", F.col("source"), F.col("doc_id")
        ).alias("url"),
        F.format_string(
            '<html><head><script type="application/ld+json">'
            '{"@context": "https://schema.org", "@id": "https://%s/doc/%s",'
            ' "@type": "Article", "name": "Doc %s", "inLanguage": "%s",'
            ' "wordCount": %s,'
            ' "author": {"@type": "Person", "name": "Author %s"}}'
            "</script></head><body>"
            '<div itemscope itemtype="https://schema.org/WebPage"'
            ' itemid="https://%s/page/%s">'
            '<span itemprop="name">Page %s</span>'
            '<a itemprop="url" href="https://%s/doc/%s">link</a>'
            "</div></body></html>",
            F.col("source"), F.col("doc_id"), F.col("doc_id"),
            F.col("lang"), F.col("n_chars"), F.col("doc_id") % 7,
            F.col("source"), F.col("doc_id"), F.col("doc_id"),
            F.col("source"), F.col("doc_id"),
        ).alias("html"),
    )
    return structured_triples(pages, html_col="html", src_col="url")


def _q_outlink_anchor_graph(spark, sf_dir):
    """Outlink + anchor-text harvest (operators/weblinks.py): one
    map-only pandas-UDF pass per page (relative-URL resolution, fragment
    strip, scheme filter, nofollow rel), then ONE dst-keyed aggregate.
    HTML is synthesized deterministically per doc with a relative next
    link, an absolute nofollow hub link, a fragment-only self link and
    two dropped-scheme links (javascript:/mailto:) so the oracle can
    replay resolution with string concat."""
    from ferenda_spark.operators.weblinks import outlinks

    d = _t(spark, sf_dir, "documents")
    pages = d.select(
        F.format_string(
            "https://%s/doc/%s", F.col("source"), F.col("doc_id")
        ).alias("url"),
        F.format_string(
            '<html><body><a href="/doc/%s">next %s</a>'
            '<a href="https://hub.example/cat/%s" rel="nofollow">cat %s</a>'
            '<a href="#sec">self</a>'
            '<a href="javascript:void(0)">js</a>'
            '<a href="mailto:x@y.example">m</a></body></html>',
            F.col("doc_id") + 1, F.col("doc_id") + 1,
            F.col("lang"), F.col("lang"),
        ).alias("html"),
    )
    links = outlinks(pages)
    return links.groupBy("dst").agg(
        F.count(F.lit(1)).alias("n_links"),
        F.sum(F.when(F.col("nofollow"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_nofollow"),
        F.countDistinct("src").alias("n_src"),
        F.min("anchor").alias("min_anchor"),
    )


def _q_decontam_overlap(spark, sf_dir):
    """Eval-set decontamination (operators/decontam.py): distinct word
    n-gram overlap per doc vs a benchmark set — here the eval set is the
    doc_id%17==0 slice of the corpus itself, so real overlaps exist and
    the oracle can rebuild the identical gram sets with
    list_transform/range. One (doc,gram) distinct shuffle + one bounded
    gram join; short docs stay with n_grams=0, never flagged."""
    from ferenda_spark.operators.decontam import decontaminate

    d = _t(spark, sf_dir, "documents")
    ev = d.filter(F.col("doc_id") % 17 == 0).select("text")
    out = decontaminate(d, ev, n=3, threshold=0.25, min_hits=1)
    return out.select(
        F.col("id").alias("doc_id"),
        "n_grams",
        "n_matched",
        "contaminated",
    )


def _q_lm_perplexity(spark, sf_dir):
    """CCNet-style LM quality scoring (functions/lm.py): stupid-backoff
    bigram perplexity, trained on the deterministic doc_id%11==0 corpus
    slice and scored over every doc — all relational (explode + hash
    joins, no model on the driver), so the oracle replays training AND
    scoring in SQL. avg_nll rounded to 6: ln() may differ by 1 ulp
    across engines and summation order by ~1e-16, both ≪ the grain."""
    from ferenda_spark.functions.lm import score_perplexity, train_ngram_lm

    d = _t(spark, sf_dir, "documents")
    lm = train_ngram_lm(d.filter(F.col("doc_id") % 11 == 0).select("text"))
    out = score_perplexity(d, lm)
    return out.select(
        F.col("id").alias("doc_id"),
        "n_bigrams",
        F.round("avg_nll", 6).alias("avg_nll"),
    )


def _q_cross_batch_dedup(spark, sf_dir):
    """Cross-batch incremental dedup (operators/dedup_store.py): batch 1
    is the doc_id < C/2 half; batch 2 is the other half PLUS re-id'd
    copies of batch 1's doc_id%10==0 texts (known cross-batch dups by
    construction). Batch 2 dedups against the committed fingerprint
    store in one anti-join — never rescanning batch 1's text — and the
    oracle replays survivor selection with normalized-text equality
    (min-id wins in batch, absent from batch 1's norm set)."""
    import os as _os
    import shutil as _shutil

    from ferenda_spark.operators.dedup_store import dedup_against_store

    d = _t(spark, sf_dir, "documents")
    c = d.count()
    half = c // 2
    b1 = d.filter(F.col("doc_id") < half)
    b2 = d.filter(F.col("doc_id") >= half).unionByName(
        b1.filter(F.col("doc_id") % 10 == 0).withColumn(
            "doc_id", F.col("doc_id") + 10 * c
        )
    )
    root = f"/tmp/ferenda_spark_fpstore_q_{_os.path.basename(sf_dir.rstrip('/'))}"
    _shutil.rmtree(root, ignore_errors=True)
    dedup_against_store(b1, root, "b1")
    surv, _v = dedup_against_store(b2, root, "b2")
    return surv.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_survivors"),
        F.min("doc_id").alias("min_id"),
        F.max("doc_id").alias("max_id"),
    )


def _q_main_content_extract(spark, sf_dir):
    """Boilerplate removal (functions/boilerplate.py): block-level
    main-content extraction — nav/footer blocks and link-dense blocks
    drop, headings survive the length gate, kept blocks join with blank
    lines. One map-only pandas UDF. The synthesized page wraps each
    doc's text in a 5-block template (nav / h1 / text / all-link
    paragraph / footer) so the oracle reconstructs main_text, n_blocks
    and n_kept from the columns."""
    from ferenda_spark.functions.boilerplate import main_content

    d = _t(spark, sf_dir, "documents")
    pages = d.select(
        "doc_id",
        F.format_string(
            "<html><body>"
            '<nav>Site Nav | <a href="/l">links here</a></nav>'
            "<h1>Title %s</h1>"
            "<p>%s</p>"
            '<p><a href="/a">all link text in this block</a></p>'
            "<footer>footer for %s</footer>"
            "</body></html>",
            F.col("doc_id"), F.col("text"), F.col("source"),
        ).alias("html"),
    )
    out = main_content(pages)
    return out.select("doc_id", "n_blocks", "n_kept", "main_text")


def _q_quality_classifier(spark, sf_dir):
    """fastText-style quality classifier (functions/quality_clf.py):
    deterministic driver-numpy logistic regression over hashed
    bag-of-words (positives = the doc_id%7==0 reference slice,
    negatives = vowel-mangled twins of the same texts), scored
    JVM-side (explode + pmod(xxhash64) + broadcast weight join — no
    UDF). Rows-only: the gradient-descent loop is not SQL-expressible;
    pytest pins separability and cross-partitioning determinism.
    Output: per (source, class) doc counts and flagged counts."""
    from ferenda_spark.functions.quality_clf import (
        score_quality,
        train_quality_classifier,
    )

    d = _t(spark, sf_dir, "documents")
    mangle = F.regexp_replace(F.col("text"), "[aeiou]", "q")
    pos = d.filter(F.col("doc_id") % 7 == 0).select("text")
    neg = d.filter(F.col("doc_id") % 7 == 0).select(mangle.alias("text"))
    model = train_quality_classifier(
        pos, neg, n_buckets=1024, sample_per_class=500, epochs=100
    )
    both = d.select("doc_id", "source", F.lit("real").alias("cls"), "text").unionByName(
        d.select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            "source",
            F.lit("mangled").alias("cls"),
            mangle.alias("text"),
        )
    )
    scored = score_quality(both, model, id_col="doc_id").join(
        both.select(F.col("doc_id").alias("id"), "source", "cls"), "id"
    )
    return scored.groupBy("source", "cls").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("quality_score") > 0.5, 1).otherwise(0))
        .cast("bigint")
        .alias("n_flagged_quality"),
    )


def _q_langid_trained(spark, sf_dir):
    """Trained char-trigram Naive-Bayes language ID
    (functions/langid_trained.py) — train on the even-doc_id half
    (labeled by the lang column), predict the odd half. The corpus text
    is lang-agnostic word soup, so each text gets a deterministic
    per-lang marker suffix (repeat(lang||'xx ', 10)) making the
    profiles separable in BOTH engines; the oracle replays training and
    scoring in SQL. Prediction ties/FP pinned by (round(score,9) DESC,
    lang ASC) row_number in both engines."""
    from ferenda_spark.functions.langid_trained import (
        predict_lang,
        train_langid,
    )

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang",
        F.concat(
            F.col("text"), F.lit(" "),
            F.repeat(F.concat(F.col("lang"), F.lit("xx ")), 10),
        ).alias("text"),
    )
    model = train_langid(d.filter(F.col("doc_id") % 2 == 0))
    out = predict_lang(d.filter(F.col("doc_id") % 2 == 1), model)
    return out.select(
        F.col("id").alias("doc_id"),
        "lang_pred",
        F.round("score", 6).alias("score"),
    )


def _q_wet_export_roundtrip(spark, sf_dir):
    """WET sink/source (sources/wet.py): documents → WARC conversion
    records (one archive per partition, content-hash names) → read back
    through the strict WARC parser (keep_types=conversion) — per-url
    sha256-exact text round-trip plus the WARC-Date timestamp carried
    as doc_id epoch seconds. The oracle reconstructs the expected rows
    straight from the documents columns."""
    import os as _os
    import shutil as _shutil

    from ferenda_spark.sources.wet import read_wet, write_wet

    d = _t(spark, sf_dir, "documents")
    docs = d.select(
        F.format_string(
            "https://%s/doc/%s", F.col("source"), F.col("doc_id")
        ).alias("url"),
        F.timestamp_seconds(F.col("doc_id")).alias("warc_ts"),
        "text",
    )
    out = f"/tmp/ferenda_spark_wet_q_{_os.path.basename(sf_dir.rstrip('/'))}"
    _shutil.rmtree(out, ignore_errors=True)
    write_wet(docs, out)
    back = read_wet(spark, out)
    return back.filter(F.col("warc_error").isNull()).select(
        "url",
        F.unix_timestamp("warc_ts").cast("bigint").alias("ts_sec"),
        F.sha2(F.col("html").cast("string"), 256).alias("text_sha256"),
        F.length(F.col("html").cast("string")).cast("bigint").alias("n_chars"),
    )


def _q_sitemap_url_inventory(spark, sf_dir):
    """Sitemap ingestion (sources/sitemaps.py): one synthesized urlset
    per source (entries deterministically derived from doc columns,
    doc_id-sorted), parsed by the namespace-tolerant stdlib parser in
    one map-only pandas UDF, then per-sitemap URL inventory stats. The
    oracle reconstructs loc/lastmod/priority straight from documents."""
    from ferenda_spark.sources.sitemaps import parse_sitemaps

    d = _t(spark, sf_dir, "documents")
    entry = F.format_string(
        "<url><loc>https://%s/doc/%s</loc>"
        "<lastmod>2024-01-%02d</lastmod><priority>0.%s</priority></url>",
        F.col("source"), F.col("doc_id"),
        F.col("doc_id") % 28 + 1, F.col("doc_id") % 10,
    )
    xml = (
        d.select("source", F.struct("doc_id", entry.alias("e")).alias("s"))
        .groupBy("source")
        .agg(F.array_sort(F.collect_list("s")).alias("_es"))
        .select(
            F.format_string(
                "https://%s/sitemap.xml", F.col("source")
            ).alias("sitemap_url"),
            F.concat(
                F.lit(
                    '<urlset xmlns='
                    '"http://www.sitemaps.org/schemas/sitemap/0.9">'
                ),
                F.array_join(
                    F.transform("_es", lambda s: s["e"]), ""
                ),
                F.lit("</urlset>"),
            ).alias("xml"),
        )
    )
    parsed = parse_sitemaps(xml, xml_col="xml")
    return parsed.filter(F.col("kind") == "url").groupBy(
        "sitemap_url"
    ).agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.min("lastmod").alias("first_mod"),
        F.max("lastmod").alias("last_mod"),
        F.round(F.avg(F.col("priority").cast("double")), 6).alias(
            "avg_priority"
        ),
    )


def _q_zorder_events(spark, sf_dir):
    """Z-order clustering value (functions/zorder.py): the Morton
    interleave as a pure codegen'd expression — per-z-prefix-bucket
    event stats over (event_id%256, user_id%256). The oracle runs the
    IDENTICAL unrolled shift/mask/or interleave in SQL (zorder_sql),
    proving bit-exactness; the layout-locality win (box filters touch
    few z-ordered files) is pinned in tests/test_zorder.py."""
    from ferenda_spark.functions.zorder import zorder_value

    e = _t(spark, sf_dir, "events")
    z = zorder_value(
        [F.col("event_id") % 256, F.col("user_id") % 256], bits=8
    )
    return (
        e.withColumn("_z", z)
        .groupBy(F.shiftright("_z", 10).alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("_z").alias("z_min"),
            F.max("_z").alias("z_max"),
        )
    )


def _q_anchor_topk_profiles(spark, sf_dir):
    """Anchor-text profiles (operators/weblinks.py:anchor_profiles —
    the alias-evidence table entity linking consumes): top-k anchors
    per target by (count DESC, anchor ASC) over the same synthesized
    link set as outlink_anchor_graph, exploded to scalar rows (dst,
    rank, anchor) so the oracle replays the window deterministically."""
    from ferenda_spark.operators.weblinks import anchor_profiles, outlinks

    d = _t(spark, sf_dir, "documents")
    pages = d.select(
        F.format_string(
            "https://%s/doc/%s", F.col("source"), F.col("doc_id")
        ).alias("url"),
        F.format_string(
            '<a href="/doc/%s">next</a>'
            '<a href="https://hub.example/cat/%s">cat %s</a>'
            '<a href="https://hub.example/cat/%s">category</a>',
            F.col("doc_id") + 1, F.col("lang"), F.col("lang"),
            F.col("lang"),
        ).alias("html"),
    )
    prof = anchor_profiles(outlinks(pages), k=2)
    return prof.select(
        "dst", "n_links", "n_src",
        F.posexplode("anchors"),
    ).select(
        "dst", "n_links", "n_src",
        (F.col("pos") + 1).cast("int").alias("rank"),
        F.col("col").alias("anchor"),
    )


def _q_frontier_seed_list(spark, sf_dir):
    """Crawl-frontier composition: sitemap-discovered URLs gated by the
    robots policy — parse_sitemaps (sources/sitemaps.py) feeds
    robots_allowed (operators/robots.py), per-host seed counts out. The
    sitemap paths reuse robots_filtering's prefix rules so the oracle
    replays both the XML reconstruction and the precedence CASE."""
    from ferenda_spark.operators.robots import (
        parse_robots_rules,
        robots_allowed,
    )
    from ferenda_spark.sources.sitemaps import parse_sitemaps

    d = _t(spark, sf_dir, "documents")
    path = (
        F.when(F.col("doc_id") % 5 == 0, F.concat(F.lit("/public/"), F.col("doc_id")))
        .when(F.col("doc_id") % 5 == 1, F.concat(F.lit("/private/"), F.col("doc_id")))
        .when(F.col("doc_id") % 5 == 2, F.concat(F.lit("/private/ok/"), F.col("doc_id")))
        .when(F.col("doc_id") % 5 == 3, F.concat(F.lit("/tmp/"), F.col("doc_id")))
        .otherwise(F.lit("/"))
    )
    entry = F.format_string(
        "<url><loc>https://%s%s</loc></url>",
        F.col("source"), path,
    )
    xml = (
        d.select("source", F.struct("doc_id", entry.alias("e")).alias("s"))
        .groupBy("source")
        .agg(F.array_sort(F.collect_list("s")).alias("_es"))
        .select(
            F.col("source").alias("sitemap_url"),
            F.concat(
                F.lit('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'),
                F.array_join(F.transform("_es", lambda s: s["e"]), ""),
                F.lit("</urlset>"),
            ).alias("xml"),
        )
    )
    seeds = parse_sitemaps(xml, xml_col="xml").filter(
        F.col("kind") == "url"
    ).select(F.col("loc").alias("url"))
    robots = d.select("source").distinct().select(
        F.col("source").alias("host"),
        F.lit(
            "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"
            "Disallow: /tmp/"
        ).alias("robots_txt"),
    )
    rules = parse_robots_rules(robots, agent="ferenda-bot")
    gated = robots_allowed(seeds, rules)
    host = F.regexp_extract(F.col("url"), r"^https://([^/]+)", 1)
    return gated.groupBy(host.alias("host")).agg(
        F.count(F.lit(1)).alias("n_seeds"),
        F.sum(F.when(F.col("allowed"), 1).otherwise(0)).cast("bigint").alias("n_allowed"),
    )


def _q_sameas_canonical(spark, sf_dir):
    """owl:sameAs canonicalization (operators/sameas.py): publisher-style
    equivalence assertions (each doc entity sameAs its group-of-4 base)
    collapsed via connected components (min-URI canonical), then every
    fact's subj — and obj when it is a URI — rewritten through the class
    map, and value-identical duplicates created by the merge collapsed
    keeping the minimum (src_url, part_key) provenance. The oracle replays
    the closure with a recursive CTE and the dedup with QUALIFY
    row_number; literals (p:lang) must pass through untouched."""
    from ferenda_spark.operators.sameas import OWL_SAMEAS, canonicalize_sameas
    from ferenda_spark.schemas import TRIPLES

    d = _t(spark, sf_dir, "documents")
    ent = F.concat(F.lit("ent:"), F.col("doc_id").cast("string"))
    src_url = F.concat(F.lit("u:"), F.col("doc_id").cast("string"))
    pk = (F.col("doc_id") % 8).cast("int")
    null_s = F.lit(None).cast("string")
    sameas = d.select(
        ent.alias("subj"),
        F.lit(OWL_SAMEAS).alias("pred"),
        F.concat(
            F.lit("ent:"), (F.col("doc_id") - F.col("doc_id") % 4).cast("string")
        ).alias("obj"),
        F.lit(True).alias("obj_is_uri"),
        null_s.alias("obj_lang"),
        null_s.alias("obj_dtype"),
        src_url.alias("src_url"),
        pk.alias("part_key"),
    )
    lang_fact = d.select(
        ent.alias("subj"),
        F.lit("p:lang").alias("pred"),
        F.col("lang").alias("obj"),
        F.lit(False).alias("obj_is_uri"),
        F.col("lang").alias("obj_lang"),
        null_s.alias("obj_dtype"),
        src_url.alias("src_url"),
        pk.alias("part_key"),
    )
    cites = d.select(
        ent.alias("subj"),
        F.lit("p:cites").alias("pred"),
        F.concat(
            F.lit("ent:"), (F.col("doc_id") - F.col("doc_id") % 10).cast("string")
        ).alias("obj"),
        F.lit(True).alias("obj_is_uri"),
        null_s.alias("obj_lang"),
        null_s.alias("obj_dtype"),
        src_url.alias("src_url"),
        pk.alias("part_key"),
    )
    triples = sameas.unionByName(lang_fact).unionByName(cites)
    assert [f.name for f in TRIPLES.fields] == triples.columns
    return canonicalize_sameas(triples)


def _q_rdfs_inference(spark, sf_dir):
    """RDFS entailment materialization (operators/inference.py): a tiny
    vocabulary (class chain c:0⊑c:1⊑c:2, c:Doc⊑c:Thing; p:cites⊑p:related
    carrying p:related's domain/range c:Doc; p:label⊑p:note for the
    literal leg) over instance facts synthesized from documents. Returns
    the INFERRED rows only (asserted facts anti-joined out null-safely);
    the oracle replays each rule as a CTE: property inheritance, inherited
    domain/range typing, subclass type inheritance, materialized schema
    closures, then min-provenance dedup via QUALIFY."""
    from ferenda_spark.operators.inference import (
        RDF_TYPE,
        RDFS_DOMAIN,
        RDFS_RANGE,
        RDFS_SUBCLASSOF,
        RDFS_SUBPROPERTYOF,
        rdfs_closure,
    )
    from ferenda_spark.schemas import TRIPLES

    schema_rows = [
        ("c:0", RDFS_SUBCLASSOF, "c:1", True, None, None, "u:schema", 0),
        ("c:1", RDFS_SUBCLASSOF, "c:2", True, None, None, "u:schema", 0),
        ("c:Doc", RDFS_SUBCLASSOF, "c:Thing", True, None, None, "u:schema", 0),
        ("p:cites", RDFS_SUBPROPERTYOF, "p:related", True, None, None, "u:schema", 0),
        ("p:label", RDFS_SUBPROPERTYOF, "p:note", True, None, None, "u:schema", 0),
        ("p:related", RDFS_DOMAIN, "c:Doc", True, None, None, "u:schema", 0),
        ("p:related", RDFS_RANGE, "c:Doc", True, None, None, "u:schema", 0),
    ]
    schema = spark.createDataFrame(schema_rows, TRIPLES)

    d = _t(spark, sf_dir, "documents")
    ent = F.concat(F.lit("ent:"), F.col("doc_id").cast("string"))
    src_url = F.concat(F.lit("u:"), F.col("doc_id").cast("string"))
    pk = (F.col("doc_id") % 8).cast("int")
    null_s = F.lit(None).cast("string")
    cites = d.select(
        ent.alias("subj"), F.lit("p:cites").alias("pred"),
        F.concat(F.lit("ent:"),
                 (F.col("doc_id") - F.col("doc_id") % 10).cast("string")).alias("obj"),
        F.lit(True).alias("obj_is_uri"), null_s.alias("obj_lang"),
        null_s.alias("obj_dtype"), src_url.alias("src_url"), pk.alias("part_key"),
    )
    atypes = d.select(
        ent.alias("subj"), F.lit(RDF_TYPE).alias("pred"),
        F.concat(F.lit("c:"), (F.col("doc_id") % 3).cast("string")).alias("obj"),
        F.lit(True).alias("obj_is_uri"), null_s.alias("obj_lang"),
        null_s.alias("obj_dtype"), src_url.alias("src_url"), pk.alias("part_key"),
    )
    labels = d.select(
        ent.alias("subj"), F.lit("p:label").alias("pred"),
        F.concat(F.lit("Doc "), F.col("doc_id").cast("string")).alias("obj"),
        F.lit(False).alias("obj_is_uri"), null_s.alias("obj_lang"),
        null_s.alias("obj_dtype"), src_url.alias("src_url"), pk.alias("part_key"),
    )
    triples = schema.unionByName(cites).unionByName(atypes).unionByName(labels)
    return rdfs_closure(triples)


def _q_hostline_boilerplate(spark, sf_dir):
    """Corpus-frequency boilerplate removal (functions/boilerplate.py::
    remove_frequent_lines — the CCNet/RefinedWeb step, vs main_content's
    per-page structural rules): per-host nav/footer chrome is synthesized
    around every document's text, then any trimmed line appearing in ≥5
    docs and ≥1% of a host's docs is stripped; clean_text must be
    byte-exact surviving lines. The oracle replays doc-frequency counting
    and ORDER BY pos reassembly (string_agg skips removed-line NULLs)."""
    from ferenda_spark.functions.boilerplate import remove_frequent_lines

    d = _t(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        "source",
        F.concat(
            F.lit("NAV "), F.col("source"), F.lit("\n"),
            F.col("text"),
            F.lit("\nCopyright "), F.col("source"),
        ).alias("text"),
    )
    return remove_frequent_lines(aug, min_docs=5, min_frac=0.01)


def _q_kmv_distinct(spark, sf_dir):
    """KMV distinct-count sketch (functions/sketches.py): per-source
    cardinality estimate of doc_id%4096 at k=128 — above k so the
    (k-1)*2^60/kth estimator path is exercised, alongside the exact
    countDistinct for comparison. The oracle recomputes the k-th smallest
    md5-60bit hash with row_number and the identical double arithmetic
    (same operands → same IEEE result, no rounding needed)."""
    from ferenda_spark.functions.sketches import kmv_estimate, kmv_sketch

    d = _t(spark, sf_dir, "documents").select(
        "source", (F.col("doc_id") % 4096).cast("string").alias("v")
    )
    est = kmv_estimate(kmv_sketch(d, ["source"], "v", k=128), k=128)
    exact = d.groupBy("source").agg(F.countDistinct("v").alias("n_exact"))
    return est.join(exact, "source")


def _q_shacl_violations(spark, sf_dir):
    """SHACL-lite validation (operators/validation.py): declarative
    shapes (minCount/maxCount/datatype/nodeKind/pattern, class-targeted)
    over a synthesized graph with planted defects — doc_id%7 drops the
    title (minCount), %11 doubles it (maxCount), %17 makes it a URI
    (nodeKind Literal), %13 drops the issued datatype, %3 lower-cases the
    code (pattern). The oracle enumerates each violation class with the
    same modular arithmetic."""
    from ferenda_spark.operators.validation import (
        RDF_TYPE,
        shapes_df,
        validate_shapes,
    )
    from ferenda_spark.schemas import TRIPLES

    d = _t(spark, sf_dir, "documents")
    ent = F.concat(F.lit("ent:"), F.col("doc_id").cast("string"))
    src_url = F.concat(F.lit("u:"), F.col("doc_id").cast("string"))
    pk = (F.col("doc_id") % 8).cast("int")
    null_s = F.lit(None).cast("string")

    def row(frame, pred, obj, uri, dtype):
        return frame.select(
            ent.alias("subj"), F.lit(pred).alias("pred"), obj.alias("obj"),
            uri.alias("obj_is_uri"), null_s.alias("obj_lang"),
            dtype.alias("obj_dtype"), src_url.alias("src_url"),
            pk.alias("part_key"),
        )

    types = row(d, RDF_TYPE, F.lit("c:Doc"), F.lit(True), null_s)
    title1 = row(
        d.filter(F.col("doc_id") % 7 != 0),
        "p:title",
        F.concat(F.lit("Title "), F.col("doc_id").cast("string")),
        F.col("doc_id") % 17 == 0,
        null_s,
    )
    title2 = row(
        d.filter(F.col("doc_id") % 11 == 0),
        "p:title",
        F.concat(F.lit("Alt "), F.col("doc_id").cast("string")),
        F.lit(False),
        null_s,
    )
    issued = row(
        d,
        "p:issued",
        F.lit("2026-01-01"),
        F.lit(False),
        F.when(F.col("doc_id") % 13 == 0, null_s).otherwise(F.lit("xsd:date")),
    )
    code = row(
        d,
        "p:code",
        F.concat(
            F.when(F.col("doc_id") % 3 == 0, F.lit("abc-")).otherwise(F.lit("ABC-")),
            F.col("doc_id").cast("string"),
        ),
        F.lit(False),
        null_s,
    )
    triples = types.unionByName(title1).unionByName(title2) \
        .unionByName(issued).unionByName(code)
    assert [f.name for f in TRIPLES.fields] == triples.columns
    shapes = shapes_df(spark, [
        dict(shape="DocShape-title", target_class="c:Doc",
             property="p:title", min_count=1, max_count=1,
             node_kind="Literal"),
        dict(shape="DocShape-issued", target_class="c:Doc",
             property="p:issued", min_count=1, datatype="xsd:date"),
        dict(shape="DocShape-code", target_class="c:Doc",
             property="p:code", min_count=0,
             pattern="^[A-Z]{3}-[0-9]+$"),
    ])
    return validate_shapes(triples, shapes)


def _q_triangle_hosts(spark, sf_dir):
    """Triangle counting (operators/graph.py::triangle_count): per-node
    triangle membership over a deterministic doc_id-derived graph
    (a=id%60, b=(id*7+3)%60) — degree-ordered orientation, one wedge join
    + one closing-edge join. The oracle counts each triangle once via the
    canonical a<b<c three-way join."""
    from ferenda_spark.operators.graph import triangle_count

    d = _t(spark, sf_dir, "documents")
    edges = d.select(
        (F.col("doc_id") % 60).alias("src"),
        ((F.col("doc_id") * 7 + 3) % 60).alias("dst"),
    )
    return triangle_count(edges)


def _q_fact_versions_events(spark, sf_dir):
    """Temporal SCD2 fact versioning (operators/temporal.py): each user's
    event_type stream becomes validity intervals — consecutive re-crawls
    of the same value extend the interval, changes open versions,
    simultaneous conflicts break ties by value. The oracle replays the
    lag change-filter and lead/row_number windows verbatim."""
    from ferenda_spark.operators.temporal import fact_versions

    e = _t(spark, sf_dir, "events")
    assertions = e.select(
        F.concat(F.lit("user:"), F.col("user_id").cast("string")).alias("subj"),
        F.lit("p:status").alias("pred"),
        F.col("event_type").alias("obj"),
        F.col("ts"),
    )
    return fact_versions(assertions)


def _q_ntriples_roundtrip(spark, sf_dir):
    """N-Triples interchange (sources/ntriples.py): triples with hostile
    literals (embedded quote+backslash prefix, document text, lang tags,
    typed literals, URI objects) are serialized to canonical NT lines,
    parsed back, and re-serialized — the query returns the parsed value
    columns plus the line, so the hash gates BOTH round-trip identity and
    exact serialized bytes. The oracle rebuilds the escape chain
    (\\\\ then \\" \\n \\r \\t) with nested replace()."""
    from ferenda_spark.sources.ntriples import (
        parse_ntriples_lines,
        to_ntriples_lines,
    )
    from ferenda_spark.schemas import TRIPLES

    d = _t(spark, sf_dir, "documents")
    ent = F.concat(F.lit("ent:"), F.col("doc_id").cast("string"))
    null_s = F.lit(None).cast("string")

    def row(pred, obj, uri, lang, dtype):
        return d.select(
            ent.alias("subj"), F.lit(pred).alias("pred"), obj.alias("obj"),
            F.lit(uri).alias("obj_is_uri"), lang.alias("obj_lang"),
            dtype.alias("obj_dtype"),
            F.concat(F.lit("u:"), F.col("doc_id").cast("string")).alias("src_url"),
            (F.col("doc_id") % 8).cast("int").alias("part_key"),
        )

    tri = (
        row("p:text", F.concat(F.lit('Q"\\ '), F.col("text")), False,
            null_s, null_s)
        .unionByName(row("p:label", F.concat(F.lit("L-"), F.col("lang")),
                         False, F.col("lang"), null_s))
        .unionByName(row("p:nchars", F.col("n_chars").cast("string"), False,
                         null_s,
                         F.lit("http://www.w3.org/2001/XMLSchema#integer")))
        .unionByName(row("p:cites",
                         F.concat(F.lit("ent:"),
                                  ((F.col("doc_id") * 7 + 3) % 1000)
                                  .cast("string")),
                         True, null_s, null_s))
    )
    assert [f.name for f in TRIPLES.fields] == tri.columns
    parsed = parse_ntriples_lines(to_ntriples_lines(tri).select("line"))
    ok = parsed.filter(F.col("kind") == "triple").drop("kind")
    return to_ntriples_lines(ok).select(
        "subj", "pred", "obj", "obj_is_uri", "obj_lang", "obj_dtype", "line"
    )


def _q_incremental_components(spark, sf_dir):
    """Incremental connected-components maintenance (operators/graph.py::
    update_components): label groups of 4 doc ids, then a new batch of
    bridge edges (id, id+4 at id%20==0) arrives and is folded in via the
    star-edge trick — the edge HISTORY is never rescanned. The oracle
    computes components over old ∪ new with one recursive CTE, which the
    incremental result must equal exactly."""
    from ferenda_spark.operators.graph import (
        connected_components,
        update_components,
    )

    d = _t(spark, sf_dir, "documents")
    old = d.select(
        F.col("doc_id").alias("src"),
        (F.col("doc_id") - F.col("doc_id") % 4).alias("dst"),
    )
    new = d.filter(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").alias("src"), (F.col("doc_id") + 4).alias("dst")
    )
    prev = connected_components(old)
    return update_components(prev, new)


def _q_redirect_resolution(spark, sf_dir):
    """Redirect-chain resolution (operators/redirects.py): pointer
    doubling to each chain's final URL with exact hop counts; planted
    2-loops (ids %50==0) must flag is_cycle with NULL final. Chains are
    u:id→u:id+1 for id%10<3 (length ≤3 ending at the decade's +3 URL).
    The oracle walks chains with a bounded recursive CTE and flags loops
    as max-hop rows whose endpoint still has an outgoing edge."""
    from ferenda_spark.operators.redirects import resolve_redirects

    d = _t(spark, sf_dir, "documents")
    u = F.concat(F.lit("u:"), F.col("doc_id").cast("string"))
    chains = d.filter(F.col("doc_id") % 10 < 3).select(
        u.alias("src"),
        F.concat(F.lit("u:"), (F.col("doc_id") + 1).cast("string")).alias("dst"),
    )
    lx = F.concat(F.lit("loop:"), F.col("doc_id").cast("string"), F.lit(":x"))
    ly = F.concat(F.lit("loop:"), F.col("doc_id").cast("string"), F.lit(":y"))
    loops = d.filter(F.col("doc_id") % 50 == 0)
    edges = chains.unionByName(
        loops.select(lx.alias("src"), ly.alias("dst"))
    ).unionByName(loops.select(ly.alias("src"), lx.alias("dst")))
    return resolve_redirects(edges)


def _q_r2rml_nation_triples(spark, sf_dir):
    """R2RML-lite relational→RDF mapping (operators/r2rml.py): nation and
    region become typed entities with literal / object-reference / typed /
    lang-tagged terms, all from ONE declarative mapping per table —
    map-only, zero shuffle. part_key (xxhash64, not DuckDB-replayable) is
    projected out; everything else hashes against the oracle's UNION ALL
    reconstruction, including the NULL-column drop rule."""
    from ferenda_spark.operators.r2rml import (
        ColumnMap,
        TableMapping,
        XSD_INTEGER,
        map_tables,
    )

    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    out = map_tables({
        "tbl:nation": (nation, TableMapping(
            subject_template="ent:nation/{n_nationkey}",
            class_uri="c:Nation",
            predicates=[
                ColumnMap("p:name", "n_name", lang="en"),
                ColumnMap("p:region", "ent:region/{n_regionkey}",
                          template=True, is_uri=True),
                ColumnMap("p:key", "n_nationkey", dtype=XSD_INTEGER),
            ],
        )),
        "tbl:region": (region, TableMapping(
            subject_template="ent:region/{r_regionkey}",
            class_uri="c:Region",
            predicates=[ColumnMap("p:name", "r_name")],
        )),
    })
    return out.drop("part_key")


def _q_schema_profile(spark, sf_dir):
    """KG schema profiling (operators/profiling.py): (subject class,
    predicate, object kind) usage summary with assertion / distinct-subj /
    distinct-obj counts — typed object refs resolve to their class,
    untyped URIs to @IRI, literals to dtype or @Literal. The oracle
    replays both type joins and the kind CASE."""
    from ferenda_spark.operators.profiling import RDF_TYPE, profile_schema
    from ferenda_spark.schemas import TRIPLES

    d = _t(spark, sf_dir, "documents")
    ent = F.concat(F.lit("ent:"), F.col("doc_id").cast("string"))
    null_s = F.lit(None).cast("string")

    def row(pred_lit, obj, uri, dtype):
        return d.select(
            ent.alias("subj"), F.lit(pred_lit).alias("pred"),
            obj.alias("obj"), F.lit(uri).alias("obj_is_uri"),
            null_s.alias("obj_lang"),
            (F.lit(dtype) if dtype else null_s).alias("obj_dtype"),
            null_s.alias("src_url"),
            (F.col("doc_id") % 8).cast("int").alias("part_key"),
        )

    tri = (
        row(RDF_TYPE,
            F.concat(F.lit("c:"), (F.col("doc_id") % 3).cast("string")),
            True, None)
        .unionByName(row("p:cites",
                         F.concat(F.lit("ent:"),
                                  (F.col("doc_id") - F.col("doc_id") % 10)
                                  .cast("string")), True, None))
        .unionByName(row("p:ext",
                         F.concat(F.lit("ext:"),
                                  (F.col("doc_id") % 5).cast("string")),
                         True, None))
        .unionByName(row("p:label",
                         F.concat(F.lit("Doc "),
                                  F.col("doc_id").cast("string")),
                         False, None))
        .unionByName(row("p:nchars", F.col("n_chars").cast("string"),
                         False, "xsd:integer"))
    )
    assert [f.name for f in TRIPLES.fields] == tri.columns
    return profile_schema(tri)


# ------------------------------------------------- round-3 graph analytics


def _hash_graph(spark, sf_dir, salt: str, n_per_doc: int = 2):
    """Deterministic md5-derived pseudo-random multigraph shared by the
    graph-analytics driver queries: each document contributes
    ``n_per_doc`` edges between nodes 0..M-1 (M = 3·|docs|/10, so degrees
    vary Poisson-style — the regular modular graphs pagerank_hosts uses
    have constant degree, which makes k-core/LPA/Adamic-Adar trivial).
    The hash is the sketches.py cross-engine idiom: top 60 bits of md5,
    ``conv(substr(md5(s),1,15),16,10)`` in Spark ≡
    ``try_cast('0x'||substr(md5(s),1,15) AS BIGINT)`` in DuckDB."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    m = (3 * d.count()) // 10
    e = d.select(
        "doc_id",
        F.explode(
            F.array(*[F.lit(j) for j in range(1, n_per_doc + 1)])
        ).alias("j"),
    )

    def hcol(tag: str):
        s = F.concat_ws(
            ":",
            F.col("doc_id").cast("string"),
            F.col("j").cast("string"),
            F.lit(f"{salt}:{tag}"),
        )
        return F.pmod(
            F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
            F.lit(m),
        )

    return e.select(hcol("a").alias("src"), hcol("b").alias("dst"))


def _hash_graph_sql(salt: str, n_per_doc: int = 2) -> str:
    """WITH-clause fragment reconstructing _hash_graph's symmetrized,
    self-loop-free edge set (`und`) in DuckDB."""
    js = ", ".join(str(j) for j in range(1, n_per_doc + 1))

    def h(tag: str) -> str:
        return (
            "try_cast('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || "
            f"CAST(j AS VARCHAR) || ':{salt}:{tag}'), 1, 15) AS BIGINT) "
            "% (SELECT m FROM cnt)"
        )

    return f"""
        cnt AS (SELECT CAST(floor(3 * count(*) / 10) AS BIGINT) AS m
                FROM documents),
        e AS (SELECT {h('a')} AS src, {h('b')} AS dst
              FROM (SELECT doc_id, j
                    FROM documents, unnest([{js}]) AS u(j))),
        und AS (SELECT src AS a, dst AS b FROM e WHERE src <> dst
                UNION SELECT dst, src FROM e WHERE src <> dst)"""


def _q_bfs_seed_distances(spark, sf_dir):
    """Multi-source BFS (operators/graph_analytics.py::bfs_distances —
    crawl-frontier seed-distance scoring): minimum hop count from seeds
    {0, 5} over the md5-derived graph, truncated at 6 hops. The oracle
    replays 6 unrolled min-relaxation rounds — on unit-weight edges,
    round-k relaxation is exactly the k-th BFS layer, so truncation
    agrees exactly and early convergence on either side is a no-op."""
    from ferenda_spark.operators.graph_analytics import bfs_distances

    return bfs_distances(_hash_graph(spark, sf_dir, "bfs"), [0, 5], max_hops=6)


def _bfs_oracle(max_hops: int = 6) -> str:
    head = f"""
        WITH {_hash_graph_sql('bfs')},
        r0 AS (SELECT CAST(node AS BIGINT) AS node, 0 AS dist
               FROM (VALUES (0), (5)) AS s(node))"""
    steps = []
    for k in range(1, max_hops + 1):
        steps.append(f"""
        r{k} AS MATERIALIZED (
            SELECT node, CAST(min(dist) AS INTEGER) AS dist FROM (
                SELECT node, dist FROM r{k - 1}
                UNION ALL
                SELECT und.b AS node, r.dist + 1 AS dist
                FROM r{k - 1} r JOIN und ON und.a = r.node
            ) GROUP BY node
        )""")
    return head + "," + ",".join(steps) + f"""
        SELECT node, dist FROM r{max_hops}"""


def _q_lpa_communities(spark, sf_dir):
    """Label-propagation communities (graph_analytics.py::
    label_propagation): 3 synchronous rounds, most-frequent neighbor
    label, ties to the smallest label — the deterministic variant. The
    oracle unrolls the 3 rounds with a (count DESC, label ASC)
    row_number argmax; integer counts, so no FP grain at all."""
    from ferenda_spark.operators.graph_analytics import label_propagation

    return label_propagation(_hash_graph(spark, sf_dir, "lpa"), n_iter=3)


def _lpa_oracle(n_iter: int = 3) -> str:
    head = f"""
        WITH {_hash_graph_sql('lpa')},
        l0 AS (SELECT DISTINCT a AS node, a AS label FROM und)"""
    steps = []
    for k in range(1, n_iter + 1):
        steps.append(f"""
        l{k} AS MATERIALIZED (
            SELECT a AS node, label FROM (
                SELECT und.a, l.label,
                       row_number() OVER (
                           PARTITION BY und.a
                           ORDER BY count(*) DESC, l.label ASC) AS rn
                FROM und JOIN l{k - 1} l ON l.node = und.b
                GROUP BY und.a, l.label
            ) WHERE rn = 1
        )""")
    return head + "," + ",".join(steps) + f"""
        SELECT node, label FROM l{n_iter}"""


def _q_kcore_survivors(spark, sf_dir):
    """k-core decomposition (graph_analytics.py::k_core — the classic
    dense-subgraph primitive for link-spam farm detection): the 9-core of
    the md5 graph with in-core degrees. Peeling is monotone with a unique
    fixed point, so the operator's converge-probe loop and the oracle's
    14 unrolled rounds land on the same set (measured peel depth at
    sf0.01 is 5; 14 = depth + margin, extra rounds are no-ops)."""
    from ferenda_spark.operators.graph_analytics import k_core

    return k_core(_hash_graph(spark, sf_dir, "core"), 9)


def _kcore_oracle(k: int = 9, n_rounds: int = 14) -> str:
    head = f"""
        WITH {_hash_graph_sql('core')},
        u0 AS (SELECT a, b FROM und)"""
    steps = []
    for r in range(1, n_rounds + 1):
        steps.append(f"""
        u{r} AS MATERIALIZED (
            SELECT u.a, u.b FROM u{r - 1} u
            JOIN (SELECT a, count(*) AS d FROM u{r - 1} GROUP BY a) da
              ON da.a = u.a
            JOIN (SELECT a, count(*) AS d FROM u{r - 1} GROUP BY a) db
              ON db.a = u.b
            WHERE da.d >= {k} AND db.d >= {k}
        )""")
    return head + "," + ",".join(steps) + f"""
        SELECT a AS node, count(*) AS degree FROM u{n_rounds} GROUP BY a"""


def _q_adamic_adar_links(spark, sf_dir):
    """Adamic-Adar link prediction (graph_analytics.py::adamic_adar —
    alias-candidate generation beyond string similarity): global top-25
    unconnected pairs by Σ 1/ln(deg(common neighbor)), hub centers capped
    at degree 1000 (part of the operator definition — the oracle replays
    the cap), scores rounded to 6, ties broken by (a, b)."""
    from ferenda_spark.operators.graph_analytics import adamic_adar

    return adamic_adar(_hash_graph(spark, sf_dir, "aa"), top_k=25)


_AA_ORACLE = """
        WITH {g},
        deg AS (SELECT a, count(*) AS d FROM und GROUP BY a),
        nb AS (SELECT und.a AS z, und.b AS n, 1.0 / ln(c.d) AS w
               FROM und JOIN deg c ON c.a = und.a
               WHERE c.d >= 2 AND c.d <= 1000),
        pr AS (SELECT l.n AS a, r.n AS b, l.w
               FROM nb l JOIN nb r ON l.z = r.z AND l.n < r.n),
        sc AS (SELECT a, b, round(sum(w), 6) AS score
               FROM pr
               WHERE NOT EXISTS (SELECT 1 FROM und u
                                 WHERE u.a = pr.a AND u.b = pr.b)
               GROUP BY a, b)
        SELECT a, b, score FROM sc
        ORDER BY score DESC, a ASC, b ASC LIMIT 25"""


def _q_wl_structural_colors(spark, sf_dir):
    """Weisfeiler-Lehman color refinement (graph_analytics.py::wl_colors
    — the structural fingerprint under blank-node-stable graph digests):
    per-node 32-hex colors after 2 rounds. Pure codegen'd column
    expressions (md5 / concat_ws / sort_array), and the identical chain
    replays in DuckDB (md5 / string_agg ORDER BY — both engines sort the
    lowercase-hex colors bytewise)."""
    from ferenda_spark.operators.graph_analytics import wl_colors

    return wl_colors(_hash_graph(spark, sf_dir, "wl"), n_rounds=2)


def _wl_oracle(n_rounds: int = 2) -> str:
    head = f"""
        WITH {_hash_graph_sql('wl')},
        c0 AS (SELECT a AS node, md5(CAST(count(*) AS VARCHAR)) AS color
               FROM und GROUP BY a)"""
    steps = []
    for k in range(1, n_rounds + 1):
        steps.append(f"""
        c{k} AS MATERIALIZED (
            SELECT s.a AS node, md5(c.color || '|' || s.sig) AS color
            FROM (SELECT und.a,
                         string_agg(n.color, ',' ORDER BY n.color) AS sig
                  FROM und JOIN c{k - 1} n ON n.node = und.b
                  GROUP BY und.a) s
            JOIN c{k - 1} c ON c.node = s.a
        )""")
    return head + "," + ",".join(steps) + f"""
        SELECT node, color FROM c{n_rounds}"""


def _q_snapshot_diff_triples(spark, sf_dir):
    """Snapshot diff (sources/snapshots.py::snapshot_diff — the
    Iceberg-style incremental feed between two commits): build two
    versions of a small triple table deterministically from documents
    (v2 drops doc_id%11 subjects, rewrites the status of doc_id%10, adds
    p:new rows for doc_id%13), then diff v1→v2. The oracle reconstructs
    both versions relationally and EXCEPT-ALLs them both ways."""
    import hashlib as _hashlib
    import os as _os
    import shutil as _shutil

    from ferenda_spark.sources.snapshots import commit_snapshot, snapshot_diff

    d = _t(spark, sf_dir, "documents")
    subj = F.concat(F.lit("ent:"), F.col("doc_id").cast("string"))

    def tri(pred, obj):
        return d.select(
            subj.alias("subj"), F.lit(pred).alias("pred"), obj.alias("obj"),
            F.col("doc_id"),
        )

    v1 = tri("p:status", F.col("lang")).unionByName(
        tri("p:bucket", (F.col("doc_id") % 7).cast("string"))
    )
    v2 = (
        tri(
            "p:status",
            F.when(F.col("doc_id") % 10 == 0, F.lit("changed")).otherwise(
                F.col("lang")
            ),
        )
        .unionByName(tri("p:bucket", (F.col("doc_id") % 7).cast("string")))
        .unionByName(
            tri("p:new", F.lit("x")).filter(F.col("doc_id") % 13 == 0)
        )
        .filter(F.col("doc_id") % 11 != 0)
    )
    # key on a digest of the FULL path, not just the basename: two
    # concurrent runs over different dirs that happen to share a basename
    # must not rmtree each other's snapshot roots mid-query.
    _dirtag = _hashlib.sha256(
        _os.path.abspath(sf_dir.rstrip("/")).encode()).hexdigest()[:16]
    root = f"/tmp/ferenda_spark_snapdiff_q_{_dirtag}"
    _shutil.rmtree(root, ignore_errors=True)
    commit_snapshot(v1.drop("doc_id"), root)
    commit_snapshot(v2.drop("doc_id"), root, mode="overwrite")
    return snapshot_diff(spark, root, 1, 2)


_SNAPDIFF_ORACLE = """
        WITH v1 AS (
            SELECT 'ent:' || CAST(doc_id AS VARCHAR) AS subj,
                   'p:status' AS pred, lang AS obj FROM documents
            UNION ALL
            SELECT 'ent:' || CAST(doc_id AS VARCHAR), 'p:bucket',
                   CAST(doc_id % 7 AS VARCHAR) FROM documents
        ),
        v2 AS (
            SELECT 'ent:' || CAST(doc_id AS VARCHAR) AS subj,
                   'p:status' AS pred,
                   CASE WHEN doc_id % 10 = 0 THEN 'changed' ELSE lang END AS obj
            FROM documents WHERE doc_id % 11 <> 0
            UNION ALL
            SELECT 'ent:' || CAST(doc_id AS VARCHAR), 'p:bucket',
                   CAST(doc_id % 7 AS VARCHAR)
            FROM documents WHERE doc_id % 11 <> 0
            UNION ALL
            SELECT 'ent:' || CAST(doc_id AS VARCHAR), 'p:new', 'x'
            FROM documents WHERE doc_id % 13 = 0 AND doc_id % 11 <> 0
        )
        SELECT subj, pred, obj, 'added' AS change
        FROM (SELECT * FROM v2 EXCEPT ALL SELECT * FROM v1)
        UNION ALL
        SELECT subj, pred, obj, 'removed' AS change
        FROM (SELECT * FROM v1 EXCEPT ALL SELECT * FROM v2)"""


def _q_taxonomy_rollup_docs(spark, sf_dir):
    """Taxonomy rollup (operators/taxonomy.py): documents carry concept
    c<doc_id%40>; concepts form a 3-ary tree (parent of c_r is
    c_floor((r-1)/3)); counts per concept roll up the subtree. The oracle
    computes the reflexive-transitive ancestor closure with a recursive
    CTE and re-aggregates."""
    from ferenda_spark.operators.taxonomy import taxonomy_rollup

    d = _t(spark, sf_dir, "documents")
    con = d.select((F.col("doc_id") % 40).alias("r")).distinct()
    br = con.filter(F.col("r") > 0).select(
        F.concat(F.lit("c"), F.col("r").cast("string")).alias("child"),
        F.concat(
            F.lit("c"), F.floor((F.col("r") - 1) / 3).cast("string")
        ).alias("parent"),
    )
    m = d.select(
        F.col("doc_id").alias("item"),
        F.concat(F.lit("c"), (F.col("doc_id") % 40).cast("string")).alias(
            "concept"
        ),
    )
    return taxonomy_rollup(m, br)


_TAXONOMY_ORACLE = """
        WITH RECURSIVE con AS (
            SELECT DISTINCT doc_id % 40 AS r FROM documents
        ),
        br AS (
            SELECT 'c' || CAST(r AS VARCHAR) AS child,
                   'c' || CAST(CAST(floor((r - 1) / 3) AS BIGINT) AS VARCHAR)
                       AS parent
            FROM con WHERE r > 0
        ),
        allc AS (
            -- DISTINCT-over-UNION-ALL, not chained UNION: inside WITH
            -- RECURSIVE, DuckDB 1.0 compiles a multi-arm UNION CTE in
            -- recursive form and the later arms skip deduplication
            SELECT DISTINCT concept FROM (
                SELECT 'c' || CAST(r AS VARCHAR) AS concept FROM con
                UNION ALL SELECT child FROM br
                UNION ALL SELECT parent FROM br
            )
        ),
        anc AS (
            SELECT concept AS sub, concept AS sup FROM allc
            UNION
            SELECT anc.sub, br.parent FROM anc JOIN br ON br.child = anc.sup
        ),
        m AS (
            SELECT doc_id AS item,
                   'c' || CAST(doc_id % 40 AS VARCHAR) AS concept
            FROM documents
        ),
        direct AS (
            SELECT concept, count(DISTINCT item) AS nd FROM m GROUP BY concept
        ),
        roll AS (
            SELECT anc.sup AS concept, count(DISTINCT m.item) AS nc
            FROM m JOIN anc ON anc.sub = m.concept GROUP BY anc.sup
        )
        SELECT allc.concept,
               CAST(coalesce(direct.nd, 0) AS BIGINT) AS n_items_direct,
               CAST(coalesce(roll.nc, 0) AS BIGINT) AS n_items_closure
        FROM allc LEFT JOIN direct USING (concept)
        LEFT JOIN roll USING (concept)"""


def _q_fulltext_bm25(spark, sf_dir):
    """Okapi BM25 ranking (operators/fulltext.py::bm25_search) over the
    same index fulltext_search builds: top-10 AND-matches for
    'spark window agg', k1=1.2 b=0.75, score rounded to 6. The oracle
    replays tokenization, tf/df, per-doc indexed length, avgdl, and the
    BM25 formula term-by-term."""
    from ferenda_spark.operators.fulltext import bm25_search, build_fulltext_index

    d = _t(spark, sf_dir, "documents")
    postings, n = build_fulltext_index(d, "text", "doc_id", max_df_ratio=1.0)
    return bm25_search(postings, n, "spark window agg", top_k=10)


_BM25_ORACLE = """
        WITH tok AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+'))
                       AS term
            FROM documents
        ), tf AS (
            SELECT term, doc_id, count(*) AS tf
            FROM tok WHERE term <> '' GROUP BY term, doc_id
        ), dfreq AS (
            SELECT term, count(*) AS df FROM tf GROUP BY term
        ), dl AS (
            SELECT doc_id, CAST(sum(tf) AS DOUBLE) AS dl
            FROM tf GROUP BY doc_id
        ), ad AS (
            SELECT avg(dl) AS avgdl FROM dl
        ), hits AS (
            SELECT tf.doc_id AS id,
                   CAST(count(*) AS INTEGER) AS n_matched,
                   round(sum(
                       ln(1.0 + ((SELECT CAST(count(*) AS DOUBLE)
                                  FROM documents) - dfreq.df + 0.5)
                                / (dfreq.df + 0.5))
                       * (tf.tf * CAST(2.2 AS DOUBLE))
                       / (tf.tf + CAST(1.2 AS DOUBLE)
                          * (CAST(0.25 AS DOUBLE)
                             + CAST(0.75 AS DOUBLE) * dl.dl
                               / (SELECT avgdl FROM ad)))
                   ), 6) AS score
            FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id)
            WHERE tf.term IN ('agg', 'spark', 'window')
            GROUP BY tf.doc_id
            HAVING count(*) = 3
            ORDER BY score DESC, id ASC
            LIMIT 10
        )
        SELECT id, n_matched, score FROM hits"""


def _q_nquads_roundtrip(spark, sf_dir):
    """N-Quads interchange (sources/nquads.py): per-doc quads across
    three named graphs (parse / harvest / default) with a hostile literal
    (quote+backslash prefix plus document text), serialized to canonical
    NQ lines, parsed back, re-serialized — hash gates round-trip identity
    AND exact bytes, graph term included."""
    from ferenda_spark.sources.nquads import (
        parse_nquads_lines,
        to_nquads_lines,
    )

    d = _t(spark, sf_dir, "documents")
    ent = F.concat(F.lit("ent:"), F.col("doc_id").cast("string"))
    null_s = F.lit(None).cast("string")

    def row(pred, obj, uri, lang, graph):
        return d.select(
            ent.alias("subj"), F.lit(pred).alias("pred"), obj.alias("obj"),
            F.lit(uri).alias("obj_is_uri"), lang.alias("obj_lang"),
            null_s.alias("obj_dtype"),
            (F.lit(graph) if graph else null_s).alias("graph"),
        )

    q = (
        row("p:text", F.concat(F.lit('Q"\\ '), F.col("text")), False,
            null_s, "g:parse")
        .unionByName(row("p:cites",
                         F.concat(F.lit("ent:"),
                                  ((F.col("doc_id") * 7 + 3) % 1000)
                                  .cast("string")),
                         True, null_s, "g:harvest"))
        .unionByName(row("p:label", F.concat(F.lit("L-"), F.col("lang")),
                         False, F.col("lang"), None))
    )
    parsed = parse_nquads_lines(to_nquads_lines(q).select("line"))
    ok = parsed.filter(F.col("kind") == "quad").drop("kind")
    return to_nquads_lines(ok).select(
        "subj", "pred", "obj", "obj_is_uri", "obj_lang", "graph", "line"
    )


_NQUADS_ORACLE = r"""
        WITH esc AS (
            SELECT doc_id,
                   replace(replace(replace(replace(replace(
                       'Q"\ ' || text,
                       '\', '\\'), '"', '\"'),
                       chr(10), '\n'), chr(13), '\r'),
                       chr(9), '\t') AS etext
            FROM documents
        ),
        rows_ AS (
            SELECT 'ent:' || doc_id AS subj, 'p:text' AS pred,
                   'Q"\ ' || text AS obj, FALSE AS obj_is_uri,
                   CAST(NULL AS VARCHAR) AS obj_lang,
                   'g:parse' AS graph,
                   '"' || e.etext || '"' AS obj_term
            FROM documents d JOIN esc e USING (doc_id)
            UNION ALL
            SELECT 'ent:' || doc_id, 'p:cites',
                   'ent:' || ((doc_id * 7 + 3) % 1000), TRUE,
                   CAST(NULL AS VARCHAR), 'g:harvest',
                   '<ent:' || ((doc_id * 7 + 3) % 1000) || '>'
            FROM documents
            UNION ALL
            SELECT 'ent:' || doc_id, 'p:label', 'L-' || lang, FALSE,
                   lang, CAST(NULL AS VARCHAR),
                   '"L-' || lang || '"@' || lang
            FROM documents
        )
        SELECT subj, pred, obj, obj_is_uri, obj_lang, graph,
               '<' || subj || '> <' || pred || '> ' || obj_term
               || CASE WHEN graph IS NULL THEN ''
                       ELSE ' <' || graph || '>' END
               || ' .' AS line
        FROM rows_"""


def _q_prov_lineage_triples(spark, sf_dir):
    """PROV-O provenance triples (operators/provenance.py): lineage rows
    synthesized per part_key = doc_id%8 for a two-stage run (parse →
    triples, the triples stage consuming parse's partitions) become
    prov:Activity/Entity/used/wasDerivedFrom structure plus literal
    metric triples; NULL metrics emit nothing. The oracle rebuilds the
    aggregation and every UNION ALL arm."""
    from ferenda_spark.operators.provenance import prov_triples

    d = _t(spark, sf_dir, "documents")
    pk = d.groupBy((F.col("doc_id") % 8).cast("int").alias("part_key")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("b")
    )
    null_l = F.lit(None).cast("long")

    def stage(name, n_out, bytes_in):
        return pk.select(
            F.lit(name).alias("stage"), F.col("part_key"),
            F.col("part_key").alias("partition_id"),
            F.col("n").alias("n_in"), n_out.alias("n_out"),
            bytes_in.alias("bytes_in"), null_l.alias("wall_ms"),
            F.lit("r1").alias("run_id"),
        )

    lineage = stage("parse", F.col("n"), F.col("b")).unionByName(
        stage("triples", F.col("n") * 3, null_l)
    )
    return prov_triples(lineage, upstream={"triples": "parse"})


_PROV_ORACLE = """
        WITH pk AS (
            SELECT doc_id % 8 AS part_key, count(*) AS n,
                   sum(n_chars) AS b
            FROM documents GROUP BY doc_id % 8
        ),
        lin AS (
            SELECT 'parse' AS stage, part_key, n AS n_in, n AS n_out,
                   b AS bytes_in FROM pk
            UNION ALL
            SELECT 'triples', part_key, n, 3 * n, CAST(NULL AS BIGINT)
            FROM pk
        ),
        base AS (
            SELECT 'act:r1/' || stage || '/' || part_key AS act,
                   'tbl:' || stage || '/p' || part_key AS ent,
                   CASE WHEN stage = 'triples'
                        THEN 'tbl:parse/p' || part_key END AS up,
                   n_in, n_out, bytes_in
            FROM lin
        )
        SELECT act AS subj, 'rdf:type' AS pred, 'prov:Activity' AS obj,
               TRUE AS obj_is_uri FROM base
        UNION ALL
        SELECT ent, 'rdf:type', 'prov:Entity', TRUE FROM base
        UNION ALL
        SELECT ent, 'prov:wasGeneratedBy', act, TRUE FROM base
        UNION ALL
        SELECT act, 'prov:used', up, TRUE FROM base WHERE up IS NOT NULL
        UNION ALL
        SELECT ent, 'prov:wasDerivedFrom', up, TRUE FROM base
        WHERE up IS NOT NULL
        UNION ALL
        SELECT act, 'm:nIn', CAST(n_in AS VARCHAR), FALSE FROM base
        UNION ALL
        SELECT act, 'm:nOut', CAST(n_out AS VARCHAR), FALSE FROM base
        UNION ALL
        SELECT act, 'm:bytesIn', CAST(bytes_in AS VARCHAR), FALSE
        FROM base WHERE bytes_in IS NOT NULL"""


def _q_dict_encode_triples(spark, sf_dir):
    """RDF dictionary encoding (operators/dictenc.py): a doc-derived
    triple set encoded to int64 term ids — encode is a map-only
    projection (hash-assigned ids, no coordination), and the oracle
    recomputes every id with the same md5-60bit idiom."""
    from ferenda_spark.operators.dictenc import encode_triples

    d = _t(spark, sf_dir, "documents")
    ent = F.concat(F.lit("ent:"), F.col("doc_id").cast("string"))
    tri = d.select(
        ent.alias("subj"), F.lit("p:cites").alias("pred"),
        F.concat(F.lit("ent:"),
                 ((F.col("doc_id") * 7 + 3) % 1000).cast("string")).alias("obj"),
    ).unionByName(
        d.select(
            ent.alias("subj"), F.lit("p:label").alias("pred"),
            F.concat(F.lit("L-"), F.col("lang")).alias("obj"),
        )
    )
    _terms, enc = encode_triples(tri)
    return enc


_DICTENC_ORACLE = """
        WITH tri AS (
            SELECT 'ent:' || doc_id AS subj, 'p:cites' AS pred,
                   'ent:' || ((doc_id * 7 + 3) % 1000) AS obj
            FROM documents
            UNION ALL
            SELECT 'ent:' || doc_id, 'p:label', 'L-' || lang
            FROM documents
        )
        SELECT try_cast('0x' || substr(md5(subj), 1, 15) AS BIGINT)
                   AS subj_id,
               try_cast('0x' || substr(md5(pred), 1, 15) AS BIGINT)
                   AS pred_id,
               try_cast('0x' || substr(md5(obj), 1, 15) AS BIGINT)
                   AS obj_id
        FROM tri"""


def _q_weighted_sample_mix(spark, sf_dir):
    """Weighted stratified sampling (functions/splits.py::
    weighted_sample — Efraimidis-Spirakis A-ES with hash-derived
    uniforms): top-5 docs per language weighted by n_chars+1; the draw
    is a pure function of doc_id bytes, and the oracle replays
    ln(u)/w ranking with the identical md5 idiom."""
    from ferenda_spark.functions.splits import weighted_sample

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", (F.col("n_chars") + 1).cast("double").alias("w")
    )
    return weighted_sample(d, "doc_id", "w", 5, strata_cols=("lang",)).select(
        "lang", "doc_id"
    )


_WSAMPLE_ORACLE = """
        SELECT lang, doc_id FROM (
            SELECT lang, doc_id,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY ln((try_cast('0x' || substr(
                                        md5(CAST(doc_id AS VARCHAR)), 1, 15)
                                    AS BIGINT) + 0.5)
                                   / 1152921504606846976.0)
                                / (n_chars + 1.0) DESC,
                                doc_id ASC) AS rn
            FROM documents
        ) WHERE rn <= 5"""


def _q_cms_frequencies(spark, sf_dir):
    """Count-Min sketch (functions/cms.py): build a 4×256 grid over the
    skewed key 'k'+floor(sqrt(doc_id)) (counts grow ~2·i per key — real
    frequency variance), then point-query every distinct key. The oracle
    rebuilds every grid cell and probe with the shared md5-60bit idiom
    and replays the min-over-d-cells estimate."""
    from ferenda_spark.functions.cms import cms_build, cms_query

    d = _t(spark, sf_dir, "documents")
    vals = d.select(
        F.concat(
            F.lit("k"), F.floor(F.sqrt(F.col("doc_id"))).cast("string")
        ).alias("v")
    )
    cms = cms_build(vals, [], "v", d=4, w=256)
    keys = vals.distinct()
    return cms_query(cms, keys, "v", d=4, w=256)


_CMS_ORACLE = """
        WITH vals AS (
            SELECT 'k' || CAST(CAST(floor(sqrt(doc_id)) AS BIGINT)
                            AS VARCHAR) AS v
            FROM documents
        ),
        cells AS (
            SELECT v, r,
                   try_cast('0x' || substr(md5(CAST(r AS VARCHAR)
                       || ':' || v), 1, 15) AS BIGINT) % 256 AS col
            FROM vals, unnest([0, 1, 2, 3]) AS u(r)
        ),
        grid AS (
            SELECT r AS row, col, count(*) AS cnt
            FROM cells GROUP BY r, col
        ),
        keys AS (SELECT DISTINCT v FROM vals),
        probes AS (
            SELECT v, r,
                   try_cast('0x' || substr(md5(CAST(r AS VARCHAR)
                       || ':' || v), 1, 15) AS BIGINT) % 256 AS col
            FROM keys, unnest([0, 1, 2, 3]) AS u(r)
        )
        SELECT p.v, min(coalesce(g.cnt, 0)) AS est_cnt
        FROM probes p
        LEFT JOIN grid g ON g.row = p.r AND g.col = p.col
        GROUP BY p.v"""


def _q_hist_quantiles_chars(spark, sf_dir):
    """Mergeable fixed-bin histogram + interpolated quantiles
    (functions/histograms.py): per-language n_chars distribution over
    [0, 4000) in 40 bins, p50/p90 read out by window cumsum + linear
    interpolation. The oracle replays binning, cumulative window, and
    the interpolation arithmetic digit-for-digit."""
    from ferenda_spark.functions.histograms import (
        histogram_quantiles,
        histogram_sketch,
    )

    d = _t(spark, sf_dir, "documents")
    h = histogram_sketch(d, ["lang"], "n_chars", lo=0.0, hi=4000.0, n_bins=40)
    return histogram_quantiles(
        h, ["lang"], [0.5, 0.9], lo=0.0, hi=4000.0, n_bins=40
    )


_HIST_ORACLE = """
        WITH h AS (
            SELECT lang,
                   least(greatest(CAST(floor(CAST(n_chars AS DOUBLE)
                       / 100.0) AS INTEGER), 0), 39) AS bin,
                   count(*) AS cnt
            FROM documents WHERE n_chars IS NOT NULL
            GROUP BY 1, 2
        ),
        c AS (
            SELECT lang, bin, cnt,
                   sum(cnt) OVER (PARTITION BY lang ORDER BY bin) AS cum,
                   coalesce(sum(cnt) OVER (PARTITION BY lang ORDER BY bin
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS cum_before,
                   sum(cnt) OVER (PARTITION BY lang) AS total
            FROM h
        ),
        qq AS (SELECT unnest([CAST(0.5 AS DOUBLE),
                              CAST(0.9 AS DOUBLE)]) AS q),
        cand AS (
            SELECT c.*, qq.q, qq.q * c.total AS target FROM c, qq
        ),
        hit AS (
            SELECT lang, q, bin, cnt, cum_before, target,
                   row_number() OVER (PARTITION BY lang, q
                                      ORDER BY bin) AS rn
            FROM cand WHERE cum >= target
        )
        SELECT lang, q,
               round(bin * 100.0 + (target - cum_before) / cnt * 100.0, 6)
                   AS est
        FROM hit WHERE rn = 1"""


def _q_key_skew_profile(spark, sf_dir):
    """Key-skew profiler (operators/profiling.py::profile_keys — the
    measuring instrument behind 'does this join key need salting'):
    top-5 heaviest event_type values with counts and corpus fractions."""
    from ferenda_spark.operators.profiling import profile_keys

    e = _t(spark, sf_dir, "events")
    return profile_keys(e, "event_type", top_k=5)


_SKEW_ORACLE = """
        WITH c AS (
            SELECT CAST(event_type AS VARCHAR) AS key, count(*) AS cnt
            FROM events GROUP BY 1
        ),
        t AS (SELECT CAST(sum(cnt) AS DOUBLE) AS total FROM c),
        top AS (
            SELECT key, cnt,
                   CAST(row_number() OVER (ORDER BY cnt DESC, key ASC)
                        AS INTEGER) AS rank
            FROM c
        )
        SELECT rank, key, cnt,
               round(cnt / (SELECT total FROM t), 6) AS frac
        FROM top WHERE rank <= 5"""


def _q_owl_property_closure(spark, sf_dir):
    """OWL-lite property semantics (operators/owl.py::owl_closure):
    doc-derived graph with a transitive chain predicate (p:next along
    doc_id blocks of 6), a symmetric predicate (p:near with a modular
    partner), and an inverseOf pair (hasPart/partOf). Returns the
    inferred-only layer; the oracle replays each rule arm (recursive CTE
    for the chain closure) and EXCEPTs the asserted set."""
    from ferenda_spark.operators.inference import RDF_TYPE
    from ferenda_spark.operators.owl import (
        OWL_INVERSE_OF,
        OWL_SYMMETRIC,
        OWL_TRANSITIVE,
        owl_closure,
    )

    d = _t(spark, sf_dir, "documents")
    c = d.count()
    ent = F.concat(F.lit("ent:"), F.col("doc_id").cast("string"))
    null_s = F.lit(None).cast("string")

    def tri(frame, s, p, o):
        return frame.select(
            s.alias("subj"), F.lit(p).alias("pred"), o.alias("obj"),
            F.lit(True).alias("obj_is_uri"), null_s.alias("obj_lang"),
            null_s.alias("obj_dtype"),
        )

    decl = spark.createDataFrame(
        [
            ("p:next", RDF_TYPE, OWL_TRANSITIVE),
            ("p:near", RDF_TYPE, OWL_SYMMETRIC),
            ("p:hasPart", OWL_INVERSE_OF, "p:partOf"),
        ],
        "subj string, pred string, obj string",
    ).select(
        "subj", "pred", "obj", F.lit(True).alias("obj_is_uri"),
        null_s.alias("obj_lang"), null_s.alias("obj_dtype"),
    )
    nxt = tri(
        d.filter(F.col("doc_id") % 6 != 5), ent, "p:next",
        F.concat(F.lit("ent:"), (F.col("doc_id") + 1).cast("string")),
    )
    near = tri(
        d, ent, "p:near",
        F.concat(F.lit("ent:"),
                 ((F.col("doc_id") * 7 + 3) % c).cast("string")),
    )
    haspart = tri(
        d, ent, "p:hasPart",
        F.concat(F.lit("sec:"), F.col("doc_id").cast("string")),
    )
    asserted = decl.unionByName(nxt).unionByName(near).unionByName(haspart)
    return owl_closure(asserted)


def _owl_oracle() -> str:
    return """
        WITH RECURSIVE nxt AS (
            SELECT 'ent:' || doc_id AS src,
                   'ent:' || (doc_id + 1) AS dst
            FROM documents WHERE doc_id % 6 <> 5
        ),
        paths AS (
            SELECT src, dst FROM nxt
            UNION
            SELECT p.src, n.dst FROM paths p JOIN nxt n ON n.src = p.dst
        ),
        near AS (
            SELECT 'ent:' || doc_id AS a,
                   'ent:' || ((doc_id * 7 + 3)
                              % (SELECT count(*) FROM documents)) AS b
            FROM documents
        ),
        asserted AS (
            SELECT DISTINCT subj, pred, obj FROM (
                SELECT src AS subj, 'p:next' AS pred, dst AS obj FROM nxt
                UNION ALL SELECT a, 'p:near', b FROM near
                UNION ALL
                SELECT 'ent:' || doc_id, 'p:hasPart', 'sec:' || doc_id
                FROM documents
            )
        ),
        inferred AS (
            SELECT DISTINCT subj, pred, obj FROM (
                SELECT 'sec:' || doc_id AS subj, 'p:partOf' AS pred,
                       'ent:' || doc_id AS obj
                FROM documents
                UNION ALL SELECT b, 'p:near', a FROM near
                UNION ALL SELECT src, 'p:next', dst FROM paths
            )
        )
        SELECT subj, pred, obj, TRUE AS obj_is_uri,
               CAST(NULL AS VARCHAR) AS obj_lang,
               CAST(NULL AS VARCHAR) AS obj_dtype
        FROM (SELECT subj, pred, obj FROM inferred
              EXCEPT SELECT subj, pred, obj FROM asserted)"""


def _q_owl_functional_conflicts(spark, sf_dir):
    """owl:FunctionalProperty conflict audit (operators/owl.py::
    functional_conflicts — conflicting crawl assertions become triage
    rows, never silent subject-smushing): subjects ent:(doc_id%50)
    asserting p:home city:(doc_id%3) collide by construction; the audit
    reports each conflicted (subj, pred) with the sorted value list."""
    from ferenda_spark.operators.inference import RDF_TYPE
    from ferenda_spark.operators.owl import OWL_FUNCTIONAL, functional_conflicts

    d = _t(spark, sf_dir, "documents")
    null_s = F.lit(None).cast("string")
    decl = spark.createDataFrame(
        [("p:home", RDF_TYPE, OWL_FUNCTIONAL)],
        "subj string, pred string, obj string",
    ).select(
        "subj", "pred", "obj", F.lit(True).alias("obj_is_uri"),
        null_s.alias("obj_lang"), null_s.alias("obj_dtype"),
    )
    facts = d.select(
        F.concat(F.lit("ent:"), (F.col("doc_id") % 50).cast("string")).alias("subj"),
        F.lit("p:home").alias("pred"),
        F.concat(F.lit("city:"), (F.col("doc_id") % 3).cast("string")).alias("obj"),
        F.lit(True).alias("obj_is_uri"), null_s.alias("obj_lang"),
        null_s.alias("obj_dtype"),
    )
    out = functional_conflicts(decl.unionByName(facts))
    return out.select(
        "subj", "pred", "n_values",
        F.concat_ws(",", "values").alias("values_csv"),
    )


_OWLFUN_ORACLE = """
        WITH facts AS (
            SELECT DISTINCT 'ent:' || (doc_id % 50) AS subj,
                   'p:home' AS pred,
                   'city:' || (doc_id % 3) AS obj
            FROM documents
        )
        SELECT subj, pred,
               CAST(count(DISTINCT obj) AS BIGINT) AS n_values,
               string_agg(DISTINCT obj, ',' ORDER BY obj) AS values_csv
        FROM facts
        GROUP BY subj, pred
        HAVING count(DISTINCT obj) > 1"""


def _q_rdf_list_flatten(spark, sf_dir):
    """rdf:List flattening (operators/rdflists.py — JSON-LD @list /
    RDFa order recovery at corpus scale): 20 interleaved cons-cell
    chains (cell:i rest→ cell:i+20), flattened to (head, idx, member)
    by pointer doubling over the reversed rest edges. The oracle walks
    each chain with a recursive CTE carrying the index."""
    from ferenda_spark.operators.rdflists import (
        RDF_FIRST,
        RDF_NIL,
        RDF_REST,
        flatten_rdf_lists,
    )

    d = _t(spark, sf_dir, "documents")
    c = d.count()
    cell = F.concat(F.lit("cell:"), F.col("doc_id").cast("string"))
    rest = d.select(
        cell.alias("subj"), F.lit(RDF_REST).alias("pred"),
        F.when(
            F.col("doc_id") + 20 < c,
            F.concat(F.lit("cell:"), (F.col("doc_id") + 20).cast("string")),
        ).otherwise(F.lit(RDF_NIL)).alias("obj"),
        F.lit(True).alias("obj_is_uri"),
    )
    firsts = d.select(
        cell.alias("subj"), F.lit(RDF_FIRST).alias("pred"),
        F.concat(F.lit("item:"), F.col("doc_id").cast("string")).alias("obj"),
        F.lit(False).alias("obj_is_uri"),
    )
    return flatten_rdf_lists(rest.unionByName(firsts))


_RDFLIST_ORACLE = """
        WITH RECURSIVE cells AS (
            SELECT doc_id AS i,
                   (SELECT count(*) FROM documents) AS c
            FROM documents
        ),
        walk AS (
            SELECT 'cell:' || i AS head, 0 AS idx, i FROM cells WHERE i < 20
            UNION ALL
            SELECT w.head, w.idx + 1, c2.i
            FROM walk w JOIN cells c2 ON c2.i = w.i + 20
        )
        SELECT head, idx, 'item:' || i AS member,
               FALSE AS member_is_uri, TRUE AS ok
        FROM walk"""


def _q_crawl_schedule(spark, sf_dir):
    """Politeness scheduling (operators/scheduler.py): doc-derived
    frontier URLs over 5 hosts → per-host md5-ordered queues, one worker
    per host, not_before offsets at 1s delay. The oracle replays window,
    worker hash, and offsets exactly."""
    from ferenda_spark.operators.scheduler import schedule_fetches

    d = _t(spark, sf_dir, "documents")
    urls = d.select(
        F.concat(
            F.lit("https://h"), (F.col("doc_id") % 5).cast("string"),
            F.lit(".example/p"), F.col("doc_id").cast("string"),
        ).alias("url")
    )
    return schedule_fetches(urls, delay_ms=1000, n_workers=8)


_SCHEDULE_ORACLE = """
        WITH u AS (
            SELECT 'https://h' || (doc_id % 5) || '.example/p' || doc_id
                       AS url,
                   'h' || (doc_id % 5) || '.example' AS host
            FROM documents
        )
        SELECT url, host,
               CAST(try_cast('0x' || substr(md5(host), 1, 15) AS BIGINT)
                    % 8 AS INTEGER) AS worker,
               CAST(row_number() OVER (
                   PARTITION BY host ORDER BY md5(url), url) - 1
                   AS INTEGER) AS seq,
               CAST((row_number() OVER (
                   PARTITION BY host ORDER BY md5(url), url) - 1) * 1000
                   AS BIGINT) AS not_before_ms
        FROM u"""


def _q_skolemized_triples(spark, sf_dir):
    """Blank-node skolemization (functions/uris.py::skolemize_col):
    harvest-style triples where even doc_ids carry bnode subjects and
    every third object is a bnode — skolemized to well-known genid IRIs;
    the oracle replays the md5 genid construction."""
    from ferenda_spark.functions.uris import skolemize_col

    d = _t(spark, sf_dir, "documents")
    subj = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(F.lit("_:doc"), F.col("doc_id").cast("string"), F.lit("/b0")),
    ).otherwise(F.concat(F.lit("ent:"), F.col("doc_id").cast("string")))
    obj = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(F.lit("_:doc"), F.col("doc_id").cast("string"), F.lit("/b1")),
    ).otherwise(F.concat(F.lit("val:"), (F.col("doc_id") % 7).cast("string")))
    tri = d.select(subj.alias("subj"), F.lit("p:rel").alias("pred"),
                   obj.alias("obj"))
    return tri.select(
        skolemize_col(F.col("subj")).alias("subj"),
        "pred",
        skolemize_col(F.col("obj")).alias("obj"),
    )


_SKOLEM_ORACLE = """
        WITH tri AS (
            SELECT CASE WHEN doc_id % 2 = 0
                        THEN '_:doc' || doc_id || '/b0'
                        ELSE 'ent:' || doc_id END AS subj,
                   'p:rel' AS pred,
                   CASE WHEN doc_id % 3 = 0
                        THEN '_:doc' || doc_id || '/b1'
                        ELSE 'val:' || (doc_id % 7) END AS obj
            FROM documents
        )
        SELECT CASE WHEN starts_with(subj, '_:')
                    THEN 'https://kg.example/.well-known/genid/' || md5(subj)
                    ELSE subj END AS subj,
               pred,
               CASE WHEN starts_with(obj, '_:')
                    THEN 'https://kg.example/.well-known/genid/' || md5(obj)
                    ELSE obj END AS obj
        FROM tri"""


def _q_kg_as_of_view(spark, sf_dir):
    """Point-in-time KG view (operators/temporal.py::as_of over the SCD2
    fact_versions output): the graph's asserted user-status facts as of
    2024-01-15 — the validity-interval filter that answers time-travel
    queries without per-day snapshots."""
    from ferenda_spark.operators.temporal import as_of, fact_versions

    e = _t(spark, sf_dir, "events")
    assertions = e.select(
        F.concat(F.lit("user:"), F.col("user_id").cast("string")).alias("subj"),
        F.lit("p:status").alias("pred"),
        F.col("event_type").alias("obj"),
        F.col("ts"),
    )
    return as_of(fact_versions(assertions), "2024-01-15 00:00:00")


_ASOF_ORACLE = """
        WITH obs AS (
            SELECT DISTINCT user_id, event_type AS value, ts
            FROM events
        ),
        w1 AS (
            SELECT user_id, value, ts,
                   lag(value) OVER (
                       PARTITION BY user_id ORDER BY ts, value
                   ) AS prev
            FROM obs
        ),
        ch AS (
            SELECT user_id, value, ts FROM w1
            WHERE prev IS NULL OR value <> prev
        ),
        v AS (
            SELECT 'user:' || user_id AS subj,
                   'p:status' AS pred,
                   value,
                   ts AS valid_from,
                   lead(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, value
                   ) AS valid_to,
                   CAST(row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, value
                   ) AS INT) AS version,
                   (lead(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, value
                   ) IS NULL) AS is_current
            FROM ch
        )
        SELECT * FROM v
        WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
          AND (valid_to IS NULL
               OR valid_to > TIMESTAMP '2024-01-15 00:00:00')"""


def _q_entity_pmi_pairs(spark, sf_dir):
    """Entity co-occurrence PMI (operators/cooccur.py): each document
    mentions three modular entities; pairs co-occurring in ≥2 docs get
    ln(n_ab·N/(n_a·n_b)), rounded to 6. The oracle replays the distinct
    bipartite table, both marginals, the pair self-join, and the
    formula."""
    from ferenda_spark.operators.cooccur import entity_pmi

    d = _t(spark, sf_dir, "documents")
    doc = F.concat(F.lit("d"), F.col("doc_id").cast("string"))

    def ment(expr):
        return d.select(
            doc.alias("doc"),
            F.concat(F.lit("e"), expr.cast("string")).alias("ent"),
        )

    m = (
        ment(F.col("doc_id") % 8)
        .unionByName(ment((F.col("doc_id") * 3 + 1) % 8))
        .unionByName(ment((F.col("doc_id") * 5 + 2) % 8))
    )
    return entity_pmi(m)


_PMI_ORACLE = """
        WITH de AS (
            SELECT DISTINCT doc, ent FROM (
                SELECT 'd' || doc_id AS doc,
                       'e' || (doc_id % 8) AS ent FROM documents
                UNION ALL
                SELECT 'd' || doc_id,
                       'e' || ((doc_id * 3 + 1) % 8) FROM documents
                UNION ALL
                SELECT 'd' || doc_id,
                       'e' || ((doc_id * 5 + 2) % 8) FROM documents
            )
        ),
        nd AS (SELECT CAST(count(DISTINCT doc) AS DOUBLE) AS n FROM de),
        ec AS (SELECT ent, count(*) AS n_e FROM de GROUP BY ent),
        pc AS (
            SELECT l.ent AS a, r.ent AS b, count(*) AS n_ab
            FROM de l JOIN de r ON l.doc = r.doc AND l.ent < r.ent
            GROUP BY l.ent, r.ent
            HAVING count(*) >= 2
        )
        SELECT pc.a, pc.b, pc.n_ab,
               round(ln(pc.n_ab * (SELECT n FROM nd)
                        / (ea.n_e * eb.n_e)), 6) AS pmi
        FROM pc
        JOIN ec ea ON ea.ent = pc.a
        JOIN ec eb ON eb.ent = pc.b"""


def _q_graph_random_walks(spark, sf_dir):
    """Deterministic random walks (operators/walks.py — DeepWalk-style
    embedding-corpus generation with hash-derived choices): 3-step walks
    from every node of the md5 graph. The oracle rebuilds the ranked
    adjacency and unrolls each step's pick = hash60(start:step:node) mod
    degree."""
    from ferenda_spark.operators.walks import random_walks

    return random_walks(_hash_graph(spark, sf_dir, "walk"), length=3)


def _walks_oracle(length: int = 3) -> str:
    head = f"""
        WITH {_hash_graph_sql('walk')},
        deg AS (SELECT a, count(*) AS deg FROM und GROUP BY a),
        adj AS (
            SELECT und.a AS u, und.b AS v,
                   row_number() OVER (PARTITION BY und.a ORDER BY und.b)
                       - 1 AS rk,
                   deg.deg
            FROM und JOIN deg ON deg.a = und.a
        ),
        w0 AS (SELECT a AS start, 0 AS step, a AS node
               FROM (SELECT DISTINCT a FROM und))"""
    steps = []
    for t in range(1, length + 1):
        steps.append(f"""
        w{t} AS MATERIALIZED (
            SELECT w.start, {t} AS step, adj.v AS node
            FROM w{t - 1} w
            JOIN adj ON adj.u = w.node
               AND adj.rk = try_cast('0x' || substr(md5(
                       CAST(w.start AS VARCHAR) || ':{t - 1}:'
                       || CAST(w.node AS VARCHAR)), 1, 15) AS BIGINT)
                   % adj.deg
        )""")
    union = "\n            UNION ALL\n            ".join(
        f"SELECT start, step, node FROM w{t}" for t in range(length + 1)
    )
    return head + "," + ",".join(steps) + f"""
        SELECT start, CAST(step AS INTEGER) AS step, node FROM (
            {union}
        )"""


def _q_void_dataset_stats(spark, sf_dir):
    """VoID dataset self-description (operators/void_stats.py): the
    doc-derived triple set's statistics emitted AS triples — dataset
    totals plus per-predicate and per-class partition nodes (md5-minted,
    order-independent). The oracle recomputes every count and partition
    arm."""
    from ferenda_spark.operators.void_stats import void_description

    d = _t(spark, sf_dir, "documents")
    ent = F.concat(F.lit("ent:"), F.col("doc_id").cast("string"))
    tri = (
        d.select(
            ent.alias("subj"), F.lit("rdf:type").alias("pred"),
            F.concat(F.lit("c:"), (F.col("doc_id") % 3).cast("string")).alias("obj"),
        )
        .unionByName(d.select(
            ent.alias("subj"), F.lit("p:cites").alias("pred"),
            F.concat(F.lit("ent:"),
                     ((F.col("doc_id") * 7 + 3) % 1000).cast("string")).alias("obj"),
        ))
        .unionByName(d.select(
            ent.alias("subj"), F.lit("p:label").alias("pred"),
            F.concat(F.lit("L-"), F.col("lang")).alias("obj"),
        ))
    )
    return void_description(tri)


_VOID_ORACLE = """
        WITH tri AS (
            SELECT 'ent:' || doc_id AS subj, 'rdf:type' AS pred,
                   'c:' || (doc_id % 3) AS obj FROM documents
            UNION ALL
            SELECT 'ent:' || doc_id, 'p:cites',
                   'ent:' || ((doc_id * 7 + 3) % 1000) FROM documents
            UNION ALL
            SELECT 'ent:' || doc_id, 'p:label', 'L-' || lang FROM documents
        ),
        tot AS (
            SELECT count(*) AS n_triples,
                   count(DISTINCT subj) AS n_subj,
                   count(DISTINCT obj) AS n_obj,
                   count(DISTINCT pred) AS n_pred,
                   count(DISTINCT CASE WHEN pred = 'rdf:type' THEN obj END)
                       AS n_classes
            FROM tri
        ),
        pp AS (SELECT pred, count(*) AS n FROM tri GROUP BY pred),
        cp AS (SELECT obj AS cls, count(DISTINCT subj) AS n
               FROM tri WHERE pred = 'rdf:type' GROUP BY obj),
        xsd AS (SELECT 'http://www.w3.org/2001/XMLSchema#integer' AS t)
        SELECT 'void:ds' AS subj, 'rdf:type' AS pred,
               'void:Dataset' AS obj, TRUE AS obj_is_uri,
               CAST(NULL AS VARCHAR) AS obj_dtype
        UNION ALL SELECT 'void:ds', 'void:triples',
               CAST(n_triples AS VARCHAR), FALSE, (SELECT t FROM xsd) FROM tot
        UNION ALL SELECT 'void:ds', 'void:distinctSubjects',
               CAST(n_subj AS VARCHAR), FALSE, (SELECT t FROM xsd) FROM tot
        UNION ALL SELECT 'void:ds', 'void:distinctObjects',
               CAST(n_obj AS VARCHAR), FALSE, (SELECT t FROM xsd) FROM tot
        UNION ALL SELECT 'void:ds', 'void:properties',
               CAST(n_pred AS VARCHAR), FALSE, (SELECT t FROM xsd) FROM tot
        UNION ALL SELECT 'void:ds', 'void:classes',
               CAST(n_classes AS VARCHAR), FALSE, (SELECT t FROM xsd) FROM tot
        UNION ALL SELECT 'void:ds', 'void:propertyPartition',
               'void:ds/prop/' || md5(pred), TRUE, CAST(NULL AS VARCHAR)
               FROM pp
        UNION ALL SELECT 'void:ds/prop/' || md5(pred), 'void:property',
               pred, TRUE, CAST(NULL AS VARCHAR) FROM pp
        UNION ALL SELECT 'void:ds/prop/' || md5(pred), 'void:triples',
               CAST(n AS VARCHAR), FALSE, (SELECT t FROM xsd) FROM pp
        UNION ALL SELECT 'void:ds', 'void:classPartition',
               'void:ds/class/' || md5(cls), TRUE, CAST(NULL AS VARCHAR)
               FROM cp
        UNION ALL SELECT 'void:ds/class/' || md5(cls), 'void:class',
               cls, TRUE, CAST(NULL AS VARCHAR) FROM cp
        UNION ALL SELECT 'void:ds/class/' || md5(cls), 'void:entities',
               CAST(n AS VARCHAR), FALSE, (SELECT t FROM xsd) FROM cp"""


def _q_negative_samples(spark, sf_dir):
    """Deterministic negative sampling (operators/walks.py::
    negative_samples — word2vec/TransE-style corruption rows): 4 hash-
    chosen negatives per directed md5-graph edge, tail drawn from the
    two-level (bucket, n) dense node ranking. The oracle rebuilds the
    ranking as ONE row_number window and replays every draw."""
    from ferenda_spark.operators.walks import negative_samples

    return negative_samples(_hash_graph(spark, sf_dir, "neg"), k=4)


def _negsample_oracle(k: int = 4) -> str:
    js = ", ".join(str(j) for j in range(k))
    return f"""
        WITH {_hash_graph_sql('neg')},
        nodes AS (
            SELECT DISTINCT n FROM (
                SELECT src AS n FROM e UNION ALL SELECT dst FROM e
            )
        ),
        ranked AS (
            SELECT n,
                   row_number() OVER (ORDER BY
                       try_cast('0x' || substr(md5(CAST(n AS VARCHAR)),
                                               1, 15) AS BIGINT) % 64,
                       n) - 1 AS rk
            FROM nodes
        ),
        nv AS (SELECT count(*) AS v FROM nodes),
        probes AS (
            SELECT src AS a, dst AS b, j,
                   try_cast('0x' || substr(md5(CAST(src AS VARCHAR) || ':'
                       || CAST(dst AS VARCHAR) || ':' || CAST(j AS VARCHAR)),
                       1, 15) AS BIGINT) % (SELECT v FROM nv) AS rk
            FROM e, unnest([{js}]) AS u(j)
        )
        SELECT p.a AS src, p.b AS dst, r.n AS neg,
               CAST(p.j AS INTEGER) AS j
        FROM probes p JOIN ranked r USING (rk)"""


def _q_katz_centrality_hosts(spark, sf_dir):
    """Fixed-iteration Katz centrality (graph_analytics.py::
    katz_centrality — the walk-counting prior next to pagerank/HITS):
    4 iterations at α=0.1 over a pagerank-style modular graph
    (dst = (11·id + 13j) mod C, j ∈ {1,2}). The oracle unrolls
    x_{t+1} = 1 + α·Σ_in x_t exactly like the pagerank oracle."""
    from ferenda_spark.operators.graph_analytics import katz_centrality

    d = _t(spark, sf_dir, "documents").select("doc_id")
    c = d.count()
    e = d.select(
        "doc_id", F.explode(F.array(F.lit(1), F.lit(2))).alias("j")
    ).select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 11 + 13 * F.col("j")) % c).alias("dst"),
    )
    return katz_centrality(e, alpha=0.1, n_iter=4)


def _katz_oracle(n_iter: int = 4) -> str:
    head = """
        WITH cnt AS (SELECT count(*) AS c FROM documents),
        e AS (
            SELECT DISTINCT doc_id AS src,
                   (doc_id * 11 + 13 * j) % (SELECT c FROM cnt) AS dst
            FROM documents, unnest([1, 2]) AS u(j)
            WHERE (doc_id * 11 + 13 * j) % (SELECT c FROM cnt) <> doc_id
        ),
        nodes AS (
            SELECT DISTINCT src AS node FROM e
            UNION SELECT DISTINCT dst FROM e
        ),
        x0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS katz FROM nodes)"""
    steps = []
    for k in range(1, n_iter + 1):
        steps.append(f"""
        x{k} AS MATERIALIZED (
            SELECT nd.node,
                   1.0 + CAST(0.1 AS DOUBLE) * COALESCE(m.s, 0.0) AS katz
            FROM nodes nd LEFT JOIN (
                SELECT e.dst AS node, sum(x.katz) AS s
                FROM e JOIN x{k - 1} x ON x.node = e.src
                GROUP BY e.dst
            ) m ON m.node = nd.node
        )""")
    return head + "," + ",".join(steps) + f"""
        SELECT node, round(katz, 6) AS katz FROM x{n_iter}"""


def _q_degree_assortativity(spark, sf_dir):
    """Degree assortativity (graph_analytics.py::degree_assortativity —
    does this link structure look like organic web or a link farm): one
    Pearson r over the md5 graph's endpoint-degree pairs, computed from
    exact integer sufficient statistics so the oracle replays it
    digit-for-digit."""
    from ferenda_spark.operators.graph_analytics import degree_assortativity

    return degree_assortativity(_hash_graph(spark, sf_dir, "assort"))


_ASSORT_ORACLE = f"""
        WITH {_hash_graph_sql('assort')},
        deg AS (SELECT a, count(*) AS d FROM und GROUP BY a),
        pts AS (
            SELECT da.d AS dx, db.d AS dy
            FROM und
            JOIN deg da ON da.a = und.a
            JOIN deg db ON db.a = und.b
        ),
        s AS (
            SELECT count(*) AS n, sum(dx) AS sx, sum(dy) AS sy,
                   sum(dx * dy) AS sxy, sum(dx * dx) AS sxx,
                   sum(dy * dy) AS syy
            FROM pts
        )
        SELECT CAST(n AS BIGINT) AS n_endpoints,
               round(CAST(n * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                            * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r
        FROM s"""


def _q_turtle_serialize(spark, sf_dir):
    """Turtle-lite serialization (sources/turtle.py): per-doc triples
    (typed / lang-tagged / URI objects) grouped into one compact
    subject statement each — objects sorted by term, predicates by IRI,
    insertion-order invariant. The oracle replays the grouping as two
    nested string_agg(... ORDER BY ...) levels."""
    from ferenda_spark.sources.turtle import to_turtle_lines

    d = _t(spark, sf_dir, "documents")
    ent = F.concat(F.lit("ent:"), F.col("doc_id").cast("string"))
    null_s = F.lit(None).cast("string")

    def row(pred, obj, uri, lang, dtype):
        return d.select(
            ent.alias("subj"), F.lit(pred).alias("pred"), obj.alias("obj"),
            F.lit(uri).alias("obj_is_uri"),
            (lang if lang is not None else null_s).alias("obj_lang"),
            (F.lit(dtype) if dtype else null_s).alias("obj_dtype"),
        )

    tri = (
        row("p:cites",
            F.concat(F.lit("ent:"),
                     ((F.col("doc_id") * 7 + 3) % 1000).cast("string")),
            True, None, None)
        .unionByName(row("p:label", F.concat(F.lit("L-"), F.col("lang")),
                         False, F.col("lang"), None))
        .unionByName(row("p:nchars", F.col("n_chars").cast("string"),
                         False, None, "xsd:integer"))
    )
    return to_turtle_lines(tri)


_TURTLE_ORACLE = """
        WITH rows_ AS (
            SELECT 'ent:' || doc_id AS subj, 'p:cites' AS pred,
                   '<ent:' || ((doc_id * 7 + 3) % 1000) || '>' AS term
            FROM documents
            UNION ALL
            SELECT 'ent:' || doc_id, 'p:label',
                   '"L-' || lang || '"@' || lang
            FROM documents
            UNION ALL
            SELECT 'ent:' || doc_id, 'p:nchars',
                   '"' || n_chars || '"^^<xsd:integer>'
            FROM documents
        ),
        pp AS (
            SELECT subj, pred,
                   string_agg(term, ' , ' ORDER BY term) AS objs
            FROM rows_ GROUP BY subj, pred
        ),
        ps AS (
            SELECT subj,
                   string_agg('<' || pred || '> ' || objs, ' ; '
                              ORDER BY pred) AS body
            FROM pp GROUP BY subj
        )
        SELECT subj, '<' || subj || '> ' || body || ' .' AS line FROM ps"""


def _q_anchor_alias_dict(spark, sf_dir):
    """Anchor-text alias dictionary (operators/weblinks.py::
    anchor_alias_dictionary — the Wikipedia-anchors trick for entity
    linking): per-target top-2 normalized anchors with count ≥ 2,
    emitted in the linking dictionary shape. Anchors include a
    double-space variant so the oracle replays the whitespace-collapse
    normalization (regexp_replace ... 'g' in DuckDB)."""
    from ferenda_spark.operators.weblinks import anchor_alias_dictionary

    d = _t(spark, sf_dir, "documents")
    dst = F.concat(
        F.lit("https://t"), (F.col("doc_id") % 20).cast("string"),
        F.lit(".example/"),
    )
    a1 = d.select(
        F.concat(F.lit("https://h"), (F.col("doc_id") % 5).cast("string"),
                 F.lit(".example/p"), F.col("doc_id").cast("string")).alias("src"),
        dst.alias("dst"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("Site  "), (F.col("doc_id") % 20).cast("string")),
        ).otherwise(
            F.concat(F.lit("Site "), (F.col("doc_id") % 20).cast("string"))
        ).alias("anchor"),
    )
    a2 = d.filter(F.col("doc_id") % 2 == 0).select(
        F.lit("s2").alias("src"), dst.alias("dst"),
        F.concat(F.lit("T"), (F.col("doc_id") % 20).cast("string")).alias("anchor"),
    )
    return anchor_alias_dictionary(a1.unionByName(a2), min_count=2, k=2)


_ANCHOR_DICT_ORACLE = """
        WITH links AS (
            SELECT CASE WHEN doc_id % 3 = 0
                        THEN 'Site  ' || (doc_id % 20)
                        ELSE 'Site ' || (doc_id % 20) END AS anchor,
                   'https://t' || (doc_id % 20) || '.example/' AS dst
            FROM documents
            UNION ALL
            SELECT 'T' || (doc_id % 20),
                   'https://t' || (doc_id % 20) || '.example/'
            FROM documents WHERE doc_id % 2 = 0
        ),
        per AS (
            SELECT dst,
                   lower(regexp_replace(trim(anchor), '\\s+', ' ', 'g'))
                       AS alias_key,
                   count(*) AS n_links,
                   min(trim(anchor)) AS alias
            FROM links WHERE length(trim(anchor)) > 0
            GROUP BY 1, 2
            HAVING count(*) >= 2
        ),
        r AS (
            SELECT *, row_number() OVER (
                PARTITION BY dst ORDER BY n_links DESC, alias_key ASC) AS rn
            FROM per
        )
        SELECT alias, alias_key, dst AS canonical_uri,
               'anchor' AS kind, CAST(n_links AS BIGINT) AS n_links
        FROM r WHERE rn <= 2"""


def _fusion_claims_df(spark, sf_dir):
    """Deterministic conflicting-claims table both engines can rebuild
    from `documents` with integer arithmetic only: 9 sources assert
    (entity, pred) facts; sources 0-2 corrupt every third doc's value.
    Mirrors the claims CTE in _FUSION_CLAIMS_SQL exactly."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    sid = (F.col("doc_id") * 13) % 9
    ent = F.col("doc_id") % 40
    true_val = ent * 10 + (F.col("doc_id") % 2)
    wrong = (sid < 3) & (F.col("doc_id") % 3 == 0)
    return d.select(
        F.concat(F.lit("s"), sid.cast("string")).alias("source"),
        F.concat(F.lit("e"), ent.cast("string")).alias("subj"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("pop"))
         .otherwise(F.lit("area")).alias("pred"),
        F.concat(
            F.lit("v"),
            F.when(wrong, true_val + 1).otherwise(true_val).cast("string"),
        ).alias("obj"),
    )


_FUSION_CLAIMS_SQL = """
    SELECT 's' || ((doc_id * 13) % 9) AS source,
           'e' || (doc_id % 40) AS subj,
           CASE WHEN doc_id % 2 = 0 THEN 'pop' ELSE 'area' END AS pred,
           'v' || (CASE WHEN (doc_id * 13) % 9 < 3 AND doc_id % 3 = 0
                        THEN (doc_id % 40) * 10 + (doc_id % 2) + 1
                        ELSE (doc_id % 40) * 10 + (doc_id % 2) END) AS obj
    FROM documents
"""


def _q_fact_fusion(spark, sf_dir):
    """Truth-discovery fusion (operators/fusion.py:fuse_claims — the
    conflict-resolution step between triple harvest and graph
    materialization at Common-Crawl scale). 2 fixed fixed-point rounds;
    the DuckDB oracle unrolls the identical update rule
    (fusion.fusion_unrolled_sql shares the spelling). Confidence rounded
    to 6 (per-key double sums commute to ~1e-15 ≪ grain)."""
    from ferenda_spark.operators.fusion import fuse_claims

    resolved, _ = fuse_claims(_fusion_claims_df(spark, sf_dir), n_iter=2)
    return resolved.select(
        "subj", "pred", "obj",
        F.round("confidence", 6).alias("confidence"),
        "n_sources", "n_candidates",
    )


def _q_fusion_source_trust(spark, sf_dir):
    """Per-source learned reliability from the same fusion run: the
    corrupting sources (s0-s2) must score strictly below the clean ones —
    the signal a crawl scheduler would feed back into host priorities."""
    from ferenda_spark.operators.fusion import fuse_claims

    _, trust = fuse_claims(_fusion_claims_df(spark, sf_dir), n_iter=2)
    return trust.select("source", F.round("trust", 6).alias("trust"))


def _fusion_oracle_head(n_iter: int = 2) -> str:
    from ferenda_spark.operators.fusion import fusion_unrolled_sql

    return fusion_unrolled_sql(_FUSION_CLAIMS_SQL, n_iter=n_iter)


_FACT_FUSION_ORACLE = _fusion_oracle_head() + """
    SELECT subj, pred, obj, round(confidence, 6) AS confidence,
           n_sources, n_candidates
    FROM (SELECT *, row_number() OVER (
              PARTITION BY subj, pred
              ORDER BY confidence DESC, obj ASC) AS rn
          FROM conf2)
    WHERE rn = 1"""


_FUSION_TRUST_ORACLE = _fusion_oracle_head() + """
    SELECT source, CAST(round(CAST(trust AS DOUBLE), 6) AS DOUBLE)
        AS trust FROM trust2"""


def _cocite_edges_df(spark, sf_dir):
    """Deterministic link graph for the co-citation family: doc i links
    to (5i + 13j) mod C for j ∈ 1..4, self-loops dropped — same
    arithmetic-edge pattern as _q_pagerank_hosts so both engines build
    the identical graph."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    c = d.count()
    return d.select(
        "doc_id",
        F.explode(F.array(*[F.lit(j) for j in (1, 2, 3, 4)])).alias("j"),
    ).select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 5 + 13 * F.col("j")) % c).alias("dst"),
    ).where(F.col("src") != F.col("dst"))


_COCITE_EDGES_SQL = """
    cnt AS (SELECT count(*) AS c FROM documents),
    e AS (
        SELECT DISTINCT doc_id AS src,
               (doc_id * 5 + 13 * j) % (SELECT c FROM cnt) AS dst
        FROM documents, unnest([1, 2, 3, 4]) AS u(j)
        WHERE (doc_id * 5 + 13 * j) % (SELECT c FROM cnt) <> doc_id)
"""


def _q_cocitation_pairs(spark, sf_dir):
    """Co-citation related-page pairs
    (operators/graph_analytics.py:cocitation): targets linked by ≥2
    common sources, hub sources above out-degree 10 dropped (the wedge
    cap; a no-op on this outdeg-≤4 graph but exercised so the oracle
    replays the capped plan)."""
    from ferenda_spark.operators.graph_analytics import cocitation

    return cocitation(
        _cocite_edges_df(spark, sf_dir), min_count=2, max_out_degree=10
    )


def _q_bibcoupling_pairs(spark, sf_dir):
    """Bibliographic-coupling pairs (sources sharing ≥2 common link
    targets) over the same deterministic graph — the transpose signal."""
    from ferenda_spark.operators.graph_analytics import (
        bibliographic_coupling,
    )

    return bibliographic_coupling(
        _cocite_edges_df(spark, sf_dir), min_count=2, max_in_degree=10
    )


_COCITATION_ORACLE = "WITH " + _COCITE_EDGES_SQL + """,
    keep AS (SELECT src FROM e GROUP BY src HAVING count(*) <= 10),
    ek AS (SELECT e.src, e.dst FROM e JOIN keep USING (src))
    SELECT l.dst AS a, r.dst AS b, count(*) AS n_common
    FROM ek l JOIN ek r USING (src)
    WHERE l.dst < r.dst
    GROUP BY 1, 2
    HAVING count(*) >= 2"""


_BIBCOUPLING_ORACLE = "WITH " + _COCITE_EDGES_SQL + """,
    keep AS (SELECT dst FROM e GROUP BY dst HAVING count(*) <= 10),
    ek AS (SELECT e.src, e.dst FROM e JOIN keep USING (dst))
    SELECT l.src AS a, r.src AS b, count(*) AS n_shared
    FROM ek l JOIN ek r USING (dst)
    WHERE l.src < r.src
    GROUP BY 1, 2
    HAVING count(*) >= 2"""


def _q_community_modularity(spark, sf_dir):
    """Community-quality gauge (operators/graph.py:modularity) over a
    deterministic 40-chain graph: rank-rn doc links to rank-rn+40, so the
    true communities are the 40 residue-class chains. Labels come from
    the REAL connected_components run (so the oracle checks CC's
    canonical-min election AND the modularity decomposition in one
    query). The rank window is query-construction only — the operator
    itself never sorts globally."""
    from pyspark.sql import Window

    from ferenda_spark.operators.graph import connected_components, modularity

    d = _t(spark, sf_dir, "documents").select("doc_id")
    rn = F.row_number().over(Window.orderBy("doc_id")) - 1
    dr = d.select("doc_id", rn.alias("rn"))
    e = (
        dr.alias("l")
        .join(dr.alias("r"), F.col("r.rn") == F.col("l.rn") + 40)
        .select(
            F.col("l.doc_id").alias("src"), F.col("r.doc_id").alias("dst")
        )
    )
    labels = connected_components(e)
    per = modularity(e, labels)
    return per.select(
        "comp", "n_nodes", "m_internal", "deg_total",
        F.round("q_contrib", 6).alias("q_contrib"),
    )


_MODULARITY_ORACLE = """
    WITH d AS (
        SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS rn
        FROM documents),
    e AS (
        SELECT l.doc_id AS src, r.doc_id AS dst
        FROM d l JOIN d r ON r.rn = l.rn + 40),
    lab AS (
        SELECT doc_id AS node,
               min(doc_id) OVER (PARTITION BY rn % 40) AS comp
        FROM d),
    mm AS (SELECT count(*) AS m FROM e),
    deg AS (
        SELECT n, count(*) AS deg
        FROM (SELECT src AS n FROM e UNION ALL SELECT dst FROM e)
        GROUP BY n),
    dm AS (
        SELECT comp, count(*) AS n_nodes,
               sum(coalesce(deg, 0)) AS deg_total
        FROM lab LEFT JOIN deg ON lab.node = deg.n
        GROUP BY comp),
    itn AS (
        SELECT la.comp AS comp, count(*) AS m_internal
        FROM e
        JOIN lab la ON e.src = la.node
        JOIN lab lb ON e.dst = lb.node
        WHERE la.comp = lb.comp
        GROUP BY 1)
    SELECT dm.comp, dm.n_nodes,
           CAST(coalesce(itn.m_internal, 0) AS BIGINT) AS m_internal,
           CAST(dm.deg_total AS BIGINT) AS deg_total,
           CAST(round(CAST(coalesce(itn.m_internal, 0) AS DOUBLE)
                      / (SELECT m FROM mm)
                 - pow(dm.deg_total / (2.0 * (SELECT m FROM mm)), 2),
                 6) AS DOUBLE) AS q_contrib
    FROM dm LEFT JOIN itn ON dm.comp = itn.comp"""


def _q_url_template_mining(spark, sf_dir):
    """Crawl-frontier URL template inventory
    (functions/urls.py:mine_url_templates): synthesize a deterministic
    URL per doc (Zipf-free here — section by doc_id%5, Knuth-hash id,
    every third URL paginated), then mine per-host templates with member
    counts and host share. The oracle replays the same regexp
    abstraction in DuckDB ('g'-flag regexp_replace ≡ Spark's
    replace-all)."""
    from ferenda_spark.functions.urls import mine_url_templates

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    section = F.element_at(
        F.array(*[F.lit(s) for s in ("news", "docs", "legal", "blog", "wiki")]),
        (F.col("doc_id") % 5 + 1).cast("int"),
    )
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/"),
        section, F.lit("/"),
        ((F.col("doc_id") * 2654435761) % 100000).cast("string"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("?page="), (F.col("doc_id") % 7).cast("string")),
        ).otherwise(F.lit("")),
    )
    mined = mine_url_templates(d.select(url.alias("url")), min_urls=2)
    return mined.select(
        "host", "template", "n_urls",
        F.round("host_share", 6).alias("host_share"),
    )


_URL_TEMPLATE_ORACLE = r"""
    WITH u AS (
        SELECT 'https://' || source || '.example.com/' ||
               CASE CAST(doc_id % 5 AS INT)
                   WHEN 0 THEN 'news' WHEN 1 THEN 'docs'
                   WHEN 2 THEN 'legal' WHEN 3 THEN 'blog'
                   ELSE 'wiki' END || '/' ||
               ((doc_id * 2654435761) % 100000) ||
               CASE WHEN doc_id % 3 = 0
                    THEN '?page=' || (doc_id % 7) ELSE '' END AS url,
               source
        FROM documents),
    t AS (
        SELECT lower(source) || '.example.com' AS host,
               regexp_replace(regexp_replace(
                   regexp_replace(regexp_replace(url,
                       '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*', ''),
                       '#.*$', ''),
                   '[0-9a-fA-F]{8,}', '{x}', 'g'),
                   '[0-9]+', '{d}', 'g') AS template
        FROM u),
    per AS (
        SELECT host, template, count(*) AS n_urls
        FROM t GROUP BY 1, 2),
    tot AS (SELECT host, sum(n_urls) AS tot FROM per GROUP BY host)
    SELECT per.host, per.template, per.n_urls,
           CAST(round(CAST(per.n_urls AS DOUBLE) / tot.tot, 6) AS DOUBLE) AS host_share
    FROM per JOIN tot USING (host)
    WHERE per.n_urls >= 2"""


def _q_betweenness_pivots(spark, sf_dir):
    """Pivot-sampled betweenness
    (operators/graph_analytics.py:betweenness_sample) over the 40-chain
    rank graph with seeds = docs with doc_id % 50 == 0, depth cap 6.
    Chains make every shortest path UNIQUE (σ ≡ 1), so Brandes'
    dependency telescopes to "count of nodes strictly beyond v within the
    cap" — a closed form the SQL oracle computes with one positional
    3-way join, while the Spark side runs the REAL forward/backward
    accumulation. Any σ bookkeeping error, off-by-one in the level walk,
    or cap leak breaks the match."""
    from pyspark.sql import Window

    from ferenda_spark.operators.graph_analytics import betweenness_sample

    d = _t(spark, sf_dir, "documents").select("doc_id")
    rn = F.row_number().over(Window.orderBy("doc_id")) - 1
    dr = d.select("doc_id", rn.alias("rn"))
    e = (
        dr.alias("l")
        .join(dr.alias("r"), F.col("r.rn") == F.col("l.rn") + 40)
        .select(
            F.col("l.doc_id").alias("src"), F.col("r.doc_id").alias("dst")
        )
    )
    seeds = d.where(F.col("doc_id") % 50 == 0)
    bt = betweenness_sample(e, seeds, max_depth=6)
    return bt.select("node", F.round("delta_sum", 6).alias("delta_sum"))


_BETWEENNESS_ORACLE = """
    WITH d AS (
        SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS rn
        FROM documents),
    pos AS (SELECT doc_id, rn % 40 AS chain, rn // 40 AS p FROM d),
    seeds AS (SELECT doc_id, chain, p FROM pos WHERE doc_id % 50 = 0),
    reach AS (
        SELECT DISTINCT v.doc_id AS node
        FROM seeds s JOIN pos v ON v.chain = s.chain
        WHERE v.doc_id <> s.doc_id AND abs(v.p - s.p) <= 6),
    dep AS (
        SELECT v.doc_id AS node, count(*) AS cnt
        FROM seeds s
        JOIN pos v ON v.chain = s.chain
        JOIN pos w ON w.chain = s.chain
        WHERE abs(w.p - s.p) <= 6
          AND ((s.p < v.p AND v.p < w.p) OR (s.p > v.p AND v.p > w.p))
        GROUP BY 1)
    SELECT reach.node,
           CAST(round(CAST(coalesce(dep.cnt, 0) AS DOUBLE), 6) AS DOUBLE) AS delta_sum
    FROM reach LEFT JOIN dep ON reach.node = dep.node"""


def _q_host_report(spark, sf_dir):
    """Per-host corpus report card (operators/profiling.py:host_report):
    doc counts, language diversity + mode, exact-duplicate share via md5
    fingerprints, mean heuristic quality — the host-level prior that
    sampling/crawl/trust weights key on."""
    from ferenda_spark.operators.profiling import host_report

    return host_report(_t(spark, sf_dir, "documents"))


_HOST_REPORT_ORACLE = f"""
    WITH per AS (
        SELECT source AS host, lang,
               length(text) AS nchar,
               md5(trim(text)) AS fp,
               list_filter(string_split_regex(trim(text), '\\s+'),
                           t -> t != '') AS toks,
               length(text) - length(regexp_replace(text, '[.,;:!?]', '',
                                                    'g')) AS npunct
        FROM documents),
    scored AS (
        SELECT host, lang, nchar, fp,
               0.3 * (CASE WHEN len(toks) BETWEEN 10 AND 100000
                           THEN 1.0 ELSE 0.0 END)
             + 0.3 * (CASE WHEN len(toks) > 0 AND
                           CAST(list_sum(list_transform(toks,
                                t -> length(t))) AS DOUBLE) / len(toks)
                           BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END)
             + 0.2 * (CASE WHEN nchar > 0 AND
                           CAST(npunct AS DOUBLE) / nchar > 0.0005
                           THEN 1.0 ELSE 0.0 END)
             + 0.2 * (CASE WHEN len(toks) > 0 AND
                           CAST(len(list_filter(toks,
                                t -> list_contains({STOP_SQL}, lower(t))))
                                AS DOUBLE) / len(toks) > 0.02
                           THEN 1.0 ELSE 0.0 END) AS q
        FROM per),
    base AS (
        SELECT host, count(*) AS n_docs,
               CAST(sum(nchar) AS BIGINT) AS total_chars,
               count(DISTINCT lang) AS n_langs,
               count(DISTINCT fp) AS n_distinct_texts,
               avg(q) AS mq
        FROM scored GROUP BY host),
    mode AS (
        SELECT host, lang AS top_lang FROM (
            SELECT host, lang, row_number() OVER (
                PARTITION BY host
                ORDER BY count(*) DESC, lang ASC) AS rn
            FROM scored GROUP BY host, lang)
        WHERE rn = 1)
    SELECT base.host, base.n_docs, base.total_chars,
           CAST(base.n_langs AS BIGINT) AS n_langs, mode.top_lang,
           CAST(base.n_distinct_texts AS BIGINT) AS n_distinct_texts,
           CAST(round(1.0 - CAST(base.n_distinct_texts AS DOUBLE)
                      / base.n_docs, 6) AS DOUBLE) AS exact_dup_share,
           CAST(round(base.mq, 6) AS DOUBLE) AS mean_quality
    FROM base JOIN mode ON base.host = mode.host"""


def _q_label_spreading(spark, sf_dir):
    """Semi-supervised label spreading
    (operators/labelspread.py:spread_labels — the multi-class seed
    expansion for spam/topic host classification): seeds are docs with
    doc_id % 83 == 0 labeled spam/ham by parity, graph is the 7i+11j
    family, 3 fixed rounds at α=0.85. Returns the SPARSE score table
    (not the argmax — near-ties under 1e-6 would make a hard assignment
    engine-dependent); the oracle unrolls the identical update
    (labelspread.spread_unrolled_sql shares the spelling)."""
    from ferenda_spark.operators.labelspread import spread_labels

    d = _t(spark, sf_dir, "documents").select("doc_id")
    c = d.count()
    e = d.select(
        "doc_id",
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("j"),
    ).select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 11 * F.col("j")) % c).alias("dst"),
    )
    seeds = d.where(F.col("doc_id") % 83 == 0).select(
        F.col("doc_id").alias("node"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("spam"))
         .otherwise(F.lit("ham")).alias("label"),
    )
    scores = spread_labels(e, seeds, alpha=0.85, n_iter=3)
    return scores.select(
        "node", "label", F.round("score", 6).alias("score")
    )


def _label_spread_oracle() -> str:
    from ferenda_spark.operators.labelspread import spread_unrolled_sql

    edges = """
        SELECT doc_id AS src,
               (doc_id * 7 + 11 * j) % (SELECT count(*) FROM documents)
                   AS dst
        FROM documents, unnest([1, 2, 3]) AS u(j)"""
    seeds = """
        SELECT doc_id AS node,
               CASE WHEN doc_id % 2 = 0 THEN 'spam' ELSE 'ham' END AS label
        FROM documents WHERE doc_id % 83 = 0"""
    return spread_unrolled_sql(edges, seeds, alpha=0.85, n_iter=3) + """
    SELECT node, label, round(score, 6) AS score FROM f3"""


_LABEL_SPREAD_ORACLE = _label_spread_oracle()


def _dsir_frames(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    target = d.where(F.col("doc_id") % 11 == 0)
    return d, target


def _q_dsir_weights(spark, sf_dir):
    """DSIR importance weights (functions/dsir.py:dsir_log_weights — the
    hashed-n-gram data-selection step of Xie et al. 2023): target = the
    doc_id % 11 == 0 in-domain sample, raw = the whole table, 256 hashed
    unigram buckets with add-one smoothing. The oracle replays the
    bucket hash (md5-hash60 mod 256), both histograms, and the per-doc
    log-ratio sum."""
    from ferenda_spark.functions.dsir import dsir_log_weights

    raw, target = _dsir_frames(spark, sf_dir)
    w = dsir_log_weights(raw, target, n_buckets=256)
    return w.select(
        F.col("id").alias("doc_id"),
        F.round("log_weight", 6).alias("log_weight"),
    )


def _q_dsir_resample(spark, sf_dir):
    """Gumbel top-25 without-replacement resample ∝ w (T=1) from the
    same weights — deterministic hash-uniform race, replayed digit-for-
    digit by the oracle (selection happens on unrounded keys whose
    engine skew is ~1e-15, far below the race's key gaps)."""
    from ferenda_spark.functions.dsir import dsir_log_weights, dsir_resample

    raw, target = _dsir_frames(spark, sf_dir)
    w = dsir_log_weights(raw, target, n_buckets=256)
    top = dsir_resample(w, 25, temperature=1.0, salt="dsir")
    return top.select(
        F.col("id").alias("doc_id"),
        F.round("log_weight", 6).alias("log_weight"),
        F.round("key", 6).alias("key"),
    )


_DSIR_CORE_SQL = r"""
    tokt AS (
        SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                                  t -> t != '')) AS t
        FROM documents WHERE doc_id % 11 = 0),
    tcnt AS (
        SELECT (try_cast('0x' || substr(md5(t), 1, 15) AS BIGINT)) % 256
                   AS bucket,
               count(*) AS tc
        FROM tokt GROUP BY 1),
    tokr AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(trim(text), '\s+'),
                                  t -> t != '')) AS t
        FROM documents),
    pdoc AS (
        SELECT doc_id,
               (try_cast('0x' || substr(md5(t), 1, 15) AS BIGINT)) % 256
                   AS bucket,
               count(*) AS cnt
        FROM tokr GROUP BY 1, 2),
    rcnt AS (SELECT bucket, sum(cnt) AS rc FROM pdoc GROUP BY 1),
    tt AS (SELECT sum(tc) AS v FROM tcnt),
    rt AS (SELECT sum(rc) AS v FROM rcnt),
    ratio AS (
        SELECT r.bucket,
               ln((coalesce(t.tc, 0) + 1.0) / ((SELECT v FROM tt) + 256.0))
             - ln((r.rc + 1.0) / ((SELECT v FROM rt) + 256.0)) AS lr
        FROM rcnt r LEFT JOIN tcnt t ON r.bucket = t.bucket),
    w AS (
        SELECT doc_id, sum(cnt * lr) AS log_weight
        FROM pdoc JOIN ratio USING (bucket) GROUP BY 1)
"""

_DSIR_WEIGHTS_ORACLE = "WITH " + _DSIR_CORE_SQL + """
    SELECT doc_id, round(log_weight, 6) AS log_weight FROM w"""

_DSIR_RESAMPLE_ORACLE = "WITH " + _DSIR_CORE_SQL + f""",
    keyed AS (
        SELECT doc_id, log_weight,
               log_weight - ln(-ln(
                   (try_cast('0x' || substr(md5(doc_id || ':dsir'), 1, 15)
                             AS BIGINT) + 1.0) / {float(1 << 60) + 1.0!r}
               )) AS key
        FROM w)
    SELECT doc_id, round(log_weight, 6) AS log_weight,
           round(key, 6) AS key
    FROM keyed ORDER BY key DESC, doc_id ASC LIMIT 25"""


def _q_ktruss_edges(spark, sf_dir):
    """k-truss dense-subgraph peel (graph_analytics.py:k_truss — the
    strictly-stronger-than-k-core cohesion filter for link-farm
    forensics) at k=4 over the shared md5 hash graph (k=5 is empty here; k=4 peels 1000+ edges down to a 38-edge truss through a multi-round cascade). Peeling is
    monotone with a unique fixed point, so the oracle unrolls 8
    support-count/filter rounds (extra rounds no-op once converged) and
    must land on the identical edge set WITH identical within-truss
    support counts."""
    from ferenda_spark.operators.graph_analytics import k_truss

    return k_truss(_hash_graph(spark, sf_dir, "truss"), k=4)


def _ktruss_oracle(k: int = 4, n_rounds: int = 8) -> str:
    head = f"""
        WITH {_hash_graph_sql('truss')},
        t0 AS (SELECT a, b FROM und WHERE a < b)"""
    steps = []
    for r in range(1, n_rounds + 1):
        steps.append(f"""
        tri{r} AS MATERIALIZED (
            SELECT l.a AS x, l.b AS y, r.b AS z
            FROM t{r - 1} l JOIN t{r - 1} r
              ON l.a = r.a AND l.b < r.b
            WHERE EXISTS (SELECT 1 FROM t{r - 1} m
                          WHERE m.a = l.b AND m.b = r.b))""")
        steps.append(f"""
        t{r} AS MATERIALIZED (
            SELECT t.a, t.b, s.support FROM t{r - 1} t
            JOIN (SELECT a, b, count(*) AS support FROM (
                      SELECT x AS a, y AS b FROM tri{r}
                      UNION ALL SELECT x, z FROM tri{r}
                      UNION ALL SELECT y, z FROM tri{r})
                  GROUP BY 1, 2) s
              ON t.a = s.a AND t.b = s.b
            WHERE s.support >= {k - 2})""")
    return head + "," + ",".join(steps) + f"""
        SELECT a, b, support FROM t{n_rounds}"""


def _q_pagerank_warm(spark, sf_dir):
    """Incremental PageRank (operators/graph.py:pagerank init_ranks —
    the nightly-crawl-delta re-rank): cold 3-iteration ranks on the
    7i+11j graph become the warm-start vector for 3 iterations on the
    graph plus a delta arm (doc_id % 10 == 0 gains a 4th out-edge). The
    oracle unrolls BOTH phases — cold rounds, the renormalization, and
    the warm rounds over the delta graph — so a drift in either the
    warm-start plumbing or the delta edge handling breaks the match."""
    from ferenda_spark.operators.graph import pagerank

    d = _t(spark, sf_dir, "documents").select("doc_id")
    c = d.count()
    e1 = d.select(
        "doc_id",
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("j"),
    ).select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 11 * F.col("j")) % c).alias("dst"),
    )
    delta = d.where(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 44) % c).alias("dst"),
    )
    old = pagerank(e1, n_iter=3)
    warm = pagerank(e1.unionByName(delta), n_iter=3, init_ranks=old)
    return warm.select(
        F.col("node").alias("doc_id"), F.round("rank", 6).alias("rank")
    )


def _pagerank_warm_oracle(damping: float = 0.85) -> str:
    def unroll(prefix: str, e: str, deg: str, r0: str, n_iter: int) -> str:
        steps = []
        for k in range(1, n_iter + 1):
            prev = r0 if k == 1 else f"{prefix}{k - 1}"
            steps.append(f"""
        {prefix}{k} AS (
            SELECT nd.node,
                   (1.0 - {damping}) / (SELECT n FROM nn)
                   + {damping} * COALESCE(m.mass, 0.0) AS rank
            FROM nodes nd LEFT JOIN (
                SELECT e.dst AS node, sum(r.rank / d.deg) AS mass
                FROM {e} e JOIN {deg} d USING (src)
                JOIN {prev} r ON r.node = e.src
                GROUP BY e.dst
            ) m ON m.node = nd.node)""")
        return ",".join(steps)

    head = """
        WITH cnt AS (SELECT count(*) AS c FROM documents),
        e1 AS (
            SELECT DISTINCT doc_id AS src,
                   (doc_id * 7 + 11 * j) % (SELECT c FROM cnt) AS dst
            FROM documents, unnest([1, 2, 3]) AS u(j)
            WHERE (doc_id * 7 + 11 * j) % (SELECT c FROM cnt) <> doc_id),
        e2 AS (
            SELECT src, dst FROM e1
            UNION
            SELECT doc_id, (doc_id * 7 + 44) % (SELECT c FROM cnt)
            FROM documents
            WHERE doc_id % 10 = 0
              AND (doc_id * 7 + 44) % (SELECT c FROM cnt) <> doc_id),
        nodes AS (
            SELECT DISTINCT src AS node FROM e2
            UNION SELECT DISTINCT dst FROM e2),
        nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        deg1 AS (SELECT src, count(*) AS deg FROM e1 GROUP BY src),
        deg2 AS (SELECT src, count(*) AS deg FROM e2 GROUP BY src),
        c0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes)"""
    cold = unroll("c", "e1", "deg1", "c0", 3)
    norm = """
        s AS (SELECT sum(rank) AS t FROM c3),
        w0 AS (SELECT node, rank / (SELECT t FROM s) AS rank FROM c3)"""
    warmed = unroll("w", "e2", "deg2", "w0", 3)
    return (head + "," + cold + "," + norm + "," + warmed + """
        SELECT node AS doc_id, round(rank, 6) AS rank FROM w3""")


def _q_interval_coalesce(spark, sf_dir):
    """Attestation-window union (operators/temporal.py:
    coalesce_intervals — merge overlapping validity intervals from
    independent sources into disjoint canonical spans): deterministic
    integer intervals derived from doc_id, merged per (subj, pred,
    value). The oracle replays the identical running-max/running-sum
    gaps-and-islands windows."""
    from ferenda_spark.operators.temporal import coalesce_intervals

    d = _t(spark, sf_dir, "documents").select("doc_id")
    start = (F.col("doc_id") * 37) % 400
    iv = d.select(
        F.concat(F.lit("e"), (F.col("doc_id") % 25).cast("string"))
        .alias("subj"),
        F.lit("p").alias("pred"),
        F.concat(F.lit("v"), (F.col("doc_id") % 2).cast("string"))
        .alias("value"),
        start.alias("valid_from"),
        (start + 20 + F.col("doc_id") % 30).alias("valid_to"),
    )
    return coalesce_intervals(iv)


_INTERVAL_COALESCE_ORACLE = """
    WITH iv AS (
        SELECT 'e' || (doc_id % 25) AS subj, 'p' AS pred,
               'v' || (doc_id % 2) AS value,
               (doc_id * 37) % 400 AS valid_from,
               (doc_id * 37) % 400 + 20 + doc_id % 30 AS valid_to
        FROM documents),
    m AS (
        SELECT *, max(valid_to) OVER (
            PARTITION BY subj, pred, value
            ORDER BY valid_from, valid_to
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        FROM iv),
    b AS (
        SELECT *, CASE WHEN pm IS NULL OR valid_from > pm
                       THEN 1 ELSE 0 END AS brk
        FROM m),
    i AS (
        SELECT *, sum(brk) OVER (
            PARTITION BY subj, pred, value
            ORDER BY valid_from, valid_to
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
        FROM b)
    SELECT subj, pred, value,
           min(valid_from) AS valid_from, max(valid_to) AS valid_to,
           count(*) AS n_merged
    FROM i GROUP BY subj, pred, value, isl"""



def _q_vocab_alignment(spark, sf_dir):
    """Vocabulary alignment (operators/alignment.py:align_vocabularies —
    the schema.org-vs-house-vocab matching pass of a multi-publisher
    harvest): two deterministic vocabularies built from the shared WORD
    wheel (left camelCase, right snake_case with permuted token order),
    matched by token-Jaccard over inverted-index blocking. The oracle
    replays localname split, camel-boundary regexp, blocking df-cap,
    Jaccard, and the argmax/tiebreak."""
    from ferenda_spark.operators.alignment import align_vocabularies

    words = ["query", "scan", "filter", "merge", "batch", "stream",
             "window", "column"]
    warr = F.array(*[F.lit(w) for w in words])
    d = _t(spark, sf_dir, "documents").select("doc_id").where(
        F.col("doc_id") < 40)
    w1 = F.element_at(warr, (F.col("doc_id") % 8 + 1).cast("int"))
    w2 = F.element_at(warr, ((F.col("doc_id") * 3) % 8 + 1).cast("int"))
    left = d.select(
        F.concat(
            F.lit("https://a.example/"), w1,
            F.concat(F.upper(F.substring(w2, 1, 1)), F.substring(w2, 2, 99)),
        ).alias("iri"))
    w3 = F.element_at(warr, ((F.col("doc_id") * 3) % 8 + 1).cast("int"))
    w4 = F.element_at(warr, ((F.col("doc_id") * 5) % 8 + 1).cast("int"))
    right = d.select(
        F.concat(F.lit("https://b.example/v#"), w3, F.lit("_"), w4)
        .alias("iri"))
    out = align_vocabularies(left, right, min_score=0.3)
    return out.select(
        "left_iri", "right_iri", "n_shared", "n_left", "n_right",
        F.round("score", 6).alias("score"))


def _q_graph_summary_stats(spark, sf_dir):
    """Whole-graph structural profile (operators/profiling.py:
    graph_summary) of the 7i+11j family PLUS deliberate self-loops and
    reciprocal pairs (doc_id % 9 == 0 adds the reverse edge), so every
    gauge — reciprocity, out-degree Gini with analytic mid-ranks,
    dangling share — exercises a non-trivial value the SQL replays."""
    from ferenda_spark.operators.profiling import graph_summary

    d = _t(spark, sf_dir, "documents").select("doc_id")
    c = d.count()
    base = d.select(
        "doc_id",
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("j"),
    ).select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 11 * F.col("j")) % c).alias("dst"),
    )
    recip = base.where(F.col("src") % 9 == 0).select(
        F.col("dst").alias("src"), F.col("src").alias("dst"))
    loops = d.where(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("src"), F.col("doc_id").alias("dst"))
    g = graph_summary(base.unionByName(recip).unionByName(loops))
    return g.select(
        "n_nodes", "n_edges", "n_self_loops",
        F.round("reciprocity", 6).alias("reciprocity"),
        F.round("out_gini", 6).alias("out_gini"),
        F.round("max_out_share", 6).alias("max_out_share"),
        F.round("dangling_share", 6).alias("dangling_share"))


_VOCAB_ALIGNMENT_ORACLE = r"""
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 40),
    words(i, w) AS (VALUES (0, 'query'), (1, 'scan'), (2, 'filter'),
                           (3, 'merge'), (4, 'batch'), (5, 'stream'),
                           (6, 'window'), (7, 'column')),
    lterm AS (
        SELECT DISTINCT 'https://a.example/' || w1.w ||
               upper(substr(w2.w, 1, 1)) || substr(w2.w, 2) AS iri
        FROM d
        JOIN words w1 ON w1.i = doc_id % 8
        JOIN words w2 ON w2.i = (doc_id * 3) % 8),
    rterm AS (
        SELECT DISTINCT 'https://b.example/v#' || w3.w || '_' || w4.w AS iri
        FROM d
        JOIN words w3 ON w3.i = (doc_id * 3) % 8
        JOIN words w4 ON w4.i = (doc_id * 5) % 8),
    ltok0 AS (
        SELECT DISTINCT iri AS left_iri, tok FROM (
            SELECT iri, unnest(list_filter(string_split_regex(
                lower(regexp_replace(
                    list_extract(string_split_regex(iri, '[#/]'),
                        len(string_split_regex(iri, '[#/]'))),
                    '([a-z0-9])([A-Z])', '\1 \2', 'g')),
                '[^a-z0-9]+'), t -> t != '')) AS tok
            FROM lterm)),
    rtok0 AS (
        SELECT DISTINCT iri AS right_iri, tok FROM (
            SELECT iri, unnest(list_filter(string_split_regex(
                lower(regexp_replace(
                    list_extract(string_split_regex(iri, '[#/]'),
                        len(string_split_regex(iri, '[#/]'))),
                    '([a-z0-9])([A-Z])', '\1 \2', 'g')),
                '[^a-z0-9]+'), t -> t != '')) AS tok
            FROM rterm)),
    lsize AS (SELECT left_iri, count(*) AS n_left FROM ltok0 GROUP BY 1),
    rsize AS (SELECT right_iri, count(*) AS n_right FROM rtok0 GROUP BY 1),
    ltok AS (
        SELECT l.* FROM ltok0 l JOIN (
            SELECT tok FROM ltok0 GROUP BY tok HAVING count(*) <= 100) c
        USING (tok)),
    rtok AS (
        SELECT r.* FROM rtok0 r JOIN (
            SELECT tok FROM rtok0 GROUP BY tok HAVING count(*) <= 100) c
        USING (tok)),
    shared AS (
        SELECT left_iri, right_iri, count(*) AS n_shared
        FROM ltok JOIN rtok USING (tok) GROUP BY 1, 2),
    scored AS (
        SELECT s.left_iri, s.right_iri, s.n_shared, l.n_left, r.n_right,
               CAST(s.n_shared AS DOUBLE)
                   / (l.n_left + r.n_right - s.n_shared) AS score
        FROM shared s JOIN lsize l USING (left_iri)
        JOIN rsize r USING (right_iri)
        WHERE CAST(s.n_shared AS DOUBLE)
                  / (l.n_left + r.n_right - s.n_shared) >= 0.3),
    best AS (
        SELECT *, row_number() OVER (
            PARTITION BY left_iri ORDER BY score DESC, right_iri ASC) AS rn
        FROM scored)
    SELECT left_iri, right_iri, n_shared, n_left, n_right,
           CAST(round(score, 6) AS DOUBLE) AS score
    FROM best WHERE rn = 1"""


_GRAPH_SUMMARY_ORACLE = r"""
    WITH cnt AS (SELECT count(*) AS c FROM documents),
    base AS (
        SELECT doc_id AS src,
               (doc_id * 7 + 11 * j) % (SELECT c FROM cnt) AS dst
        FROM documents, unnest([1, 2, 3]) AS u(j)),
    e AS (
        SELECT DISTINCT src, dst FROM (
            SELECT src, dst FROM base
            UNION ALL
            SELECT dst, src FROM base WHERE src % 9 = 0
            UNION ALL
            SELECT doc_id, doc_id FROM documents WHERE doc_id % 50 = 0)),
    loops AS (SELECT count(*) AS n_self FROM e WHERE src = dst),
    clean AS (SELECT src, dst FROM e WHERE src <> dst),
    nodes AS (SELECT DISTINCT src AS n FROM clean
              UNION SELECT DISTINCT dst FROM clean),
    recip AS (
        SELECT count(*) AS n_recip FROM clean c
        WHERE EXISTS (SELECT 1 FROM clean r
                      WHERE r.src = c.dst AND r.dst = c.src)),
    outdeg AS (SELECT src, count(*) AS deg FROM clean GROUP BY src),
    ddist AS (
        SELECT deg, count(*) AS cnt FROM (
            SELECT coalesce(o.deg, 0) AS deg
            FROM nodes LEFT JOIN outdeg o ON nodes.n = o.src)
        GROUP BY deg),
    ranked AS (
        SELECT deg, cnt,
               coalesce(sum(cnt) OVER (ORDER BY deg
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + (cnt + 1) / 2.0 AS midrank
        FROM ddist),
    tot AS (
        SELECT sum(cnt) AS n, sum(deg * cnt) AS sdeg,
               sum(deg * cnt * 2.0 * midrank) AS wsum
        FROM ranked),
    scal AS (
        SELECT (SELECT count(*) FROM clean) AS n_edges,
               (SELECT n_self FROM loops) AS n_self_loops,
               (SELECT n_recip FROM recip) AS n_recip,
               (SELECT max(deg) FROM outdeg) AS max_out,
               (SELECT count(*) FROM outdeg) AS n_sources,
               (SELECT n FROM tot) AS n,
               (SELECT sdeg FROM tot) AS sdeg,
               (SELECT wsum FROM tot) AS wsum)
    SELECT CAST(n AS BIGINT) AS n_nodes, n_edges, n_self_loops,
           CAST(round(CAST(n_recip AS DOUBLE) / n_edges, 6) AS DOUBLE)
               AS reciprocity,
           CAST(round((wsum - (n + 1) * sdeg) / (n * CAST(sdeg AS DOUBLE)),
                      6) AS DOUBLE) AS out_gini,
           CAST(round(CAST(max_out AS DOUBLE) / n_edges, 6) AS DOUBLE)
               AS max_out_share,
           CAST(round(CAST(n - n_sources AS DOUBLE) / n, 6) AS DOUBLE)
               AS dangling_share
    FROM scal"""


def _q_fusion_fold_state(spark, sf_dir):
    """Incremental fusion (operators/fusion.py:fold_claims — fold crawl
    deltas into persistent trust/fact state, history never rescanned):
    the claims family split into two batches by doc parity, folded in
    sequence; returns the final fact_state. Batch-2 beliefs use the
    trust LEARNED from batch 1 (sources shared across batches), so the
    oracle — which unrolls both folds in SQL — breaks if the trust
    carry-over, the full_outer fact merge, or the unseen-source default
    drifts."""
    from ferenda_spark.functions.sketches import hash60
    from ferenda_spark.operators.fusion import fold_claims

    claims = _fusion_claims_df(spark, sf_dir)
    split = hash60(F.concat_ws("|", "source", "subj", "pred", "obj")) % 2
    b1 = claims.where(split == 0)
    b2 = claims.where(split == 1)
    ts, fs, _ = fold_claims(b1)
    _, fs2, _ = fold_claims(b2, ts, fs)
    return fs2.select(
        "subj", "pred", "obj",
        F.round("belief", 6).alias("belief"),
        "n_sources",
    )


def _fusion_fold_oracle() -> str:
    return f"""
    WITH claims_all AS ({_FUSION_CLAIMS_SQL}),
    b1 AS (
        SELECT DISTINCT source, subj, pred, obj FROM claims_all
        WHERE try_cast('0x' || substr(md5(source || '|' || subj || '|' || pred
              || '|' || obj), 1, 15) AS BIGINT) % 2 = 0),
    b2 AS (
        SELECT DISTINCT source, subj, pred, obj FROM claims_all
        WHERE try_cast('0x' || substr(md5(source || '|' || subj || '|' || pred
              || '|' || obj), 1, 15) AS BIGINT) % 2 = 1),
    fact1 AS (
        SELECT subj, pred, obj,
               CAST(count(*) AS DOUBLE) AS belief,
               count(*) AS n_sources
        FROM b1 GROUP BY 1, 2, 3),
    norm1 AS (
        SELECT subj, pred, sum(belief) AS total
        FROM fact1 GROUP BY 1, 2),
    conf1 AS (
        SELECT f.subj, f.pred, f.obj, f.belief / n.total AS confidence
        FROM fact1 f JOIN norm1 n USING (subj, pred)),
    trust1 AS (
        SELECT b.source, count(*) AS n_claims,
               sum(c.confidence) AS sum_conf
        FROM b1 b JOIN conf1 c USING (subj, pred, obj)
        GROUP BY b.source),
    bt2 AS (
        SELECT b.subj, b.pred, b.obj,
               coalesce(t.sum_conf / t.n_claims, 1.0) AS trust
        FROM b2 b LEFT JOIN trust1 t USING (source)),
    delta2 AS (
        SELECT subj, pred, obj, sum(trust) AS d_belief,
               count(*) AS d_sources
        FROM bt2 GROUP BY 1, 2, 3)
    SELECT coalesce(f.subj, d.subj) AS subj,
           coalesce(f.pred, d.pred) AS pred,
           coalesce(f.obj, d.obj) AS obj,
           CAST(round(coalesce(f.belief, 0.0) + coalesce(d.d_belief, 0.0),
                      6) AS DOUBLE) AS belief,
           coalesce(f.n_sources, 0) + coalesce(d.d_sources, 0)
               AS n_sources
    FROM fact1 f FULL OUTER JOIN delta2 d
      ON f.subj = d.subj AND f.pred = d.pred AND f.obj = d.obj"""


def _q_streaming_fusion(spark, sf_dir):
    """Streaming fusion-state maintenance
    (streaming/fusion.py:run_stream_to_fusion): the SAME two md5-parity
    claim batches as fusion_fold_state, but drained through
    Trigger.AvailableNow foreachBatch folds into the snapshot-backed
    state (replay-guarded, exactly-once). Returns the facts table from
    the final snapshot — the oracle is fusion_fold_state's two-fold SQL
    verbatim, so the streaming plumbing (snapshot round-trips, batch
    ordering, upsert wiring) gets the same value-hash check as the
    direct fold."""
    import hashlib as _hashlib
    import os as _os
    import shutil as _shutil

    from ferenda_spark.functions.sketches import hash60
    from ferenda_spark.streaming.fusion import (
        read_fusion_state,
        run_stream_to_fusion,
    )

    claims = _fusion_claims_df(spark, sf_dir)
    split = hash60(F.concat_ws("|", "source", "subj", "pred", "obj")) % 2
    b1, b2 = claims.where(split == 0), claims.where(split == 1)

    _dirtag = _hashlib.sha256(
        _os.path.abspath(sf_dir.rstrip("/")).encode()).hexdigest()[:16]
    base = f"/tmp/ferenda_spark_streamfuse_q_{_dirtag}"
    _shutil.rmtree(base, ignore_errors=True)
    src_dir, root, ckpt = f"{base}/src", f"{base}/state", f"{base}/ckpt"
    schema = "source string, subj string, pred string, obj string"

    b1.write.mode("append").parquet(src_dir)
    run_stream_to_fusion(
        spark.readStream.schema(schema).parquet(src_dir), root, ckpt)
    b2.write.mode("append").parquet(src_dir)
    run_stream_to_fusion(
        spark.readStream.schema(schema).parquet(src_dir), root, ckpt)
    _, facts, _ = read_fusion_state(spark, root)
    return facts.select(
        "subj", "pred", "obj",
        F.round("belief", 6).alias("belief"), "n_sources",
    )


def _q_entity_disambiguation(spark, sf_dir):
    """Context NED scoring (operators/disambig.py:disambiguate — the
    stage between alias blocking and linking that breaks homonym ties):
    entity profiles are docs 0-19's text, mentions are docs 100-199's
    text, each mention carries three arithmetic candidates. The oracle
    replays the whole tf-idf cosine — profile tf, smoothed idf, both L2
    norms, the argmax and the top-2 margin."""
    from ferenda_spark.operators.disambig import disambiguate

    d = _t(spark, sf_dir, "documents")
    profiles = d.where(F.col("doc_id") < 20).select(
        F.concat(F.lit("E"), F.col("doc_id").cast("string")).alias("entity"),
        F.col("text").alias("profile"),
    )
    ment = d.where((F.col("doc_id") >= 100) & (F.col("doc_id") < 200))
    mentions = ment.select(
        F.col("doc_id").alias("mention_id"), F.col("text").alias("context")
    )
    cands = None
    for mult in (1, 7, 13):
        c = ment.select(
            F.col("doc_id").alias("mention_id"),
            F.concat(F.lit("E"),
                     ((F.col("doc_id") * mult) % 20).cast("string"))
            .alias("entity"),
        )
        cands = c if cands is None else cands.unionByName(c)
    out = disambiguate(mentions, cands, profiles)
    return out.select(
        "mention_id", "entity",
        F.round("score", 6).alias("score"),
        F.round("margin", 6).alias("margin"),
        "n_candidates",
    )


_DISAMBIG_ORACLE = r"""
    WITH prof AS (
        SELECT 'E' || doc_id AS entity, text FROM documents
        WHERE doc_id < 20),
    ment AS (
        SELECT doc_id AS mention_id, text FROM documents
        WHERE doc_id >= 100 AND doc_id < 200),
    cand AS (
        SELECT DISTINCT mention_id, 'E' || ((mention_id * m) % 20) AS entity
        FROM ment, unnest([1, 7, 13]) AS u(m)),
    ptok AS (
        SELECT entity, unnest(list_filter(
            string_split_regex(trim(lower(text)), '\s+'),
            t -> t != '')) AS tok
        FROM prof),
    tf AS (SELECT entity, tok, count(*) AS tf FROM ptok GROUP BY 1, 2),
    nent AS (SELECT count(DISTINCT entity) AS n FROM prof),
    dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
    idf AS (
        SELECT tok,
               ln(((SELECT n FROM nent) + 1.0) / (df + 1.0)) + 1.0 AS idf
        FROM dfq),
    w AS (SELECT entity, tok, tf * idf AS w FROM tf JOIN idf USING (tok)),
    pnorm AS (SELECT entity, sqrt(sum(w * w)) AS norm FROM w GROUP BY 1),
    ctok AS (
        SELECT mention_id, unnest(list_filter(
            string_split_regex(trim(lower(text)), '\s+'),
            t -> t != '')) AS tok
        FROM ment),
    ctf AS (SELECT mention_id, tok, count(*) AS ctf FROM ctok GROUP BY 1, 2),
    cw AS (SELECT mention_id, tok, ctf * idf AS cw
           FROM ctf JOIN idf USING (tok)),
    cnorm AS (SELECT mention_id, sqrt(sum(cw * cw)) AS cnorm
              FROM cw GROUP BY 1),
    pairs AS (
        SELECT c.mention_id, c.entity, sum(cw.cw * w.w) AS dot
        FROM cand c
        JOIN cw ON cw.mention_id = c.mention_id
        JOIN w ON w.entity = c.entity AND w.tok = cw.tok
        GROUP BY 1, 2),
    scored AS (
        SELECT c.mention_id, c.entity,
               CASE WHEN p.dot IS NOT NULL AND cn.cnorm > 0 AND pn.norm > 0
                    THEN p.dot / (cn.cnorm * pn.norm)
                    ELSE 0.0 END AS score
        FROM cand c
        LEFT JOIN pairs p
          ON p.mention_id = c.mention_id AND p.entity = c.entity
        LEFT JOIN cnorm cn ON cn.mention_id = c.mention_id
        LEFT JOIN pnorm pn ON pn.entity = c.entity),
    best AS (
        SELECT mention_id, entity, score, n_candidates FROM (
            SELECT *, row_number() OVER (
                PARTITION BY mention_id
                ORDER BY score DESC, entity ASC) AS rn,
                count(*) OVER (PARTITION BY mention_id) AS n_candidates
            FROM scored)
        WHERE rn = 1),
    sec AS (
        SELECT s.mention_id, max(s.score) AS second
        FROM scored s JOIN best b
          ON b.mention_id = s.mention_id AND s.entity <> b.entity
        GROUP BY 1)
    SELECT b.mention_id, b.entity,
           CAST(round(b.score, 6) AS DOUBLE) AS score,
           CAST(round(b.score - coalesce(sec.second, b.score), 6)
                AS DOUBLE) AS margin,
           CAST(b.n_candidates AS BIGINT) AS n_candidates
    FROM best b LEFT JOIN sec USING (mention_id)"""


def _q_dedup_cluster_audit(spark, sf_dir):
    """Near-dup cluster-quality audit (operators/dedup.py:audit_clusters
    — exact shingle Jaccard over capped intra-cluster pairs, the
    false-merge detector for the blocking family): synthetic clusters
    comp = doc_id % 60, 5 audited members each. The oracle recomputes
    exact Jaccard over shingle STRINGS (64-bit fingerprint injectivity,
    same argument as shingle_fingerprint_stats), so a drift in the
    member cap, the pair enumeration, or the set arithmetic breaks it."""
    from ferenda_spark.operators.dedup import audit_clusters

    d = _t(spark, sf_dir, "documents")
    comps = d.select(
        F.col("doc_id").alias("node"),
        (F.col("doc_id") % 60).alias("comp"),
    )
    out = audit_clusters(comps, d, max_members=5)
    return out.select(
        "comp", "n_members", "n_pairs",
        F.round("mean_jaccard", 6).alias("mean_jaccard"),
        F.round("min_jaccard", 6).alias("min_jaccard"),
    )


_DEDUP_AUDIT_ORACLE = r"""
    WITH t AS (
        SELECT doc_id, doc_id % 60 AS comp,
               list_filter(string_split_regex(trim(text), '\s+'),
                           x -> x != '') AS toks
        FROM documents),
    g AS (
        SELECT doc_id, comp,
               CASE
                 WHEN len(toks) >= 3 THEN list_distinct(
                      list_transform(generate_series(1, len(toks) - 2),
                          i -> concat_ws(' ', toks[i], toks[i+1],
                                         toks[i+2])))
                 WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
                 ELSE [] END AS sh
        FROM t),
    sizes AS (SELECT comp, count(*) AS n_members FROM g GROUP BY comp),
    capped AS (
        SELECT * FROM (
            SELECT doc_id, comp, sh, row_number() OVER (
                PARTITION BY comp ORDER BY doc_id) AS rn
            FROM g)
        WHERE rn <= 5),
    pairs AS (
        SELECT l.comp,
               len(list_intersect(l.sh, r.sh)) AS inter,
               len(l.sh) + len(r.sh)
                   - len(list_intersect(l.sh, r.sh)) AS un
        FROM capped l JOIN capped r
          ON l.comp = r.comp AND l.rn < r.rn),
    scored AS (
        SELECT comp,
               CASE WHEN un > 0 THEN CAST(inter AS DOUBLE) / un
                    ELSE 1.0 END AS j
        FROM pairs),
    agg AS (
        SELECT comp, count(*) AS n_pairs, avg(j) AS mj, min(j) AS mnj
        FROM scored GROUP BY comp)
    SELECT agg.comp, sizes.n_members, agg.n_pairs,
           CAST(round(agg.mj, 6) AS DOUBLE) AS mean_jaccard,
           CAST(round(agg.mnj, 6) AS DOUBLE) AS min_jaccard
    FROM agg JOIN sizes ON agg.comp = sizes.comp"""


def _q_feature_propagation(spark, sf_dir):
    """k-hop feature smoothing
    (operators/graph_analytics.py:propagate_features — the SGC primitive
    that densifies sparse per-host signals over the link graph): the
    7i+11j family, every third doc seeded with value (doc_id % 13), two
    hops, self-inclusive. The oracle unrolls both hops (symmetrized
    edges + featured self-loops + per-hop mean)."""
    from ferenda_spark.operators.graph_analytics import propagate_features

    d = _t(spark, sf_dir, "documents").select("doc_id")
    c = d.count()
    e = d.select(
        "doc_id",
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("j"),
    ).select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 11 * F.col("j")) % c).alias("dst"),
    )
    feats = d.where(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").alias("node"),
        (F.col("doc_id") % 13).cast("double").alias("value"),
    )
    out = propagate_features(e, feats, hops=2)
    return out.select("node", F.round("value", 6).alias("value"))


_FEATURE_PROP_ORACLE = """
    WITH cnt AS (SELECT count(*) AS c FROM documents),
    e0 AS (
        SELECT doc_id AS src,
               (doc_id * 7 + 11 * j) % (SELECT c FROM cnt) AS dst
        FROM documents, unnest([1, 2, 3]) AS u(j)
        WHERE (doc_id * 7 + 11 * j) % (SELECT c FROM cnt) <> doc_id),
    f0 AS (
        SELECT doc_id AS node, CAST(doc_id % 13 AS DOUBLE) AS value
        FROM documents WHERE doc_id % 3 = 0),
    es AS (
        SELECT DISTINCT a, b FROM (
            SELECT src AS a, dst AS b FROM e0
            UNION ALL SELECT dst, src FROM e0
            UNION ALL SELECT node, node FROM f0)),
    h1 AS (
        SELECT es.b AS node, avg(f.value) AS value
        FROM es JOIN f0 f ON f.node = es.a GROUP BY 1),
    h2 AS (
        SELECT es.b AS node, avg(f.value) AS value
        FROM es JOIN h1 f ON f.node = es.a GROUP BY 1)
    SELECT node, CAST(round(value, 6) AS DOUBLE) AS value FROM h2"""


def _q_crawl_budget(spark, sf_dir):
    """Crawl budget allocation (operators/scheduler.py:
    allocate_crawl_budget — the capstone composition: link-graph rank ×
    content quality → per-host budget): host rank is the 7i+11j
    pagerank rolled up doc→source (doc ranks rounded to the shared
    6-decimal grain BEFORE the rollup so both engines sum identical
    quantities), host quality is host_report's mean_quality; 1M-fetch
    budget, 10% head cap. The oracle composes the unrolled pagerank
    chain and the host-report SQL."""
    from ferenda_spark.operators.graph import pagerank
    from ferenda_spark.operators.profiling import host_report
    from ferenda_spark.operators.scheduler import allocate_crawl_budget

    d = _t(spark, sf_dir, "documents")
    c = d.count()
    e = d.select(
        "doc_id",
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("j"),
    ).select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 7 + 11 * F.col("j")) % c).alias("dst"),
    )
    pr = pagerank(e, n_iter=6).select(
        "node", F.round("rank", 6).alias("rank")
    )
    host_rank = (
        d.select("doc_id", "source")
        .join(pr, d["doc_id"] == pr["node"])
        .groupBy("source")
        .agg(F.sum("rank").alias("rank"))
        .withColumnRenamed("source", "host")
    )
    hq = host_report(d).select("host", "mean_quality")
    out = allocate_crawl_budget(
        host_rank, hq, total_budget=1_000_000, max_share=0.10
    )
    return out.select(
        "host", F.round("score", 6).alias("score"),
        F.round("share", 6).alias("share"), "budget",
    )


def _crawl_budget_oracle() -> str:
    pr_sql = _pagerank_oracle(n_iter=6)
    return f"""
    WITH pr AS (SELECT * FROM ({pr_sql}) q),
    hr AS (SELECT doc_id AS d_id, source FROM documents),
    host_rank AS (
        SELECT source AS host, sum(rank) AS rank
        FROM hr JOIN pr ON pr.doc_id = hr.d_id
        GROUP BY source),
    hq AS (SELECT host, mean_quality FROM ({_HOST_REPORT_ORACLE}) h),
    j AS (
        SELECT host_rank.host,
               greatest(0.0, host_rank.rank * hq.mean_quality) AS score
        FROM host_rank JOIN hq USING (host)),
    tot AS (SELECT sum(score) AS t FROM j),
    sh AS (
        SELECT host, score,
               CASE WHEN (SELECT t FROM tot) > 0
                    THEN round(least(score / (SELECT t FROM tot), 0.10), 6)
                    ELSE 0.0 END AS share
        FROM j)
    SELECT host, CAST(round(score, 6) AS DOUBLE) AS score,
           CAST(round(share, 6) AS DOUBLE) AS share,
           CAST(floor(share * 1000000) AS BIGINT) AS budget
    FROM sh"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "toc_rollup_docs": _q_toc_rollup_docs,
        "feed_topk_events": _q_feed_topk_events,
        "feed_main_topk": _q_feed_main_topk,
        "deps_join_agg": _q_deps_join_agg,
        "skeleton_anti": _q_skeleton_anti,
        "precedence_latest": _q_precedence_latest,
        "keyword_counts": _q_keyword_counts,
        "annotations_agg": _q_annotations_agg,
        "exists_semijoin": _q_exists_semijoin,
        "priority_pivot": _q_priority_pivot,
        "acctbal_percentiles": _q_acctbal_percentiles,
        "union_nations": _q_union_nations,
        "except_nations": _q_except_nations,
        "scalar_surface": _q_scalar_surface,
        "tpch_q1ish": _q_tpch_q1ish,
        "tpch_q3ish": _q_tpch_q3ish,
        "filter_pushdown_part": _q_filter_pushdown_part,
        "events_hourly": _q_events_hourly,
        "region_nation_leftjoin": _q_region_nation_leftjoin,
        "rollup_customer_geo": _q_rollup_customer_geo,
        "events_running_total": _q_events_running_total,
        "events_lag_delta": _q_events_lag_delta,
        "natural_sort_priorities": _q_natural_sort_priorities,
        "toc_page_lists": _q_toc_page_lists,
        "orders_monthly": _q_orders_monthly,
        "doc_point_lookup": _q_doc_point_lookup,
        "dedup_exact_stats": _q_dedup_exact_stats,
        "url_canonical_dedup": _q_url_canonical_dedup,
        "line_dedup_docs": _q_line_dedup_docs,
        "span_dedup_docs": _q_span_dedup_docs,
        "span_dedup_stride1": _q_span_dedup_stride1,
        "span_dedup_winnow": _q_span_dedup_winnow,
        "dedup_jaccard_pairs": _q_dedup_jaccard_pairs,
        "dedup_components": _q_dedup_components,
        "corpus_hash_split": _q_corpus_hash_split,
        "dedup_embedding_exact": _q_dedup_embedding_exact,
        "shingle_fingerprint_stats": _q_shingle_fingerprint_stats,
        "embedding_topk": _q_embedding_topk,
        "text_quality": _q_text_quality,
        "lang_id_counts": _q_lang_id_counts,
        "token_count_bpe": _q_token_count_bpe,
        "sparql_docs": _q_sparql_docs,
        "sparql_optional": _q_sparql_optional,
        "sparql_groupby": _q_sparql_groupby,
        "sparql_union_values": _q_sparql_union_values,
        "sparql_triple_count": _q_sparql_triple_count,
        "sparql_path_closure": _q_sparql_path_closure,
        "sparql_bind_if": _q_sparql_bind_if,
        "sparql_ask": _q_sparql_ask,
        "sparql_describe": _q_sparql_describe,
        "sparql_subquery": _q_sparql_subquery,
        "sparql_path_star": _q_sparql_path_star,
        "sparql_nps": _q_sparql_nps,
        "sparql_construct_graph": _q_sparql_construct,
        "pii_redact": _q_pii_redact,
        "chunk_dedup_stats": _q_chunk_dedup,
        "dup_chunk_topk": _q_dup_chunk_topk,
        "chunk_dedup_clean": _q_chunk_dedup_clean,
        "url_normalize_stats": _q_url_normalize,
        "incremental_toc_counts": _q_incremental_toc,
        "fulltext_search": _q_fulltext_search,
        "fulltext_facets": _q_fulltext_facets,
        "atom_feeds": _q_atom_feeds,
        "warc_ingest_roundtrip": _q_warc_ingest_roundtrip,
        "docx_ingest_roundtrip": _q_docx_ingest_roundtrip,
        "pack_training_shards": _q_pack_training_shards,
        "facet_rollup_custom": _q_facet_rollup_custom,
        "docx_struct_triples": _q_docx_struct_triples,
        "gopher_quality_stats": _q_gopher_quality_stats,
        "domain_cap_sample": _q_domain_cap_sample,
        "pagerank_hosts": _q_pagerank_hosts,
        "trustrank_hosts": _q_trustrank_hosts,
        "salsa_hosts": _q_salsa_hosts,
        "clustering_coeff": _q_clustering_coeff,
        "hyperball_centrality": _q_hyperball_centrality,
        "hits_hosts": _q_hits_hosts,
        "lm_perplexity": _q_lm_perplexity,
        "cross_batch_dedup": _q_cross_batch_dedup,
        "main_content_extract": _q_main_content_extract,
        "quality_classifier": _q_quality_classifier,
        "langid_trained": _q_langid_trained,
        "wet_export_roundtrip": _q_wet_export_roundtrip,
        "sitemap_url_inventory": _q_sitemap_url_inventory,
        "zorder_events": _q_zorder_events,
        "anchor_topk_profiles": _q_anchor_topk_profiles,
        "frontier_seed_list": _q_frontier_seed_list,
        "snapshot_time_travel": _q_snapshot_time_travel,
        "asof_purchase_attribution": _q_asof_purchase_attribution,
        "token_budget_mix": _q_token_budget_mix,
        "range_window_events": _q_range_window_events,
        "event_sessions": _q_event_sessions,
        "robots_filtering": _q_robots_filtering,
        "structured_data_triples": _q_structured_data_triples,
        "outlink_anchor_graph": _q_outlink_anchor_graph,
        "decontam_overlap": _q_decontam_overlap,
        "sameas_canonical": _q_sameas_canonical,
        "rdfs_inference": _q_rdfs_inference,
        "hostline_boilerplate": _q_hostline_boilerplate,
        "kmv_distinct": _q_kmv_distinct,
        "shacl_violations": _q_shacl_violations,
        "triangle_hosts": _q_triangle_hosts,
        "fact_versions_events": _q_fact_versions_events,
        "ntriples_roundtrip": _q_ntriples_roundtrip,
        "incremental_components": _q_incremental_components,
        "redirect_resolution": _q_redirect_resolution,
        "r2rml_nation_triples": _q_r2rml_nation_triples,
        "schema_profile": _q_schema_profile,
        "bfs_seed_distances": _q_bfs_seed_distances,
        "lpa_communities": _q_lpa_communities,
        "kcore_survivors": _q_kcore_survivors,
        "adamic_adar_links": _q_adamic_adar_links,
        "wl_structural_colors": _q_wl_structural_colors,
        "snapshot_diff_triples": _q_snapshot_diff_triples,
        "taxonomy_rollup_docs": _q_taxonomy_rollup_docs,
        "fulltext_bm25": _q_fulltext_bm25,
        "nquads_roundtrip": _q_nquads_roundtrip,
        "prov_lineage_triples": _q_prov_lineage_triples,
        "dict_encode_triples": _q_dict_encode_triples,
        "weighted_sample_mix": _q_weighted_sample_mix,
        "cms_frequencies": _q_cms_frequencies,
        "hist_quantiles_chars": _q_hist_quantiles_chars,
        "key_skew_profile": _q_key_skew_profile,
        "owl_property_closure": _q_owl_property_closure,
        "owl_functional_conflicts": _q_owl_functional_conflicts,
        "rdf_list_flatten": _q_rdf_list_flatten,
        "crawl_schedule": _q_crawl_schedule,
        "skolemized_triples": _q_skolemized_triples,
        "kg_as_of_view": _q_kg_as_of_view,
        "entity_pmi_pairs": _q_entity_pmi_pairs,
        "graph_random_walks": _q_graph_random_walks,
        "void_dataset_stats": _q_void_dataset_stats,
        "negative_samples": _q_negative_samples,
        "katz_centrality_hosts": _q_katz_centrality_hosts,
        "degree_assortativity": _q_degree_assortativity,
        "turtle_serialize": _q_turtle_serialize,
        "anchor_alias_dict": _q_anchor_alias_dict,
        "streaming_components": _q_streaming_components,
        "incremental_void": _q_incremental_void,
        "fact_fusion": _q_fact_fusion,
        "fusion_source_trust": _q_fusion_source_trust,
        "cocitation_pairs": _q_cocitation_pairs,
        "bibcoupling_pairs": _q_bibcoupling_pairs,
        "community_modularity": _q_community_modularity,
        "url_template_mining": _q_url_template_mining,
        "betweenness_pivots": _q_betweenness_pivots,
        "host_report": _q_host_report,
        "label_spreading": _q_label_spreading,
        "dsir_weights": _q_dsir_weights,
        "dsir_resample": _q_dsir_resample,
        "ktruss_edges": _q_ktruss_edges,
        "pagerank_warm": _q_pagerank_warm,
        "interval_coalesce": _q_interval_coalesce,
        "vocab_alignment": _q_vocab_alignment,
        "graph_summary_stats": _q_graph_summary_stats,
        "fusion_fold_state": _q_fusion_fold_state,
        "streaming_fusion": _q_streaming_fusion,
        "entity_disambiguation": _q_entity_disambiguation,
        "dedup_cluster_audit": _q_dedup_cluster_audit,
        "feature_propagation": _q_feature_propagation,
        "crawl_budget": _q_crawl_budget,
        # rows-only (non-SQL-expressible) below
        "generate_html": _q_generate_html,
        "curation_report": _q_curation_report,
        "kg_triples": _q_kg_triples,
        "kg_entity_links": _q_kg_entity_links,
        "kg_fused_pipeline": _q_kg_fused_pipeline,
        "dedup_embedding_lsh": _q_dedup_embedding_lsh,
        "dedup_minhash": _q_dedup_minhash,
        "dedup_simhash": _q_dedup_simhash,
        "similarity_ivf": _q_similarity_ivf,
        "similarity_pq": _q_similarity_pq,
        "bpe_token_stats": _q_bpe_token_stats,
        "media_features": _q_media_features,
        "media_real_decode": _q_media_real_decode,
        "media_real_decode_jpeg": _q_media_real_decode_jpeg,
        "curation_pipeline": _q_curation_pipeline,
        "kg_xhtml": _q_kg_xhtml,
        "toc_html_pages": _q_toc_html_pages,
        "kg_patched_parse": _q_kg_patched_parse,
    }


def oracle_sql() -> dict[str, str]:
    from ferenda_spark.functions.splits import sql_hash_split

    _split_case = sql_hash_split("doc_id", _SPLIT_FRACS)
    return {
        "toc_rollup_docs": """
            SELECT coalesce(source, 'ALL') AS source_g,
                   coalesce(lang, 'ALL') AS lang_g,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents
            GROUP BY GROUPING SETS ((source), (lang), ())
        """,
        "feed_topk_events": """
            SELECT event_type, rn,
                   CAST(floor((rn - 1) / 5) AS INTEGER) AS page,
                   event_id, ts
            FROM (
                SELECT event_type,
                       CAST(row_number() OVER (PARTITION BY event_type
                            ORDER BY ts DESC, event_id ASC) AS INTEGER) AS rn,
                       event_id, ts
                FROM events
            ) t
            WHERE rn <= 25
        """,
        "feed_main_topk": """
            SELECT event_id, event_type, ts FROM events
            ORDER BY ts DESC, event_id ASC LIMIT 25
        """,
        "deps_join_agg": """
            SELECT c.c_nationkey AS nationkey,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_nationkey
        """,
        "skeleton_anti": """
            SELECT c_custkey FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        """,
        "precedence_latest": """
            SELECT o_custkey AS custkey,
                   o_orderkey AS latest_orderkey,
                   o_orderdate AS latest_date
            FROM (
                SELECT *, row_number() OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
                FROM orders
            ) WHERE rn = 1
        """,
        "keyword_counts": """
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
            FROM events GROUP BY event_type
        """,
        "annotations_agg": """
            SELECT a.l_orderkey AS orderkey, a.n_items, a.sum_qty,
                   CAST(year(o.o_orderdate) AS INTEGER) AS order_year
            FROM (
                SELECT l_orderkey,
                       CAST(count(*) AS BIGINT) AS n_items,
                       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
                FROM lineitem GROUP BY l_orderkey HAVING count(*) >= 6
            ) a JOIN orders o ON a.l_orderkey = o.o_orderkey
        """,
        "exists_semijoin": """
            SELECT c_custkey, c_nationkey FROM customer c
            WHERE EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority = '1-URGENT'
            )
        """,
        "priority_pivot": """
            SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
                   CAST(sum(CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
                   CAST(sum(CASE WHEN o_orderpriority LIKE '2%' THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
                   CAST(sum(CASE WHEN o_orderpriority LIKE '3%' THEN 1 ELSE 0 END) AS BIGINT) AS n_medium,
                   CAST(count(*) AS BIGINT) AS n_total
            FROM orders GROUP BY year(o_orderdate)
        """,
        "acctbal_percentiles": """
            SELECT c_mktsegment,
                   round(quantile_cont(c_acctbal, 0.5), 4) AS p50,
                   round(quantile_cont(c_acctbal, 0.9), 4) AS p90,
                   CAST(count(*) AS BIGINT) AS n_cust
            FROM customer GROUP BY c_mktsegment
        """,
        "union_nations": """
            SELECT c_nationkey AS nationkey FROM customer
            UNION
            SELECT s_nationkey AS nationkey FROM supplier
        """,
        "except_nations": """
            SELECT DISTINCT c_nationkey AS nationkey FROM customer
            EXCEPT
            SELECT DISTINCT s_nationkey AS nationkey FROM supplier
        """,
        "scalar_surface": """
            SELECT p_partkey,
                   upper(p_brand) AS brand_u,
                   trim(regexp_replace(p_name, '\\s+', ' ', 'g')) AS name_norm,
                   upper(substr(p_name, 1, 1)) AS letter,
                   CAST(length(p_name) AS BIGINT) AS name_len
            FROM part WHERE p_size >= 40
        """,
        "tpch_q1ish": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                        AS sum_disc_price,
                   CAST(count(*) AS BIGINT) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "tpch_q3ish": """
            SELECT o_orderkey AS orderkey,
                   CAST(rev_d AS DOUBLE) AS revenue,
                   o_orderdate AS orderdate
            FROM (
                SELECT o.o_orderkey, o.o_orderdate,
                       sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                           * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS rev_d
                FROM customer c
                JOIN orders o ON c.c_custkey = o.o_custkey
                JOIN lineitem l ON o.o_orderkey = l.l_orderkey
                WHERE c.c_mktsegment = 'BUILDING'
                GROUP BY o.o_orderkey, o.o_orderdate
            )
            ORDER BY rev_d DESC, o_orderkey ASC LIMIT 10
        """,
        "filter_pushdown_part": """
            SELECT p_brand,
                   CAST(count(*) AS BIGINT) AS n_parts,
                   CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
            FROM part
            WHERE p_type LIKE '%STANDARD%' AND p_size <= 20
            GROUP BY p_brand
        """,
        "events_hourly": """
            SELECT date_trunc('hour', ts) AS hour,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
            FROM events GROUP BY date_trunc('hour', ts)
        """,
        "region_nation_leftjoin": """
            SELECT n.n_nationkey AS nationkey,
                   n.n_name AS nation,
                   coalesce(r.r_name, 'UNKNOWN') AS region
            FROM nation n
            LEFT OUTER JOIN (SELECT * FROM region WHERE r_regionkey <= 2) r
              ON n.n_regionkey = r.r_regionkey
        """,
        "rollup_customer_geo": """
            SELECT coalesce(r_name, 'ALL') AS region_g,
                   coalesce(n_name, 'ALL') AS nation_g,
                   CAST(count(*) AS BIGINT) AS n_cust,
                   CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
            FROM customer c
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY ROLLUP (r_name, n_name)
        """,
        "events_running_total": """
            SELECT event_type, event_id,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
                        PARTITION BY event_type ORDER BY ts ASC, event_id ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS DOUBLE) AS running_value
            FROM events WHERE event_id % 50 = 0
        """,
        "events_lag_delta": """
            SELECT user_id, event_id,
                   CAST(CAST(value AS DECIMAL(18,2))
                        - lag(CAST(value AS DECIMAL(18,2))) OVER (
                              PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                          ) AS DOUBLE) AS value_delta
            FROM events WHERE user_id < 40
        """,
        "natural_sort_priorities": """
            SELECT o_orderpriority AS priority,
                   CAST(regexp_extract(o_orderpriority, '^(\\d+)', 1) AS BIGINT) AS num_part,
                   regexp_extract(o_orderpriority, '([A-Za-z]+)', 1) AS alpha_part
            FROM (SELECT DISTINCT o_orderpriority FROM orders)
        """,
        "toc_page_lists": """
            SELECT source, lang,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS members
            FROM documents GROUP BY source, lang
        """,
        "orders_monthly": """
            SELECT strftime(o_orderdate, '%Y-%m') AS ym,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
            FROM orders GROUP BY strftime(o_orderdate, '%Y-%m')
        """,
        "doc_point_lookup": """
            SELECT doc_id, source, lang, n_chars
            FROM documents WHERE doc_id = 42
        """,
        "dedup_exact_stats": """
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct,
                   CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS n_dupes
            FROM (
                SELECT source,
                       sha256(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp
                FROM documents
            ) GROUP BY source
        """,
        "url_canonical_dedup": _URL_CANONICAL_ORACLE,
        "line_dedup_docs": _LINE_DEDUP_ORACLE,
        "span_dedup_docs": _SPAN_DEDUP_ORACLE,
        "span_dedup_stride1": _SPAN_DEDUP_ORACLE,
        "dedup_jaccard_pairs": _JACCARD_PAIRS_CTE + """
            SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM pairs
        """,
        "corpus_hash_split": f"""
            SELECT {_split_case} AS split, lang,
                   CAST(count(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY 1, 2
        """,
        "dedup_components": _JACCARD_PAIRS_CTE + """,
            und AS (
                SELECT id_a AS a, id_b AS b FROM pairs
                UNION SELECT id_b, id_a FROM pairs
            ),
            reach(n, m) AS (
                SELECT DISTINCT a, a FROM und
                UNION
                SELECT r.n, u.b FROM reach r JOIN und u ON r.m = u.a
            )
            SELECT n AS doc_id, min(m) AS component FROM reach GROUP BY n
        """,
        "dedup_embedding_exact": """
            WITH e AS (
                SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            )
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.v, b.v), 4) AS cosine
            FROM e a JOIN e b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) >= 0.35
        """,
        "shingle_fingerprint_stats": """
            WITH t AS (
                SELECT source,
                       list_filter(string_split_regex(trim(text), '\\s+'),
                                   x -> x != '') AS toks
                FROM documents
            ),
            g AS (
                SELECT source,
                       CASE
                         WHEN len(toks) >= 3 THEN list_distinct(
                              list_transform(generate_series(1, len(toks) - 2),
                                  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
                         WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')]
                         ELSE [] END AS grams
                FROM t
            )
            SELECT source,
                   CAST(count(DISTINCT gr) AS BIGINT) AS n_distinct_shingles,
                   CAST(count(*) AS BIGINT) AS n_shingle_rows
            FROM (SELECT source, unnest(grams) AS gr FROM g)
            GROUP BY source
        """,
        "embedding_topk": """
            WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
            sims AS (
                SELECT vec_id AS id,
                       list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv) AS c
                FROM embeddings, q
            )
            SELECT id, round(c, 4) AS cosine FROM sims
            ORDER BY c DESC, id ASC LIMIT 20
        """,
        "text_quality": f"""
            WITH per AS (
                SELECT source,
                       list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '') AS toks,
                       length(text) AS nchar,
                       length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS npunct
                FROM documents
            ),
            scored AS (
                SELECT source,
                       len(toks) AS n,
                       CASE WHEN len(toks) > 0
                            THEN CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE) / len(toks)
                            ELSE 0.0 END AS mtl,
                       CASE WHEN nchar > 0 THEN CAST(npunct AS DOUBLE) / nchar ELSE 0.0 END AS pr,
                       CASE WHEN len(toks) > 0
                            THEN CAST(len(list_filter(toks, t -> list_contains({STOP_SQL}, lower(t)))) AS DOUBLE) / len(toks)
                            ELSE 0.0 END AS sr
                FROM per
            )
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(round(sum(
                       0.3 * (CASE WHEN n >= 10 AND n <= 100000 THEN 1.0 ELSE 0.0 END)
                     + 0.3 * (CASE WHEN mtl >= 2.0 AND mtl <= 12.0 THEN 1.0 ELSE 0.0 END)
                     + 0.2 * (CASE WHEN pr > 0.0005 THEN 1.0 ELSE 0.0 END)
                     + 0.2 * (CASE WHEN sr > 0.02 THEN 1.0 ELSE 0.0 END)
                   ), 6) AS DOUBLE) AS sum_quality,
                   CAST(sum(n) AS BIGINT) AS sum_tokens
            FROM scored GROUP BY source
        """,
        "lang_id_counts": """
            WITH t AS (
                SELECT list_transform(
                         list_filter(string_split_regex(trim(text), '\\s+'), x -> x != ''),
                         x -> lower(x)) AS toks
                FROM documents
            ),
            s AS (
                SELECT len(list_filter(toks, t -> list_contains(['the','and','of','to','is','that','with','for'], t))) AS s_en,
                       len(list_filter(toks, t -> list_contains(['der','die','das','und','ist','nicht','mit','ein'], t))) AS s_de,
                       len(list_filter(toks, t -> list_contains(['le','la','les','et','est','que','des','une'], t))) AS s_fr,
                       len(list_filter(toks, t -> list_contains(['el','los','las','es','que','una','por','con'], t))) AS s_es
                FROM t
            )
            SELECT lang_detected, CAST(count(*) AS BIGINT) AS n_docs FROM (
                SELECT CASE
                    WHEN s_fr > 0 AND s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr'
                    WHEN s_es > 0 AND s_es >= s_fr AND s_es >= s_en AND s_es >= s_de THEN 'es'
                    WHEN s_en > 0 AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_de THEN 'en'
                    WHEN s_de > 0 AND s_de >= s_fr AND s_de >= s_es AND s_de >= s_en THEN 'de'
                    ELSE 'und' END AS lang_detected
                FROM s
            ) GROUP BY lang_detected
        """,
        "token_count_bpe": r"""
            SELECT lang,
                   CAST(sum(len(regexp_extract_all(text, '[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]'))) AS BIGINT)
                        AS sum_bpe_tokens,
                   CAST(count(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY lang
        """,
        "sparql_docs": _DOC_TRIPLES_SQL + """
            SELECT a.subj AS d, a.obj AS src, c.obj AS nc
            FROM t a
            JOIN t b ON a.subj = b.subj
            JOIN t c ON a.subj = c.subj
            WHERE a.pred = 'doc:source'
              AND b.pred = 'doc:lang' AND b.obj = 'en'
              AND c.pred = 'doc:nchars'
              AND CAST(c.obj AS DOUBLE) >= 400
              AND regexp_matches(a.obj, '^src1[0-9]$')
        """,
        "sparql_groupby": _DOC_TRIPLES_SQL + """
            SELECT a.obj AS src,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(CAST(b.obj AS DOUBLE)) AS DOUBLE) AS sum_nc,
                   max(c.obj) AS max_lang
            FROM t a
            JOIN t b ON a.subj = b.subj
            JOIN t c ON a.subj = c.subj
            WHERE a.pred = 'doc:source' AND b.pred = 'doc:nchars'
              AND c.pred = 'doc:lang'
            GROUP BY a.obj HAVING count(*) >= 2
        """,
        "sparql_union_values": _DOC_TRIPLES_SQL + """
            SELECT s.subj AS d, u.obj AS v
            FROM (SELECT subj FROM t
                  WHERE pred = 'doc:source' AND obj IN ('src3', 'src7')) s
            JOIN (SELECT subj, obj FROM t
                  WHERE pred IN ('doc:lang', 'doc:nchars')) u
              ON s.subj = u.subj
        """,
        "sparql_triple_count": _DOC_TRIPLES_SQL + """
            SELECT CAST(count(*) AS BIGINT) AS n_triples,
                   CAST(count(DISTINCT subj) AS BIGINT) AS n_subjects,
                   CAST(count(DISTINCT pred) AS BIGINT) AS n_preds
            FROM t
        """,
        "sparql_path_closure": _DOC_TRIPLES_SQL + """,
            reach(a, b) AS (
                SELECT subj, obj FROM t WHERE pred = 'doc:prev'
                UNION
                SELECT r.a, t2.obj FROM reach r
                JOIN t t2 ON t2.pred = 'doc:prev' AND r.b = t2.subj
            )
            SELECT a AS d, b AS anc FROM reach
        """,
        "sparql_bind_if": _DOC_TRIPLES_SQL + """
            SELECT a.subj AS d,
                   CASE WHEN CAST(b.obj AS DOUBLE) >= 500
                        THEN upper(a.obj) || '-LONG' ELSE a.obj END AS tag
            FROM t a
            JOIN t b ON a.subj = b.subj
            WHERE a.pred = 'doc:lang' AND a.obj IN ('en', 'de')
              AND b.pred = 'doc:nchars'
        """,
        "sparql_ask": _DOC_TRIPLES_SQL + """
            SELECT EXISTS(SELECT 1 FROM t
                          WHERE pred = 'doc:source' AND obj LIKE 'src%') AS ask,
                   'hit' AS probe
            UNION ALL
            SELECT EXISTS(SELECT 1 FROM t
                          WHERE pred = 'doc:lang' AND obj = 'xx-nope') AS ask,
                   'miss' AS probe
        """,
        "sparql_describe": _DOC_TRIPLES_SQL + """
            SELECT subj, pred, obj, (pred = 'doc:prev') AS obj_is_uri
            FROM t
            WHERE subj IN (SELECT subj FROM t
                           WHERE pred = 'doc:prev' AND obj = 'doc://41')
        """,
        "sparql_subquery": _DOC_TRIPLES_SQL + """
            SELECT DISTINCT a.obj AS src, cnt.n AS n
            FROM t a
            JOIN t b ON a.subj = b.subj
            JOIN (SELECT obj AS src, CAST(count(*) AS BIGINT) AS n
                  FROM t WHERE pred = 'doc:source' GROUP BY obj) cnt
              ON cnt.src = a.obj
            WHERE a.pred = 'doc:source'
              AND b.pred = 'doc:lang' AND b.obj = 'en'
        """,
        "sparql_path_star": _DOC_TRIPLES_SQL + """,
            r(x) AS (
                SELECT 'doc://45'
                UNION
                SELECT t2.obj FROM r
                JOIN t t2 ON t2.pred = 'doc:prev' AND t2.subj = r.x
            )
            SELECT x FROM r
        """,
        "sparql_nps": _DOC_TRIPLES_SQL + """
            SELECT subj AS s, obj AS o FROM t
            WHERE pred NOT IN ('doc:source', 'doc:lang', 'doc:prev')
        """,
        "sparql_construct_graph": _DOC_TRIPLES_SQL + """,
            edges AS (SELECT subj AS d, obj AS p FROM t
                      WHERE pred = 'doc:prev')
            SELECT d AS subj, 'doc:neighbor' AS pred, p AS obj,
                   TRUE AS obj_is_uri
            FROM edges
            UNION
            SELECT p AS subj, 'doc:neighborOf' AS pred, d AS obj,
                   TRUE AS obj_is_uri
            FROM edges
        """,
        "url_normalize_stats": """
            WITH n AS (
                SELECT 'http://www.site' || CAST(doc_id % 5 AS VARCHAR) ||
                       '.example.com/p/' || CAST(doc_id AS VARCHAR) AS u,
                       'www.site' || CAST(doc_id % 5 AS VARCHAR) ||
                       '.example.com' AS dom
                FROM documents)
            SELECT dom, CAST(count(*) AS BIGINT) AS n_urls,
                   CAST(sum(length(u)) AS BIGINT) AS sum_len
            FROM n GROUP BY dom
        """,
        "incremental_toc_counts": """
            WITH dm AS (
                SELECT CASE WHEN doc_id % 25 = 0
                            THEN 'X' || substring(text, 1, 16)
                            ELSE substring(text, 1, 16) END AS title,
                       CASE WHEN doc_id % 25 = 0 THEN 'pt' ELSE lang END
                           AS lang,
                       '20' || lpad(CAST(doc_id % 20 + 5 AS VARCHAR), 2, '0')
                           || '-01-01' AS issued
                FROM documents),
            f AS (SELECT upper(substring(title, 1, 1)) AS letter,
                         CAST(substring(issued, 1, 4) AS INT) AS year,
                         lang
                  FROM dm)
            SELECT CASE WHEN letter IS NOT NULL THEN 'letter'
                        WHEN year IS NOT NULL THEN 'year'
                        WHEN lang IS NOT NULL THEN 'lang'
                        ELSE 'all' END AS facet,
                   coalesce(letter, CAST(year AS VARCHAR), lang, '*')
                       AS value,
                   CAST(count(*) AS BIGINT) AS n_docs
            FROM f GROUP BY GROUPING SETS ((letter), (year), (lang), ())
        """,
        "pii_redact": r"""
            WITH aug AS (
""" + _PII_AUG_SQL + r"""
            )
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(len(regexp_extract_all(t,
                        '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}')))
                        AS BIGINT) AS n_emails,
                   CAST(sum(len(regexp_extract_all(t,
                        '\+\d{1,3}[-. ]\d{3}[-. ]\d{4}\b')))
                        AS BIGINT) AS n_phones,
                   CAST(sum(len(regexp_extract_all(t,
                        '\b(?:\d{1,3}\.){3}\d{1,3}\b')))
                        AS BIGINT) AS n_ipv4,
                   CAST(sum(length(
                        regexp_replace(regexp_replace(regexp_replace(t,
                          '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}',
                          '[PII]', 'g'),
                          '\+\d{1,3}[-. ]\d{3}[-. ]\d{4}\b', '[PII]', 'g'),
                          '\b(?:\d{1,3}\.){3}\d{1,3}\b', '[PII]', 'g')))
                        AS BIGINT) AS sum_redacted_len
            FROM aug GROUP BY lang
        """,
        "chunk_dedup_stats": """
            WITH base AS (
                SELECT doc_id, lang, string_split(text, ' ') AS toks
                FROM documents),
            expl AS (
                SELECT doc_id, lang, toks,
                       unnest(range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT)))
                           AS pos
                FROM base),
            chunks AS (
                SELECT doc_id, lang, pos,
                       array_to_string(
                           list_slice(toks, pos * 8 + 1, pos * 8 + 8), ' ')
                           AS chunk
                FROM expl),
            ranked AS (
                SELECT lang,
                       row_number() OVER (PARTITION BY chunk
                                          ORDER BY doc_id, pos) AS rn
                FROM chunks)
            SELECT lang, CAST(count(*) AS BIGINT) AS n_chunks,
                   CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_kept
            FROM ranked GROUP BY lang
        """,
        "chunk_dedup_clean": """
            WITH base AS (
                SELECT doc_id, string_split(text, ' ') AS toks
                FROM documents),
            expl AS (
                SELECT doc_id, toks,
                       unnest(range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT)))
                           AS pos
                FROM base),
            chunks AS (
                SELECT doc_id, pos,
                       array_to_string(
                           list_slice(toks, pos * 8 + 1, pos * 8 + 8), ' ')
                           AS chunk
                FROM expl),
            ranked AS (
                SELECT doc_id, pos, chunk,
                       row_number() OVER (PARTITION BY chunk
                                          ORDER BY doc_id, pos) AS rn
                FROM chunks),
            rebuilt AS (
                SELECT doc_id,
                       string_agg(chunk, ' ' ORDER BY pos) AS clean_text,
                       CAST(count(*) AS BIGINT) AS n_kept_chunks
                FROM ranked WHERE rn = 1 GROUP BY doc_id)
            SELECT d.doc_id AS id,
                   coalesce(r.clean_text, '') AS clean_text,
                   CAST(coalesce(r.n_kept_chunks, 0) AS BIGINT)
                       AS n_kept_chunks
            FROM (SELECT DISTINCT doc_id FROM documents) d
            LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
        """,
        "dup_chunk_topk": """
            WITH base AS (
                SELECT doc_id, string_split(text, ' ') AS toks
                FROM documents),
            expl AS (
                SELECT doc_id, toks,
                       unnest(range(0, CAST(ceil(len(toks) / 8.0) AS BIGINT)))
                           AS pos
                FROM base),
            chunks AS (
                SELECT doc_id, pos,
                       array_to_string(
                           list_slice(toks, pos * 8 + 1, pos * 8 + 8), ' ')
                           AS chunk
                FROM expl),
            counted AS (
                SELECT doc_id,
                       count(*) OVER (PARTITION BY chunk) AS cnt
                FROM chunks),
            per_doc AS (
                SELECT doc_id AS id,
                       CAST(count(*) AS BIGINT) AS n_chunks,
                       CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_dup_chunks
                FROM counted GROUP BY doc_id)
            SELECT id, n_chunks, n_dup_chunks,
                   round(n_dup_chunks / CAST(n_chunks AS DOUBLE), 6)
                       AS dup_fraction
            FROM per_doc ORDER BY dup_fraction DESC, id LIMIT 10
        """,
        "sparql_optional": _DOC_TRIPLES_SQL + """
            SELECT a.subj AS d, a.obj AS nc, b.obj AS de
            FROM t a
            LEFT JOIN (SELECT subj, obj FROM t
                       WHERE pred = 'doc:lang' AND obj = 'de') b
              ON a.subj = b.subj
            WHERE a.pred = 'doc:nchars' AND CAST(a.obj AS DOUBLE) < 60
        """,
        "fulltext_search": _FULLTEXT_HITS_SQL + """
            SELECT id, n_matched, score FROM hits
        """,
        "fulltext_facets": _FULLTEXT_HITS_SQL + """
            SELECT 'lang' AS facet, d.lang AS value, count(*) AS n_hits
            FROM hits JOIN documents d ON hits.id = d.doc_id GROUP BY d.lang
            UNION ALL
            SELECT 'source', d.source, count(*)
            FROM hits JOIN documents d ON hits.id = d.doc_id GROUP BY d.source
        """,
        "atom_feeds": """
            WITH ranked AS (
                SELECT event_type AS feed,
                       CAST(row_number() OVER (PARTITION BY event_type
                            ORDER BY ts DESC, event_id ASC) AS INTEGER) AS rn,
                       event_id, ts
                FROM events
            ), top AS (
                SELECT feed, rn, CAST(floor((rn - 1) / 5) AS INTEGER) AS page,
                       'evt://' || CAST(event_id AS VARCHAR) AS uri,
                       'event ' || CAST(event_id AS VARCHAR) AS title, ts
                FROM ranked WHERE rn <= 10
            ), pages AS (
                SELECT feed, page,
                       CAST(count(*) AS INTEGER) AS n_entries,
                       strftime(max(ts), '%Y-%m-%dT%H:%M:%SZ') AS updated,
                       string_agg(
                           '<entry><id>' || uri || '</id><title>' || title
                           || '</title><link href="' || uri || '"/><updated>'
                           || strftime(ts, '%Y-%m-%dT%H:%M:%SZ')
                           || '</updated></entry>', '' ORDER BY rn) AS entries
                FROM top GROUP BY feed, page
            ), lp AS (
                SELECT feed, max(page) AS last_page FROM top GROUP BY feed
            )
            SELECT p.feed, p.page, p.n_entries, p.updated,
                   '<?xml version="1.0" encoding="utf-8"?>'
                   || '<feed xmlns="http://www.w3.org/2005/Atom"><id>'
                   || 'https://ex.org/feed/' || p.feed || '/'
                   || CAST(p.page AS VARCHAR) || '.atom</id><title>' || p.feed
                   || '</title><updated>' || p.updated
                   || '</updated><link rel="self" href="https://ex.org/feed/'
                   || p.feed || '/' || CAST(p.page AS VARCHAR) || '.atom"/>'
                   || CASE WHEN p.page < lp.last_page
                        THEN '<link rel="prev-archive" href="https://ex.org/feed/'
                             || p.feed || '/' || CAST(p.page + 1 AS VARCHAR) || '.atom"/>'
                        ELSE '' END
                   || CASE WHEN p.page > 0
                        THEN '<link rel="next-archive" href="https://ex.org/feed/'
                             || p.feed || '/' || CAST(p.page - 1 AS VARCHAR) || '.atom"/>'
                        ELSE '' END
                   || p.entries || '</feed>' AS atom_xml
            FROM pages p JOIN lp USING (feed)
        """,
        # byte-exact WARC roundtrip: the oracle reconstructs what the WARC
        # writer embedded straight from the documents table; equality proves
        # the parser recovered every payload bit-for-bit
        "warc_ingest_roundtrip": """
            SELECT 'https://w' || CAST(doc_id % 5 AS VARCHAR)
                       || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
                   TIMESTAMP '2026-01-01'
                       + to_seconds(CAST(doc_id AS BIGINT)) AS warc_ts,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   sha256(text) AS payload_sha
            FROM documents WHERE doc_id < 200
        """,
        # character-exact OOXML roundtrip: extracted text must equal
        # 'Doc {id}\n\n{text}' reconstructed from the documents table
        "docx_ingest_roundtrip": """
            SELECT lpad(CAST(doc_id AS VARCHAR), 5, '0') || '.docx' AS fname,
                   'Doc ' || CAST(doc_id AS VARCHAR) AS title,
                   CAST(2 AS BIGINT) AS n_parts,
                   sha256('Doc ' || CAST(doc_id AS VARCHAR)
                          || chr(10) || chr(10) || text) AS text_sha
            FROM documents WHERE doc_id >= 200 AND doc_id < 300
        """,
        # concat-then-chunk packing: pack = floor(start_offset / budget)
        # over the per-(source, bucket) stream ordered by doc_id
        "pack_training_shards": """
            WITH t AS (
                SELECT source,
                       CAST(doc_id % 4 AS INT) AS bucket,
                       doc_id,
                       CAST(CASE WHEN len(trim(text)) = 0 THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                            END AS BIGINT) AS n_tokens
                FROM documents
            ), o AS (
                SELECT source, bucket, n_tokens,
                       sum(n_tokens) OVER (
                           PARTITION BY source, bucket ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING
                       ) - n_tokens AS start_offset
                FROM t
            )
            SELECT source, bucket,
                   CAST(floor(start_offset / 512) AS BIGINT) AS pack_id,
                   count(*) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
                   CAST(sum(n_tokens) AS DOUBLE) / 512 AS fill_ratio
            FROM o GROUP BY source, bucket, CAST(floor(start_offset / 512) AS BIGINT)
        """,
        "facet_rollup_custom": """
            SELECT 'publisher' AS facet, source AS value,
                   count(*) AS n_docs
            FROM documents GROUP BY source
            UNION ALL
            SELECT 'size_kb', CAST(CAST(n_chars // 1000 AS INT) AS VARCHAR),
                   count(*)
            FROM documents GROUP BY 2
            UNION ALL
            SELECT 'all', '*', count(*) FROM documents
        """,
        # the exact structure graph the styled DOCX FSM must emit per doc:
        # Title para -> doc title; Heading1 -> S1; Heading2 -> S1.1 nested
        # under it (isPartOf chain), every node typed, titles attached
        "docx_struct_triples": """
            WITH ids AS (
                SELECT doc_id, source FROM documents
                WHERE doc_id >= 300 AND doc_id < 340
            ), pat(sfx, pred, objk) AS (VALUES
                ('', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
                     'bibo:Document'),
                ('', 'http://purl.org/dc/terms/title', 'doc_title'),
                ('', 'http://purl.org/dc/terms/language', 'und'),
                ('1', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
                      'bibo:DocumentPart'),
                ('1', 'http://purl.org/dc/terms/isPartOf', 'parent_doc'),
                ('1', 'http://purl.org/dc/terms/title', 'Part A'),
                ('1.1', 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
                        'bibo:DocumentPart'),
                ('1.1', 'http://purl.org/dc/terms/isPartOf', 'parent_s1'),
                ('1.1', 'http://purl.org/dc/terms/title', 'h2_title')
            )
            SELECT ids.doc_id, pat.sfx, pat.pred,
                   CASE pat.objk
                       WHEN 'bibo:Document'
                           THEN 'http://purl.org/ontology/bibo/Document'
                       WHEN 'bibo:DocumentPart'
                           THEN 'http://purl.org/ontology/bibo/DocumentPart'
                       WHEN 'doc_title' THEN 'Doc ' || ids.doc_id
                       WHEN 'parent_doc' THEN 'doc:' || ids.doc_id
                       WHEN 'parent_s1' THEN 'doc:' || ids.doc_id || '#S1'
                       WHEN 'h2_title' THEN 'From ' || ids.source
                       ELSE pat.objk
                   END AS obj
            FROM ids CROSS JOIN pat
        """,
        # Gopher repetition signals: line stats via unnest/groupBy, word
        # n-gram stats via list_transform(generate_series)/unnest — the
        # same per-doc integer ratios the Spark HOF/explode branches
        # compute, averaged per lang (round 6)
        "gopher_quality_stats": r"""
            WITH l0 AS (
                SELECT doc_id,
                       trim(unnest(string_split(text, chr(10)))) AS line
                FROM documents
            ), lines AS (
                SELECT doc_id, line FROM l0 WHERE len(line) > 0
            ), linesig AS (
                SELECT doc_id,
                       count(*) AS n_lines,
                       count(*) - count(DISTINCT line) AS n_dup,
                       sum(len(line)) AS total_chars,
                       sum(CASE WHEN substr(line, 1, 1) IN ('-', '*', '•')
                           THEN 1 ELSE 0 END) AS n_bullet,
                       sum(CASE WHEN line LIKE '%...' OR line LIKE '%…'
                           THEN 1 ELSE 0 END) AS n_ell
                FROM lines GROUP BY doc_id
            ), percnt AS (
                SELECT doc_id, line, count(*) AS c, len(line) AS ll
                FROM lines GROUP BY doc_id, line
            ), dupchars AS (
                SELECT doc_id, sum((c - 1) * ll) AS dup_chars
                FROM percnt GROUP BY doc_id
            ), toks AS (
                SELECT doc_id, len(text) AS nc,
                       CASE WHEN len(trim(text)) = 0 THEN []
                            ELSE regexp_split_to_array(trim(text), '\s+')
                       END AS t
                FROM documents
            ), g2 AS (
                SELECT doc_id, nc,
                       unnest(list_transform(
                           generate_series(1, len(t) - 1),
                           i -> t[i] || ' ' || t[i + 1])) AS gram
                FROM toks WHERE len(t) >= 2
            ), g2c AS (
                SELECT doc_id, gram, count(*) AS c
                FROM g2 GROUP BY doc_id, gram
            ), top2 AS (
                SELECT doc_id, max(c * len(gram)) AS top_chars
                FROM g2c GROUP BY doc_id
            ), g5 AS (
                SELECT doc_id,
                       unnest(list_transform(
                           generate_series(1, len(t) - 4),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                || ' ' || t[i+3] || ' ' || t[i+4])) AS gram
                FROM toks WHERE len(t) >= 5
            ), g5c AS (
                SELECT doc_id, gram, count(*) AS c
                FROM g5 GROUP BY doc_id, gram
            ), dup5 AS (
                SELECT doc_id,
                       sum(CASE WHEN c > 1 THEN c * len(gram) ELSE 0 END)
                           AS dup_chars5
                FROM g5c GROUP BY doc_id
            ), sig AS (
                SELECT d.doc_id, d.lang,
                       COALESCE(CAST(ls.n_dup AS DOUBLE)
                                / NULLIF(ls.n_lines, 0), 0.0) AS dlf,
                       COALESCE(CAST(dc.dup_chars AS DOUBLE)
                                / NULLIF(ls.total_chars, 0), 0.0) AS dlcf,
                       COALESCE(CAST(ls.n_bullet AS DOUBLE)
                                / NULLIF(ls.n_lines, 0), 0.0) AS bf,
                       COALESCE(CAST(ls.n_ell AS DOUBLE)
                                / NULLIF(ls.n_lines, 0), 0.0) AS ef,
                       COALESCE(CAST(t2.top_chars AS DOUBLE)
                                / NULLIF(tk.nc, 0), 0.0) AS top2,
                       COALESCE(CAST(d5.dup_chars5 AS DOUBLE)
                                / NULLIF(tk.nc, 0), 0.0) AS dup5
                FROM documents d
                LEFT JOIN linesig ls USING (doc_id)
                LEFT JOIN dupchars dc USING (doc_id)
                LEFT JOIN toks tk USING (doc_id)
                LEFT JOIN top2 t2 USING (doc_id)
                LEFT JOIN dup5 d5 USING (doc_id)
            )
            SELECT lang,
                   count(*) AS n_docs,
                   round(avg(dlf), 6) AS avg_dup_line_frac,
                   round(avg(dlcf), 6) AS avg_dup_line_char_frac,
                   round(avg(bf), 6) AS avg_bullet_frac,
                   round(avg(ef), 6) AS avg_ellipsis_frac,
                   round(avg(top2), 6) AS avg_top_2gram_frac,
                   round(avg(dup5), 6) AS avg_dup_5gram_frac,
                   CAST(sum(CASE WHEN dlf > 0.30 OR top2 > 0.20
                                 OR ef > 0.30 OR bf > 0.90
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
            FROM sig GROUP BY lang
        """,
        # deterministic per-domain cap: md5-ordered row_number <= 20
        "domain_cap_sample": """
            WITH r AS (
                SELECT source, doc_id,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                       ) AS rn
                FROM documents
            )
            SELECT source, CAST(rn AS INT) AS rn, doc_id
            FROM r WHERE rn <= 20
        """,
        "pagerank_hosts": _pagerank_oracle(6),
        "trustrank_hosts": _trustrank_oracle(6),
        "salsa_hosts": _SALSA_ORACLE,
        "clustering_coeff": _CLUSTERING_COEFF_ORACLE,
        "hyperball_centrality": _HYPERBALL_ORACLE,
        "hits_hosts": _hits_oracle(4),
        # stupid-backoff bigram LM: train on the doc_id%11==0 slice,
        # score every doc; MATERIALIZED or DuckDB re-inlines the token
        # CTE per reference
        "lm_perplexity": """
            WITH tok AS MATERIALIZED (
                SELECT doc_id,
                       list_filter(
                           string_split_regex(trim(lower(text)), '\\s+'),
                           t -> t != '') AS toks
                FROM documents
            ), train_bi AS MATERIALIZED (
                SELECT toks[i] AS w1, toks[i + 1] AS w2, count(*) AS c_bi
                FROM tok, unnest(range(1, len(toks))) AS u(i)
                WHERE doc_id % 11 = 0 GROUP BY 1, 2
            ), train_uni AS MATERIALIZED (
                SELECT tokk AS tok, count(*) AS c_uni FROM (
                    SELECT unnest(toks) AS tokk FROM tok WHERE doc_id % 11 = 0
                ) GROUP BY 1
            ), n AS (SELECT sum(c_uni) AS n_tokens FROM train_uni),
            db AS MATERIALIZED (
                SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
                FROM tok, unnest(range(1, len(toks))) AS u(i)
            ), s AS (
                SELECT db.doc_id,
                       CASE WHEN b.c_bi IS NOT NULL
                            THEN b.c_bi * 1.0 / u1.c_uni
                            ELSE 0.4 * (coalesce(u2.c_uni, 0) + 1)
                                 / ((SELECT n_tokens FROM n) + 1) END AS sc
                FROM db
                LEFT JOIN train_bi b ON b.w1 = db.w1 AND b.w2 = db.w2
                LEFT JOIN train_uni u1 ON u1.tok = db.w1
                LEFT JOIN train_uni u2 ON u2.tok = db.w2
            )
            SELECT d.doc_id,
                   CAST(coalesce(agg.n_bigrams, 0) AS BIGINT) AS n_bigrams,
                   round(agg.avg_nll, 6) AS avg_nll
            FROM documents d LEFT JOIN (
                SELECT doc_id, count(*) AS n_bigrams,
                       avg(-ln(sc)) AS avg_nll
                FROM s GROUP BY doc_id
            ) agg USING (doc_id)
        """,
        "cross_batch_dedup": """
            WITH c AS (SELECT count(*) AS n FROM documents),
            norm AS MATERIALIZED (
                SELECT doc_id, source,
                       lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))
                           AS nt
                FROM documents
            ),
            b1 AS MATERIALIZED (
                SELECT * FROM norm WHERE doc_id < (SELECT n FROM c) // 2
            ),
            b2 AS MATERIALIZED (
                SELECT doc_id, source, nt FROM norm
                WHERE doc_id >= (SELECT n FROM c) // 2
                UNION ALL
                SELECT doc_id + 10 * (SELECT n FROM c), source, nt
                FROM b1 WHERE doc_id % 10 = 0
            ),
            win AS (SELECT nt, min(doc_id) AS keep_id FROM b2 GROUP BY nt),
            surv AS (
                SELECT b2.doc_id, b2.source FROM b2
                JOIN win ON b2.doc_id = win.keep_id AND b2.nt = win.nt
                WHERE b2.nt NOT IN (SELECT nt FROM b1)
            )
            SELECT source, count(*) AS n_survivors,
                   min(doc_id) AS min_id, max(doc_id) AS max_id
            FROM surv GROUP BY source
        """,
        # 5-block template: nav + footer are boilerplate, the all-link
        # paragraph fails the density gate, the heading survives the
        # length gate, the text block survives iff >= 25 normalized chars
        "main_content_extract": """
            WITH d AS (
                SELECT doc_id,
                       trim(regexp_replace(text, '\\s+', ' ', 'g')) AS nt
                FROM documents
            )
            SELECT doc_id,
                   CAST(4 + CASE WHEN len(nt) > 0 THEN 1 ELSE 0 END
                        AS INT) AS n_blocks,
                   CAST(1 + CASE WHEN len(nt) >= 25 THEN 1 ELSE 0 END
                        AS INT) AS n_kept,
                   'Title ' || doc_id ||
                   CASE WHEN len(nt) >= 25
                        THEN chr(10) || chr(10) || nt ELSE '' END
                       AS main_text
            FROM d
        """,
        # trained char-trigram NB langid: training AND scoring replayed;
        # MATERIALIZED everywhere or DuckDB re-inlines the gram explode
        "langid_trained": """
            WITH marked AS MATERIALIZED (
                SELECT doc_id, lang,
                       lower(text || ' ' || repeat(lang || 'xx ', 10)) AS s
                FROM documents
            ), tg AS MATERIALIZED (
                SELECT m.lang, substring(s, i, 3) AS gram
                FROM marked m, unnest(range(1, len(s) - 1)) AS u(i)
                WHERE doc_id % 2 = 0
            ), counts AS MATERIALIZED (
                SELECT lang, gram, count(*) AS c FROM tg GROUP BY 1, 2
            ), v AS (SELECT count(DISTINCT gram) AS v FROM counts),
            nl AS MATERIALIZED (
                SELECT lang, sum(c) AS n_lang FROM counts GROUP BY 1
            ), nd AS MATERIALIZED (
                SELECT lang, count(*) AS nd FROM marked
                WHERE doc_id % 2 = 0 GROUP BY 1
            ), ndt AS (
                SELECT count(*) AS ndt FROM marked WHERE doc_id % 2 = 0
            ), probs AS MATERIALIZED (
                SELECT c.lang, c.gram,
                       ln((c.c + 1) * 1.0
                          / (nl.n_lang + (SELECT v FROM v))) AS logp
                FROM counts c JOIN nl USING (lang)
            ), stats AS MATERIALIZED (
                SELECT nd.lang,
                       ln(nd.nd * 1.0 / (SELECT ndt FROM ndt)) AS log_prior,
                       ln(1.0 / (nl.n_lang + (SELECT v FROM v)))
                           AS log_fallback
                FROM nd JOIN nl USING (lang)
            ), dg AS MATERIALIZED (
                SELECT doc_id, substring(s, i, 3) AS gram
                FROM marked, unnest(range(1, len(s) - 1)) AS u(i)
                WHERE doc_id % 2 = 1
            ), tot AS MATERIALIZED (
                SELECT doc_id, count(*) AS n_grams FROM dg GROUP BY 1
            ), mat AS MATERIALIZED (
                SELECT dg.doc_id, p.lang, sum(p.logp) AS m_sum,
                       count(*) AS m_cnt
                FROM dg JOIN probs p USING (gram) GROUP BY 1, 2
            ), scored AS MATERIALIZED (
                SELECT b.doc_id, s.lang,
                       s.log_prior + coalesce(m.m_sum, 0.0)
                       + (coalesce(t.n_grams, 0) - coalesce(m.m_cnt, 0))
                         * s.log_fallback AS score
                FROM (SELECT DISTINCT doc_id FROM marked
                      WHERE doc_id % 2 = 1) b
                CROSS JOIN stats s
                LEFT JOIN tot t ON t.doc_id = b.doc_id
                LEFT JOIN mat m ON m.doc_id = b.doc_id AND m.lang = s.lang
            )
            SELECT doc_id, lang AS lang_pred, round(score, 6) AS score
            FROM (SELECT *, row_number() OVER (
                      PARTITION BY doc_id
                      ORDER BY round(score, 9) DESC, lang) AS r
                  FROM scored)
            WHERE r = 1
        """,
        "wet_export_roundtrip": """
            SELECT 'https://' || source || '/doc/' || doc_id AS url,
                   doc_id AS ts_sec,
                   sha256(text) AS text_sha256,
                   CAST(length(text) AS BIGINT) AS n_chars
            FROM documents
        """,
        "sitemap_url_inventory": """
            SELECT 'https://' || source || '/sitemap.xml' AS sitemap_url,
                   count(*) AS n_urls,
                   min('2024-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR),
                                          2, '0')) AS first_mod,
                   max('2024-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR),
                                          2, '0')) AS last_mod,
                   round(avg(CAST('0.' || (doc_id % 10) AS DOUBLE)), 6)
                       AS avg_priority
            FROM documents GROUP BY source
        """,
        "zorder_events": """
            WITH z AS (
                SELECT ((((((event_id % 256) & 255) >> 0) & 1) << 0) | (((((user_id % 256) & 255) >> 0) & 1) << 1) | (((((event_id % 256) & 255) >> 1) & 1) << 2) | (((((user_id % 256) & 255) >> 1) & 1) << 3) | (((((event_id % 256) & 255) >> 2) & 1) << 4) | (((((user_id % 256) & 255) >> 2) & 1) << 5) | (((((event_id % 256) & 255) >> 3) & 1) << 6) | (((((user_id % 256) & 255) >> 3) & 1) << 7) | (((((event_id % 256) & 255) >> 4) & 1) << 8) | (((((user_id % 256) & 255) >> 4) & 1) << 9) | (((((event_id % 256) & 255) >> 5) & 1) << 10) | (((((user_id % 256) & 255) >> 5) & 1) << 11) | (((((event_id % 256) & 255) >> 6) & 1) << 12) | (((((user_id % 256) & 255) >> 6) & 1) << 13) | (((((event_id % 256) & 255) >> 7) & 1) << 14) | (((((user_id % 256) & 255) >> 7) & 1) << 15)) AS zv
                FROM events
            )
            SELECT zv >> 10 AS z_bucket, count(*) AS n_events,
                   min(zv) AS z_min, max(zv) AS z_max
            FROM z GROUP BY 1
        """,
        "anchor_topk_profiles": """
            WITH d AS (
                SELECT doc_id, source, lang,
                       'https://' || source || '/doc/' || doc_id AS src
                FROM documents
            ), l AS (
                SELECT src,
                       'https://' || source || '/doc/' || (doc_id + 1)
                           AS dst, 'next' AS anchor FROM d
                UNION ALL SELECT src, 'https://hub.example/cat/' || lang,
                       'cat ' || lang FROM d
                UNION ALL SELECT src, 'https://hub.example/cat/' || lang,
                       'category' FROM d
            ), pa AS (
                SELECT dst, anchor, count(*) AS n FROM l GROUP BY 1, 2
            ), tk AS (
                SELECT dst, anchor,
                       row_number() OVER (PARTITION BY dst
                                          ORDER BY n DESC, anchor) AS rank
                FROM pa
            ), tot AS (
                SELECT dst, count(*) AS n_links,
                       CAST(count(DISTINCT src) AS BIGINT) AS n_src
                FROM l GROUP BY 1
            )
            SELECT t.dst, tot.n_links, tot.n_src,
                   CAST(t.rank AS INT) AS rank, t.anchor
            FROM tk t JOIN tot USING (dst) WHERE t.rank <= 2
        """,
        "frontier_seed_list": """
            WITH u AS (
                SELECT source,
                       CASE CAST(doc_id % 5 AS INT)
                           WHEN 0 THEN '/public/' || doc_id
                           WHEN 1 THEN '/private/' || doc_id
                           WHEN 2 THEN '/private/ok/' || doc_id
                           WHEN 3 THEN '/tmp/' || doc_id
                           ELSE '/' END AS path
                FROM documents
            )
            SELECT source AS host, count(*) AS n_seeds,
                   CAST(sum(CASE WHEN path LIKE '/private/ok%' THEN 1
                                 WHEN path LIKE '/private%' THEN 0
                                 WHEN path LIKE '/tmp/%' THEN 0
                                 ELSE 1 END) AS BIGINT) AS n_allowed
            FROM u GROUP BY source
        """,








        # type map joined on subj and (URI-only) obj, kind CASE replayed
        "schema_profile": """
            WITH base AS (SELECT doc_id, n_chars FROM documents),
            types AS (
                SELECT DISTINCT 'ent:' || doc_id AS node,
                       'c:' || (doc_id % 3) AS cls
                FROM base
            ),
            props AS (
                SELECT 'ent:' || doc_id AS subj, 'p:cites' AS pred,
                       'ent:' || (doc_id - doc_id % 10) AS obj,
                       TRUE AS u, CAST(NULL AS VARCHAR) AS dt
                FROM base
                UNION ALL
                SELECT 'ent:' || doc_id, 'p:ext',
                       'ext:' || (doc_id % 5), TRUE, NULL
                FROM base
                UNION ALL
                SELECT 'ent:' || doc_id, 'p:label',
                       'Doc ' || doc_id, FALSE, NULL
                FROM base
                UNION ALL
                SELECT 'ent:' || doc_id, 'p:nchars',
                       CAST(n_chars AS VARCHAR), FALSE, 'xsd:integer'
                FROM base
            ),
            j AS (
                SELECT s.cls AS subj_class, p.pred,
                       CASE WHEN p.u AND o.cls IS NOT NULL THEN o.cls
                            WHEN p.u THEN '@IRI'
                            WHEN p.dt IS NOT NULL THEN p.dt
                            ELSE '@Literal' END AS obj_kind,
                       p.subj, p.obj
                FROM props p
                LEFT JOIN types s ON p.subj = s.node
                LEFT JOIN types o ON p.obj = o.node AND p.u
            )
            SELECT subj_class, pred, obj_kind,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(count(DISTINCT subj) AS BIGINT) AS n_subj,
                   CAST(count(DISTINCT obj) AS BIGINT) AS n_obj
            FROM j GROUP BY subj_class, pred, obj_kind
        """,
        # R2RML mapping replayed as UNION ALL selects; rdf:type row per
        # entity, NULL columns emit nothing
        "r2rml_nation_triples": """
            WITH n AS (SELECT * FROM nation), r AS (SELECT * FROM region),
            t AS (
                SELECT 'ent:nation/' || n_nationkey AS subj,
                       'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
                           AS pred,
                       'c:Nation' AS obj, TRUE AS obj_is_uri,
                       CAST(NULL AS VARCHAR) AS obj_lang,
                       CAST(NULL AS VARCHAR) AS obj_dtype,
                       'tbl:nation' AS src_url
                FROM n
                UNION ALL
                SELECT 'ent:nation/' || n_nationkey, 'p:name',
                       n_name, FALSE, 'en', NULL, 'tbl:nation'
                FROM n WHERE n_name IS NOT NULL
                UNION ALL
                SELECT 'ent:nation/' || n_nationkey, 'p:region',
                       'ent:region/' || n_regionkey, TRUE, NULL, NULL,
                       'tbl:nation'
                FROM n WHERE n_regionkey IS NOT NULL
                UNION ALL
                SELECT 'ent:nation/' || n_nationkey, 'p:key',
                       CAST(n_nationkey AS VARCHAR), FALSE, NULL,
                       'http://www.w3.org/2001/XMLSchema#integer',
                       'tbl:nation'
                FROM n
                UNION ALL
                SELECT 'ent:region/' || r_regionkey,
                       'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
                       'c:Region', TRUE, NULL, NULL, 'tbl:region'
                FROM r
                UNION ALL
                SELECT 'ent:region/' || r_regionkey, 'p:name',
                       r_name, FALSE, NULL, NULL, 'tbl:region'
                FROM r WHERE r_name IS NOT NULL
            )
            SELECT * FROM t
        """,
        # chain walk as a bounded recursive CTE; a loop = the max-hop row
        # still has an outgoing edge at the cap
        "redirect_resolution": """
            WITH RECURSIVE e0 AS (
                SELECT 'u:' || doc_id AS src, 'u:' || (doc_id + 1) AS dst
                FROM documents WHERE doc_id % 10 < 3
                UNION ALL
                SELECT 'loop:' || doc_id || ':x', 'loop:' || doc_id || ':y'
                FROM documents WHERE doc_id % 50 = 0
                UNION ALL
                SELECT 'loop:' || doc_id || ':y', 'loop:' || doc_id || ':x'
                FROM documents WHERE doc_id % 50 = 0
            ),
            e AS (
                SELECT src, min(dst) AS dst FROM e0
                WHERE src <> dst GROUP BY src
            ),
            walk(url, cur, hops) AS (
                SELECT src, dst, 1 FROM e
                UNION ALL
                SELECT w.url, e.dst, w.hops + 1
                FROM walk w JOIN e ON w.cur = e.src
                WHERE w.hops < 64
            ),
            last AS (
                SELECT url, cur, hops,
                       row_number() OVER (
                           PARTITION BY url ORDER BY hops DESC
                       ) AS rn
                FROM walk
            )
            SELECT l.url,
                   CASE WHEN t.src IS NULL THEN l.cur END AS final_url,
                   CAST(CASE WHEN t.src IS NULL THEN l.hops END AS INT)
                       AS n_hops,
                   (t.src IS NOT NULL) AS is_cycle
            FROM last l LEFT JOIN e t ON l.cur = t.src
            WHERE l.rn = 1
        """,
        # incremental result must equal the one-shot closure over the
        # full edge history (old ∪ new), recursive-CTE replay
        "incremental_components": """
            WITH RECURSIVE e0 AS (
                SELECT doc_id AS a, doc_id - doc_id % 4 AS b
                FROM documents
                UNION ALL
                SELECT doc_id, doc_id + 4 FROM documents
                WHERE doc_id % 20 = 0
            ),
            e1 AS (SELECT a, b FROM e0 WHERE a <> b),
            und AS (SELECT a, b FROM e1 UNION SELECT b, a FROM e1),
            reach(n, m) AS (
                SELECT DISTINCT a, a FROM und
                UNION
                SELECT r.n, u.b FROM reach r JOIN und u ON r.m = u.a
            )
            SELECT n AS node, min(m) AS comp FROM reach GROUP BY n
        """,
        # NT lines rebuilt from scratch: escape chain \ -> \\ first, then
        # " LF CR TAB; literal term + optional @lang / ^^<dtype> suffix
        "ntriples_roundtrip": """
            WITH esc AS (
                SELECT doc_id,
                       replace(replace(replace(replace(replace(
                           'Q"\\ ' || text,
                           '\\', '\\\\'), '"', '\\"'),
                           chr(10), '\\n'), chr(13), '\\r'),
                           chr(9), '\\t') AS etext,
                       lang, n_chars
                FROM documents
            ),
            rows_ AS (
                SELECT 'ent:' || doc_id AS subj, 'p:text' AS pred,
                       'Q"\\ ' || text AS obj, FALSE AS obj_is_uri,
                       CAST(NULL AS VARCHAR) AS obj_lang,
                       CAST(NULL AS VARCHAR) AS obj_dtype,
                       '"' || e.etext || '"' AS obj_term
                FROM documents d JOIN esc e USING (doc_id)
                UNION ALL
                SELECT 'ent:' || doc_id, 'p:label', 'L-' || lang, FALSE,
                       lang, CAST(NULL AS VARCHAR),
                       '"L-' || lang || '"@' || lang
                FROM documents
                UNION ALL
                SELECT 'ent:' || doc_id, 'p:nchars',
                       CAST(n_chars AS VARCHAR), FALSE,
                       CAST(NULL AS VARCHAR),
                       'http://www.w3.org/2001/XMLSchema#integer',
                       '"' || n_chars
                       || '"^^<http://www.w3.org/2001/XMLSchema#integer>'
                FROM documents
                UNION ALL
                SELECT 'ent:' || doc_id, 'p:cites',
                       'ent:' || ((doc_id * 7 + 3) % 1000), TRUE,
                       CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
                       '<ent:' || ((doc_id * 7 + 3) % 1000) || '>'
                FROM documents
            )
            SELECT subj, pred, obj, obj_is_uri, obj_lang, obj_dtype,
                   '<' || subj || '> <' || pred || '> ' || obj_term || ' .'
                       AS line
            FROM rows_
        """,
        # each triangle counted once via the canonical a<b<c 3-way join
        "triangle_hosts": """
            WITH e0 AS (
                SELECT doc_id % 60 AS a, (doc_id * 7 + 3) % 60 AS b
                FROM documents
            ),
            e1 AS (SELECT a, b FROM e0 WHERE a <> b),
            und AS (SELECT a, b FROM e1 UNION SELECT b, a FROM e1),
            canon AS (SELECT a, b FROM und WHERE a < b),
            tri AS (
                SELECT t1.a AS x, t1.b AS y, t2.b AS z
                FROM canon t1
                JOIN canon t2 ON t2.a = t1.b
                JOIN canon t3 ON t3.a = t1.a AND t3.b = t2.b
            ),
            nodes AS (SELECT DISTINCT a AS node FROM und),
            pn AS (
                SELECT node, count(*) AS c FROM (
                    SELECT x AS node FROM tri
                    UNION ALL SELECT y FROM tri
                    UNION ALL SELECT z FROM tri
                ) GROUP BY node
            )
            SELECT n.node, CAST(coalesce(pn.c, 0) AS BIGINT) AS n_triangles
            FROM nodes n LEFT JOIN pn USING (node)
        """,
        # lag change-filter + lead/row_number replayed over the same
        # (ts, value) ordering; DISTINCT = the operator's idempotent
        # duplicate-observation collapse
        "fact_versions_events": """
            WITH obs AS (
                SELECT DISTINCT user_id, event_type AS value, ts
                FROM events
            ),
            w1 AS (
                SELECT user_id, value, ts,
                       lag(value) OVER (
                           PARTITION BY user_id ORDER BY ts, value
                       ) AS prev
                FROM obs
            ),
            ch AS (
                SELECT user_id, value, ts FROM w1
                WHERE prev IS NULL OR value <> prev
            )
            SELECT 'user:' || user_id AS subj,
                   'p:status' AS pred,
                   value,
                   ts AS valid_from,
                   lead(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, value
                   ) AS valid_to,
                   CAST(row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, value
                   ) AS INT) AS version,
                   (lead(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, value
                   ) IS NULL) AS is_current
            FROM ch
        """,
        # SHACL-lite violations enumerated per planted-defect class with
        # the same modular arithmetic the Spark side synthesizes with
        "shacl_violations": """
            WITH base AS (SELECT doc_id FROM documents)
            SELECT 'ent:' || doc_id AS focus,
                   'DocShape-title' AS shape,
                   'minCount' AS constraint, '0' AS value
            FROM base WHERE doc_id % 7 = 0 AND doc_id % 11 <> 0
            UNION ALL
            SELECT 'ent:' || doc_id, 'DocShape-title', 'maxCount', '2'
            FROM base WHERE doc_id % 7 <> 0 AND doc_id % 11 = 0
            UNION ALL
            SELECT 'ent:' || doc_id, 'DocShape-title', 'nodeKind',
                   'Title ' || doc_id
            FROM base WHERE doc_id % 7 <> 0 AND doc_id % 17 = 0
            UNION ALL
            SELECT 'ent:' || doc_id, 'DocShape-issued', 'datatype',
                   '2026-01-01'
            FROM base WHERE doc_id % 13 = 0
            UNION ALL
            SELECT 'ent:' || doc_id, 'DocShape-code', 'pattern',
                   'abc-' || doc_id
            FROM base WHERE doc_id % 3 = 0
        """,
        # KMV sketch replayed: k-th smallest md5-60bit hash via
        # row_number, identical double arithmetic for the estimator
        "kmv_distinct": """
            WITH v AS (
                SELECT source, CAST(doc_id % 4096 AS VARCHAR) AS val
                FROM documents
            ),
            h AS (
                SELECT DISTINCT source,
                       try_cast(('0x' || substr(md5(val), 1, 15)) AS BIGINT)
                           AS hh
                FROM v
            ),
            r AS (
                SELECT source, hh,
                       row_number() OVER (
                           PARTITION BY source ORDER BY hh
                       ) AS rn,
                       count(*) OVER (PARTITION BY source) AS nd
                FROM h
            ),
            agg AS (
                SELECT source,
                       CAST(least(max(nd), 128) AS INT) AS sketch_size,
                       max(CASE WHEN rn = 128 THEN hh END) AS kth,
                       max(nd) AS nd
                FROM r GROUP BY source
            ),
            ex AS (
                SELECT source, count(DISTINCT val) AS n_exact FROM v
                GROUP BY source
            )
            SELECT a.source, a.sketch_size,
                   CASE WHEN a.nd < 128 THEN CAST(a.nd AS DOUBLE)
                        ELSE (127.0 * 1152921504606846976.0)
                             / CAST(a.kth AS DOUBLE) END AS est_distinct,
                   e.n_exact
            FROM agg a JOIN ex e USING (source)
        """,
        # per-host frequent-line removal replayed with unnest+subscripts,
        # doc-frequency over trimmed lines, ORDER BY pos reassembly
        "hostline_boilerplate": """
            WITH aug AS (
                SELECT doc_id, source,
                       'NAV ' || source || chr(10) || text || chr(10)
                       || 'Copyright ' || source AS text
                FROM documents
            ),
            sp AS (
                SELECT doc_id, source,
                       string_split(text, chr(10)) AS parts
                FROM aug
            ),
            lines AS (
                SELECT doc_id, source,
                       unnest(parts) AS line,
                       generate_subscripts(parts, 1) AS pos
                FROM sp
            ),
            freq AS (
                SELECT source, trim(line) AS key,
                       count(DISTINCT doc_id) AS df
                FROM lines WHERE trim(line) <> ''
                GROUP BY source, trim(line)
            ),
            hd AS (
                SELECT source, count(DISTINCT doc_id) AS n_docs
                FROM aug GROUP BY source
            ),
            drops AS (
                SELECT f.source, f.key
                FROM freq f JOIN hd USING (source)
                WHERE f.df >= 5 AND f.df >= hd.n_docs * 0.01
            ),
            marked AS (
                SELECT l.doc_id, l.source, l.line, l.pos,
                       (trim(l.line) <> '' AND d.key IS NOT NULL) AS removed
                FROM lines l
                LEFT JOIN drops d
                  ON l.source = d.source AND trim(l.line) = d.key
            )
            SELECT doc_id, source,
                   coalesce(string_agg(
                       CASE WHEN NOT removed THEN line END,
                       chr(10) ORDER BY pos), '') AS clean_text,
                   CAST(count(*) AS INT) AS n_lines,
                   CAST(sum(CASE WHEN removed THEN 1 ELSE 0 END) AS INT)
                       AS n_removed
            FROM marked GROUP BY doc_id, source
        """,
        # RDFS entailment replayed rule-by-rule: subclass closure as a
        # recursive CTE, property inheritance / inherited-domain-range /
        # type-inheritance as joins, min-provenance dedup via QUALIFY,
        # asserted facts anti-joined out (all on non-null cols here)
        "rdfs_inference": """
            WITH RECURSIVE base AS (SELECT doc_id FROM documents),
            sc(sub, sup) AS (
                VALUES ('c:0','c:1'), ('c:1','c:2'), ('c:Doc','c:Thing')
            ),
            scc(sub, sup) AS (
                SELECT sub, sup FROM sc
                UNION
                SELECT s.sub, t.sup FROM scc s JOIN sc t
                ON s.sup = t.sub AND s.sub <> t.sup
            ),
            spc(sub, sup) AS (
                VALUES ('p:cites','p:related'), ('p:label','p:note')
            ),
            dm(p, cls) AS (VALUES ('p:related','c:Doc')),
            rg(p, cls) AS (VALUES ('p:related','c:Doc')),
            idom AS (
                SELECT p, cls FROM dm
                UNION SELECT s.sub, d.cls FROM spc s JOIN dm d ON s.sup = d.p
            ),
            irng AS (
                SELECT p, cls FROM rg
                UNION SELECT s.sub, d.cls FROM spc s JOIN rg d ON s.sup = d.p
            ),
            facts AS (
                SELECT 'ent:' || doc_id AS subj, 'p:cites' AS pred,
                       'ent:' || (doc_id - doc_id % 10) AS obj,
                       TRUE AS obj_is_uri,
                       'u:' || doc_id AS src_url,
                       CAST(doc_id % 8 AS INT) AS part_key
                FROM base
                UNION ALL
                SELECT 'ent:' || doc_id, 'p:label', 'Doc ' || doc_id,
                       FALSE, 'u:' || doc_id, CAST(doc_id % 8 AS INT)
                FROM base
            ),
            atypes AS (
                SELECT 'ent:' || doc_id AS subj,
                       'c:' || (doc_id % 3) AS obj,
                       'u:' || doc_id AS src_url,
                       CAST(doc_id % 8 AS INT) AS part_key
                FROM base
            ),
            prop_sup AS (
                SELECT f.subj, s.sup AS pred, f.obj, f.obj_is_uri,
                       f.src_url, f.part_key
                FROM facts f JOIN spc s ON f.pred = s.sub
            ),
            prop_all AS (
                SELECT * FROM facts UNION ALL SELECT * FROM prop_sup
            ),
            dom_types AS (
                SELECT p.subj, d.cls AS obj, p.src_url, p.part_key
                FROM prop_all p JOIN idom d ON p.pred = d.p
            ),
            rng_types AS (
                SELECT p.obj AS subj, d.cls AS obj, p.src_url, p.part_key
                FROM prop_all p JOIN irng d ON p.pred = d.p
                WHERE p.obj_is_uri
            ),
            all_types AS (
                SELECT subj, obj, src_url, part_key FROM atypes
                UNION ALL SELECT * FROM dom_types
                UNION ALL SELECT * FROM rng_types
            ),
            super_types AS (
                SELECT t.subj, c.sup AS obj, t.src_url, t.part_key
                FROM all_types t JOIN scc c ON t.obj = c.sub
            ),
            rdf_type AS (
                SELECT 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS u
            ),
            inferred AS (
                SELECT subj, pred, obj, obj_is_uri, src_url, part_key
                FROM prop_sup
                UNION ALL
                SELECT subj, (SELECT u FROM rdf_type), obj, TRUE,
                       src_url, part_key FROM dom_types
                UNION ALL
                SELECT subj, (SELECT u FROM rdf_type), obj, TRUE,
                       src_url, part_key FROM rng_types
                UNION ALL
                SELECT subj, (SELECT u FROM rdf_type), obj, TRUE,
                       src_url, part_key FROM super_types
                UNION ALL
                SELECT sub, 'http://www.w3.org/2000/01/rdf-schema#subClassOf',
                       sup, TRUE, CAST(NULL AS VARCHAR), CAST(NULL AS INT)
                FROM scc
                UNION ALL
                SELECT sub, 'http://www.w3.org/2000/01/rdf-schema#subPropertyOf',
                       sup, TRUE, CAST(NULL AS VARCHAR), CAST(NULL AS INT)
                FROM spc
            ),
            asserted AS (
                SELECT subj, pred, obj, obj_is_uri FROM facts
                UNION ALL
                SELECT subj, (SELECT u FROM rdf_type), obj, TRUE FROM atypes
                UNION ALL
                SELECT sub, 'http://www.w3.org/2000/01/rdf-schema#subClassOf',
                       sup, TRUE FROM sc
                UNION ALL
                SELECT sub, 'http://www.w3.org/2000/01/rdf-schema#subPropertyOf',
                       sup, TRUE FROM spc
            ),
            deduped AS (
                SELECT subj, pred, obj, obj_is_uri,
                       CAST(NULL AS VARCHAR) AS obj_lang,
                       CAST(NULL AS VARCHAR) AS obj_dtype,
                       src_url, part_key
                FROM inferred
                QUALIFY row_number() OVER (
                    PARTITION BY subj, pred, obj, obj_is_uri
                    ORDER BY src_url NULLS FIRST, part_key NULLS FIRST
                ) = 1
            )
            SELECT d.* FROM deduped d
            WHERE NOT EXISTS (
                SELECT 1 FROM asserted a
                WHERE a.subj = d.subj AND a.pred = d.pred
                  AND a.obj = d.obj AND a.obj_is_uri = d.obj_is_uri
            )
        """,
        # owl:sameAs closure as a recursive CTE (same idiom as
        # dedup_components), rewrite via left joins, merge-dedup keeping
        # min (src_url, part_key) via QUALIFY — mirrors the Spark
        # struct-min exactly (no NULL provenance here)
        "sameas_canonical": """
            WITH RECURSIVE base AS (SELECT doc_id, lang FROM documents),
            same_edges AS (
                SELECT 'ent:' || doc_id AS a,
                       'ent:' || (doc_id - doc_id % 4) AS b
                FROM base WHERE doc_id % 4 <> 0
            ),
            und AS (
                SELECT a, b FROM same_edges
                UNION SELECT b, a FROM same_edges
            ),
            reach(n, m) AS (
                SELECT DISTINCT a, a FROM und
                UNION
                SELECT r.n, u.b FROM reach r JOIN und u ON r.m = u.a
            ),
            cls AS (SELECT n AS node, min(m) AS canonical FROM reach GROUP BY n),
            facts AS (
                SELECT 'ent:' || doc_id AS subj, 'p:lang' AS pred,
                       lang AS obj, FALSE AS obj_is_uri, lang AS obj_lang,
                       CAST(NULL AS VARCHAR) AS obj_dtype,
                       'u:' || doc_id AS src_url,
                       CAST(doc_id % 8 AS INT) AS part_key
                FROM base
                UNION ALL
                SELECT 'ent:' || doc_id, 'p:cites',
                       'ent:' || (doc_id - doc_id % 10), TRUE,
                       CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
                       'u:' || doc_id, CAST(doc_id % 8 AS INT)
                FROM base
            ),
            rew AS (
                SELECT coalesce(s.canonical, f.subj) AS subj, f.pred,
                       CASE WHEN f.obj_is_uri
                            THEN coalesce(o.canonical, f.obj)
                            ELSE f.obj END AS obj,
                       f.obj_is_uri, f.obj_lang, f.obj_dtype,
                       f.src_url, f.part_key
                FROM facts f
                LEFT JOIN cls s ON f.subj = s.node
                LEFT JOIN cls o ON f.obj = o.node
            )
            SELECT subj, pred, obj, obj_is_uri, obj_lang, obj_dtype,
                   src_url, part_key
            FROM rew
            QUALIFY row_number() OVER (
                PARTITION BY subj, pred, obj, obj_is_uri, obj_lang, obj_dtype
                ORDER BY src_url, part_key
            ) = 1
        """,
        # snapshot v1 == first half of documents by construction
        "snapshot_time_travel": """
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   max(doc_id) AS max_doc_id
            FROM documents
            WHERE doc_id < (SELECT count(*) // 2 FROM documents)
            GROUP BY lang
        """,
        # DuckDB native ASOF LEFT JOIN, purchases pre-deduped per (user,ts)
        # to the largest event_id (the operator's tie rule)
        "asof_purchase_attribution": """
            WITH clicks AS (
                SELECT event_id, user_id, ts FROM events
                WHERE event_type = 'click'
            ), p0 AS (
                SELECT user_id, ts, value, event_id,
                       row_number() OVER (
                           PARTITION BY user_id, ts ORDER BY event_id DESC
                       ) AS rn
                FROM events WHERE event_type = 'purchase'
            ), purch AS (
                SELECT user_id, ts, value, event_id FROM p0 WHERE rn = 1
            )
            SELECT c.event_id, c.user_id, c.ts,
                   p.ts AS purchase_ts,
                   p.event_id AS purchase_id,
                   p.value AS purchase_value
            FROM clicks c ASOF LEFT JOIN purch p
              ON c.user_id = p.user_id AND c.ts >= p.ts
        """,
        # greedy per-lang prefix under a token budget, md5 order (same
        # token estimator as pack_training_shards)
        "token_budget_mix": """
            WITH t AS (
                SELECT lang, doc_id,
                       CAST(CASE WHEN len(trim(text)) = 0 THEN 0
                            ELSE len(regexp_split_to_array(trim(text), '\\s+'))
                            END AS BIGINT) AS n_tokens
                FROM documents
            ), o AS (
                SELECT lang, doc_id, n_tokens,
                       sum(n_tokens) OVER (
                           PARTITION BY lang
                           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                           ROWS UNBOUNDED PRECEDING
                       ) - n_tokens AS start_offset
                FROM t
            )
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
                   CAST(max(start_offset) AS BIGINT) AS max_start
            FROM o WHERE start_offset < 6000 GROUP BY lang
        """,
        # plain BETWEEN range join on the identical generated window
        # table, integer-microsecond comparisons
        "range_window_events": """
            WITH wins AS (
                SELECT k AS win_id,
                       (1704067200 + k * 21600 + (k % 5) * 780)
                           * 1000000 AS w_start,
                       (1704067200 + k * 21600 + (k % 5) * 780
                        + 1800 + (k % 7) * 1200) * 1000000 AS w_end
                FROM generate_series(0, 119) AS t(k)
            )
            SELECT w.win_id,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE)
                       AS sum_value
            FROM events e JOIN wins w
              ON epoch_us(e.ts) >= w.w_start AND epoch_us(e.ts) < w.w_end
            GROUP BY w.win_id
        """,
        # identical lag+cumsum sessionization, integer-microsecond gap
        "event_sessions": """
            WITH o AS (
                SELECT user_id, event_id, ts,
                       CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                                 OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                                    > 1800 * 1000000
                            THEN 1 ELSE 0 END AS is_new
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
                SELECT user_id, ts,
                       sum(is_new) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING
                       ) - 1 AS session_id
                FROM o
            )
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   CAST(count(*) AS BIGINT) AS n_events,
                   min(ts) AS first_ts, max(ts) AS last_ts
            FROM s GROUP BY user_id, session_id
        """,
        # fixed prefix rules → precedence is a CASE: /private/ok allows
        # (longest), else /private and /tmp/ block, else allow
        "robots_filtering": """
            WITH u AS (
                SELECT doc_id, source,
                       CASE CAST(doc_id % 5 AS INT)
                           WHEN 0 THEN '/public/' || doc_id
                           WHEN 1 THEN '/private/' || doc_id
                           WHEN 2 THEN '/private/ok/' || doc_id
                           WHEN 3 THEN '/tmp/' || doc_id
                           ELSE '/' END AS path
                FROM documents
            ), v AS (
                SELECT source,
                       CASE WHEN path LIKE '/private/ok%' THEN 1
                            WHEN path LIKE '/private%' THEN 0
                            WHEN path LIKE '/tmp/%' THEN 0
                            ELSE 1 END AS allowed
                FROM u
            )
            SELECT source,
                   CAST(sum(allowed) AS BIGINT) AS n_allowed,
                   CAST(sum(1 - allowed) AS BIGINT) AS n_blocked
            FROM v GROUP BY source
        """,
        # fixed page template → the expected graph is 10 triples per doc,
        # reconstructed column-by-column (blank node _:b0 is doc-local)
        "structured_data_triples": """
            WITH d AS (
                SELECT doc_id, source, lang, n_chars,
                       'https://' || source || '/doc/' || doc_id AS doc_uri,
                       'https://' || source || '/page/' || doc_id AS page_uri
                FROM documents
            ), rdf AS (
                SELECT 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type'
                       AS t
            )
            SELECT doc_uri AS src, doc_uri AS subj,
                   (SELECT t FROM rdf) AS pred,
                   'https://schema.org/Article' AS obj FROM d
            UNION ALL SELECT doc_uri, doc_uri, 'https://schema.org/name',
                   'Doc ' || doc_id FROM d
            UNION ALL SELECT doc_uri, doc_uri,
                   'https://schema.org/inLanguage', lang FROM d
            UNION ALL SELECT doc_uri, doc_uri,
                   'https://schema.org/wordCount',
                   CAST(n_chars AS VARCHAR) FROM d
            UNION ALL SELECT doc_uri, doc_uri,
                   'https://schema.org/author', '_:b0' FROM d
            UNION ALL SELECT doc_uri, '_:b0', (SELECT t FROM rdf),
                   'https://schema.org/Person' FROM d
            UNION ALL SELECT doc_uri, '_:b0', 'https://schema.org/name',
                   'Author ' || (doc_id % 7) FROM d
            UNION ALL SELECT doc_uri, page_uri, (SELECT t FROM rdf),
                   'https://schema.org/WebPage' FROM d
            UNION ALL SELECT doc_uri, page_uri, 'https://schema.org/name',
                   'Page ' || doc_id FROM d
            UNION ALL SELECT doc_uri, page_uri, 'https://schema.org/url',
                   doc_uri FROM d
        """,
        # three kept links per doc (next / hub-nofollow / defragged self);
        # javascript:/mailto: links are dropped by the scheme filter
        "outlink_anchor_graph": """
            WITH d AS (
                SELECT doc_id, source, lang,
                       'https://' || source || '/doc/' || doc_id AS src
                FROM documents
            ), l AS (
                SELECT src,
                       'https://' || source || '/doc/' || (doc_id + 1)
                           AS dst,
                       'next ' || (doc_id + 1) AS anchor, 0 AS nofollow
                FROM d
                UNION ALL SELECT src, 'https://hub.example/cat/' || lang,
                       'cat ' || lang, 1 FROM d
                UNION ALL SELECT src, src, 'self', 0 FROM d
            )
            SELECT dst, count(*) AS n_links,
                   CAST(sum(nofollow) AS BIGINT) AS n_nofollow,
                   CAST(count(DISTINCT src) AS BIGINT) AS n_src,
                   min(anchor) AS min_anchor
            FROM l GROUP BY dst
        """,
        # same token definition as text_quality (trim + \s+ split, empty
        # fragments filtered); 3-grams via list slicing; FALSE AND NULL
        # = FALSE keeps zero-gram docs unflagged in both engines
        "decontam_overlap": """
            WITH tok AS (
                SELECT doc_id,
                       list_filter(
                           string_split_regex(trim(lower(text)), '\\s+'),
                           t -> t != '') AS toks
                FROM documents
            ), g AS (
                SELECT doc_id,
                       unnest(list_transform(
                           range(1, greatest(len(toks) - 1, 1)),
                           i -> array_to_string(toks[i:i+2], ' '))) AS gram
                FROM tok
            ), dg AS (
                SELECT DISTINCT doc_id, gram FROM g
            ), ev AS (
                SELECT DISTINCT gram FROM dg WHERE doc_id % 17 = 0
            ), tot AS (
                SELECT doc_id, count(*) AS n_grams FROM dg GROUP BY doc_id
            ), mat AS (
                SELECT dg.doc_id, count(*) AS n_matched
                FROM dg JOIN ev USING (gram) GROUP BY dg.doc_id
            )
            SELECT d.doc_id,
                   CAST(coalesce(tot.n_grams, 0) AS BIGINT) AS n_grams,
                   CAST(coalesce(mat.n_matched, 0) AS BIGINT) AS n_matched,
                   (coalesce(mat.n_matched, 0) >= 1
                    AND coalesce(mat.n_matched, 0) * 1.0 / tot.n_grams
                        >= 0.25) AS contaminated
            FROM documents d
            LEFT JOIN tot USING (doc_id) LEFT JOIN mat USING (doc_id)
        """,
        "bfs_seed_distances": _bfs_oracle(),
        "lpa_communities": _lpa_oracle(),
        "kcore_survivors": _kcore_oracle(),
        "adamic_adar_links": _AA_ORACLE.format(g=_hash_graph_sql("aa")),
        "wl_structural_colors": _wl_oracle(),
        "snapshot_diff_triples": _SNAPDIFF_ORACLE,
        "taxonomy_rollup_docs": _TAXONOMY_ORACLE,
        "fulltext_bm25": _BM25_ORACLE,
        "nquads_roundtrip": _NQUADS_ORACLE,
        "prov_lineage_triples": _PROV_ORACLE,
        "dict_encode_triples": _DICTENC_ORACLE,
        "weighted_sample_mix": _WSAMPLE_ORACLE,
        "cms_frequencies": _CMS_ORACLE,
        "hist_quantiles_chars": _HIST_ORACLE,
        "key_skew_profile": _SKEW_ORACLE,
        "owl_property_closure": _owl_oracle(),
        "owl_functional_conflicts": _OWLFUN_ORACLE,
        "rdf_list_flatten": _RDFLIST_ORACLE,
        "crawl_schedule": _SCHEDULE_ORACLE,
        "skolemized_triples": _SKOLEM_ORACLE,
        "kg_as_of_view": _ASOF_ORACLE,
        "entity_pmi_pairs": _PMI_ORACLE,
        "graph_random_walks": _walks_oracle(),
        "void_dataset_stats": _VOID_ORACLE,
        "negative_samples": _negsample_oracle(),
        "katz_centrality_hosts": _katz_oracle(),
        "degree_assortativity": _ASSORT_ORACLE,
        "turtle_serialize": _TURTLE_ORACLE,
        "anchor_alias_dict": _ANCHOR_DICT_ORACLE,
        "streaming_components": _STREAMING_COMPONENTS_ORACLE,
        "incremental_void": _INCREMENTAL_VOID_ORACLE,
        "fact_fusion": _FACT_FUSION_ORACLE,
        "fusion_source_trust": _FUSION_TRUST_ORACLE,
        "cocitation_pairs": _COCITATION_ORACLE,
        "bibcoupling_pairs": _BIBCOUPLING_ORACLE,
        "community_modularity": _MODULARITY_ORACLE,
        "url_template_mining": _URL_TEMPLATE_ORACLE,
        "betweenness_pivots": _BETWEENNESS_ORACLE,
        "host_report": _HOST_REPORT_ORACLE,
        "label_spreading": _LABEL_SPREAD_ORACLE,
        "dsir_weights": _DSIR_WEIGHTS_ORACLE,
        "dsir_resample": _DSIR_RESAMPLE_ORACLE,
        "ktruss_edges": _ktruss_oracle(),
        "pagerank_warm": _pagerank_warm_oracle(),
        "interval_coalesce": _INTERVAL_COALESCE_ORACLE,
        "vocab_alignment": _VOCAB_ALIGNMENT_ORACLE,
        "graph_summary_stats": _GRAPH_SUMMARY_ORACLE,
        "fusion_fold_state": _fusion_fold_oracle(),
        "streaming_fusion": _fusion_fold_oracle(),
        "entity_disambiguation": _DISAMBIG_ORACLE,
        "dedup_cluster_audit": _DEDUP_AUDIT_ORACLE,
        "feature_propagation": _FEATURE_PROP_ORACLE,
        "crawl_budget": _crawl_budget_oracle(),
    }
