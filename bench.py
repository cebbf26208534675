"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Headline set: the KG-construction pipeline (parse → link → triples — the
north_star workload, measured in docs/sec + triples/sec) plus the heaviest
oracle-backed relational/curation queries from __spark_entry__.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from ferenda_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# 20k docs ≈ the same wall as 4k (session + fixed costs dominate below
# this) but reports steady-state docs/sec rather than overhead-bound numbers
KG_DOCS = int(os.environ.get("SPARK_GRAFT_KG_DOCS", "20000"))

BENCH_QUERIES = [
    "tpch_q1ish",
    "tpch_q3ish",
    "toc_rollup_docs",
    "feed_topk_events",
    "precedence_latest",
    "annotations_agg",
    "dedup_exact_stats",
    "dedup_jaccard_pairs",
    "dedup_simhash",
    "embedding_topk",
    "text_quality",
    "lang_id_counts",
    "token_count_bpe",
    "sparql_docs",
    "sparql_groupby",
    "dedup_components",
    "fulltext_search",
    "atom_feeds",
    "chunk_dedup_stats",
    "pii_redact",
    # round-3 additions (each oracle-backed in __spark_entry__)
    "gopher_quality_stats",
    "pagerank_hosts",
    "asof_purchase_attribution",
    "range_window_events",
    "token_budget_mix",
    # round-3 webtext additions (each oracle-backed in __spark_entry__)
    "structured_data_triples",
    "outlink_anchor_graph",
    "decontam_overlap",
    "hits_hosts",
    "lm_perplexity",
    "main_content_extract",
    "robots_filtering",
    # round-3 KG-enrichment additions (each oracle-backed)
    "sameas_canonical",
    "rdfs_inference",
    "shacl_violations",
    "triangle_hosts",
    "fact_versions_events",
    "hostline_boilerplate",
    "kmv_distinct",
    "ntriples_roundtrip",
    "redirect_resolution",
    "incremental_components",
    # round-3 graph-analytics additions (each oracle-backed)
    "bfs_seed_distances",
    "lpa_communities",
    "kcore_survivors",
    "adamic_adar_links",
    "wl_structural_colors",
    "taxonomy_rollup_docs",
    "fulltext_bm25",
    "nquads_roundtrip",
    "prov_lineage_triples",
    "dict_encode_triples",
    "weighted_sample_mix",
    "cms_frequencies",
    "hist_quantiles_chars",
    "key_skew_profile",
    "owl_property_closure",
    "owl_functional_conflicts",
    "rdf_list_flatten",
    "crawl_schedule",
    "skolemized_triples",
    "kg_as_of_view",
    "entity_pmi_pairs",
    "graph_random_walks",
    "void_dataset_stats",
    "negative_samples",
    "katz_centrality_hosts",
    "degree_assortativity",
    "turtle_serialize",
    "anchor_alias_dict",
    # round-4 additions (each oracle-backed)
    "fact_fusion",
    "cocitation_pairs",
    "community_modularity",
    "url_template_mining",
    "betweenness_pivots",
    "host_report",
    "label_spreading",
    "dsir_weights",
    "ktruss_edges",
    "pagerank_warm",
    "interval_coalesce",
    "vocab_alignment",
    "graph_summary_stats",
    "fusion_fold_state",
    "entity_disambiguation",
    "dedup_cluster_audit",
    "feature_propagation",
    "crawl_budget",
    # round-5 additions (kg_fused_pipeline deliberately NOT benched: it
    # runs a whole disk-writing pipeline — correctness lives in
    # CHECK_ORACLE, and the bench line stays lean like curation_pipeline)
    "media_real_decode_jpeg",   # stdlib baseline-JPEG decode path
    "span_dedup_winnow",        # winnowed approximate ExactSubstr
    "salsa_hosts",              # closed-form SALSA
    "hyperball_centrality",     # HLL-sketch centralities
]

# Per-query time = best of N runs: the box is a shared VM and single runs
# have shown transient 3-10x outliers (host contention) — measured round 2:
# the same query 3.4s and 18.1s in back-to-back bench runs. The minimum of
# three is the steady-state number the queries actually cost.
BEST_OF = int(os.environ.get("SPARK_GRAFT_BEST_OF", "3"))


def _time(fn) -> tuple[float, int]:
    t0 = time.monotonic()
    n = fn()
    return time.monotonic() - t0, n


def _time_best(fn, runs: int = BEST_OF) -> tuple[float, int]:
    best, n = _time(fn)
    for _ in range(runs - 1):
        secs, n = _time(fn)
        best = min(best, secs)
    return best, n


def materialize_corpus(spark, n_docs: int) -> str:
    """Write the synthetic web corpus to parquet once (NOT timed) — the
    benchmarked pipeline reads a table, per input_hint, not a generator."""
    import tempfile

    from ferenda_spark.sources.corpus import TEMPLATE_VERSION, generate_corpus

    path = os.path.join(
        tempfile.gettempdir(),
        f"ferenda_bench_corpus_v{TEMPLATE_VERSION}_{n_docs}.parquet",
    )
    if not os.path.isdir(path):
        generate_corpus(spark, n_docs).write.mode("overwrite").parquet(path)
    return path


def kg_pipeline(spark, corpus_path: str) -> int:
    """The north_star workload: corpus table → parse (mapInPandas) →
    exact+LSH entity linking → triple assembly. Returns triple count."""
    from ferenda_spark.operators.linking import link_mentions_onepass
    from ferenda_spark.operators.parse import parse_stage, split_parsed
    from ferenda_spark.operators.triples import assemble_triples
    from ferenda_spark.sources.corpus import dictionary_df

    corpus = spark.read.parquet(corpus_path)
    docs, _ = split_parsed(parse_stage(corpus, n_parts=max(CPUS * 2, 16)))
    docs = docs.cache()
    mentions = docs.select(
        "url", "part_key", F.explode("mentions").alias("m")
    ).select("url", "part_key", F.col("m.*"))
    links = link_mentions_onepass(mentions, dictionary_df(spark))
    n = assemble_triples(docs, links).count()
    docs.unpersist()
    return n


def main() -> None:
    sf = 0.1 if "sf0.1" in SF_DIR else (0.01 if "sf0.01" in SF_DIR else 0.001)
    spark = get_spark(
        app_name="ferenda_spark_bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")

    qtimes: dict[str, float] = {}
    qs = entrymod.queries()

    # warm the JVM/Arrow path once (not timed)
    qs["tpch_q1ish"](spark, SF_DIR).count()

    total = 0.0
    for name in BENCH_QUERIES:
        secs, _ = _time_best(lambda: qs[name](spark, SF_DIR).count())
        qtimes[name] = round(secs, 3)
        total += secs

    corpus_path = materialize_corpus(spark, KG_DOCS)
    kg_secs, n_triples = _time_best(lambda: kg_pipeline(spark, corpus_path))
    qtimes["kg_pipeline"] = round(kg_secs, 3)
    total += kg_secs

    full = {
        "metric": "kg_construct+relational bench wall time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": sf,
        "kg_docs": KG_DOCS,
        "kg_triples": n_triples,
        "kg_docs_per_sec": round(KG_DOCS / kg_secs, 1),
        "kg_triples_per_sec": round(n_triples / kg_secs, 1),
        "cpus": CPUS,
        "best_of": BEST_OF,
        "note": (
            f"kg_docs_per_sec is the {KG_DOCS}-doc fixed-cost-"
            "dominated bench figure; steady-state throughput is the "
            "1M-doc run in BENCH/BASELINE.md (e.g. 7432 docs/s at "
            "local[8] on the round-1 box); full per-query record in "
            "BENCH/local_latest.json"
        ),
    }
    # the driver captures only the LAST 2000 chars of stdout and parses
    # the JSON line out of that tail — round 3's 65-query line overflowed
    # it and the driver recorded parsed=null. Keep the full record as a
    # committed artifact, and shrink the PRINTED line to fit: 2-decimal
    # walls, then drop the fastest sub-second queries (counted in
    # queries_omitted) until the line fits the capture window.
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH", "local_latest.json"), "w") as f:
            json.dump(full, f, indent=1)
    except OSError:
        pass
    out = dict(full)
    out["queries"] = {k: round(v, 2) for k, v in qtimes.items()}
    out["note"] = "full per-query record in BENCH/local_latest.json"
    line = json.dumps(out, separators=(",", ":"))
    if len(line) > 1900:
        omitted = 0
        for k in sorted(qtimes, key=lambda k: qtimes[k]):
            if len(line) <= 1900:
                break
            if qtimes[k] >= 1.0:
                break  # never drop a >=1s query from the printed record
            del out["queries"][k]
            omitted += 1
            out["queries_omitted_subsecond"] = omitted
            line = json.dumps(out, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
