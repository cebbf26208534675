"""Dump the physical plans of the KG deployment DAG to BENCH/PLANS.md —
the audit artifact for the plan-quality claims in kg_job.py/BENCH:
broadcast hash joins for linking, no corpus-sized shuffles besides the
alias-key distinct and entity-edge dedup, column-pruned stage scans,
partition-pruned POS reads.

Usage: python tools/explain_kg.py   (small corpus, local[8], ~1 min)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def main() -> None:
    import tempfile

    from pyspark.sql import functions as F

    from ferenda_spark.operators.linking import link_mentions_onepass
    from ferenda_spark.operators.parse import parse_stage, split_parsed
    from ferenda_spark.operators.triples import (
        assemble_triples,
        write_pos,
        write_spo,
    )
    from ferenda_spark.session import get_spark
    from ferenda_spark.sources.corpus import dictionary_df, generate_corpus

    spark = get_spark(app_name="explain_kg", master="local[8]",
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="explain_kg_")
    corpus_path = os.path.join(tmp, "corpus.parquet")
    stage_dir = os.path.join(tmp, "stage.parquet")
    generate_corpus(spark, 2000).write.parquet(corpus_path)

    corpus = spark.read.parquet(corpus_path)
    docs, _ = split_parsed(parse_stage(corpus, n_parts=16, with_sections=False))
    docs.select(
        "url", "part_key", "lang", "title", "issued", "triples", "mentions"
    ).write.mode("overwrite").parquet(stage_dir)
    stage = spark.read.parquet(stage_dir)
    mentions = stage.select(
        "url", "part_key", F.explode("mentions").alias("m")
    ).select("url", "part_key", F.col("m.*"))
    links = link_mentions_onepass(mentions, dictionary_df(spark))
    triples = assemble_triples(
        stage.select("url", "part_key", "lang", "title", "issued", "triples"),
        links,
    )

    spo_dir, pos_dir = os.path.join(tmp, "spo"), os.path.join(tmp, "pos")
    write_spo(triples, spo_dir)
    write_pos(spark.read.parquet(spo_dir), pos_dir)
    pos = spark.read.parquet(pos_dir)
    from ferenda_spark.schemas import P_REFERENCES
    pos_scan = pos.filter(F.col("pred") == P_REFERENCES).select("obj", "subj")

    from ferenda_spark.operators.fulltext import build_fulltext_index, search
    from ferenda_spark.operators.sparql import sparql_select

    sparql_plan = sparql_select(
        spark.read.parquet(spo_dir),
        "PREFIX dcterms: <http://purl.org/dc/terms/> "
        "SELECT ?src ?t ?ti WHERE { ?src dcterms:references ?t . "
        "?src dcterms:title ?ti . }",
        pos_triples=pos,
    )
    postings, n_ft = build_fulltext_index(corpus, "text", "url")
    ft_plan = search(postings, n_ft, "spark window", top_k=10)

    sparql_agg_plan = sparql_select(
        spark.read.parquet(spo_dir),
        "PREFIX dcterms: <http://purl.org/dc/terms/> "
        "SELECT ?src (COUNT(*) AS ?n) WHERE { ?src dcterms:references ?t } "
        "GROUP BY ?src HAVING(?n >= 2)",
        pos_triples=pos,
    )

    sparql_graph_plan = sparql_select(
        spark.read.parquet(spo_dir),
        "PREFIX dcterms: <http://purl.org/dc/terms/> "
        "SELECT ?src ?t WHERE { GRAPH <a0.example> "
        "{ ?src dcterms:references ?t } }",
        pos_triples=pos,
    )

    sparql_subq_plan = sparql_select(
        spark.read.parquet(spo_dir),
        "PREFIX dcterms: <http://purl.org/dc/terms/> "
        "SELECT DISTINCT ?src ?n WHERE { ?src dcterms:title ?ti . "
        "{ SELECT ?src (COUNT(?t) AS ?n) "
        "WHERE { ?src dcterms:references ?t } GROUP BY ?src } }",
        pos_triples=pos,
    )

    # one connected-components round over the reference edges: the per-round
    # shape is what repeats log(diameter) times at scale
    from ferenda_spark.operators.graph import _propagation_round
    e = pos_scan.select(F.col("subj").alias("a"), F.col("obj").alias("b"))
    und = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )
    cc_plan = _propagation_round(und, labels)

    sections = [
        ("parse stage (map-only mapInPandas; no shuffle)",
         plan_of(docs.select("url", "part_key", "triples"))),
        ("entity linking (one-pass: vocabulary-sized distinct + resolve + "
         "ONE BroadcastHashJoin)", plan_of(links)),
        ("triple assembly (grammar explode shuffle-free; entity-edge "
         "distinct is the only corpus-sized exchange)", plan_of(triples)),
        ("POS layout pattern scan (PartitionFilters prune to one pred "
         "directory; ReadSchema pruned to 2 columns)", plan_of(pos_scan)),
        ("SPARQL compile: constant-pred patterns routed to POS layout "
         "(both scans show PartitionFilters on pred; join on the shared "
         "?src variable)", plan_of(sparql_plan)),
        ("fulltext search: postings term filter + per-doc partial agg + "
         "TakeOrderedAndProject top-k (no doc scan at query time)",
         plan_of(ft_plan)),
        ("SPARQL GROUP BY aggregate: HashAggregate with partial_count "
         "map-side before the exchange; HAVING folded into a post-agg "
         "Filter; POS scan partition-pruned on pred",
         plan_of(sparql_agg_plan)),
        ("SPARQL GRAPH clause (constant label): the domain-of-src_url "
         "filter sits directly on the partition-pruned POS scan, before "
         "the join — graph scoping costs one column read, no shuffle",
         plan_of(sparql_graph_plan)),
        ("SPARQL subquery: inner GROUP BY aggregated before the join "
         "(pre-aggregation shrinks the build side); DISTINCT of the outer "
         "projection is one more HashAggregate",
         plan_of(sparql_subq_plan)),
        ("connected-components round (repeats O(log diameter) times): "
         "min-label HashAggregate with partial_min map-side combine, two "
         "node-keyed joins; AQE re-plans each round since localCheckpoint "
         "makes round inputs concrete", plan_of(cc_plan)),
    ]

    out = ["# KG DAG physical plans (generated by tools/explain_kg.py)\n"]
    for title, plan in sections:
        out.append(f"## {title}\n\n```\n{plan}\n```\n")
    # preserve hand-appended sections (anything from the first '# Round-'
    # heading on) — regeneration must not silently drop them
    path = os.path.join(REPO, "BENCH", "PLANS.md")
    extra = ""
    if os.path.exists(path):
        old = open(path).read()
        idx = old.find("\n# Round-")
        if idx >= 0:
            extra = old[idx:]
    with open(path, "w") as f:
        f.write("\n".join(out) + extra)
    print("wrote BENCH/PLANS.md")

    import shutil

    spark.stop()
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
