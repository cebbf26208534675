"""The north_rule deployment shape: the full KG-construction DAG as a
spark-submit job (`spark-submit --py-files ferenda_spark.zip tools/kg_job.py
<corpus.parquet> <n_parts>`). Master/cores come from spark-submit; the
script only declares the plan. Prints ONE JSON line with wall time and
throughput (docs/sec, triples/sec) for the timed pipeline (session startup
excluded — it is reported separately).
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    corpus_path, n_parts = sys.argv[1], int(sys.argv[2])
    t_boot = time.monotonic()
    spark = (
        SparkSession.builder.appName("ferenda_kg_job")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    boot_s = time.monotonic() - t_boot

    from ferenda_spark.operators.linking import link_mentions
    from ferenda_spark.operators.parse import parse_stage, split_parsed
    from ferenda_spark.operators.triples import assemble_triples
    from ferenda_spark.sources.corpus import dictionary_df

    corpus = spark.read.parquet(corpus_path)
    n_docs = corpus.count()  # warm the scan metadata; not part of the DAG

    t0 = time.monotonic()
    docs, lineage = split_parsed(parse_stage(corpus, n_parts=n_parts))
    # cache only the columns the KG DAG consumes — the sections struct is
    # the widest column and this DAG never reads it; mentions are cached
    # separately so the linking tiers never re-scan the doc structs.
    slim = docs.select("url", "part_key", "lang", "triples", "mentions").cache()
    mentions = (
        slim.select("url", "part_key", F.explode("mentions").alias("m"))
        .select("url", "part_key", F.col("m.*"))
        .cache()
    )
    links = link_mentions(
        mentions, dictionary_df(spark), fuzzy_strategy="ngram"
    ).cache()
    n_triples = assemble_triples(slim, links).count()
    wall = time.monotonic() - t0

    print(
        json.dumps(
            {
                "cores": spark.sparkContext.defaultParallelism,
                "n_docs": n_docs,
                "n_triples": n_triples,
                "boot_s": round(boot_s, 2),
                "pipeline_s": round(wall, 3),
                "docs_per_sec": round(n_docs / wall, 1),
                "triples_per_sec": round(n_triples / wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
