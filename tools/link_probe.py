"""Sub-phase timing probe for the post-parse half of the KG job (diagnosis
tool, not part of the bench protocol). Reads a retained stage table and
times each downstream phase separately at whatever master spark-submit
gives it. Usage:
  spark-submit --py-files ferenda_spark.zip tools/link_probe.py <stage_dir>
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    stage_dir = sys.argv[1]
    spark = (
        SparkSession.builder.appName("link_probe")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from ferenda_spark.operators.linking import (
        _exact_broadcast,
        _ngram_tier,
    )
    from ferenda_spark.operators.triples import assemble_triples
    from ferenda_spark.sources.corpus import dictionary_df

    timings = {}

    def t(name, fn):
        t0 = time.monotonic()
        r = fn()
        timings[name] = round(time.monotonic() - t0, 3)
        return r

    stage = spark.read.parquet(stage_dir)
    dic = dictionary_df(spark)

    mentions = (
        stage.select("url", "part_key", F.explode("mentions").alias("m"))
        .select("url", "part_key", F.col("m.*"))
        .cache()
    )
    t("mentions_cache_count", mentions.count)

    exact = _exact_broadcast(mentions, dic)
    t("exact_join_count", exact.count)

    exact_keys = dic.filter(F.col("is_exact")).select("alias_key").distinct()
    unresolved = mentions.join(F.broadcast(exact_keys), "alias_key", "left_anti")
    t("unresolved_count", unresolved.count)

    fuzzy = _ngram_tier(unresolved, dic, threshold=0.5)
    t("fuzzy_tier_count", fuzzy.count)

    links = exact.unionByName(fuzzy)
    grammar_only = assemble_triples(
        stage.select("url", "part_key", "lang", "title", "issued", "triples"),
        links.limit(0),
    )
    t("grammar_expand_count", grammar_only.count)

    full = assemble_triples(
        stage.select("url", "part_key", "lang", "title", "issued", "triples"),
        links,
    )
    t("full_assemble_count", full.count)

    timings["cores"] = spark.sparkContext.defaultParallelism
    print(json.dumps(timings))
    spark.stop()


if __name__ == "__main__":
    main()
