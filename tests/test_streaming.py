"""Structured-Streaming ingest (SURVEY §2.9 idiomatic upgrade): the
AvailableNow drain must produce the same docs/triples as the batch
operators, and re-invocation after new files land must process ONLY the
new files (file-source checkpoint = incremental semantics)."""

import os

import pytest
from pyspark.sql import functions as F

from ferenda_spark.sources.corpus import dictionary_df, generate_corpus
from ferenda_spark.streaming import (
    run_streaming_ingest,
    stream_corpus,
    streaming_feed_counts,
)


@pytest.fixture(scope="module")
def corpus_dirs(spark, tmp_path_factory):
    """Two incremental corpus drops: docs 0–59 then 60–99, written as
    separate parquet files into one stream-input directory."""
    root = tmp_path_factory.mktemp("stream")
    input_dir = str(root / "input")
    full = generate_corpus(spark, 100).cache()
    full.filter(F.col("url").isin(
        [r["url"] for r in full.limit(60).collect()]
    )).coalesce(2).write.mode("append").parquet(input_dir)
    first_urls = {r["url"] for r in spark.read.parquet(input_dir).collect()}
    rest = full.filter(~F.col("url").isin(list(first_urls)))
    return input_dir, full, rest, str(root / "out")


def test_available_now_drain_then_incremental(spark, corpus_dirs):
    input_dir, full, rest, out_dir = corpus_dirs
    d = dictionary_df(spark)

    paths = run_streaming_ingest(spark, input_dir, d, out_dir, n_parts=8)
    n_docs_1 = spark.read.parquet(paths["docs"]).count()
    n_tr_1 = spark.read.parquet(paths["triples"]).count()
    assert n_docs_1 == 60
    assert n_tr_1 > 0

    # drop the remaining files, re-drain: only the 40 new docs are parsed
    rest.coalesce(1).write.mode("append").parquet(input_dir)
    paths = run_streaming_ingest(spark, input_dir, d, out_dir, n_parts=8)
    docs = spark.read.parquet(paths["docs"])
    assert docs.count() == 100
    # no duplicates: each url parsed exactly once across both drains
    assert docs.select("url").distinct().count() == 100

    # streamed triples == batch-operator triples over the same corpus
    from ferenda_spark.operators.linking import link_mentions
    from ferenda_spark.operators.parse import parse_stage, split_parsed
    from ferenda_spark.operators.triples import assemble_triples

    bdocs, _ = split_parsed(parse_stage(spark.read.parquet(input_dir), n_parts=8))
    bdocs = bdocs.cache()
    mentions = bdocs.select(
        "url", "part_key", F.explode("mentions").alias("m")
    ).select("url", "part_key", F.col("m.*"))
    batch = assemble_triples(bdocs, link_mentions(mentions, d)).select(
        "subj", "pred", "obj"
    )
    streamed = spark.read.parquet(paths["triples"]).select("subj", "pred", "obj")
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0

    # lineage carries per-epoch metrics rows
    lin = spark.read.parquet(paths["lineage"])
    assert lin.filter(F.col("n_in").isNotNull()).count() >= 2


def test_streaming_feed_counts_matches_batch(spark, corpus_dirs, tmp_path):
    input_dir, full, _rest, _out = corpus_dirs
    agg = streaming_feed_counts(stream_corpus(spark, input_dir))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("feed_counts")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["window_start"], r["lang"]): r["n_docs"]
        for r in spark.sql("SELECT * FROM feed_counts").collect()
    }
    expect = {
        (r["ws"], r["lang"]): r["n"]
        for r in spark.read.parquet(input_dir)
        .groupBy(
            F.date_trunc("hour", F.col("warc_ts")).alias("ws"), F.col("lang")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expect


def test_stateful_entry_tracker_accumulates_across_restarts(spark, tmp_path):
    """applyInPandasWithState DocumentEntry semantics: published = first ts
    ever seen, updated = latest, n_versions accumulates — and the state
    survives a query restart via the checkpoint (the nightly-run shape)."""
    from datetime import datetime

    from ferenda_spark.streaming import track_document_entries

    t = [datetime(2026, 1, 1, h) for h in range(6)]
    input_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")

    def drain(name):
        stream = spark.readStream.schema("url string, warc_ts timestamp").parquet(
            input_dir
        )
        emitted = {}

        def sink(batch_df, _epoch):
            for r in batch_df.collect():
                emitted[r["url"]] = (r["published"], r["updated"], r["n_versions"])

        q = (
            track_document_entries(stream)
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return emitted

    drop1 = [("u1", t[0]), ("u1", t[2]), ("u2", t[1])]
    spark.createDataFrame(drop1, "url string, warc_ts timestamp").coalesce(
        1
    ).write.mode("append").parquet(input_dir)
    got1 = drain("entries_run1")
    assert got1 == {"u1": (t[0], t[2], 2), "u2": (t[1], t[1], 1)}

    # second drop: u1 re-crawled later, u3 new; u2 silent
    drop2 = [("u1", t[4]), ("u3", t[3])]
    spark.createDataFrame(drop2, "url string, warc_ts timestamp").coalesce(
        1
    ).write.mode("append").parquet(input_dir)
    got2 = drain("entries_run2")
    # update mode: only urls with new data re-emit; u1 keeps its original
    # published ts from run 1 (state restored from the checkpoint)
    assert got2 == {"u1": (t[0], t[4], 3), "u3": (t[3], t[3], 1)}


def test_entry_tracker_ignores_nat_timestamps(spark):
    """An all-NaT batch must not clobber published/updated state (NaT
    comparisons are order-dependent in python min/max); null-ts rows still
    count as versions."""
    import pandas as pd

    from ferenda_spark.streaming.entries import _update_entry

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    st = FakeState()
    ts = pd.Timestamp("2026-01-01 03:00:00")
    list(_update_entry(("u",), iter([pd.DataFrame({"warc_ts": [ts]})]), st))
    assert st._v[0] == ts and st._v[1] == ts and st._v[2] == 1

    nat_batch = pd.DataFrame({"warc_ts": pd.to_datetime([None, None])})
    out = list(_update_entry(("u",), iter([nat_batch]), st))[0]
    assert st._v[0] == ts and st._v[1] == ts  # not clobbered to NaT
    assert st._v[2] == 3  # versions still counted
    assert out["published"].iloc[0] == ts

    later = pd.DataFrame({"warc_ts": pd.to_datetime([None, "2026-02-01"])})
    list(_update_entry(("u",), iter([later]), st))
    assert st._v[1] == pd.Timestamp("2026-02-01") and st._v[0] == ts
