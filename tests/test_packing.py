"""Sequence packing into token-budget shards (functions/packing.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ferenda_spark.functions.packing import pack_documents, pack_stats


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_pack_offsets_and_bins(spark):
    rows = [(i, "s", " ".join(["w"] * 10)) for i in range(10)]  # 10 tokens each
    packed = pack_documents(
        _df(spark, rows), budget=25, group_cols=("source",), n_buckets=1
    ).orderBy("doc_id")
    got = [(r["start_offset"], r["pack_id"]) for r in packed.collect()]
    # stream offsets 0,10,20,...,90; budget 25 → packs by start offset
    assert got == [
        (0, 0), (10, 0), (20, 0), (30, 1), (40, 1),
        (50, 2), (60, 2), (70, 2), (80, 3), (90, 3),
    ]
    stats = {r["pack_id"]: r for r in pack_stats(packed, 25, ("source",)).collect()}
    assert stats[0]["n_docs"] == 3 and stats[0]["n_tokens"] == 30
    assert stats[0]["fill_ratio"] == 30 / 25


def test_pack_deterministic_across_partitioning(spark):
    rows = [(i, f"s{i % 3}", " ".join(["w"] * (1 + i % 7))) for i in range(200)]
    a = pack_documents(_df(spark, rows), group_cols=("source",), budget=16)
    b = pack_documents(
        _df(spark, rows).repartition(13), group_cols=("source",), budget=16
    )
    ka = sorted((r["doc_id"], r["bucket"], r["pack_id"]) for r in a.collect())
    kb = sorted((r["doc_id"], r["bucket"], r["pack_id"]) for r in b.collect())
    assert ka == kb


def test_pack_window_is_bucket_parallel(spark):
    rows = [(i, "s", "w w w") for i in range(100)]
    packed = pack_documents(_df(spark, rows), group_cols=("source",), n_buckets=8)
    plan = packed._jdf.queryExecution().executedPlan().toString()
    # window partition key must include the bucket — no single-partition sort
    assert "Exchange SinglePartition" not in plan
    assert packed.select("bucket").distinct().count() == 8


def test_pack_property_matches_bruteforce(spark):
    """Property: Spark pack assignment equals a per-stream python cumsum
    brute force for random corpora."""
    import random

    rng = random.Random("packprop")
    rows = [
        (i, f"s{rng.randrange(3)}", " ".join(["w"] * rng.randint(1, 40)))
        for i in range(300)
    ]
    budget = 64
    packed = pack_documents(
        _df(spark, rows), group_cols=("source",), budget=budget, n_buckets=4
    )
    got = {
        r["doc_id"]: (r["bucket"], r["start_offset"], r["pack_id"])
        for r in packed.collect()
    }
    # brute force: same bucket fn (xxhash64) taken from the Spark result,
    # then per-(source,bucket) cumsum in doc_id order
    streams = {}
    for i, src, text in rows:
        b = got[i][0]
        streams.setdefault((src, b), []).append((i, len(text.split(" "))))
    for (src, b), docs in streams.items():
        off = 0
        for i, ntok in sorted(docs):
            assert got[i] == (b, off, off // budget), (i, src, b)
            off += ntok
