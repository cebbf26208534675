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


# ------------------------------------------------- token_budget_sample


def test_token_budget_sample_greedy_prefix(spark):
    from ferenda_spark.functions.packing import token_budget_sample

    df = spark.createDataFrame(
        [(i, "en", "w " * 100) for i in range(10)]
        + [(100 + i, "de", "w " * 100) for i in range(2)],
        "doc_id long, lang string, text string",
    )
    out = token_budget_sample(df, 250, strata_col="lang").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r)
    # en: docs taken while start_offset < 250 → offsets 0,100,200 → 3 docs
    assert len(by_lang["en"]) == 3
    assert sorted(r.start_offset for r in by_lang["en"]) == [0, 100, 200]
    # de has only 200 tokens total < budget → taken whole
    assert len(by_lang["de"]) == 2


def test_token_budget_sample_dict_budgets_drop_absent_strata(spark):
    from ferenda_spark.functions.packing import token_budget_sample

    df = spark.createDataFrame(
        [(1, "en", "a b c"), (2, "de", "a b c"), (3, "zh", "a b c")],
        "doc_id long, lang string, text string",
    )
    out = token_budget_sample(
        df, {"en": 10, "de": 1}, strata_col="lang"
    ).collect()
    langs = sorted(r.lang for r in out)
    assert langs == ["de", "en"]  # zh absent from recipe → dropped
    # de budget 1: first doc straddles (start 0 < 1) and is included whole
    assert [r.n_tokens for r in out if r.lang == "de"] == [3]


def test_token_budget_sample_deterministic_across_partitioning(spark):
    from ferenda_spark.functions.packing import token_budget_sample

    df = spark.createDataFrame(
        [(i, "en", "tok " * (1 + i % 7)) for i in range(200)],
        "doc_id long, lang string, text string",
    )
    a = sorted(
        r.doc_id for r in token_budget_sample(df, 300).collect()
    )
    b = sorted(
        r.doc_id
        for r in token_budget_sample(df.repartition(17), 300).collect()
    )
    assert a == b
