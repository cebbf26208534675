"""Dedup operator family: exact / n-gram Jaccard / SimHash / MinHash /
embedding-cosine. Positive pairs must be found, negative pairs must not."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ferenda_spark.operators import dedup

BASE = (
    "the quick brown fox jumps over the lazy dog while the spark engine "
    "shuffles partitions across the cluster and writes parquet files"
)
NEAR = BASE.replace("lazy", "sleepy")  # one-token edit
FAR = (
    "completely unrelated content about cooking pasta with tomatoes basil "
    "garlic and olive oil in a large pot of salted boiling water tonight"
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, BASE), (3, NEAR), (4, FAR), (5, "BASE  extra")],
        "id long, text string",
    )


def test_exact_groups_and_drop(spark, docs):
    groups = dedup.exact_duplicate_groups(docs, "text", "id").collect()
    assert len(groups) == 1
    assert groups[0]["dup_ids"] == [1, 2] and groups[0]["keep_id"] == 1
    kept = dedup.drop_exact_duplicates(docs, "text", "id")
    assert kept.count() == 4
    assert {r["id"] for r in kept.select("id").collect()} == {1, 3, 4, 5}


def test_ngram_jaccard_pairs(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, "text", "id", k=3, threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0
    assert not any(4 in p for p in pairs)  # FAR never pairs


def test_simhash_pairs(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_pairs(docs, "text", "id", max_hamming=10).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 10
    assert not any(4 in p for p in pairs)


def test_simhash_is_deterministic(spark, docs):
    a = docs.select(dedup.simhash_col("text").alias("s")).collect()
    b = docs.repartition(7).select(dedup.simhash_col("text").alias("s")).collect()
    assert sorted(r["s"] for r in a) == sorted(r["s"] for r in b)


def test_minhash_pairs(docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_pairs(docs, "text", "id", k=3, threshold=0.6).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs
    assert not any(4 in p for p in pairs)


def test_embedding_near_dup(spark):
    import math

    rows = []
    for i in range(40):
        base = [math.sin(0.7 * (i % 8) + j) for j in range(16)]
        rows.append((i, base))
    # 41 = near-copy of 1's vector, 99 = orthogonal-ish
    rows.append((41, [x * 1.0001 for x in rows[1][1]]))
    df = spark.createDataFrame(rows, "id long, v array<float>")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_near_dup_pairs(df, "v", "id", threshold=0.9999).collect()
    }
    assert (1, 41) in pairs
    # vectors from different phase groups never appear
    assert all((a % 8) == (b % 8) or b == 41 for a, b in pairs)


def test_dedup_on_driver_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    kept = dedup.drop_exact_duplicates(docs, "text", "doc_id").count()
    groups = dedup.exact_duplicate_groups(docs, "text", "doc_id")
    n_dropped = groups.agg(F.sum(F.col("n_dups") - 1)).collect()[0][0] or 0
    assert kept == n - n_dropped


def test_embedding_exact_pairs_matches_numpy(spark):
    import numpy as np

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pdf = e.toPandas()
    V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    ids = pdf["vec_id"].to_numpy()
    nrm = np.linalg.norm(V, axis=1)
    sims = (V @ V.T) / np.outer(nrm, nrm)
    truth = {
        (int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if sims[i, j] >= 0.35
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_exact_pairs(e, "embedding", "vec_id", 0.35).collect()
    }
    assert got == truth and len(truth) > 0


def test_embedding_lsh_is_subset_of_exact(spark):
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_exact_pairs(e, "embedding", "vec_id", 0.35).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_near_dup_pairs(
            e, "embedding", "vec_id", threshold=0.35, n_planes=4
        ).collect()
    }
    # in-bucket verification is exact cosine, so LSH pairs ⊆ exact pairs
    assert lsh <= exact


def test_dedup_lines_first_occurrence(spark):
    """Pins the order-preservation contract dedup_lines_col relies on:
    array_distinct keeps FIRST occurrences in original order."""
    txt = "nav\nbody A\nnav\nbody B\nbody A\nfooter\nnav"
    df = spark.createDataFrame([(1, txt)], "id long, text string")
    out = dedup.dedup_lines_stats(df, "text", "id").collect()[0]
    assert out["text"] == "nav\nbody A\nbody B\nfooter"
    assert out["n_lines"] == 7 and out["n_unique"] == 4


def test_dedup_lines_identity_when_unique(spark):
    txt = "a\nb\nc"
    df = spark.createDataFrame([(1, txt)], "id long, text string")
    out = dedup.dedup_lines_stats(df, "text", "id").collect()[0]
    assert out["text"] == txt and out["n_lines"] == out["n_unique"] == 3


def test_dedup_lines_is_map_only(spark):
    df = spark.createDataFrame([(1, "a\na")], "id long, text string")
    plan = (
        dedup.dedup_lines_stats(df, "text", "id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
