"""End-to-end curation DAG (plans/curation.py): audit-first filtering,
boilerplate removal feeding the repetitive rule, PII redaction, split +
pack determinism, manifest consistency."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ferenda_spark.plans.curation import curate_corpus, run_curation_pipeline

BOILER = " ".join(f"nav{i}" for i in range(64))  # one full 64-token chunk


@pytest.fixture(scope="module")
def corpus(spark):
    body = lambda tag: " ".join(f"{tag}{i}" for i in range(64))
    rows = [
        # three docs sharing the same leading boilerplate chunk + unique body
        (0, "web", BOILER + " " + body("a")),
        (1, "web", BOILER + " " + body("b")),
        (2, "web", BOILER + " " + body("c")),
        # junk: too short
        (3, "web", "tiny"),
        # PII-carrying doc (kept; text gets redacted)
        (4, "wiki", body("d") + " contact alice@example.com now " + body("e")),
        # pure-boilerplate doc → empty after cleaning → leaves the set
        (5, "wiki", BOILER),
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_curation_dag_outputs(spark, corpus):
    out = curate_corpus(
        corpus, budget=64, n_buckets=2, chunk_n=64,
        splits={"train": 1.0}, min_clean_tokens=5,
    )
    verdicts = {r["doc_id"]: r for r in out["verdicts"].collect()}
    assert len(verdicts) == 6  # audit covers EVERY input doc
    assert not verdicts[3]["keep"] and "too_short" in verdicts[3]["reasons"]
    assert verdicts[0]["keep"] and verdicts[4]["keep"]

    reasons = {r["reason"]: r["n_docs"] for r in out["reasons"].collect()}
    assert reasons.get("too_short") == 1

    shards = {r["doc_id"]: r for r in out["shards"].collect()}
    assert 3 not in shards  # dropped by verdict
    assert 5 not in shards  # emptied by boilerplate removal
    # boilerplate survives exactly once across the corpus: the first doc
    # keeps it, the others lose that chunk
    assert "nav0" in shards[0]["clean_text"]
    assert "nav0" not in shards[1]["clean_text"]
    assert "nav0" not in shards[2]["clean_text"]
    # PII redacted in the packed text
    assert "alice@example.com" not in shards[4]["clean_text"]
    assert "[PII]" in shards[4]["clean_text"]
    assert all(r["split"] == "train" for r in shards.values())

    # manifest reconciles with the shard rows
    manifest = out["manifest"].collect()
    assert sum(r["n_docs"] for r in manifest) == len(shards)
    assert sum(r["n_tokens"] for r in manifest) == sum(
        r["n_tokens"] for r in shards.values()
    )


def test_curation_dag_deterministic(spark, corpus):
    a = curate_corpus(corpus, budget=64, n_buckets=2, min_clean_tokens=5)
    b = curate_corpus(
        corpus.repartition(7), budget=64, n_buckets=2, min_clean_tokens=5
    )
    key = lambda out: sorted(
        (r["doc_id"], r["split"], r["bucket"], r["pack_id"])
        for r in out["shards"].collect()
    )
    assert key(a) == key(b)


def test_run_pipeline_writes_partitioned_shards(spark, corpus, tmp_path):
    paths = run_curation_pipeline(
        spark, corpus, str(tmp_path / "cur"),
        budget=64, n_buckets=2, splits={"train": 0.5, "val": 0.5},
        min_clean_tokens=5,
    )
    import os

    shards = spark.read.parquet(paths["shards"])
    assert shards.count() > 0
    # split/bucket partition directories exist → loader-side pruning
    top = os.listdir(paths["shards"])
    assert any(d.startswith("split=") for d in top)
    # reading one split prunes via PartitionFilters
    one = shards.filter(F.col("split") == "train")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "split" in plan.split("PartitionFilters", 1)[1][:120]
    assert spark.read.parquet(paths["verdicts"]).count() == 6


def test_webtext_gates_add_reasons(spark, corpus):
    """Opt-in decontamination / LM-perplexity / classifier gates flow
    into the verdict audit table as ordinary reasons."""
    from ferenda_spark.functions.lm import train_ngram_lm
    from ferenda_spark.functions.quality_clf import train_quality_classifier

    # eval set = doc 1's text → doc 1 must flag contaminated
    ev = corpus.filter(F.col("doc_id") == 1).select("text")
    # LM trained on docs 0-2 (boiler+body): doc 4's vocabulary is unseen
    # → high perplexity with a tight gate
    lm = train_ngram_lm(corpus.filter(F.col("doc_id") <= 2).select("text"))
    # classifier: positives = doc 0-2 style, negatives = mangled
    qm = train_quality_classifier(
        corpus.filter(F.col("doc_id") <= 2).select("text"),
        corpus.filter(F.col("doc_id") <= 2).select(
            F.regexp_replace("text", "[aeiou]", "q").alias("text")
        ),
        n_buckets=256,
        sample_per_class=5,
        epochs=50,
    )
    out = curate_corpus(
        corpus,
        budget=64,
        n_buckets=2,
        chunk_n=64,
        min_clean_tokens=5,
        decontam_eval=ev,
        decontam_n=8,
        decontam_threshold=0.9,
        lm_model=lm,
        max_avg_nll=6.0,
        quality_model=qm,
        min_quality_prob=0.5,
    )
    v = {r["doc_id"]: r for r in out["verdicts"].collect()}
    assert len(v) == 6  # audit table always has every input doc
    assert "contaminated" in v[1]["reasons"]
    assert "contaminated" not in v[4]["reasons"]
    assert "high_perplexity" in v[4]["reasons"]  # unseen vocabulary
    assert "high_perplexity" not in v[0]["reasons"]  # in-domain
    # helper columns must not leak into the audit schema
    cols = set(out["verdicts"].columns)
    assert not cols & {"_contaminated", "_avg_nll", "_quality_prob"}
    # reasons histogram picks the new reasons up like any rule
    reasons = {r["reason"] for r in out["reasons"].collect()}
    assert "contaminated" in reasons and "high_perplexity" in reasons
