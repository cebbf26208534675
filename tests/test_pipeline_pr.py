"""End-to-end triple P/R vs generator ground truth — the DataFrame analog of
the reference's assertEqualGraphs distill test (SURVEY §5.2(4); gate:
P ≥ 0.95 ∧ R ≥ 0.95 per BASELINE.md)."""

import pytest
from pyspark.sql import functions as F

from ferenda_spark.operators.linking import link_mentions
from ferenda_spark.operators.parse import parse_stage, split_parsed
from ferenda_spark.operators.triples import assemble_triples, docmeta_from_triples
from ferenda_spark.sources.corpus import (
    dictionary_df,
    generate_corpus,
    generate_truth_triples,
)

N = 300


@pytest.fixture(scope="module")
def emitted(spark):
    docs, lineage = split_parsed(parse_stage(generate_corpus(spark, N), n_parts=16))
    docs = docs.cache()
    mentions = docs.select("url", "part_key", F.explode("mentions").alias("m")).select(
        "url",
        "part_key",
        F.col("m.section_ordinal").alias("section_ordinal"),
        F.col("m.mention").alias("mention"),
        F.col("m.alias_key").alias("alias_key"),
    )
    links = link_mentions(mentions, dictionary_df(spark))
    return docs, lineage.cache(), assemble_triples(docs, links).cache()


def test_triple_precision_recall(spark, emitted):
    _, _, triples = emitted
    truth = generate_truth_triples(spark, N).select("subj", "pred", "obj").cache()
    got = triples.select("subj", "pred", "obj")
    n_got, n_truth = got.count(), truth.count()
    n_inter = got.intersect(truth).count()
    p, r = n_inter / n_got, n_inter / n_truth
    print(f"\ntriples P={p:.4f} R={r:.4f} ({n_got} emitted, {n_truth} truth)")
    assert p >= 0.95 and r >= 0.95


def test_lineage_rows_cover_input(spark, emitted):
    _, lineage, _ = emitted
    rows = lineage.collect()
    assert sum(r["n_in"] for r in rows) == N
    assert all(r["wall_ms"] is not None and r["partition_id"] >= 0 for r in rows)
    assert sum(r["n_out"] for r in rows) > 0  # triples counted per partition


def test_docmeta_pivot(spark, emitted):
    docs, _, triples = emitted
    dm = docmeta_from_triples(triples)
    assert dm.count() == N
    row = dm.filter(F.col("title").isNull()).count()
    assert row == 0


def test_parse_is_batch_composition_invariant(spark):
    """SURVEY §7.4: per-doc FSM/refparser state must never leak across docs
    in an Arrow batch — the same corpus parsed under different partitionings
    and batch sizes must produce identical rows."""
    from ferenda_spark.operators.parse import parse_stage, split_parsed
    from ferenda_spark.sources.corpus import generate_corpus

    def canon(docs_df):
        rows = docs_df.collect()
        return sorted(
            (
                r["url"],
                r["text_sha256"],
                tuple(sorted((t["s"], t["p"], t["obj"]) for t in r["triples"])),
                tuple(sorted((m["section_ordinal"], m["mention"]) for m in r["mentions"])),
            )
            for r in rows
        )

    base = generate_corpus(spark, 120, n_slices=2)
    a, _ = split_parsed(parse_stage(base, n_parts=8))
    got_a = canon(a)
    # different physical layout: more, smaller partitions + tiny Arrow batches
    scrambled = generate_corpus(spark, 120, n_slices=2).repartition(13)
    conf = spark.conf
    old = conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        b, _ = split_parsed(parse_stage(scrambled, n_parts=8))
        got_b = canon(b)
    finally:
        conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert got_a == got_b
