"""Opt-in KG-enrichment stage (plans/pipeline.py): sameAs
canonicalization + RDFS inference + validation as stage tables with
lineage, composed with the grammar graph."""

from __future__ import annotations

from pyspark.sql import functions as F

from ferenda_spark.operators.inference import RDF_TYPE, RDFS_SUBCLASSOF
from ferenda_spark.operators.sameas import OWL_SAMEAS
from ferenda_spark.operators.validation import shapes_df
from ferenda_spark.plans.pipeline import run_pipeline
from ferenda_spark.schemas import TRIPLES
from ferenda_spark.sources.corpus import dictionary_df, generate_corpus


def test_enrich_stage_tables(spark, tmp_path):
    out = str(tmp_path / "kg")
    corpus = generate_corpus(spark, 30)
    urls = [r.url for r in corpus.select("url").limit(4).collect()]

    def _t(s, p, o, uri=True):
        return (s, p, o, uri, None, None, "u:extra", 0)

    extra_rows = (
        # merge the first four doc URIs into ent:master
        [_t(u, OWL_SAMEAS, "ent:master") for u in urls]
        + [
            _t("c:A", RDFS_SUBCLASSOF, "c:B"),
            _t("ent:x", RDF_TYPE, "c:A"),
        ]
    )
    extra = spark.createDataFrame(extra_rows, TRIPLES)
    shapes = shapes_df(spark, [
        dict(shape="AShape", target_class="c:A", property="p:req",
             min_count=1),
    ])

    paths = run_pipeline(
        spark, corpus, dictionary_df(spark), out, n_parts=4,
        with_lsh=False, enrich_kg=True, shapes=shapes,
        enrich_extra_triples=extra,
    )

    canon = spark.read.parquet(paths["triples_canonical"])
    # merged subjects are gone; their facts moved onto ent:master
    assert canon.filter(F.col("subj").isin(urls)).count() == 0
    master_preds = {
        r.pred for r in canon.filter(F.col("subj") == "ent:master").collect()
    }
    assert len(master_preds) > 0  # absorbed the grammar triples
    # sameAs assertions consumed
    assert canon.filter(F.col("pred") == OWL_SAMEAS).count() == 0

    inferred = spark.read.parquet(paths["triples_inferred"])
    got = {(r.subj, r.pred, r.obj) for r in inferred.collect()}
    assert ("ent:x", RDF_TYPE, "c:B") in got
    assert inferred.filter("part_key IS NULL").count() == 0

    viol = spark.read.parquet(paths["violations"])
    v = {(r.focus, r.shape, r.constraint) for r in viol.collect()}
    assert ("ent:x", "AShape", "minCount") in v

    lin = spark.read.parquet(paths["lineage"]).filter("stage = 'enrich'")
    rows = lin.collect()
    assert len(rows) == 1
    assert rows[0]["n_in"] > 0 and rows[0]["n_out"] > 0
    assert rows[0]["bytes_in"] > 0


def test_enrich_off_by_default(spark, tmp_path):
    out = str(tmp_path / "kg")
    paths = run_pipeline(
        spark, generate_corpus(spark, 10), dictionary_df(spark), out,
        n_parts=2, with_lsh=False,
    )
    assert "triples_canonical" not in paths
    assert (
        spark.read.parquet(paths["lineage"])
        .filter("stage = 'enrich'").count() == 0
    )


def test_void_stage(spark, tmp_path):
    out = str(tmp_path / "kg")
    corpus = generate_corpus(spark, 20)
    paths = run_pipeline(
        spark, corpus, dictionary_df(spark), out, n_parts=4,
        describe_dataset=True,
    )
    assert "void" in paths
    void = spark.read.parquet(paths["void"])
    rows = {
        (r["subj"], r["pred"]): r["obj"] for r in void.collect()
    }
    spo = spark.read.parquet(paths["triples_spo"])
    assert rows[("void:ds", "void:triples")] == str(spo.count())
    assert rows[("void:ds", "rdf:type")] == "void:Dataset"
    # per-predicate partitions cover every asserted predicate
    preds = {r["pred"] for r in spo.select("pred").distinct().collect()}
    props = {
        r["obj"] for r in void.filter("pred = 'void:property'").collect()
    }
    assert props == preds
    # lineage row with real metrics
    lin = spark.read.parquet(paths["lineage"]).filter("stage = 'void'")
    r = lin.collect()[0]
    assert r["n_in"] > 0 and r["n_out"] > 0 and r["wall_ms"] is not None


def test_fuse_stage_tables(spark, tmp_path):
    """Opt-in fusion stage: structured harvest claims → resolved facts +
    per-host trust as stage tables, with lineage + ledger rows. The
    corpus plants a CONFLICT: ~1/3 of pages assert claim='minority' for
    the shared subject, the rest 'majority' — fusion must resolve to the
    majority value."""
    out = str(tmp_path / "kg")
    claim_val = F.when(
        F.crc32(F.col("url")) % 3 == 0, F.lit("minority")
    ).otherwise(F.lit("majority"))
    extra = F.encode(
        F.concat(
            F.lit('<script type="application/ld+json">'
                  '{"@id": "e:topic", "claim": "'),
            claim_val,
            F.lit('"}</script>'),
        ),
        "UTF-8",
    )
    corpus = generate_corpus(spark, 30).withColumn(
        "html", F.concat(F.col("html"), extra)
    )
    paths = run_pipeline(
        spark, corpus, dictionary_df(spark), out, n_parts=4,
        with_lsh=False, harvest_structured=True, fuse=True,
    )
    fused = spark.read.parquet(paths["fused"])
    # exactly one resolved value per (subj, pred)
    assert fused.groupBy("subj", "pred").count().filter(
        "count > 1").count() == 0
    assert fused.count() > 0
    win = fused.filter(
        (F.col("subj") == "e:topic") & (F.col("pred") == "claim")
    ).collect()
    assert len(win) == 1
    assert win[0]["obj"] == "majority"
    assert win[0]["n_candidates"] == 2
    assert 0.5 < win[0]["confidence"] <= 1.0
    assert fused.filter("part_key IS NULL").count() == 0

    trust = spark.read.parquet(paths["source_trust"])
    tvals = [r["trust"] for r in trust.collect()]
    assert len(tvals) > 0 and all(0.0 <= t <= 1.0 for t in tvals)
    # sources are hosts, not full URLs
    assert trust.filter(F.col("source").contains("/")).count() == 0

    lin = spark.read.parquet(paths["lineage"]).filter("stage = 'fuse'")
    rows = lin.collect()
    assert len(rows) == 1
    assert rows[0]["n_in"] > 0 and rows[0]["n_out"] == fused.count()
    assert rows[0]["bytes_in"] > 0 and rows[0]["wall_ms"] >= 0


def test_fuse_requires_structured_harvest(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="harvest_structured"):
        run_pipeline(
            spark, generate_corpus(spark, 5), dictionary_df(spark),
            str(tmp_path / "kg2"), n_parts=2, with_lsh=False, fuse=True,
        )
