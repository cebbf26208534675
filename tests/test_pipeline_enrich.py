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
