"""VoID dataset statistics — the KG describing itself, as triples.

Reference analog: ferenda publishes a machine-readable dataset
description alongside the data (the toc/feed layer says what exists);
the RDF-native convention is the W3C VoID vocabulary: a
``void:Dataset`` node carrying ``void:triples``, ``void:entities``,
``void:distinctSubjects/Objects``, ``void:properties/classes``, plus one
``void:propertyPartition`` per predicate and ``void:classPartition`` per
class with their per-partition triple counts. Publishing these WITH the
dataset lets a consumer (or the SPARQL engine's own planner) size joins
before touching the data — the KG equivalent of table statistics.

Scale shape: one pass over the triple table — every number is a
map-side-combined aggregate; the per-predicate/per-class partitions are
vocabulary-sized groupBys; everything lands in ONE output frame of
triples (subj, pred, obj, obj_is_uri, obj_dtype) whose subjects are the
dataset node and deterministic partition nodes, so the description can
be unioned straight into the store and queried with the same SPARQL
surface it describes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE_SHORT = "rdf:type"
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"


def void_description(
    triples: DataFrame,
    dataset_uri: str = "void:ds",
    *,
    rdf_type: str = RDF_TYPE_SHORT,
) -> DataFrame:
    """→ VoID triples ``(subj, pred, obj, obj_is_uri, obj_dtype)``.

    Emitted: the dataset-level counts (void:triples,
    void:distinctSubjects, void:distinctObjects, void:properties,
    void:classes), one property-partition node
    ``<ds>/prop/<i>`` per predicate (void:property + void:triples),
    and one class-partition node ``<ds>/class/<i>`` per asserted class
    (void:class + void:entities). Partition node ids are minted from the
    partitioned term itself (md5), not row order — deterministic across
    runs and cluster sizes."""
    ds = F.lit(dataset_uri)
    null_s = F.lit(None).cast("string")

    def row(subj, pred, obj, *, uri=False, num=False):
        return F.struct(
            subj.alias("subj"),
            F.lit(pred).alias("pred"),
            (obj.cast("string")).alias("obj"),
            F.lit(uri).alias("obj_is_uri"),
            (F.lit(XSD_INT) if num else null_s).alias("obj_dtype"),
        )

    totals = triples.agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.countDistinct("subj").alias("n_subj"),
        F.countDistinct("obj").alias("n_obj"),
        F.countDistinct("pred").alias("n_pred"),
        F.countDistinct(
            F.when(F.col("pred") == rdf_type, F.col("obj"))
        ).alias("n_classes"),
    )
    ds_rows = totals.select(
        F.explode(
            F.array(
                row(ds, "rdf:type", F.lit("void:Dataset"), uri=True),
                row(ds, "void:triples", F.col("n_triples"), num=True),
                row(ds, "void:distinctSubjects", F.col("n_subj"), num=True),
                row(ds, "void:distinctObjects", F.col("n_obj"), num=True),
                row(ds, "void:properties", F.col("n_pred"), num=True),
                row(ds, "void:classes", F.col("n_classes"), num=True),
            )
        ).alias("t")
    ).select("t.*")

    prop_node = F.concat(
        ds, F.lit("/prop/"), F.md5(F.col("pred"))
    )
    prop_rows = (
        triples.groupBy("pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.explode(
                F.array(
                    row(ds, "void:propertyPartition", prop_node, uri=True),
                    row(prop_node, "void:property", F.col("pred"), uri=True),
                    row(prop_node, "void:triples", F.col("n"), num=True),
                )
            ).alias("t")
        )
        .select("t.*")
    )

    cls_node = F.concat(ds, F.lit("/class/"), F.md5(F.col("obj")))
    cls_rows = (
        triples.filter(F.col("pred") == rdf_type)
        .groupBy("obj")
        .agg(F.countDistinct("subj").alias("n"))
        .select(
            F.explode(
                F.array(
                    row(ds, "void:classPartition", cls_node, uri=True),
                    row(cls_node, "void:class", F.col("obj"), uri=True),
                    row(cls_node, "void:entities", F.col("n"), num=True),
                )
            ).alias("t")
        )
        .select("t.*")
    )
    return ds_rows.unionByName(prop_rows).unionByName(cls_rows)


def void_sketch_state(triples: DataFrame, *, k: int = 256) -> DataFrame:
    """Mergeable VoID state for APPEND-ONLY maintenance: exact counters
    merge by addition, distinct counters by KMV-sketch union
    (functions/sketches.py) — so the statistics of a growing 100 TB table
    are maintained per ingest batch without ever rescanning history
    (``void_description`` recomputes exactly; this trades bounded error
    for O(batch) upkeep — publish the exact form at full-rebuild points
    and the sketched form between them).

    Returns one row per metric: ``(metric, cnt, kmv)`` where exact
    metrics carry ``kmv=NULL`` and distinct metrics carry ``cnt=NULL``:

        triples (exact), subjects / objects / predicates / classes (KMV)
    """
    from ..functions.sketches import kmv_sketch

    def sk(frame, col, name):
        return kmv_sketch(
            frame.withColumn("metric", F.lit(name)), ["metric"], col, k=k
        ).select("metric", F.lit(None).cast("bigint").alias("cnt"), "kmv")

    exact = triples.agg(F.count(F.lit(1)).alias("cnt")).select(
        F.lit("triples").alias("metric"), "cnt",
        F.lit(None).cast("array<bigint>").alias("kmv"),
    )
    classes = triples.filter(F.col("pred") == RDF_TYPE_SHORT)
    return (
        exact.unionByName(sk(triples, "subj", "subjects"))
        .unionByName(sk(triples, "obj", "objects"))
        .unionByName(sk(triples, "pred", "predicates"))
        .unionByName(sk(classes, "obj", "classes"))
    )


def void_merge_states(states: DataFrame, *, k: int = 256) -> DataFrame:
    """Merge per-batch states (same schema) into one: counters add, KMV
    sketches union-merge — state(A ∪ B) == merge(state(A), state(B))
    exactly, which is what makes per-batch maintenance correct."""
    from ..functions.sketches import kmv_merge

    counts = (
        states.filter(F.col("cnt").isNotNull())
        .groupBy("metric")
        .agg(F.sum("cnt").alias("cnt"))
        .select("metric", "cnt",
                F.lit(None).cast("array<bigint>").alias("kmv"))
    )
    sketches = kmv_merge(
        states.filter(F.col("kmv").isNotNull()), ["metric"], k=k
    ).select("metric", F.lit(None).cast("bigint").alias("cnt"), "kmv")
    return counts.unionByName(sketches)


def void_estimate(state: DataFrame, *, k: int = 256) -> DataFrame:
    """State → ``(metric, value)``: exact counters pass through, KMV
    sketches read out via the (k-1)·2^60/kth estimator (exact below k
    distinct — vocabulary-sized metrics like predicates/classes are
    usually exact in practice)."""
    from ..functions.sketches import kmv_estimate

    exact = state.filter(F.col("cnt").isNotNull()).select(
        "metric", F.col("cnt").cast("double").alias("value")
    )
    est = kmv_estimate(
        state.filter(F.col("kmv").isNotNull()), k=k
    ).select("metric", F.col("est_distinct").alias("value"))
    return exact.unionByName(est)
