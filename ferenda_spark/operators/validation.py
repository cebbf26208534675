"""SHACL-lite shape validation — declarative graph constraints → a
violations table.

Reference analog: ferenda's render step validates each document's minimum
metadata (rdf:type, dcterms:title, prov:wasGeneratedBy —
[ref: ferenda/decorators.py :: render]) and raises per doc. At corpus
scale validation must be (a) declarative — constraints are DATA, reviewed
and versioned, not code — and (b) total: every violation lands in an
audit table (same errors-as-data discipline as curation verdicts), never
an exception. The constraint vocabulary is the useful core of W3C SHACL
(sh:minCount / sh:maxCount / sh:datatype / sh:nodeKind / sh:pattern with
class targeting), which is itself the lineage of ferenda's hand-rolled
checks.

Shapes frame (one row per (shape, property) constraint):

    shape:        STRING  report label
    target_class: STRING  focus nodes = subjects with rdf:type this class
    property:     STRING  constrained predicate
    min_count:    INT     violation when a focus has fewer assertions
    max_count:    INT?    violation when more (NULL = unbounded)
    datatype:     STRING? literal datatype required on every value
    node_kind:    STRING? 'IRI' | 'Literal' required on every value
    pattern:      STRING? regex the lexical form must match (use the
                          Java∩RE2 subset so the DuckDB oracle agrees)

Output: ``(focus, shape, constraint, value)`` — one row per violated
constraint per focus (count constraints: value = the offending count;
value constraints: one row per distinct offending value).

Scale shape: shapes are vocabulary-sized → broadcast everywhere; the two
corpus-sized operations are the scope join (assertions ⋈ focus on subj —
one shuffle) and the per-(focus, shape) count (map-side combinable).
Everything else is codegen'd filters. No UDFs, no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

SHAPE_COLUMNS = [
    "shape", "target_class", "property",
    "min_count", "max_count", "datatype", "node_kind", "pattern",
]


def shapes_df(spark, rows: list[dict]) -> DataFrame:
    """Build a shapes frame from dicts (missing keys → no constraint)."""
    filled = [
        tuple(r.get(c) for c in SHAPE_COLUMNS) for r in rows
    ]
    return spark.createDataFrame(
        filled,
        "shape string, target_class string, property string, "
        "min_count int, max_count int, datatype string, node_kind string, "
        "pattern string",
    )


def validate_shapes(triples: DataFrame, shapes: DataFrame) -> DataFrame:
    """Violations of ``shapes`` over a TRIPLES-schema frame (see module
    docstring for both contracts)."""
    sh = F.broadcast(shapes)

    # focus nodes: one row per (focus, shape-row); carries the constraint
    focus = (
        triples.filter((F.col("pred") == RDF_TYPE) & F.col("obj_is_uri"))
        .select(F.col("subj").alias("focus"), F.col("obj").alias("target_class"))
        .distinct()
        .join(sh, "target_class")
    )

    # in-scope assertions: the shape's property asserted by a focus node.
    # join keys (subj, pred=property) — the broadcast prunes first, then
    # one shuffle joins assertions to focus scope on the subject.
    vals = (
        triples.filter(F.col("pred") != RDF_TYPE)
        .select(
            F.col("subj").alias("focus"),
            F.col("pred").alias("property"),
            "obj", "obj_is_uri", "obj_dtype",
        )
        .join(
            focus.select(
                "focus", "property", "shape",
                "datatype", "node_kind", "pattern",
            ),
            ["focus", "property"],
        )
    )

    counts = vals.groupBy("focus", "shape").agg(
        F.count(F.lit(1)).alias("_n")
    )
    counted = focus.join(counts, ["focus", "shape"], "left").withColumn(
        "_n", F.coalesce("_n", F.lit(0))
    )

    def _v(df, constraint, value_col):
        return df.select(
            "focus",
            "shape",
            F.lit(constraint).alias("constraint"),
            value_col.cast("string").alias("value"),
        )

    min_v = _v(
        counted.filter(F.col("_n") < F.col("min_count")),
        "minCount", F.col("_n"),
    )
    max_v = _v(
        counted.filter(
            F.col("max_count").isNotNull() & (F.col("_n") > F.col("max_count"))
        ),
        "maxCount", F.col("_n"),
    )
    dtype_v = _v(
        vals.filter(
            F.col("datatype").isNotNull()
            & (
                F.col("obj_is_uri")
                | F.col("obj_dtype").isNull()
                | (F.col("obj_dtype") != F.col("datatype"))
            )
        ),
        "datatype", F.col("obj"),
    )
    kind_v = _v(
        vals.filter(
            ((F.col("node_kind") == "IRI") & ~F.col("obj_is_uri"))
            | ((F.col("node_kind") == "Literal") & F.col("obj_is_uri"))
        ),
        "nodeKind", F.col("obj"),
    )
    # regexp_like with a COLUMN pattern recompiles per row — fine here
    # because only rows of constrained predicates reach it and shape
    # patterns are few; swap to per-shape literal branches if a profile
    # ever shows this hot
    pattern_v = _v(
        vals.filter(
            F.col("pattern").isNotNull()
            & ~F.regexp_like(F.col("obj"), F.col("pattern"))
        ),
        "pattern", F.col("obj"),
    )

    return (
        min_v.unionByName(max_v)
        .unionByName(dtype_v)
        .unionByName(kind_v)
        .unionByName(pattern_v)
        .distinct()
    )
