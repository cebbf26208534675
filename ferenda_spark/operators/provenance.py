"""PROV-O provenance triples from the pipeline's lineage rows.

Reference analog: ferenda records per-document provenance implicitly
(file mtimes, the `entry.json` DocumentEntry) — the north_rule makes
"per-partition lineage rows and metrics" a first-class deliverable, and
this operator closes the loop by expressing those lineage rows IN the
knowledge graph itself, using the W3C PROV-O vocabulary: each (run,
stage, partition) becomes a ``prov:Activity``, each stage-partition
output a ``prov:Entity`` that ``prov:wasGeneratedBy`` it, with
``prov:used`` / ``prov:wasDerivedFrom`` edges to the upstream stage's
entity and the measured counters as literal metrics. The KG can then
answer its own audit queries ("which partitions fed this rollup, at what
cost") through the same SPARQL engine that serves content queries.

Scale shape: lineage is O(stages × partitions) — thousands of rows for a
100 TB run — and the conversion is one map-only projection + explode
(six-ish triples per lineage row). NULL metrics emit no triple (the
R2RML NULL-drop rule, operators/r2rml.py:1)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROV_ACTIVITY = "prov:Activity"
PROV_ENTITY = "prov:Entity"
RDF_TYPE = "rdf:type"


def prov_triples(
    lineage: DataFrame,
    upstream: dict[str, str] | None = None,
) -> DataFrame:
    """Lineage rows (stage, part_key, partition_id, n_in, n_out, bytes_in,
    wall_ms, run_id) → PROV-O triples ``(subj, pred, obj, obj_is_uri)``.

    ``upstream`` maps stage → the stage whose same-partition output it
    consumed (e.g. ``{"triples": "parse"}``); stages absent from the map
    emit no used/derivedFrom edges (they read external input).

    Per lineage row:
      act = act:<run_id>/<stage>/<part_key>   a prov:Activity
      ent = tbl:<stage>/p<part_key>           a prov:Entity
      ent prov:wasGeneratedBy act
      act prov:used tbl:<up>/p<part_key>          (when upstream known)
      ent prov:wasDerivedFrom tbl:<up>/p<part_key> (when upstream known)
      act m:nIn / m:nOut / m:bytesIn / m:wallMs <literal>  (NULLs drop)
    """
    pk = F.col("part_key").cast("string")
    act = F.concat(
        F.lit("act:"), F.col("run_id"), F.lit("/"), F.col("stage"),
        F.lit("/"), pk,
    )
    ent = F.concat(F.lit("tbl:"), F.col("stage"), F.lit("/p"), pk)
    up_stage = None
    if upstream:
        for s, u in upstream.items():
            cond = F.col("stage") == s
            up_stage = (
                F.when(cond, F.lit(u))
                if up_stage is None
                else up_stage.when(cond, F.lit(u))
            )
        up_ent = F.when(
            up_stage.isNotNull(),
            F.concat(F.lit("tbl:"), up_stage, F.lit("/p"), pk),
        )
    else:
        up_ent = F.lit(None).cast("string")

    def t(s, p, o, is_uri):
        return F.struct(
            s.alias("subj"), F.lit(p).alias("pred"), o.alias("obj"),
            F.lit(is_uri).alias("obj_is_uri"),
        )

    rows = F.array(
        t(act, RDF_TYPE, F.lit(PROV_ACTIVITY), True),
        t(ent, RDF_TYPE, F.lit(PROV_ENTITY), True),
        t(ent, "prov:wasGeneratedBy", act, True),
        t(act, "prov:used", up_ent, True),
        t(ent, "prov:wasDerivedFrom", up_ent, True),
        t(act, "m:nIn", F.col("n_in").cast("string"), False),
        t(act, "m:nOut", F.col("n_out").cast("string"), False),
        t(act, "m:bytesIn", F.col("bytes_in").cast("string"), False),
        t(act, "m:wallMs", F.col("wall_ms").cast("string"), False),
    )
    return (
        lineage.select(F.explode(rows).alias("t"))
        .select("t.*")
        .filter(F.col("obj").isNotNull())
    )
