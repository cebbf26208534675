"""owl:sameAs canonicalization — graph-level entity merge.

Reference analog: ferenda never merges entities after the fact — its URI
space is curated (COIN templates, [ref: ferenda/thirdparty/coin.py ::
URISpace]) so two URIs never denote the same thing. At the north_rule's
Common-Crawl scale the opposite holds: publisher-asserted equivalences
(schema.org `sameAs`, Wikidata/DBpedia links harvested by
operators/structured.py) and our own linker's alias clusters both emit
owl:sameAs edges between URIs that MUST collapse to one node, or every
downstream rollup/count double-counts entities.

Semantics (standard owl:sameAs closure, restricted to rewriting):

- sameAs is symmetric + transitive → its connected components are
  equivalence classes. We reuse ``operators.graph.connected_components``
  (min-label + pointer jumping, O(log diameter) shuffle rounds).
- each class elects the lexicographically smallest URI as canonical —
  deterministic, partitioning- and re-run-stable (the ledger/resume
  contract), and replayable by the DuckDB oracle with plain ``min``.
- every triple's subject, and its object WHEN ``obj_is_uri``, is rewritten
  through the class map; literals are never touched.
- the consumed sameAs assertions are dropped from the fact set; pass
  ``keep_provenance=True`` to get them back normalized as
  ``(canonical, owl:sameAs, member)`` rows — one per non-canonical member,
  the audit trail that says *why* a node absorbed others.

Scale shape (the part that must survive 100 TB):

- the class map has one row per URI that appears in a sameAs edge — a
  small fraction of the triple set. The two rewrite joins key on the
  ALIAS side (subj / obj), which is unique in the map, so a celebrity
  entity with 10^6 aliases creates a big component but never a hot join
  key: the skew lives in the map's *canonical* column, which is only ever
  a payload here.
- rewriting is two left equi-joins + coalesce — AQE broadcasts the map
  when it fits, sort-merge otherwise; no UDFs, fully codegen'd.
- duplicate facts created by the merge (two aliases asserting the same
  statement) are deduped on the six VALUE columns only via one
  ``dropDuplicates`` (opt-out ``dedup=False`` when the caller wants raw
  provenance rows), keeping min(src_url)/min(part_key) deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ferenda_spark.operators.graph import connected_components

OWL_SAMEAS = "http://www.w3.org/2002/07/owl#sameAs"

#: the six columns that define a triple's VALUE (everything but provenance)
_VALUE_COLS = ["subj", "pred", "obj", "obj_is_uri", "obj_lang", "obj_dtype"]


def _rank_uris(uris: DataFrame) -> DataFrame:
    """(uri) → (uri, rk bigint): a dense, deterministic, collision-free
    0..V-1 id per distinct URI, built WITHOUT a global sort — row_number
    within a hash bucket plus the bucket's cumulative offset (the same
    two-level construction as operators/walks.py negative_samples; 64
    B-way parallel windows, one broadcast of the 64-row offset table).
    The rank order is (bucket, uri) — NOT lexicographic over all URIs,
    which is why the caller restores the min-URI canonical itself."""
    n_buckets = 64
    bucketed = uris.withColumn(
        "bk", F.pmod(F.xxhash64("uri"), F.lit(n_buckets))
    )
    within = bucketed.withColumn(
        "wrk", F.row_number().over(Window.partitionBy("bk").orderBy("uri")) - 1
    )
    offsets = (
        bucketed.groupBy("bk")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "off",
            F.coalesce(
                F.sum("cnt").over(
                    Window.orderBy("bk").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("bk", "off")
    )
    return within.join(F.broadcast(offsets), "bk").select(
        "uri", (F.col("wrk") + F.col("off")).alias("rk")
    )


def sameas_classes(triples: DataFrame, *, pred: str = OWL_SAMEAS) -> DataFrame:
    """Equivalence classes of the sameAs subgraph: ``(node, canonical)``,
    one row per URI mentioned in any sameAs edge (including canonicals
    themselves — callers may inner-join without a coalesce fallback only
    if they filter). ``canonical`` = min URI of the component.

    Scale shape (round-4): the connected-components rounds run over DENSE
    LONG ids, not URI strings. URIs average ~30-80 bytes and the CC loop
    shuffles its keys every round (~25 rounds on a critical-regime alias
    graph), so string keys multiply the dominant shuffle ~4-10x. The
    id-encode costs two one-time edge-sized joins + a node-sized rank
    build; the min-URI canonical (the public, oracle-replayable contract)
    is restored afterwards with one node-sized groupBy — exact, because
    min(uri) per component is independent of the internal id order.
    Measured at 2M string pairs / 4M URIs, local[8]: CC-on-strings
    shuffled 11.6 GB in 464s; see BENCH/BASELINE.md."""
    edges = (
        triples.filter((F.col("pred") == pred) & F.col("obj_is_uri"))
        .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
    uris = (
        edges.select(F.col("src").alias("uri"))
        .unionByName(edges.select(F.col("dst").alias("uri")))
        .distinct()
    )
    # materialized once (node-sized) and referenced by three joins AND the
    # lazily-returned plan — checkpoint, not persist/unpersist, so the id
    # table survives until the caller materializes (the same lifetime rule
    # as connected_components' returned labels checkpoint)
    from ferenda_spark.checkpoint import truncate_checkpoint

    ids = truncate_checkpoint(_rank_uris(uris))
    e = (
        edges.join(ids.withColumnRenamed("uri", "src"), "src")
        .withColumnRenamed("rk", "src_id")
        .join(ids.withColumnRenamed("uri", "dst"), "dst")
        .withColumnRenamed("rk", "dst_id")
        .select("src_id", "dst_id")
    )
    comp = connected_components(e, "src_id", "dst_id")  # (node, comp)
    member = comp.join(
        ids.withColumnRenamed("rk", "node"), "node"
    ).select("uri", "comp")
    canonical = member.groupBy("comp").agg(
        F.min("uri").alias("canonical")
    )
    return member.join(canonical, "comp").select(
        F.col("uri").alias("node"), "canonical"
    )


def canonicalize_sameas(
    triples: DataFrame,
    *,
    pred: str = OWL_SAMEAS,
    keep_provenance: bool = False,
    dedup: bool = True,
) -> DataFrame:
    """Rewrite a TRIPLES-schema frame through its own owl:sameAs closure.

    Returns the same schema as the input. sameAs rows are consumed (and,
    with ``keep_provenance``, re-emitted normalized canonical→member with
    the min src_url/part_key of the class's original assertions as
    provenance)."""
    classes = sameas_classes(triples, pred=pred)
    facts = triples.filter(F.col("pred") != pred)

    smap = classes.select(
        F.col("node").alias("subj"), F.col("canonical").alias("_subj_canon")
    )
    omap = classes.select(
        F.col("node").alias("obj"), F.col("canonical").alias("_obj_canon")
    )
    extra = [c for c in facts.columns if c not in _VALUE_COLS]
    rewritten = (
        facts.join(smap, "subj", "left")
        .join(omap, "obj", "left")
        .select(
            F.coalesce("_subj_canon", "subj").alias("subj"),
            F.col("pred"),
            F.when(F.col("obj_is_uri"), F.coalesce("_obj_canon", "obj"))
            .otherwise(F.col("obj"))
            .alias("obj"),
            *(
                [F.col(c) for c in _VALUE_COLS if c not in ("subj", "pred", "obj")]
                + [F.col(c) for c in extra]
            ),
        )
    )

    if keep_provenance:
        # one row per non-canonical member; provenance = the class's min
        # original sameAs assertion provenance (deterministic)
        orig = triples.filter((F.col("pred") == pred) & F.col("obj_is_uri"))
        prov_cols = {}
        if "src_url" in triples.columns:
            prov_cols["src_url"] = F.min("src_url").alias("src_url")
        if "part_key" in triples.columns:
            prov_cols["part_key"] = F.min("part_key").alias("part_key")
        cls_prov = (
            orig.join(
                classes.select(F.col("node").alias("subj"), "canonical"), "subj"
            )
            .groupBy("canonical")
            .agg(*prov_cols.values())
            if prov_cols
            else classes.select("canonical").distinct()
        )
        dtypes = dict(facts.dtypes)
        members = (
            classes.filter(F.col("node") != F.col("canonical"))
            .join(cls_prov, "canonical")
            .select(
                F.col("canonical").alias("subj"),
                F.lit(pred).alias("pred"),
                F.col("node").alias("obj"),
                F.lit(True).alias("obj_is_uri"),
                F.lit(None).cast("string").alias("obj_lang"),
                F.lit(None).cast("string").alias("obj_dtype"),
                *[
                    F.col(c) if c in prov_cols
                    else F.lit(None).cast(dtypes[c]).alias(c)
                    for c in extra
                ],
            )
        )
        rewritten = rewritten.unionByName(members)

    if dedup:
        if extra:
            # deterministic winner per value-identical group: min of the
            # provenance struct (src_url/part_key first, so the ordering is
            # meaningful); struct-min keeps the columns consistent with
            # each other, unlike independent per-column mins.
            ordered = [c for c in ("src_url", "part_key") if c in extra] + [
                c for c in extra if c not in ("src_url", "part_key")
            ]
            rewritten = (
                rewritten.groupBy(*_VALUE_COLS)
                .agg(F.min(F.struct(*ordered)).alias("_prov"))
                .select(*_VALUE_COLS, *[F.col(f"_prov.{c}").alias(c) for c in ordered])
            )
        else:
            rewritten = rewritten.dropDuplicates(_VALUE_COLS)
    return rewritten
