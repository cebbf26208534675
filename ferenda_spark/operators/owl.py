"""OWL-lite property semantics: inverseOf / Symmetric / Transitive
materialization + Functional-property conflict audit.

Extends the RDFS entailment layer (operators/inference.py — rdfs2/3/5/7/
9/11) with the four OWL property characteristics that matter for
web-harvested graphs (schema.org and wikidata-style vocabularies use all
four): ``owl:inverseOf`` (isPartOf ↔ hasPart), ``owl:SymmetricProperty``
(sameAs-adjacent "relatedTo" edges), ``owl:TransitiveProperty``
(containment/broader chains), and ``owl:FunctionalProperty`` — which is
NOT an inference rule here but an AUDIT: at 10^12 documents two crawls
WILL assert conflicting values, and silently smushing subjects (the
formal owl:sameAs entailment) is never what a curation pipeline wants;
a violations table routed to triage is (same philosophy as SHACL-lite,
operators/validation.py).

Scale shape, following inference.py: property-characteristic declarations
are vocabulary-sized → broadcast joins against the corpus-sized instance
table; inverse/symmetric are map-only swaps after the broadcast pick;
transitive closure runs iterative doubling ON INSTANCE EDGES — per
predicate, O(log longest-chain) self-joins keyed on (pred, node), which
is the one genuinely super-linear rule (same cost class as SPARQL's `+`
path operator, operators/sparql.py) and why it only fires for predicates
explicitly declared transitive. Inferred-only output via the same
NULL-safe value-column anti-join rdfs_closure uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .inference import _VALUE_COLS, RDF_TYPE, transitive_closure

OWL_INVERSE_OF = "http://www.w3.org/2002/07/owl#inverseOf"
OWL_SYMMETRIC = "http://www.w3.org/2002/07/owl#SymmetricProperty"
OWL_TRANSITIVE = "http://www.w3.org/2002/07/owl#TransitiveProperty"
OWL_FUNCTIONAL = "http://www.w3.org/2002/07/owl#FunctionalProperty"


def _declared(triples: DataFrame, cls: str) -> DataFrame:
    """Predicates declared ``rdf:type <cls>`` — vocabulary-sized."""
    return triples.filter(
        (F.col("pred") == RDF_TYPE) & (F.col("obj") == cls)
    ).select(F.col("subj").alias("p")).distinct()


def _uri_edge(subj, pred, obj, extra_cols):
    return [
        subj.alias("subj"), pred.alias("pred"), obj.alias("obj"),
        F.lit(True).alias("obj_is_uri"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit(None).cast("string").alias("obj_dtype"),
        *extra_cols,
    ]


def owl_closure(
    triples: DataFrame,
    max_doublings: int = 32,
    *,
    max_closure_rows: int | None = None,
    on_budget: str = "raise",
    closure_audit: list | None = None,
) -> DataFrame:
    """Inferred-only triples entailed by the four property
    characteristics; same schema as the input, provenance columns carried
    from a triggering triple (min-struct dedup, deterministic). Union
    with the asserted graph — or keep as its own layer like the RDFS
    inferred layer (recommended; see plans/pipeline.py's enrichment
    stage).

    Growth audit & budget (round-3 verdict watch-item: materializing a
    transitive closure over a pathologically deep instance chain is
    inherently O(n²) rows): ``closure_audit=[]`` receives per-doubling
    growth dicts for lineage; ``max_closure_rows`` bounds the
    materialized transitive rows — breach raises
    :class:`~.inference.ClosureBudgetError` (default) or, with
    ``on_budget='partial'``, degrades to a documented partial closure
    (paths up to 2^rounds; the audit's last entry carries
    ``budget_exceeded=True``). Real KG transitive predicates (broader /
    partOf) are shallow; the budget is the tripwire for crawl spam.

    Composition semantics: inverse/symmetric fire once over the ASSERTED
    edges, and the transitive closure runs over asserted ∪ those derived
    rows — i.e. characteristics compose THROUGH the transitive rule
    (symmetric+transitive → clique; inverse feeding a transitive inverse
    predicate → closed), which covers every sane vocabulary. A predicate
    whose derived edges would need to re-trigger a DIFFERENT predicate's
    inverse/symmetric rule (p symmetric AND p inverseOf q) would need a
    mutual fixpoint — declare such vocabularies as two explicit rules
    instead."""
    extra = [c for c in triples.columns if c not in _VALUE_COLS]
    extra_f = [F.col(c) for c in extra]

    inv = triples.filter(
        (F.col("pred") == OWL_INVERSE_OF) & F.col("obj_is_uri")
    ).select(F.col("subj").alias("p"), F.col("obj").alias("q")).distinct()
    # inverseOf is symmetric in itself: q inverseOf p holds too
    inv_full = inv.unionByName(
        inv.select(F.col("q").alias("p"), F.col("p").alias("q"))
    ).distinct()
    sym = _declared(triples, OWL_SYMMETRIC)
    trans = _declared(triples, OWL_TRANSITIVE)

    uri_edges = triples.filter(F.col("obj_is_uri"))

    inv_rows = uri_edges.join(
        F.broadcast(inv_full.withColumnRenamed("p", "pred")), "pred"
    ).select(
        *_uri_edge(F.col("obj"), F.col("q"), F.col("subj"), extra_f)
    )
    sym_rows = uri_edges.join(
        F.broadcast(sym.withColumnRenamed("p", "pred")), "pred"
    ).select(
        *_uri_edge(F.col("obj"), F.col("pred"), F.col("subj"), extra_f)
    )

    # transitive closure per declared-transitive predicate, over
    # asserted ∪ inverse/symmetric-derived edges of that predicate (the
    # spec composes: symmetric+transitive must close over both)
    trans_in = (
        uri_edges.select(*_VALUE_COLS, *extra_f)
        .unionByName(inv_rows)
        .unionByName(sym_rows)
        .join(F.broadcast(trans.withColumnRenamed("p", "pred")), "pred")
    )
    # doubling keyed on (pred, node): tag sub/sup with the predicate so
    # one closure call serves every transitive predicate at once. Closure
    # rows carry NULL provenance (a path spans many sources — same
    # convention as rdfs_closure's schema-closure triples).
    tagged = trans_in.select(
        F.concat_ws("\x00", "pred", "subj").alias("sub"),
        F.concat_ws("\x00", "pred", "obj").alias("sup"),
    )
    closed = transitive_closure(
        tagged, max_doublings,
        max_rows=max_closure_rows, on_budget=on_budget, audit=closure_audit,
    ).select(
        F.split("sub", "\x00")[0].alias("pred"),
        F.split("sub", "\x00")[1].alias("subj"),
        F.split("sup", "\x00")[1].alias("obj"),
    )
    dtypes = dict(triples.dtypes)
    trans_rows = closed.select(
        *_uri_edge(
            F.col("subj"), F.col("pred"), F.col("obj"),
            [F.lit(None).cast(dtypes[c]).alias(c) for c in extra],
        )
    )

    inferred = inv_rows.unionByName(sym_rows).unionByName(trans_rows)
    if extra:
        ordered = [c for c in ("src_url", "part_key") if c in extra] + [
            c for c in extra if c not in ("src_url", "part_key")
        ]
        deduped = (
            inferred.groupBy(*_VALUE_COLS)
            .agg(F.min(F.struct(*ordered)).alias("_prov"))
            .select(*_VALUE_COLS,
                    *[F.col(f"_prov.{c}").alias(c) for c in ordered])
        )
    else:
        deduped = inferred.dropDuplicates(_VALUE_COLS)
    asserted = triples.select(*_VALUE_COLS).alias("_a")
    ded = deduped.alias("_d")
    cond = None
    for c in _VALUE_COLS:
        e = F.col(f"_d.{c}").eqNullSafe(F.col(f"_a.{c}"))
        cond = e if cond is None else (cond & e)
    return ded.join(asserted, cond, "left_anti")


def functional_conflicts(triples: DataFrame) -> DataFrame:
    """Audit rows for declared-functional predicates asserted with more
    than one distinct object per subject: ``(subj, pred, n_values,
    values)`` with the conflicting objects as a sorted array (bounded by
    the conflict fan-out — triage payload, not a join key). One broadcast
    pick + one map-side-combined groupBy."""
    fun = _declared(triples, OWL_FUNCTIONAL)
    scoped = triples.join(
        F.broadcast(fun.withColumnRenamed("p", "pred")), "pred"
    )
    return (
        scoped.groupBy("subj", "pred")
        .agg(
            # distinct over the FULL term (lexical + lang + dtype +
            # uri-ness), not the lexical form alone: "Boston"@en vs
            # "Boston"^^xsd:string IS a conflict — countDistinct over a
            # struct (a struct is never NULL, so NULL lang/dtype rows
            # still count, unlike multi-column countDistinct)
            F.countDistinct(
                F.struct("obj", "obj_is_uri", "obj_lang", "obj_dtype")
            ).alias("n_values"),
            F.sort_array(F.collect_set("obj")).alias("values"),
        )
        .filter(F.col("n_values") > 1)
    )
