"""RDFS inference — materialize schema entailments over the triple tables.

Reference analog: ferenda delegates all reasoning to the external SPARQL
store ([ref: ferenda/triplestore.py :: TripleStore] — Fuseki/Jena can be
configured with an RDFS reasoner); the pipeline itself never infers. At
the north_rule's scale an external reasoner is off the table: entailment
must be a materialization pass over the triple tables so every downstream
rollup/SPARQL query sees inferred facts at scan cost.

Implemented entailment subset (the useful-materialization core of RDFS):

    rdfs5   p1 subPropertyOf p2, p2 subPropertyOf p3 → p1 subPropertyOf p3
    rdfs7   s p1 o,  p1 subPropertyOf* p2            → s p2 o
    rdfs11  c1 subClassOf c2, c2 subClassOf c3       → c1 subClassOf c3
    rdfs9   x rdf:type c1, c1 subClassOf* c2         → x rdf:type c2
    rdfs2   s p o, p rdfs:domain c                   → s rdf:type c
    rdfs3   s p o (o a URI), p rdfs:range c          → o rdf:type c

domain/range fire AFTER property inheritance (a subproperty inherits its
superproperties' domains/ranges — the rule composition RDFS requires), and
type inheritance runs last over asserted ∪ domain/range-derived types.
Axiomatic/reflexive entailments (rdfs4a/4b, c subClassOf c, the rdf:/rdfs:
vocabulary triples) are deliberately NOT emitted — they are noise at
10^12-doc scale and no consumer queries them.

Scale shape:

- the SCHEMA (subClassOf/subPropertyOf/domain/range edges) is
  vocabulary-sized — closures run iterative doubling over frames that fit
  in one broadcast; every instance-sized join below broadcasts the schema
  side, so the only corpus-sized shuffle is the final value-column
  ``dropDuplicates`` over the (bounded: |closure| per fact) inferred rows.
- inferred rows carry the provenance (src_url, part_key, …) of the
  instance triple that triggered them, so lineage survives inference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ferenda_spark.checkpoint import RoundCadence as _RoundCadence
from ferenda_spark.checkpoint import truncate_checkpoint as _tckpt
from ferenda_spark.operators.graph import _unpersist_checkpoint

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_SUBCLASSOF = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
RDFS_SUBPROPERTYOF = "http://www.w3.org/2000/01/rdf-schema#subPropertyOf"
RDFS_DOMAIN = "http://www.w3.org/2000/01/rdf-schema#domain"
RDFS_RANGE = "http://www.w3.org/2000/01/rdf-schema#range"

_VALUE_COLS = ["subj", "pred", "obj", "obj_is_uri", "obj_lang", "obj_dtype"]
_MAX_DOUBLINGS = 32


class ClosureBudgetError(RuntimeError):
    """The materialized closure grew past ``max_rows`` — a pathologically
    deep/dense transitive chain. Carries the last audited round so the
    caller's lineage can record how far the doubling got."""

    def __init__(self, rows: int, max_rows: int, rounds: int):
        self.rows, self.max_rows, self.rounds = rows, max_rows, rounds
        super().__init__(
            f"transitive closure reached {rows} rows after {rounds} "
            f"doubling rounds, over the {max_rows}-row budget — the input "
            f"chain is too deep/dense to materialize; raise max_rows, or "
            f"pass on_budget='partial' for a documented partial closure"
        )


def transitive_closure(
    edges: DataFrame,
    max_doublings: int = _MAX_DOUBLINGS,
    *,
    max_rows: int | None = None,
    on_budget: str = "raise",
    audit: list | None = None,
) -> DataFrame:
    """Strict transitive closure of a two-column ``(sub, sup)`` frame by
    iterative doubling (path length covered doubles per round — O(log
    longest-chain) self-joins). Self-loops are dropped on entry; cycles
    therefore converge (a cycle's members reach each other, their
    self-pairs are filtered each round).

    Growth audit & row budget (round-3 verdict: a closure IS inherently
    O(n²) rows on a deep chain — the operator must observe its own growth
    instead of materializing unboundedly): pass ``audit=[]`` to receive
    one dict per round ``{round, rows, added, budget_exceeded}`` — wire it
    into the pipeline's lineage rows. ``max_rows`` caps the materialized
    row count; on breach, ``on_budget='raise'`` (default) raises
    :class:`ClosureBudgetError`, ``on_budget='partial'`` returns the rows
    computed so far — a correct UNDER-approximation (every returned pair
    is a true path of length ≤ 2^rounds; deeper pairs are missing) with
    the final audit entry flagged ``budget_exceeded=True``."""
    if on_budget not in ("raise", "partial"):
        raise ValueError(f"on_budget must be 'raise' or 'partial': {on_budget!r}")
    cad = _RoundCadence()
    reach = cad.seed(
        edges.select("sub", "sup")
        .filter(F.col("sub") != F.col("sup"))
        .distinct()
    )
    n = reach.count()
    if audit is not None:
        audit.append(
            {"round": 0, "rows": n, "added": n, "budget_exceeded": False})
    for i in range(max_doublings):
        if max_rows is not None and n > max_rows:
            if audit is not None:
                audit[-1]["budget_exceeded"] = True
            if on_budget == "partial":
                return cad.finish(reach)
            cad.close()
            raise ClosureBudgetError(n, max_rows, i)
        stepped = (
            reach.select(F.col("sub"), F.col("sup").alias("_mid"))
            .join(reach.select(F.col("sub").alias("_mid"), "sup"), "_mid")
            .select("sub", "sup")
            .filter(F.col("sub") != F.col("sup"))
        )
        # the count doubles as the convergence probe AND the audit row —
        # it fully materializes the (lazily cached) round; the eager
        # checkpoint happens only on cadence rounds
        new = cad.step(reach.unionByName(stepped).distinct())
        m = new.count()
        if audit is not None:
            audit.append({"round": i + 1, "rows": m, "added": m - n,
                          "budget_exceeded": False})
        if m == n:
            # converged: new == reach as a SET (new ⊇ reach by
            # construction, same count) — return the LIVE frame; reach's
            # cache may already have been freed by a cadence checkpoint
            return cad.finish(new)
        reach, n = new, m
    cad.close()
    raise RuntimeError("transitive_closure did not converge")


def _schema_pairs(triples: DataFrame, pred: str) -> DataFrame:
    return triples.filter(
        (F.col("pred") == pred) & F.col("obj_is_uri")
    ).select(F.col("subj").alias("sub"), F.col("obj").alias("sup"))


def rdfs_closure(triples: DataFrame) -> DataFrame:
    """Inferred triples entailed by ``triples`` under the RDFS subset in
    the module docstring. Returns the SAME schema as the input, containing
    ONLY rows not already asserted (set difference on the six value
    columns); union it back for the materialized graph, or store it as its
    own layer (recommended — re-inference after schema changes then never
    rewrites asserted facts)."""
    extra = [c for c in triples.columns if c not in _VALUE_COLS]

    subclass = transitive_closure(_schema_pairs(triples, RDFS_SUBCLASSOF))
    subprop = transitive_closure(_schema_pairs(triples, RDFS_SUBPROPERTYOF))
    dom = _schema_pairs(triples, RDFS_DOMAIN).withColumnRenamed("sup", "cls")
    rng = _schema_pairs(triples, RDFS_RANGE).withColumnRenamed("sup", "cls")

    # rdfs2/rdfs3 must see inherited domains/ranges: dom(p2) applies to p1
    # when p1 subPropertyOf* p2
    inherited_dom = dom.unionByName(
        subprop.join(dom.withColumnRenamed("sub", "sup"), "sup").select("sub", "cls")
    ).distinct()
    inherited_rng = rng.unionByName(
        subprop.join(rng.withColumnRenamed("sub", "sup"), "sup").select("sub", "cls")
    ).distinct()

    schema_preds = (RDF_TYPE, RDFS_SUBCLASSOF, RDFS_SUBPROPERTYOF,
                    RDFS_DOMAIN, RDFS_RANGE)
    props = triples.filter(~F.col("pred").isin(*schema_preds))

    def _typed(frame: DataFrame, node_col: str, cls_frame: DataFrame) -> DataFrame:
        """(s p o) ⋈ broadcast(schema) → rdf:type rows carrying the
        triggering triple's provenance."""
        return frame.join(
            F.broadcast(cls_frame.withColumnRenamed("sub", "pred")), "pred"
        ).select(
            F.col(node_col).alias("subj"),
            F.lit(RDF_TYPE).alias("pred"),
            F.col("cls").alias("obj"),
            F.lit(True).alias("obj_is_uri"),
            F.lit(None).cast("string").alias("obj_lang"),
            F.lit(None).cast("string").alias("obj_dtype"),
            *[F.col(c) for c in extra],
        )

    # rdfs7: inherited property assertions (subj/obj/literal bits unchanged)
    prop_sup = props.join(
        F.broadcast(subprop.withColumnRenamed("sub", "pred")), "pred"
    ).select(
        "subj",
        F.col("sup").alias("pred"),
        *[F.col(c) for c in _VALUE_COLS if c not in ("subj", "pred")],
        *[F.col(c) for c in extra],
    )
    # rdfs2/rdfs3 over asserted + inherited property assertions
    prop_all = props.select(*_VALUE_COLS, *extra).unionByName(prop_sup)
    dom_types = _typed(prop_all, "subj", inherited_dom)
    rng_types = _typed(
        prop_all.filter(F.col("obj_is_uri")), "obj", inherited_rng
    )

    # rdfs9: type inheritance over asserted ∪ derived types
    asserted_types = triples.filter(F.col("pred") == RDF_TYPE).select(
        *_VALUE_COLS, *extra
    )
    all_types = asserted_types.unionByName(dom_types).unionByName(rng_types)
    super_types = all_types.join(
        F.broadcast(subclass.withColumnRenamed("sub", "obj")), "obj"
    ).select(
        "subj",
        F.lit(RDF_TYPE).alias("pred"),
        F.col("sup").alias("obj"),
        F.lit(True).alias("obj_is_uri"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit(None).cast("string").alias("obj_dtype"),
        *[F.col(c) for c in extra],
    )

    # rdfs5/rdfs11 materialized schema closures (tiny) as triples
    def _schema_triples(closure: DataFrame, pred: str) -> DataFrame:
        dtypes = dict(triples.dtypes)
        return closure.select(
            F.col("sub").alias("subj"),
            F.lit(pred).alias("pred"),
            F.col("sup").alias("obj"),
            F.lit(True).alias("obj_is_uri"),
            F.lit(None).cast("string").alias("obj_lang"),
            F.lit(None).cast("string").alias("obj_dtype"),
            *[F.lit(None).cast(dtypes[c]).alias(c) for c in extra],
        )

    inferred = (
        prop_sup.unionByName(dom_types)
        .unionByName(rng_types)
        .unionByName(super_types)
        .unionByName(_schema_triples(subclass, RDFS_SUBCLASSOF))
        .unionByName(_schema_triples(subprop, RDFS_SUBPROPERTYOF))
    )

    # deduplicate on VALUE columns (min provenance, deterministic) and
    # subtract everything already asserted
    if extra:
        ordered = [c for c in ("src_url", "part_key") if c in extra] + [
            c for c in extra if c not in ("src_url", "part_key")
        ]
        deduped = (
            inferred.groupBy(*_VALUE_COLS)
            .agg(F.min(F.struct(*ordered)).alias("_prov"))
            .select(*_VALUE_COLS, *[F.col(f"_prov.{c}").alias(c) for c in ordered])
        )
    else:
        deduped = inferred.dropDuplicates(_VALUE_COLS)
    # anti-join must be NULL-safe: obj_lang/obj_dtype are NULL on most
    # rows and plain equi-keys never match NULL=NULL, which would leak
    # every asserted type triple back out as "inferred"
    asserted = triples.select(*_VALUE_COLS).alias("_a")
    ded = deduped.alias("_d")
    cond = None
    for c in _VALUE_COLS:
        e = F.col(f"_d.{c}").eqNullSafe(F.col(f"_a.{c}"))
        cond = e if cond is None else (cond & e)
    return ded.join(asserted, cond, "left_anti")
