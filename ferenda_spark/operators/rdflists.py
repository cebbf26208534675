"""rdf:List flattening: first/rest cons-cell chains → (head, idx, member).

Reference analog: ferenda's RDFa/XHTML output and any JSON-LD ``@list``
harvest (operators/structured.py) represent ORDER with the rdf:List
vocabulary — a linked list of cons cells (``rdf:first`` = the member,
``rdf:rest`` = the next cell, terminated by ``rdf:nil``). Relational
consumers need the positional form ``(list head, index, member)``; at
corpus scale the lists are millions-of-short-chains, and walking each
chain sequentially per list on the driver is exactly the anti-pattern
this repo exists to avoid.

Algorithm: each cell's index IS its backward distance to the list head,
so flattening reduces to redirect resolution (operators/redirects.py —
pointer doubling with exact hop counts) over the REVERSED rest edges:
every cell walks back to its head in O(log length) rounds, hops = index.
Heads (cells no rest edge points at) get index 0 directly. Cells caught
in a rest-cycle (malformed markup) never reach a head; they are emitted
with ``head NULL, ok=false`` — errors-as-data, the ingest-wide contract.

Shuffles: the reversal/dedup + one join per doubling round (the
redirects machinery, localCheckpointed) + the final first-edge join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .redirects import resolve_redirects

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"


def flatten_rdf_lists(triples: DataFrame) -> DataFrame:
    """→ ``(head, idx, member, member_is_uri, ok)`` — one row per cons
    cell carrying an ``rdf:first``; idx is 0-based from the head. Cells
    in a malformed rest-cycle get head NULL / idx NULL / ok false."""
    rest = triples.filter(
        (F.col("pred") == RDF_REST)
        & F.col("obj_is_uri")
        & (F.col("obj") != RDF_NIL)
    ).select(F.col("subj").alias("cell"), F.col("obj").alias("nxt"))
    firsts = triples.filter(F.col("pred") == RDF_FIRST).select(
        F.col("subj").alias("cell"),
        F.col("obj").alias("member"),
        F.col("obj_is_uri").alias("member_is_uri"),
    )
    # backward walk: reversed rest edges, every non-head cell → its head
    back = resolve_redirects(
        rest.select(F.col("nxt").alias("src"), F.col("cell").alias("dst"))
    ).select(
        F.col("url").alias("cell"),
        F.col("final_url").alias("head"),
        F.col("n_hops").alias("idx"),
        F.col("is_cycle"),
    )
    positions = firsts.join(back, "cell", "left").select(
        "cell",
        # a cell with no backward row is itself a head (nothing points
        # at it): idx 0
        F.when(F.col("is_cycle"), F.lit(None).cast("string"))
        .otherwise(F.coalesce("head", F.col("cell")))
        .alias("head"),
        F.when(F.col("is_cycle"), F.lit(None).cast("int"))
        .otherwise(F.coalesce("idx", F.lit(0)))
        .alias("idx"),
        "member",
        "member_is_uri",
        (~F.coalesce("is_cycle", F.lit(False))).alias("ok"),
    )
    return positions.drop("cell")
