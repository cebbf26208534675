"""Redirect-chain resolution — canonical final URL per crawl source.

Reference analog: ferenda's downloader follows HTTP redirects in-process
per document ([ref: ferenda/documentrepository.py :: download_single],
requests following 3xx) and only the final body is stored. A web-scale
crawl stores the redirect EDGES (CDX / crawl logs record each 3xx hop
separately) and resolution becomes a graph problem over billions of
edges: every URL must map to the final destination of its chain — or be
flagged as part of a redirect loop — before dedup/linking, otherwise the
same content counts once per chain alias.

Algorithm: pointer doubling over the functional graph (each src keeps ONE
outgoing edge — the deterministically smallest dst, so conflicting crawl
records can't make resolution ambiguous). Each round replaces every
node's known endpoint with its endpoint's endpoint, doubling the covered
chain length — O(log longest-chain) self-join rounds, localCheckpoint-
truncated like connected_components. A node is DONE when its current
endpoint has no outgoing edge. Nodes still unfinished after the round
budget (2^max_doublings hops — astronomically past any real chain) are
redirect LOOPS: ``is_cycle=true, final_url=NULL`` rather than an
exception or an arbitrary member.

Returns ``(url, final_url, n_hops, is_cycle)`` for every src in the edge
set; ``n_hops`` is the exact chain length for resolved chains (segment
hop counts add through the doubling), NULL for loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ferenda_spark.checkpoint import RoundCadence as _RoundCadence
from ferenda_spark.checkpoint import truncate_checkpoint as _tckpt
from ferenda_spark.operators.graph import _unpersist_checkpoint

_MAX_DOUBLINGS = 16


def resolve_redirects(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_doublings: int = _MAX_DOUBLINGS,
) -> DataFrame:
    e = (
        edges.select(F.col(src).alias("url"), F.col(dst).alias("nxt"))
        .filter(F.col("url") != F.col("nxt"))
        .groupBy("url")
        .agg(F.min("nxt").alias("nxt"))
    )
    srcs = e.select(F.col("url").alias("nxt")).distinct()

    # state: url → (cur endpoint, exact hops so far, done?).
    # interval=1: the done-probe below is an action EVERY round, so each
    # round is materialized anyway — a >1 cadence window amortizes nothing
    # and costs extra (measured 1.6x on long chains: rdf_list_flatten
    # 5.9s at interval=4 vs 3.6s at interval=1, sf0.1; probe-per-round
    # loops pin interval=1, fixed-round loops keep the default window)
    cad = _RoundCadence(interval=1)
    cur = (
        e.join(srcs, "nxt", "left_semi")
        .select("url", F.col("nxt").alias("cur"), F.lit(1).alias("hops"),
                F.lit(False).alias("done"))
        .unionByName(
            e.join(srcs, "nxt", "left_anti").select(
                "url", F.col("nxt").alias("cur"), F.lit(1).alias("hops"),
                F.lit(True).alias("done"),
            )
        )
        .transform(cad.seed)
    )

    for _ in range(max_doublings):
        # the done-probe materializes the (lazily cached) round; eager
        # checkpoints only every cadence round (RoundCadence)
        if cur.filter(~F.col("done")).limit(1).count() == 0:
            break
        hop = cur.select(
            F.col("url").alias("cur"),
            F.col("cur").alias("_jcur"),
            F.col("hops").alias("_jhops"),
            F.col("done").alias("_jdone"),
        )
        stepped = (
            cur.join(hop, "cur", "left")
            .select(
                "url",
                F.when(F.col("done") | F.col("_jcur").isNull(), F.col("cur"))
                .otherwise(F.col("_jcur"))
                .alias("cur"),
                F.when(F.col("done") | F.col("_jcur").isNull(), F.col("hops"))
                .otherwise(F.col("hops") + F.col("_jhops"))
                .alias("hops"),
                (
                    F.col("done")
                    | F.coalesce(F.col("_jdone"), F.lit(True))
                ).alias("done"),
            )
            .transform(cad.step)
        )
        cur = stepped

    return cad.finish(cur).select(
        "url",
        F.when(F.col("done"), F.col("cur")).alias("final_url"),
        F.when(F.col("done"), F.col("hops")).cast("int").alias("n_hops"),
        (~F.col("done")).alias("is_cycle"),
    )
