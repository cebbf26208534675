"""Deterministic random walks — DeepWalk-style corpus generation for
graph embedding training, without randomness.

A node-embedding pipeline (DeepWalk/node2vec) needs millions of short
walks over the entity/host graph as its training corpus. ``sample()``
-based walks are irreproducible across re-runs and cluster sizes — the
same violation `splits.py` documents for corpus splitting — so the
"random" choice here is hash-derived: at step t of the walk started at
s, standing on node u, the next node is

    neighbors(u)[ hash60(s ‖ ':' ‖ t ‖ ':' ‖ u) mod degree(u) ]

with ``neighbors(u)`` in ascending order. The walk is a pure function of
(graph, start, salt): re-runs, other partitionings, and the DuckDB
oracle all reproduce it bit-for-bit. Conditioning the hash on the START
(not just u, t) makes two walks crossing the same node at the same step
diverge, like independent draws.

Scale shape: the ranked adjacency (one window shuffle keyed on node,
streaming row_number) is built once; each of the ``length`` steps is one
equi-join of the walk frontier against it (hot nodes are AQE-splittable
join keys, not window partitions). Dead-end nodes truncate their walk —
rows simply stop, mirroring DeepWalk's behavior on directed graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.sketches import hash60


def random_walks(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    length: int = 4,
    directed: bool = False,
    salt: str = "",
) -> DataFrame:
    """→ ``(start, step, node)`` — one row per visited position, step 0
    is the start node itself; every node in the graph starts one walk.
    ``length`` = number of transitions attempted."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    if not directed:
        e = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    e = e.distinct()
    ranked = e.select(
        "u",
        "v",
        (F.row_number().over(Window.partitionBy("u").orderBy("v")) - 1).alias(
            "rk"
        ),
    )
    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    adj = ranked.join(deg, "u")

    walk = (
        e.select(F.col("u").alias("start")).distinct()
        .select("start", F.lit(0).alias("step"),
                F.col("start").alias("node"))
    )
    out = walk
    cur = walk
    for t in range(1, length + 1):
        pick = F.pmod(
            hash60(
                F.concat_ws(
                    ":",
                    F.col("start").cast("string"),
                    F.lit(str(t - 1) + salt),
                    F.col("node").cast("string"),
                )
            ),
            F.col("deg"),
        )
        nxt = (
            cur.join(adj, cur["node"] == adj["u"])
            .filter(F.col("rk") == pick)
            .select("start", F.lit(t).alias("step"),
                    F.col("v").alias("node"))
        )
        out = out.unionByName(nxt)
        cur = nxt
    return out
