"""Deterministic random walks — DeepWalk-style corpus generation for
graph embedding training, without randomness.

A node-embedding pipeline (DeepWalk/node2vec) needs millions of short
walks over the entity/host graph as its training corpus. ``sample()``
-based walks are irreproducible across re-runs and cluster sizes — the
same violation `splits.py` documents for corpus splitting — so the
"random" choice here is hash-derived: standing on node u at position
t-1 of the walk started at s (so picking the node for position t), the
next node is

    neighbors(u)[ hash60(s ‖ ':' ‖ (t-1) ‖ salt ‖ ':' ‖ u) mod degree(u) ]

(the hash is keyed on the CURRENT position t-1, which is what the
DuckDB oracle replays — position t would be equivalent but is not what
ships)

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


def negative_samples(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    k: int = 5,
    salt: str = "",
) -> DataFrame:
    """Deterministic negative sampling for link-prediction / embedding
    training: for every directed positive edge, ``k`` corruption rows
    ``(src, dst, neg, j)`` — the POSITIVE tail rides along so a trainer
    can pair each positive with exactly its k corruptions.

    The choice is ``nodes[hash60(src ‖ ':' ‖ dst ‖ ':' ‖ j ‖ salt) mod
    |V|]`` over the ascending-ranked node table — a pure function of the
    edge bytes, so re-runs, other partitionings, and a SQL oracle
    reproduce the exact sample. Following word2vec/TransE practice the
    sample is NOT rejection-filtered against true edges: at web-graph
    sparsity a collision is rare, filtering would cost an extra
    edge-sized join per round, and the training objective tolerates the
    noise (documented rather than hidden).

    Scale shape: the node table gets a dense 0..V-1 rank WITHOUT a global
    sort — a single-partition row_number would bottleneck at 10^9 nodes,
    so the rank is two-level: row_number within a hash bucket (B-way
    parallel windows) plus the bucket's cumulative offset (a window over
    the B-row bucket-count table). The resulting total order is
    (bucket, n) — deterministic and SQL-replayable as ONE
    ``row_number() OVER (ORDER BY bucket, n)``. Then ONE equi-join of the
    k-exploded edges against the ranked table — the join key is the
    uniform hash rank, skew-free."""
    n_buckets = 64
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    nodes = (
        e.select(F.col("a").alias("n"))
        .unionByName(e.select(F.col("b").alias("n")))
        .distinct()
        .withColumn("bk", F.pmod(hash60(F.col("n")), F.lit(n_buckets)))
    )
    within = nodes.withColumn(
        "wrk",
        F.row_number().over(Window.partitionBy("bk").orderBy("n")) - 1,
    )
    offsets = (
        nodes.groupBy("bk")
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
    ranked = within.join(F.broadcast(offsets), "bk").select(
        "n", (F.col("wrk") + F.col("off")).alias("rk")
    )
    n_nodes = nodes.count()
    probes = e.select(
        "a",
        "b",
        F.explode(F.array(*[F.lit(j) for j in range(k)])).alias("j"),
    ).withColumn(
        "rk",
        F.pmod(
            hash60(
                F.concat_ws(
                    ":",
                    F.col("a").cast("string"),
                    F.col("b").cast("string"),
                    F.concat(F.col("j").cast("string"), F.lit(salt)),
                )
            ),
            F.lit(n_nodes),
        ),
    )
    return probes.join(ranked, "rk").select(
        F.col("a").alias("src"), F.col("b").alias("dst"),
        F.col("n").alias("neg"), "j",
    )
