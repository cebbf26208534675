"""HyperBall: sketch-based harmonic / Lin / closeness centrality.

Boldi & Vigna 2013 ("In-Core Computation of Geometric Centralities with
HyperBall"): maintain one HyperLogLog counter per node holding the ball
B(v,t) = nodes within distance t, grown by one relaxation round per
iteration — counter(v, t+1) = counter(v, t) merged with the counters of
v's out-neighbors. The neighborhood-function deltas |B(v,t)| - |B(v,t-1)|
are (approximately) the number of nodes at EXACTLY distance t, which is
enough to accumulate every distance-distribution centrality in one pass:

    harmonic(v)  = sum_t (1/t)  * (|B(v,t)| - |B(v,t-1)|)
    sum_dist(v)  = sum_t   t    * (|B(v,t)| - |B(v,t-1)|)
    lin(v)       = |B(v,inf)|^2 / sum_dist(v)     (1.0 for isolated nodes)

This is THE web-scale centrality algorithm — exact closeness needs
all-pairs BFS (O(nm), hopeless at 10^12 docs), while HyperBall is
O(m · rounds) with a few-KB mergeable register array per node and was run
on the full Facebook graph by its authors. The Spark mapping is direct
and stays entirely JVM-side via the Datasketches builtins
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``):

- state (node, sketch, est, harmonic, sum_dist) — sketch is the binary
  HLL register array, a few KB at lgk=12 (±1.6%), 64 B at lgk=4;
- one round = edge-keyed equi-join putting successor sketches on each
  edge + a map-side-combined ``hll_union_agg`` groupBy — HLL union is an
  element-wise register max, so Spark's partial aggregation collapses a
  hub's millions of incoming sketches to one per map partition before
  the shuffle (the same celebrity-key property the CC hook round uses);
- convergence: registers only grow, so when no node's estimate moved the
  balls are complete and the loop stops (bounded by ``max_iter`` for
  pathological diameters); per-round lineage is cadence-checkpointed
  like every iterative operator here (checkpoint.RoundCadence).

Determinism: HLL register state is order-independent (max per register)
and the Datasketches hash is fixed, so results are bit-stable across
cluster sizes and round orderings — pinned by the rows-only driver query.
At small cardinalities the sketch is in exact (coupon list) mode, which
is what lets tests assert equality against a BFS reference on toy graphs.

Directions: counters grown over OUT-edges estimate the ball reachable
FROM v, giving outward centralities; harmonic centrality as usually
defined (sum of 1/d(u,v) over u REACHING v) needs the transpose graph,
so ``transpose=True`` (default) swaps the edge roles first — on an
undirected (symmetrized) graph the two coincide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ferenda_spark.checkpoint import RoundCadence


def hyperball(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    max_iter: int = 32,
    lgk: int = 12,
    transpose: bool = True,
) -> DataFrame:
    """Centralities for every node with at least one edge:
    ``(node, reachable_est, harmonic, sum_dist, lin)``.

    reachable_est counts v itself (|B(v,inf)|, HLL estimate); harmonic
    and sum_dist exclude it (d(v,v)=0 contributes nothing); lin is
    Lin's index |B|^2 / sum_dist, defined as 1.0 when sum_dist = 0
    (nodes reaching nothing else), per Boldi & Vigna §2.
    """
    a, b = (dst, src) if transpose else (src, dst)
    e = (
        edges.select(F.col(a).alias("a"), F.col(b).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("a").alias("node"))
        .union(e.select("b"))
        .distinct()
    )
    state = (
        nodes.groupBy("node")
        .agg(F.hll_sketch_agg(F.col("node").cast("string"), F.lit(lgk)).alias("sk"))
        .select(
            "node",
            "sk",
            F.hll_sketch_estimate("sk").cast("double").alias("est"),
            F.lit(0.0).alias("harmonic"),
            F.lit(0.0).alias("sum_dist"),
        )
    )
    cad = RoundCadence()
    state = cad.seed(state)
    try:
        for t in range(1, max_iter + 1):
            succ = e.join(
                state.select(F.col("node").alias("b"), F.col("sk").alias("nsk")),
                "b",
            ).select(F.col("a").alias("node"), F.col("nsk").alias("sk"))
            merged = (
                state.select("node", "sk")
                .union(succ)
                .groupBy("node")
                .agg(F.hll_union_agg("sk").alias("sk"))
            )
            grown = (
                merged.withColumn(
                    "nest", F.hll_sketch_estimate("sk").cast("double")
                )
                .join(
                    state.select("node", "est", "harmonic", "sum_dist"),
                    "node",
                )
                .select(
                    "node",
                    "sk",
                    F.col("nest").alias("est"),
                    (
                        F.col("harmonic")
                        + (F.col("nest") - F.col("est")) / t
                    ).alias("harmonic"),
                    (
                        F.col("sum_dist")
                        + (F.col("nest") - F.col("est")) * t
                    ).alias("sum_dist"),
                    (F.col("nest") > F.col("est")).alias("_grew"),
                )
            )
            # flatten once so the convergence probe and the next state
            # share one compiled round (see RoundCadence.flatten); the
            # probe job materializes it, step() is a cheap projection on
            # the flattened frame
            grown = cad.flatten(grown)
            done = grown.filter(F.col("_grew")).limit(1).count() == 0
            state = cad.step(grown.drop("_grew"))
            if done:
                break
        out = cad.finish(state)
    finally:
        cad.close()
        e.unpersist()
    return out.select(
        "node",
        F.col("est").alias("reachable_est"),
        "harmonic",
        "sum_dist",
        F.when(F.col("sum_dist") > 0, F.col("est") * F.col("est") / F.col("sum_dist"))
        .otherwise(F.lit(1.0))
        .alias("lin"),
    )
