"""Semi-supervised label spreading over the host/link graph (Zhou et al.
2004, "Learning with Local and Global Consistency") — grow a small set of
labeled seeds (spam/ham hosts, topic exemplars) into scores for every
reachable node.

Distinct from this repo's other propagation operators and complementary
to them: LPA (graph_analytics.label_propagation) discovers UNSUPERVISED
communities; personalized PageRank (graph.personalized_pagerank) ranks
relatedness to ONE seed set; label spreading carries MULTIPLE competing
labels with per-class scores and a retention term that keeps seeds
anchored — the textbook tool for "we hand-labeled 500 spam hosts and 500
good ones, classify the other 10^8" (the same deployment shape as
TrustRank, but multi-class and score-calibrated).

Update rule (fixed ``n_iter`` rounds, deterministic):

    F⁰            = Y                      (seed one-hot rows)
    Fᵗ⁺¹(v, l)    = α · Σ_{u~v} S(u,v) · Fᵗ(u, l)  +  (1−α) · Y(v, l)
    S(u, v)       = 1 / sqrt(deg(u) · deg(v))      (symmetric normalization)

with the standard symmetric-normalized adjacency; scores stay in [0, 1]
and converge geometrically (α < 1). The final hard assignment is
argmax_l F(v, l), ties broken by MINIMUM label (re-run stable).

Scale shape:

- state is SPARSE: one row per (node, label) pair actually touched —
  k labels and a frontier that grows one hop per round, never |V|·k
  dense rows. Each round is one edge-keyed equi-join (state × normalized
  edges) + one map-side-combined (node, label) sum; a celebrity node's
  contributions pre-reduce per map partition.
- normalized edge weights are computed ONCE (two degree joins) and
  persisted; rounds reuse the frame.
- ``RoundCadence`` flattens per-round plans (same driver-stall rationale
  as graph.py).
- unrolled-SQL replayable: fixed rounds, no convergence probe — the
  oracle in __spark_entry__ replays the identical arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ferenda_spark.checkpoint import RoundCadence as _RoundCadence


def spread_labels(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
    label: str = "label",
    *,
    alpha: float = 0.85,
    n_iter: int = 5,
) -> DataFrame:
    """Run the spreading fixed-point → ``(node, label, score)`` for every
    (node, label) pair with non-zero score after ``n_iter`` rounds.

    ``seeds``: (node, label) — duplicate rows collapse to one; a node
    seeded with two labels competes against itself (legal, occasionally
    useful for soft priors)."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    und = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    w = (
        und.join(deg, "a")
        .join(
            deg.select(F.col("a").alias("b"), F.col("d").alias("db")), "b"
        )
        .select(
            "a", "b",
            (1.0 / F.sqrt(F.col("d") * F.col("db"))).alias("w"),
        )
        # persist without priming: round 1's propagation join is the
        # single first consumer and materializes the cache itself
        .persist()
    )

    y = (
        seeds.select(F.col(node).alias("node"), F.col(label).alias("label"))
        .distinct()
        .withColumn("y", F.lit(1.0))
    )
    cad = _RoundCadence()
    state = cad.seed(y.select("node", "label", F.col("y").alias("score")))
    try:
        for _ in range(n_iter):
            prop = (
                state.join(w, state["node"] == w["a"])
                .groupBy(F.col("b").alias("node"), "label")
                .agg(F.sum(F.col("score") * F.col("w")).alias("p"))
            )
            nxt = (
                prop.join(y, ["node", "label"], "full_outer")
                .select(
                    "node", "label",
                    (
                        alpha * F.coalesce("p", F.lit(0.0))
                        + (1.0 - alpha) * F.coalesce("y", F.lit(0.0))
                    ).alias("score"),
                )
            )
            state = cad.step(nxt)
        out = cad.finish(state)
    finally:
        cad.close()
        w.unpersist()
    return out


def assign_labels(scores: DataFrame) -> DataFrame:
    """Hard assignment from :func:`spread_labels` scores →
    ``(node, label, score)``, one row per node: argmax score, ties to the
    minimum label. A min(struct) aggregation — map-side combinable, no
    window, string labels safe (the negation is on the score)."""
    return (
        scores.groupBy("node")
        .agg(
            F.min(
                F.struct(
                    (-F.col("score")).alias("ns"),
                    F.col("label").alias("label"),
                )
            ).alias("_m")
        )
        .select("node", F.col("_m.label").alias("label"),
                (-F.col("_m.ns")).alias("score"))
    )


def spread_unrolled_sql(
    edges_cte: str,
    seeds_cte: str,
    alpha: float = 0.85,
    n_iter: int = 3,
) -> str:
    """ANSI-SQL oracle mirroring :func:`spread_labels` for a fixed round
    count — ``edges_cte``/``seeds_cte`` are CTE bodies producing
    (src, dst) and (node, label). Returns a WITH-chain ending with the
    CTE ``f{n_iter}`` (node, label, score) defined; the caller appends
    the final SELECT. Shared spelling between the Spark operator's
    docstring, the DuckDB replay, and the test reference."""
    a1 = repr(float(alpha))
    parts = [
        f"e0 AS ({edges_cte})",
        """und AS (
            SELECT DISTINCT a, b FROM (
                SELECT src AS a, dst AS b FROM e0 WHERE src <> dst
                UNION ALL
                SELECT dst AS a, src AS b FROM e0 WHERE src <> dst))""",
        "deg AS (SELECT a, count(*) AS d FROM und GROUP BY a)",
        """w AS (
            SELECT und.a, und.b,
                   1.0 / sqrt(da.d * db.d) AS w
            FROM und
            JOIN deg da ON und.a = da.a
            JOIN deg db ON und.b = db.a)""",
        f"y AS (SELECT node, label, CAST(1.0 AS DOUBLE) AS y FROM (SELECT DISTINCT node, label FROM ({seeds_cte})))",
        "f0 AS (SELECT node, label, y AS score FROM y)",
    ]
    for k in range(1, n_iter + 1):
        parts.append(f"""
        p{k} AS (
            SELECT w.b AS node, f.label, sum(f.score * w.w) AS p
            FROM f{k - 1} f JOIN w ON f.node = w.a
            GROUP BY 1, 2)""")
        parts.append(f"""
        f{k} AS (
            SELECT coalesce(p.node, y.node) AS node,
                   coalesce(p.label, y.label) AS label,
                   {a1} * coalesce(p.p, 0.0)
                   + (1.0 - {a1}) * coalesce(y.y, 0.0) AS score
            FROM p{k} p FULL OUTER JOIN y
              ON p.node = y.node AND p.label = y.label)""")
    return "WITH " + ",\n".join(parts)
