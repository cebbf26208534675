"""truncate_checkpoint (ferenda_spark/checkpoint.py) — the round-4 fix for
the iterative-loop driver stall.

Spark's ``Dataset.localCheckpoint`` carries the producing plan's size
ESTIMATE into the new LogicalRDD, and the fallback join estimate is the
product of its children — so any loop whose round contains a join squares
its sizeInBytes every iteration. After ~17 rounds the stat is a
megabyte-long BigInt and the driver spends minutes per round multiplying
it inside ``SizeInBytesOnlyStatsPlanVisitor`` (measured on 1k rows:
0.7s/round through round 15, then 1.7/6.9/19/50/139s — pure driver stall,
all executors parked). These tests pin the invariant that makes 20+-round
loops (deep alias chains, long redirect chains, large-diameter component
graphs) viable: checkpointed stats stay ~data-sized forever."""

from __future__ import annotations

from pyspark.sql import functions as F

from ferenda_spark.checkpoint import truncate_checkpoint, unpersist_checkpoint


def _stats_size(df) -> int:
    return int(
        str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    )


def test_stats_stay_data_sized_over_20_join_rounds(spark):
    df = spark.range(500).select(
        F.col("id").alias("node"), F.col("id").alias("comp")
    )
    df = truncate_checkpoint(df)
    prev = df
    for _ in range(20):
        j = df.select(F.col("node").alias("comp"), F.col("comp").alias("j2"))
        new = df.join(j, "comp", "left").select(
            "node",
            F.least("comp", F.coalesce("j2", "comp")).alias("comp"),
        )
        new = truncate_checkpoint(new)
        unpersist_checkpoint(prev)
        df = prev = new
        # the raw localCheckpoint reaches ~10^1000 within 10 rounds; the
        # honest stat is the measured cached size of 500 skinny rows
        assert _stats_size(df) < 10**9, _stats_size(df)
    assert df.count() == 500


def test_bare_localcheckpoint_inflates_stats(spark):
    """Documents WHY the helper exists: the inherited estimate really does
    square per round (if a Spark upgrade fixes this upstream, this test
    failing is the signal the helper can be retired)."""
    df = spark.range(100).select(
        F.col("id").alias("node"), F.col("id").alias("comp")
    )
    df = df.localCheckpoint(eager=True)
    for _ in range(6):
        j = df.select(F.col("node").alias("comp"), F.col("comp").alias("j2"))
        df = (
            df.join(j, "comp", "left")
            .select("node", F.coalesce("j2", "comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
    assert _stats_size(df) > 10**12  # squared 6 times from ~10^3


def test_truncation_still_cuts_lineage(spark):
    df = spark.range(100).select(F.col("id").alias("node"))
    for _ in range(5):
        df = truncate_checkpoint(
            df.select((F.col("node") + 1).alias("node"))
        )
    # a truncated plan is a LogicalRDD scan, not 5 nested projections
    assert "LogicalRDD" in df._jdf.queryExecution().analyzed().toString()
    assert df.agg(F.min("node")).collect()[0][0] == 5


def test_no_leaked_cache_blocks(spark):
    jsc = spark.sparkContext._jsc.sc()
    base = jsc.getPersistentRDDs().size()
    df = spark.range(1000).select(F.col("id").alias("node"))
    out = truncate_checkpoint(df)
    # exactly the checkpoint RDD may remain; the persist() inside the
    # helper must NOT linger
    assert jsc.getPersistentRDDs().size() <= base + 1
    unpersist_checkpoint(out)


def test_deep_path_graph_converges_quickly(spark):
    """connected_components on a 300-node path — the worst convergence
    shape (min label at one end) — must finish well inside max_iter and
    label every node with the path's minimum. Exercises ~15+ checkpoint
    rounds end-to-end through the fixed helper."""
    from ferenda_spark.operators.graph import connected_components

    edges = spark.range(299).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    comp = connected_components(edges, max_iter=50)
    rows = comp.collect()
    assert len(rows) == 300
    assert {r["comp"] for r in rows} == {0}


# ---------------------------------------------------------------------------
# RoundCadence — checkpoint every K rounds instead of every round
# ---------------------------------------------------------------------------

from ferenda_spark.checkpoint import RoundCadence  # noqa: E402


def _n_persistent_rdds(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_cadence_single_chain_matches_per_round(spark):
    """A join-per-round min-label loop under interval=3 lands on the same
    fixpoint as the interval=1 (per-round) cadence."""

    def run(interval):
        df = spark.range(64).select(
            F.col("id").alias("node"), (F.col("id") + 1).alias("comp")
        ).withColumn("comp", F.when(F.col("comp") >= 64, 0).otherwise(F.col("comp")))
        cad = RoundCadence(interval=interval)
        state = cad.seed(df)
        for _ in range(7):
            j = state.select(
                F.col("comp").alias("node2"), F.col("comp").alias("jc")
            ).groupBy("node2").agg(F.min("jc").alias("jc"))
            state = cad.step(
                state.join(
                    j.withColumnRenamed("node2", "comp"), "comp", "left"
                ).select(
                    "node",
                    F.least("comp", F.coalesce("jc", "comp")).alias("comp"),
                )
            )
        out = cad.finish(state)
        rows = sorted((r["node"], r["comp"]) for r in out.collect())
        return rows

    assert run(1) == run(3)


def test_cadence_multi_state_survives_checkpoint_round(spark):
    """step_many keeps BOTH interdependent states usable after a cadence
    round frees the prior chain (the HITS/BFS shape)."""
    cad = RoundCadence(interval=2)
    a = cad.seed(spark.range(32).select(F.col("id").alias("n"), F.lit(1.0).alias("x")))
    b = a
    for i in range(5):  # rounds 2 and 4 are cadence checkpoints
        a2 = a.select("n", (F.col("x") + 1.0).alias("x"))
        b2 = a2.join(b.select("n", F.col("x").alias("y")), "n").select(
            "n", (F.col("x") + F.col("y")).alias("x")
        )
        a, b = cad.step_many([a2, b2])
    # both states must still be readable and consistent
    out = cad.finish(a.join(b.select("n", F.col("x").alias("bx")), "n"))
    rows = out.collect()
    assert len(rows) == 32
    assert all(r["x"] == 6.0 for r in rows)


def test_cadence_frees_intermediate_caches(spark):
    base = _n_persistent_rdds(spark)
    cad = RoundCadence(interval=4)
    state = cad.seed(spark.range(16).select(F.col("id").alias("n")))
    for _ in range(6):
        state = cad.step(state.select((F.col("n") + 1).alias("n")))
    out = cad.finish(state)
    out.count()
    # only the final checkpoint may remain pinned
    assert _n_persistent_rdds(spark) <= base + 1
    unpersist_checkpoint(out)


def test_cadence_checkpoint_stats_stay_data_sized(spark):
    """The BigInt-stats stall cannot re-arise: estimates reset to the
    measured size at every cadence checkpoint."""
    df = spark.range(500).select(
        F.col("id").alias("node"), F.col("id").alias("comp")
    )
    cad = RoundCadence(interval=4)
    state = cad.seed(df)
    for _ in range(16):
        j = state.select(F.col("node").alias("comp"), F.col("comp").alias("j2"))
        state = cad.step(
            state.join(j, "comp", "left").select(
                "node", F.least("comp", F.coalesce("j2", "comp")).alias("comp")
            )
        )
    out = cad.finish(state)
    assert len(str(_stats_size(out))) < 12
    unpersist_checkpoint(out)


def test_bfs_terminating_on_cadence_round(spark):
    """Regression: a BFS whose frontier empties EXACTLY on a cadence round
    must not hand a freed pre-step frame to finish()
    (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND). Path graph of length 4 from node
    0: frontier empties at hop 4 = the default interval's checkpoint
    round; string ids mirror the diameter_estimate repro."""
    from ferenda_spark.operators.graph_analytics import bfs_distances

    edges = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(4)], "src string, dst string"
    )
    out = bfs_distances(edges, ["n0"], directed=True, max_hops=10)
    rows = {r["node"]: r["dist"] for r in out.collect()}
    assert rows == {"n0": 0, "n1": 1, "n2": 2, "n3": 3, "n4": 4}
    unpersist_checkpoint(out)
