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
