"""range_join (operators/ranges.py) vs a naive cross-product reference,
plus the plan guarantee (equi join, never BroadcastNestedLoopJoin)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ferenda_spark.operators.ranges import range_join


def test_matches_naive_reference(spark):
    rng = np.random.RandomState(3)
    points = [(int(i), float(v)) for i, v in enumerate(rng.uniform(0, 100, 200))]
    ivs = []
    for j in range(40):
        lo = float(rng.uniform(0, 95))
        ivs.append((int(j), lo, lo + float(rng.uniform(0.5, 8))))
    left = spark.createDataFrame(points, "pid long, v double")
    right = spark.createDataFrame(ivs, "iid long, lo double, hi double")
    got = {
        (r.pid, r.iid)
        for r in range_join(left, right, "v", "lo", "hi").collect()
    }
    exp = {
        (pid, iid)
        for pid, v in points
        for iid, lo, hi in ivs
        if lo <= v < hi
    }
    assert got == exp
    assert len(got) > 50  # non-trivial overlap


def test_keys_and_half_open_bounds(spark):
    left = spark.createDataFrame(
        [("a", 1, 5.0), ("a", 2, 10.0), ("b", 3, 5.0)],
        "k string, pid long, v double",
    )
    right = spark.createDataFrame(
        [("a", 10, 5.0, 10.0), ("b", 20, 0.0, 5.0)],
        "k string, iid long, lo double, hi double",
    )
    got = {
        (r.pid, r.iid)
        for r in range_join(
            left, right, "v", "lo", "hi", keys=("k",)
        ).collect()
    }
    # v=5.0 'a' matches [5,10) inclusive-start; v=10.0 excluded (half-open);
    # v=5.0 'b' misses [0,5) — and never crosses keys
    assert got == {(1, 10)}


def test_explicit_width_handles_monster_interval(spark):
    left = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "pid long, v double"
    )
    right = spark.createDataFrame(
        [(1, 0.0, 90.0), (2, 40.0, 41.0)], "iid long, lo double, hi double"
    )
    got = range_join(
        left, right, "v", "lo", "hi", bucket_width=10.0
    ).groupBy("iid").count().collect()
    counts = {r.iid: r["count"] for r in got}
    assert counts == {1: 90, 2: 1}


def test_inverted_and_empty_intervals_drop(spark):
    left = spark.createDataFrame([(1, 5.0)], "pid long, v double")
    right = spark.createDataFrame(
        [(1, 10.0, 0.0), (2, 5.0, 5.0)], "iid long, lo double, hi double"
    )
    assert range_join(left, right, "v", "lo", "hi").count() == 0


def test_plan_is_equi_join_not_nested_loop(spark):
    left = spark.createDataFrame(
        [(i, float(i)) for i in range(50)], "pid long, v double"
    )
    right = spark.createDataFrame(
        [(j, float(j), float(j) + 2.0) for j in range(20)],
        "iid long, lo double, hi double",
    )
    plan = (
        range_join(left, right, "v", "lo", "hi")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_collision_raises(spark):
    left = spark.createDataFrame([(1, 1.0)], "x long, v double")
    right = spark.createDataFrame([(2, 0.0, 2.0)], "x long, lo double, hi double")
    with pytest.raises(ValueError, match="ambiguous"):
        range_join(left, right, "v", "lo", "hi")
