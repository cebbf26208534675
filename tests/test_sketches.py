"""KMV distinct sketches (functions/sketches.py): exactness below k,
estimator accuracy above k, the merge identity, and cross-partitioning
determinism — all against plain Python md5 as the independent reference."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from ferenda_spark.functions.sketches import (
    TWO_POW_60,
    kmv_estimate,
    kmv_merge,
    kmv_sketch,
)


def _h60(v) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


def _py_kmv(values, k):
    return sorted({_h60(v) for v in values})[:k]


def test_exact_below_k(spark):
    df = spark.createDataFrame(
        [("g", f"v{i % 17}") for i in range(200)], ["g", "v"]
    )
    out = kmv_estimate(kmv_sketch(df, ["g"], "v", k=64), k=64).collect()
    assert len(out) == 1
    assert out[0].sketch_size == 17
    assert out[0].est_distinct == 17.0


def test_sketch_matches_python_reference(spark):
    vals = [f"item-{i}" for i in range(500)]
    df = spark.createDataFrame([("g", v) for v in vals for _ in (0, 1)],
                               ["g", "v"])
    got = kmv_sketch(df, ["g"], "v", k=32).collect()[0].kmv
    assert list(got) == _py_kmv(vals, 32)


def test_estimator_accuracy(spark):
    n = 5000
    df = spark.createDataFrame([("g", f"u{i}") for i in range(n)], ["g", "v"])
    r = kmv_estimate(kmv_sketch(df, ["g"], "v", k=256), k=256).collect()[0]
    assert r.sketch_size == 256
    # KMV relative error ~ 1/sqrt(k) ≈ 6.25%; allow 3 sigma
    assert abs(r.est_distinct - n) / n < 0.2
    # and it equals the closed-form on the python-reference kth hash
    kth = _py_kmv([f"u{i}" for i in range(n)], 256)[-1]
    assert r.est_distinct == pytest.approx(255.0 * TWO_POW_60 / kth, rel=0)


def test_merge_identity(spark):
    a = [("g", f"x{i}") for i in range(300)]
    b = [("g", f"x{i}") for i in range(150, 450)]  # overlapping
    sk_union = kmv_sketch(
        spark.createDataFrame(a + b, ["g", "v"]), ["g"], "v", k=64
    )
    sk_a = kmv_sketch(spark.createDataFrame(a, ["g", "v"]), ["g"], "v", k=64)
    sk_b = kmv_sketch(spark.createDataFrame(b, ["g", "v"]), ["g"], "v", k=64)
    merged = kmv_merge(sk_a.unionByName(sk_b), ["g"], k=64)
    assert merged.collect()[0].kmv == sk_union.collect()[0].kmv


@pytest.mark.parametrize("n_parts,n_buckets", [(1, 4), (7, 64)])
def test_determinism_across_partitioning(spark, n_parts, n_buckets):
    rows = [(f"g{i % 3}", f"v{i % 97}") for i in range(400)]
    df = spark.createDataFrame(rows, ["g", "v"]).repartition(n_parts)
    got = {
        r.g: list(r.kmv)
        for r in kmv_sketch(df, ["g"], "v", k=48, n_buckets=n_buckets).collect()
    }
    want = {
        g: _py_kmv({v for gg, v in rows if gg == g}, 48)
        for g in ("g0", "g1", "g2")
    }
    assert got == want
