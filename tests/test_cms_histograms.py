"""Count-Min sketch, fixed-bin histogram quantiles, key-skew profiler."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from ferenda_spark.functions.cms import cms_build, cms_merge, cms_query
from ferenda_spark.functions.histograms import (
    histogram_merge,
    histogram_quantiles,
    histogram_sketch,
)
from ferenda_spark.operators.profiling import profile_keys


def _values(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "v string")


def test_cms_overestimates_never_under(spark):
    vals = [f"k{i % 7}" for i in range(100)] + ["rare"] * 3
    truth = Counter(vals)
    cms = cms_build(_values(spark, vals), [], "v", d=4, w=64)
    keys = spark.createDataFrame([(k,) for k in truth], "v string")
    got = {r["v"]: r["est_cnt"] for r in cms_query(cms, keys, "v", d=4, w=64).collect()}
    for k, c in truth.items():
        assert got[k] >= c
    # wide sketch → no collisions at 8 distinct keys: exact
    cms_wide = cms_build(_values(spark, vals), [], "v", d=4, w=4096)
    exact = {
        r["v"]: r["est_cnt"]
        for r in cms_query(cms_wide, keys, "v", d=4, w=4096).collect()
    }
    assert exact == dict(truth)


def test_cms_missing_key_is_zero(spark):
    cms = cms_build(_values(spark, ["a", "b"]), [], "v", d=4, w=4096)
    keys = spark.createDataFrame([("never",)], "v string")
    assert cms_query(cms, keys, "v", d=4, w=4096).collect()[0]["est_cnt"] == 0


def test_cms_merge_equals_union_build(spark):
    a = ["x"] * 5 + ["y"] * 2
    b = ["y"] * 4 + ["z"]
    ca = cms_build(_values(spark, a), [], "v", d=3, w=128)
    cb = cms_build(_values(spark, b), [], "v", d=3, w=128)
    merged = cms_merge(ca.unionByName(cb), [])
    full = cms_build(_values(spark, a + b), [], "v", d=3, w=128)
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in full.collect()
    }


def _nums(spark, vals):
    return spark.createDataFrame(
        [(float(v), "g") for v in vals], "v double, g string"
    )


def test_histogram_counts_and_clamping(spark):
    vals = [-5, 0, 1, 9.99, 10, 55, 120]  # lo=0 hi=100 bins=10 → width 10
    h = histogram_sketch(_nums(spark, vals), ["g"], "v", lo=0, hi=100, n_bins=10)
    got = {r["bin"]: r["cnt"] for r in h.collect()}
    assert got == {0: 4, 1: 1, 5: 1, 9: 1}  # -5 clamps to 0, 120 to 9
    assert sum(got.values()) == len(vals)


def test_histogram_merge_identity(spark):
    a, b = [1, 2, 3, 50], [2, 60, 99]
    ha = histogram_sketch(_nums(spark, a), ["g"], "v", lo=0, hi=100, n_bins=10)
    hb = histogram_sketch(_nums(spark, b), ["g"], "v", lo=0, hi=100, n_bins=10)
    merged = histogram_merge(ha.unionByName(hb), ["g"])
    full = histogram_sketch(_nums(spark, a + b), ["g"], "v", lo=0, hi=100, n_bins=10)
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in full.collect()}


def _hq_ref(vals, q, lo, hi, n_bins):
    width = (hi - lo) / n_bins
    bins = Counter(
        min(max(int((v - lo) // width), 0), n_bins - 1) for v in vals
    )
    total = len(vals)
    target = q * total
    cum = 0
    for b in sorted(bins):
        before = cum
        cum += bins[b]
        if cum >= target:
            return round(lo + b * width + (target - before) / bins[b] * width, 6)
    raise AssertionError


def test_histogram_quantiles_match_reference(spark):
    vals = [3, 7, 12, 18, 25, 33, 41, 56, 77, 91, 95, 99]
    h = histogram_sketch(_nums(spark, vals), ["g"], "v", lo=0, hi=100, n_bins=20)
    got = {
        r["q"]: r["est"]
        for r in histogram_quantiles(
            h, ["g"], [0.5, 0.9, 0.99], lo=0, hi=100, n_bins=20
        ).collect()
    }
    for q in (0.5, 0.9, 0.99):
        assert got[q] == _hq_ref(vals, q, 0, 100, 20)


def test_histogram_quantile_exact_when_bins_fine(spark):
    # one value per bin → interpolation lands within one bin width
    vals = list(range(100))
    h = histogram_sketch(_nums(spark, vals), ["g"], "v", lo=0, hi=100, n_bins=100)
    got = histogram_quantiles(h, ["g"], [0.5], lo=0, hi=100, n_bins=100).collect()[0]
    assert abs(got["est"] - 50.0) <= 1.0


def test_profile_keys(spark):
    rows = ["a"] * 6 + ["b"] * 3 + ["c"] * 1
    df = _values(spark, rows)
    got = [tuple(r) for r in profile_keys(df, "v", top_k=2).collect()]
    assert got == [(1, "a", 6, 0.6), (2, "b", 3, 0.3)]


def test_cms_query_dedupes_keys_and_survives_reserved_cols(spark):
    # duplicate key rows → one output row per distinct key; a keys frame
    # that already carries row/col/cnt columns must not collide with the
    # probe coordinates (they live under reserved _cms_* names now).
    vals = ["a"] * 5 + ["b"] * 2
    cms = cms_build(_values(spark, vals), [], "v", d=4, w=4096)
    keys = spark.createDataFrame(
        [("a", 1, 2, 3), ("a", 1, 2, 3), ("b", 9, 9, 9)],
        "v string, row int, col int, cnt int",
    )
    got = cms_query(cms, keys, "v", d=4, w=4096).collect()
    assert len(got) == 2
    est = {r["v"]: r["est_cnt"] for r in got}
    assert est == {"a": 5, "b": 2}
    # original key columns ride through untouched
    assert {r["v"]: (r["row"], r["col"], r["cnt"]) for r in got} == {
        "a": (1, 2, 3), "b": (9, 9, 9)
    }
