"""Hash-split tests: determinism under repartitioning, fraction accuracy,
and exact agreement with the SQL oracle form evaluated by DuckDB."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from ferenda_spark.functions.splits import hash_split, sql_hash_split

FRACS = {"train": 0.8, "val": 0.1, "test": 0.1}


def test_split_is_stable_under_partitioning(spark):
    df = spark.range(2000).select(F.concat(F.lit("u"), "id").alias("url"))
    a = {r.url: r.split for r in df.select("url", hash_split("url", FRACS)).collect()}
    b = {
        r.url: r.split
        for r in df.repartition(17, "url")
        .sortWithinPartitions(F.desc("url"))
        .select("url", hash_split("url", FRACS))
        .collect()
    }
    assert a == b
    # fractions hold within binomial noise at n=2000
    from collections import Counter

    c = Counter(a.values())
    assert abs(c["train"] / 2000 - 0.8) < 0.04
    assert abs(c["val"] / 2000 - 0.1) < 0.03
    assert abs(c["test"] / 2000 - 0.1) < 0.03


def test_split_matches_duckdb_oracle(spark):
    df = spark.range(500).select(F.concat(F.lit("doc"), "id").alias("url"))
    got = {
        r.url: r.split for r in df.select("url", hash_split("url", FRACS)).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE u(url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?)", [(u,) for u in got])
    case = sql_hash_split("url", FRACS)
    want = dict(con.execute(f"SELECT url, {case} FROM u").fetchall())
    assert got == want


def test_bad_fractions_rejected():
    with pytest.raises(ValueError):
        hash_split("url", {"a": 0.5, "b": 0.4})
    with pytest.raises(ValueError):
        sql_hash_split("url", {"a": 0.7, "b": 0.7})


def test_weighted_sample_deterministic_and_stratified(spark):
    from ferenda_spark.functions.splits import weighted_sample

    df = spark.range(0, 200).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("stratum"),
        (F.col("id") % 7 + 1).cast("double").alias("w"),
    )
    a = weighted_sample(df, "id", "w", 5, strata_cols=("stratum",))
    b = weighted_sample(df.repartition(13), "id", "w", 5, strata_cols=("stratum",))
    sa = {(r["stratum"], r["id"]) for r in a.collect()}
    sb = {(r["stratum"], r["id"]) for r in b.collect()}
    assert sa == sb  # partitioning-independent
    from collections import Counter

    per = Counter(s for s, _ in sa)
    assert per == {"0": 5, "1": 5, "2": 5}


def test_weighted_sample_matches_python_reference(spark):
    import hashlib
    import math

    from ferenda_spark.functions.splits import weighted_sample

    rows = [(i, float(i % 5 + 1)) for i in range(60)]
    df = spark.createDataFrame(rows, "id bigint, w double")
    got = sorted(r["id"] for r in weighted_sample(df, "id", "w", 8).collect())

    def rank(i, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        return math.log((h + 0.5) / float(1 << 60)) / w

    ref = sorted(
        i for i, _ in sorted(rows, key=lambda t: (-rank(*t), t[0]))[:8]
    )
    assert got == ref


def test_weighted_sample_weight_bias(spark):
    """Heavier rows must win far more often across salts."""
    from ferenda_spark.functions.splits import weighted_sample

    df = spark.range(0, 100).select(
        F.col("id"),
        F.when(F.col("id") < 10, 50.0).otherwise(1.0).alias("w"),
    )
    heavy = 0
    for salt in ("a", "b", "c"):
        picked = {
            r["id"] for r in weighted_sample(df, "id", "w", 10, salt=salt).collect()
        }
        heavy += len([i for i in picked if i < 10])
    # 10 heavy rows at weight 50 vs 90 light at 1 → heavies dominate
    assert heavy >= 20
