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
