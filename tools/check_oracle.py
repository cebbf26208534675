"""Self-check of the driver's correctness gate: run every oracle-backed
entry in __spark_entry__.queries() on Spark AND its oracle_sql() on DuckDB
over the same sf0.01 parquet tables, then compare row count, column-name
set, and an order-insensitive value comparison (columns sorted by name,
rows sorted) — mirroring CORRECTNESS_r{N}.json semantics.

Usage: python tools/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            df[c] = s.map(lambda v: str(v))
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.map(lambda v: "nan" if v is None or (isinstance(v, float) and math.isnan(v)) else repr(round(float(v), 9)))
        else:
            df[c] = s.map(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as em
    from ferenda_spark.session import get_spark

    spark = get_spark(app_name="oracle_check", master="local[8]",
                      shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = em.queries(), em.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if name not in oracles:
            n = fn(spark, sf_dir).count()
            print(f"{name:24s} rows-only: {n} rows")
            continue
        sdf = fn(spark, sf_dir).toPandas()
        odf = con.execute(oracles[name]).df()
        status = []
        if len(sdf) != len(odf):
            status.append(f"ROWS {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            status.append(f"COLS {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        if not status:
            a, b = canon(sdf), canon(odf)
            if not a.equals(b):
                diff = (a != b).any(axis=1)
                status.append(f"VALUES ({int(diff.sum())} differing rows)")
                ex = a[diff].head(3), b[diff].head(3)
                print(f"--- {name} spark:\n{ex[0]}\n--- oracle:\n{ex[1]}")
        if status:
            failures.append(name)
            print(f"{name:24s} FAIL: {'; '.join(status)}")
        else:
            print(f"{name:24s} OK ({len(sdf)} rows)")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} ok; failures: {failures}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
