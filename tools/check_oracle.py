"""Self-check of the driver's correctness gate: run every oracle-backed
entry in __spark_entry__.queries() on Spark AND its oracle_sql() on DuckDB
over the same sf0.01 parquet tables, then compare row count, column-name
set, and an order-insensitive value comparison (columns sorted by name,
rows sorted) — mirroring CORRECTNESS_r{N}.json semantics.

Emits CHECK_ORACLE.json (same per-query shape as CORRECTNESS_r{N}.json:
rows_match / schema_match / hash_match / spark_rows / oracle_rows / err;
rows-only queries get hash_match=null) so the 24 contract queries outside
the driver's frozen r01 snapshot still have an auditable machine-readable
artifact per round.

Usage: python tools/check_oracle.py [sf_dir] [only_query1,only_query2,...]
"""

from __future__ import annotations

import json
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
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    failures = []
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        rec = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        report[name] = rec
        try:
            if name not in oracles:
                n = fn(spark, sf_dir).count()
                rec.update(spark_rows=n, rows_match=n >= 0)
                print(f"{name:24s} rows-only: {n} rows")
                continue
            sdf = fn(spark, sf_dir).toPandas()
            odf = con.execute(oracles[name]).df()
            rec.update(
                spark_rows=len(sdf),
                oracle_rows=len(odf),
                rows_match=len(sdf) == len(odf),
                schema_match=sorted(sdf.columns) == sorted(odf.columns),
            )
            status = []
            if not rec["rows_match"]:
                status.append(f"ROWS {len(sdf)} vs {len(odf)}")
            if not rec["schema_match"]:
                status.append(
                    f"COLS {sorted(sdf.columns)} vs {sorted(odf.columns)}")
            if not status:
                a, b = canon(sdf), canon(odf)
                rec["hash_match"] = bool(a.equals(b))
                if not rec["hash_match"]:
                    diff = (a != b).any(axis=1)
                    status.append(f"VALUES ({int(diff.sum())} differing rows)")
                    ex = a[diff].head(3), b[diff].head(3)
                    print(f"--- {name} spark:\n{ex[0]}\n--- oracle:\n{ex[1]}")
            else:
                rec["hash_match"] = False
        except Exception as e:  # noqa: BLE001 — errors-as-data, like the driver
            rec["err"] = f"{type(e).__name__}: {e}"
            status = [rec["err"]]
        if status:
            failures.append(name)
            print(f"{name:24s} FAIL: {'; '.join(status)}")
        else:
            print(f"{name:24s} OK ({rec['spark_rows']} rows)")

    if only is None:  # partial runs must not clobber the round artifact
        out = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "CHECK_ORACLE.json")
        with open(out, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_ok": len(report) - len(failures),
                       "n_total": len(report), "queries": report}, f, indent=1)
        print(f"wrote {out}")
    print(f"\n{len(report) - len(failures)}/{len(report)} ok; failures: {failures}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
