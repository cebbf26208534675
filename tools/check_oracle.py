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

# Rows-only queries (no SQL oracle) get their row count PINNED here per
# sf_dir basename — the corpus is seed-42 deterministic, so any drift is
# a real regression, and a silent collapse to 0 rows can no longer read
# as green (round-3 verdict finding #1). A rows-only query with no pin
# for the requested sf_dir FAILS loudly: pin it when you add it.
EXPECTED_ROWS: dict[str, dict[str, int]] = {
    "generate_html":       {"sf0.001": 100,   "sf0.01": 100},
    "quality_classifier":  {"sf0.001": 40,    "sf0.01": 40},
    "curation_report":     {"sf0.001": 1,     "sf0.01": 1},
    "kg_triples":          {"sf0.001": 10732, "sf0.01": 10732},
    "kg_entity_links":     {"sf0.001": 1705,  "sf0.01": 1705},
    "dedup_embedding_lsh": {"sf0.001": 37,    "sf0.01": 40},
    "dedup_minhash":       {"sf0.001": 28,    "sf0.01": 25},
    "dedup_simhash":       {"sf0.001": 133,   "sf0.01": 122},
    "similarity_ivf":      {"sf0.001": 10,    "sf0.01": 10},
    "similarity_pq":       {"sf0.001": 10,    "sf0.01": 10},
    "bpe_token_stats":     {"sf0.001": 5,     "sf0.01": 5},
    "media_features":      {"sf0.001": 64,    "sf0.01": 64},
    "media_real_decode":   {"sf0.001": 48,    "sf0.01": 48},
    "media_real_decode_jpeg": {"sf0.001": 48, "sf0.01": 48},
    "curation_pipeline":   {"sf0.001": 89,    "sf0.01": 89},
    "kg_xhtml":            {"sf0.001": 100,   "sf0.01": 100},
    "toc_html_pages":      {"sf0.001": 44,    "sf0.01": 45},
    "kg_patched_parse":    {"sf0.001": 60,    "sf0.01": 60},
    "span_dedup_winnow":   {"sf0.001": 211,   "sf0.01": 229},
    "kg_fused_pipeline":   {"sf0.001": 1,     "sf0.01": 1},
}


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
        status = []
        try:
            if name not in oracles:
                n = fn(spark, sf_dir).count()
                sf_key = os.path.basename(sf_dir.rstrip("/"))
                want = EXPECTED_ROWS.get(name, {}).get(sf_key)
                rec.update(spark_rows=n, expected_rows=want,
                           rows_match=(want is not None and n == want))
                if want is None:
                    status.append(
                        f"rows-only query has no pinned expected_rows for "
                        f"{sf_key} — add it to EXPECTED_ROWS")
                elif n != want:
                    status.append(f"ROWS {n} vs pinned {want}")
                if status:
                    failures.append(name)
                    print(f"{name:24s} FAIL: {'; '.join(status)}")
                else:
                    print(f"{name:24s} rows-only OK: {n} rows (pinned)")
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
        # lockstep guard (round-3 verdict): the artifact must cover the
        # FULL contract — a report shorter than queries() means a query
        # was added without regenerating this file.
        if len(report) != len(qs):
            print(f"LOCKSTEP VIOLATION: report covers {len(report)} of "
                  f"{len(qs)} contract queries")
            sys.exit(1)
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
