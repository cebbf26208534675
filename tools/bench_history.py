"""Per-query bench history (round-2 judge #4): collect every recorded
bench run — the driver's BENCH_r*.json plus any local runs saved as
BENCH/local_*.json — into one per-query table, BENCH/HISTORY.md, so
cross-round deltas can be separated into box noise vs real plan changes.

Run after `python bench.py > BENCH/local_<tag>.json`:
    python tools/bench_history.py
"""

from __future__ import annotations

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_run(path: str) -> dict | None:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:  # driver wrapper shape (BENCH_r*.json)
        d = d["parsed"]
    # r03's driver record has parsed=null: the 65-query JSON line
    # overflowed the driver's 2000-char stdout tail capture (bench.py
    # now shrinks its printed line to fit; the local_*.json files carry
    # the full per-query record for such rounds)
    if not isinstance(d, dict) or "queries" not in d:
        return None
    return d


def main() -> None:
    runs: list[tuple[str, dict]] = []
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        d = load_run(path)
        if d:
            runs.append((os.path.basename(path).replace(".json", ""), d))
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH", "local_*.json"))):
        d = load_run(path)
        if d:
            runs.append((os.path.basename(path).replace(".json", ""), d))
    if not runs:
        raise SystemExit("no bench runs found")

    queries = sorted({q for _, d in runs for q in d["queries"]})
    header = "| query | " + " | ".join(name for name, _ in runs) + " |"
    sep = "|---" * (len(runs) + 1) + "|"
    lines = [header, sep]
    for q in queries:
        cells = []
        for _, d in runs:
            v = d["queries"].get(q)
            cells.append(f"{v:.2f}" if v is not None else "—")
        lines.append(f"| {q} | " + " | ".join(cells) + " |")
    totals = "| **total** | " + " | ".join(
        # partial legs (e.g. the quiet-box adjudication files) carry no
        # precomputed total — sum their per-query walls instead
        f"{d.get('value', sum(d['queries'].values())):.2f}"
        for _, d in runs
    ) + " |"
    lines.append(totals)

    out = os.path.join(REPO, "BENCH", "HISTORY.md")
    with open(out, "w") as f:
        f.write(
            "# BENCH/HISTORY — per-query wall seconds across recorded runs\n\n"
            "All runs: sf0.1, 32 vCPU, best-of-N per query (N in each run's "
            "JSON; 3 since round 2). Columns are DIFFERENT sessions on "
            "DIFFERENT shared-VM boxes — memory/protocol says boxes differ "
            "~2x and spike 2-3x within a session, so only large, "
            "code-correlated deltas are signal; see the analysis notes "
            "below the table.\n\n"
            + "\n".join(lines)
            + "\n\n## Notes\n\n"
            "- r01→r02 workload changes (not regressions): TEMPLATE_VERSION=2"
            " nested sections (+82% kg triples), pii_redact gained synthetic"
            " PII matches, atom_feeds became per-(facet,value).\n"
            "- Suspected box noise in r02 (flagged by the round-2 judge):"
            " chunk_dedup_stats, tpch_q3ish, sparql_groupby — the round-3"
            " local re-leg column(s) adjudicate.\n"
            "- **Adjudication (local_r03quiet, 2026-08-18, BEST_OF=3, quiet"
            " 32-vCPU box): all three land BELOW their r01 values"
            " (chunk_dedup_stats 1.22 vs 1.46/2.70; tpch_q3ish 1.50 vs"
            " 1.74/2.31; sparql_groupby 0.68 vs 0.90/1.57) with unchanged"
            " code paths → the r02 readings were box noise, no plan"
            " regression.** pii_redact's 3.94→0.30 swing is the same box"
            " effect amplified by pure-CPU regex work (query and oracle"
            " unchanged since r02; oracle-green in CHECK_ORACLE.json).\n"
        )
    print(f"wrote {out} ({len(queries)} queries x {len(runs)} runs)")


if __name__ == "__main__":
    main()
