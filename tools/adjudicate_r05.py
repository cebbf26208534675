"""Quiet-box adjudication leg (round-4 verdict 'What's wrong' #1).

Re-times ONLY the five iterative queries whose local sf0.1 walls regressed
>1.5x between local_r03f and local_r04c (all touched by the RoundCadence /
tree-hooking change), plus two untouched control queries that bound the
box-noise level (tpch_q1ish regressed 0.62->2.37 in r04c with UNCHANGED
code — the control tells us whether this box behaves like the r03 or the
r04 one). Same harness constants as bench.py: local[32], shuffle=32,
BEST_OF=3, sf0.1.

Usage: python tools/adjudicate_r05.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from ferenda_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BEST_OF = int(os.environ.get("SPARK_GRAFT_BEST_OF", "3"))

REGRESSED = [
    "kcore_survivors",
    "redirect_resolution",
    "sameas_canonical",
    "rdf_list_flatten",
    "bfs_seed_distances",
]
CONTROLS = ["tpch_q1ish", "toc_rollup_docs"]


def main() -> None:
    spark = get_spark(
        app_name="ferenda_adjudicate",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    qs["tpch_q1ish"](spark, SF_DIR).count()  # warm (not timed)

    out: dict[str, float] = {}
    for name in CONTROLS + REGRESSED:
        best = None
        for _ in range(BEST_OF):
            t0 = time.monotonic()
            qs[name](spark, SF_DIR).count()
            secs = time.monotonic() - t0
            best = secs if best is None else min(best, secs)
        out[name] = round(best, 3)
        print(f"{name:24s} {best:6.2f}s", flush=True)

    rec = {"sf_dir": SF_DIR, "cpus": CPUS, "best_of": BEST_OF,
           "queries": out}
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH", "local_r05quiet.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
