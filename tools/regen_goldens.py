"""DELIBERATE golden regeneration (FIXTURES §2 contract: goldens are frozen
and never regenerated implicitly; rerunning this script is an explicit,
reviewed breaking change to the per-row invariant).

Regenerated 2026-08-18 (round 2) because the corpus template gained nested
Section/Subsection structure (SURVEY §7.4 depth-3, VERDICT round-1 item 6):
`<h3>/<h4>` headings with dotted ("Section 2.1.") and lettered
("Section 2 a.") ordinals. The html per url changed, so the frozen
extraction shas and struct trees were re-frozen from the new template and
hand-audited (see the audit printout this script emits: a sample of pages
with their heading lines, path lists, and round-trip checks).

Usage: python tools/regen_goldens.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ferenda_spark.functions.extract import extract_text  # noqa: E402
from ferenda_spark.operators.fsm import parse_structure  # noqa: E402
from ferenda_spark.sources.corpus import gen_doc  # noqa: E402

N_GOLDEN = 500
N_STRUCT = 25


def main() -> None:
    urls, shas, lens = [], [], []
    struct_rows = []
    n_nested = n_depth3 = 0
    for i in range(N_GOLDEN):
        d = gen_doc(i, N_GOLDEN)
        b = extract_text(d["html"]).encode("utf-8")
        urls.append(d["url"])
        shas.append(hashlib.sha256(b).hexdigest())
        lens.append(len(b))
        paths = [s["ordinal_path"] for s in d["struct"]]
        if any("." in p for p in paths):
            n_nested += 1
        if any(p.count(".") == 2 for p in paths):
            n_depth3 += 1
        if i % 20 == 0 and len(struct_rows) < N_STRUCT:
            struct_rows.append(
                {
                    "url": d["url"],
                    "title": d["title"],
                    "sections": [
                        {
                            "ordinal": s["ordinal"],
                            "ordinal_path": s["ordinal_path"],
                            "title": s["title"],
                            "paras": [
                                {"idx": p["idx"], "text": p["text"]}
                                for p in s["paras"]
                            ],
                        }
                        for s in d["struct"]
                    ],
                }
            )

    pq.write_table(
        pa.table({"url": urls, "text_sha256": shas, "text_len": lens}),
        "fixtures/golden_text.parquet",
    )
    with open("fixtures/golden_struct.jsonl", "w") as f:
        for row in struct_rows:
            f.write(json.dumps(row, sort_keys=True) + "\n")

    # ---- audit: FSM must recover the planted structure for EVERY doc ----
    mismatches = 0
    for i in range(N_GOLDEN):
        d = gen_doc(i, N_GOLDEN)
        ctx = parse_structure(d["text"])
        got = [
            (s["ordinal"], s["ordinal_path"], s["title"],
             tuple(p["text"] for p in s["paras"]))
            for s in ctx["sections"]
        ]
        want = [
            (s["ordinal"], s["ordinal_path"], s["title"],
             tuple(p["text"] for p in s["paras"]))
            for s in d["struct"]
        ]
        if got != want:
            mismatches += 1
            if mismatches <= 3:
                print(f"MISMATCH {d['url']}", file=sys.stderr)
    print(
        f"goldens: {N_GOLDEN} text shas, {len(struct_rows)} structs; "
        f"{n_nested} docs nested, {n_depth3} with depth-3; "
        f"FSM round-trip mismatches: {mismatches}"
    )
    # hand-audit sample: show one nested doc's headings
    for i in range(N_GOLDEN):
        d = gen_doc(i, N_GOLDEN)
        paths = [s["ordinal_path"] for s in d["struct"]]
        if any(p.count(".") == 2 for p in paths):
            print(f"sample {d['url']}: paths={paths}")
            for line in d["text"].split("\n\n"):
                if line.startswith("Section "):
                    print("  ", line[:72])
            break
    if mismatches:
        sys.exit(1)


if __name__ == "__main__":
    main()
