"""Artifact-lockstep guard (round-3 verdict, next-round #7).

Round 3 shipped a CHECK_ORACLE.json one query short because the last
commit added a contract query AFTER the artifact was generated. This
test makes that state unrepresentable in a green tree: whenever
``__spark_entry__.queries()`` changes, the committed CHECK_ORACLE.json
must be regenerated in the SAME commit (``python tools/check_oracle.py``)
or the suite goes red.

Also pins the rows-only probe contract: every query without an
``oracle_sql()`` entry must carry a pinned expected row count in
``tools/check_oracle.py::EXPECTED_ROWS`` for both checked sf dirs, so a
silent regression to 0 rows can never read as green.
"""

from __future__ import annotations

import json
import os
import sys

import __spark_entry__ as em

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from check_oracle import EXPECTED_ROWS  # noqa: E402


def test_check_oracle_artifact_covers_full_contract():
    with open(os.path.join(REPO, "CHECK_ORACLE.json")) as f:
        artifact = json.load(f)
    contract = set(em.queries())
    recorded = set(artifact["queries"])
    missing = sorted(contract - recorded)
    stale = sorted(recorded - contract)
    assert not missing and not stale, (
        f"CHECK_ORACLE.json out of lockstep with queries() — regenerate it "
        f"in this commit (python tools/check_oracle.py). "
        f"missing={missing} stale={stale}"
    )
    assert artifact["n_total"] == len(contract)


def test_every_rows_only_query_has_pinned_expected_rows():
    rows_only = set(em.queries()) - set(em.oracle_sql())
    for name in sorted(rows_only):
        pins = EXPECTED_ROWS.get(name, {})
        assert "sf0.001" in pins and "sf0.01" in pins, (
            f"rows-only query {name!r} lacks pinned expected_rows — add "
            f"both sf0.001 and sf0.01 to EXPECTED_ROWS in "
            f"tools/check_oracle.py"
        )


def test_no_stale_pins_for_oracle_backed_queries():
    oracle_backed = set(em.oracle_sql())
    stale = sorted(set(EXPECTED_ROWS) & oracle_backed)
    assert not stale, (
        f"EXPECTED_ROWS pins exist for oracle-backed queries (the oracle "
        f"already checks rows): {stale}"
    )
