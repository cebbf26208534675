"""triangle_count (operators/graph.py) and fact_versions
(operators/temporal.py) vs naive Python references."""

from __future__ import annotations

import datetime as dt
import itertools
import random

import pytest
from pyspark.sql import functions as F

from ferenda_spark.operators.graph import triangle_count
from ferenda_spark.operators.temporal import fact_versions, facts_as_of


def _naive_triangles(edges):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {n: 0 for n in adj}
    for x, y, z in itertools.combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for n in (x, y, z):
                counts[n] += 1
    return counts


def _run_tri(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"])
    return {r.node: r.n_triangles for r in triangle_count(df).collect()}


def test_triangle_known_graph(spark):
    # K4 on {1,2,3,4}: every node in C(3,2)=3 triangles; 5 dangles off
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges += [(4, 5), (5, 5), (2, 1)]  # dangle, self-loop, reverse dup
    got = _run_tri(spark, edges)
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 5: 0}


@pytest.mark.parametrize("seed", [3, 9])
def test_triangle_random_matches_naive(spark, seed):
    rnd = random.Random(seed)
    edges = [(rnd.randint(0, 25), rnd.randint(0, 25)) for _ in range(120)]
    edges = [e for e in edges if e[0] != e[1]]
    assert _run_tri(spark, edges) == _naive_triangles(edges)


# ---------------------------------------------------------------- temporal
def _ts(day, hour=0):
    return dt.datetime(2026, 1, day, hour)


def _naive_versions(rows):
    """rows: (subj, pred, obj, ts) → {key: [(value, from, to, ver, cur)]}"""
    from collections import defaultdict

    by_key = defaultdict(set)
    for s, p, o, t in rows:
        by_key[(s, p)].add((t, o))
    out = {}
    for k, obs in by_key.items():
        ordered = sorted(obs)
        changes = []
        for t, v in ordered:
            if not changes or changes[-1][1] != v:
                changes.append((t, v))
        vers = []
        for i, (t, v) in enumerate(changes):
            nxt = changes[i + 1][0] if i + 1 < len(changes) else None
            vers.append((v, t, nxt, i + 1, nxt is None))
        out[k] = vers
    return out


def _run_versions(spark, rows):
    df = spark.createDataFrame(rows, ["subj", "pred", "obj", "ts"])
    got = fact_versions(df).collect()
    out = {}
    for r in got:
        out.setdefault((r.subj, r.pred), []).append(
            (r.value, r.valid_from, r.valid_to, r.version, r.is_current)
        )
    return {k: sorted(v, key=lambda x: x[3]) for k, v in out.items()}


def test_versions_change_detection(spark):
    rows = [
        ("e:1", "p:title", "A", _ts(1)),
        ("e:1", "p:title", "A", _ts(2)),   # re-crawl, no change
        ("e:1", "p:title", "B", _ts(3)),
        ("e:1", "p:title", "A", _ts(4)),   # changes BACK → new version
        ("e:2", "p:title", "X", _ts(1)),
    ]
    got = _run_versions(spark, rows)
    assert got[("e:1", "p:title")] == [
        ("A", _ts(1), _ts(3), 1, False),
        ("B", _ts(3), _ts(4), 2, False),
        ("A", _ts(4), None, 3, True),
    ]
    assert got[("e:2", "p:title")] == [("X", _ts(1), None, 1, True)]
    assert got == _naive_versions(rows)


def test_versions_idempotent_reingest_and_ties(spark):
    rows = [
        ("e:1", "p:v", "A", _ts(1)),
        ("e:1", "p:v", "A", _ts(1)),       # exact duplicate observation
        ("e:1", "p:v", "B", _ts(2)),
        ("e:1", "p:v", "C", _ts(2)),       # simultaneous conflict: value
    ]                                       # tiebreak → B then C
    got = _run_versions(spark, rows)
    vals = [(v, f, t) for v, f, t, *_ in got[("e:1", "p:v")]]
    assert vals == [("A", _ts(1), _ts(2)), ("B", _ts(2), _ts(2)),
                    ("C", _ts(2), None)]
    assert got == _naive_versions(rows)


def test_facts_as_of(spark):
    rows = [
        ("e:1", "p:v", "A", _ts(1)),
        ("e:1", "p:v", "B", _ts(5)),
    ]
    df = spark.createDataFrame(rows, ["subj", "pred", "obj", "ts"])
    vers = fact_versions(df)
    at3 = facts_as_of(vers, _ts(3)).collect()
    assert [(r.value,) for r in at3] == [("A",)]
    at5 = facts_as_of(vers, _ts(5)).collect()
    assert [(r.value,) for r in at5] == [("B",)]


@pytest.mark.parametrize("seed", [5])
def test_versions_random_matches_naive(spark, seed):
    rnd = random.Random(seed)
    rows = []
    for _ in range(300):
        rows.append((
            f"e:{rnd.randint(0, 10)}",
            f"p:{rnd.randint(0, 3)}",
            rnd.choice("ABCD"),
            _ts(rnd.randint(1, 20), rnd.randint(0, 23)),
        ))
    assert _run_versions(spark, rows) == _naive_versions(rows)


# --- interval coalescing -------------------------------------------------

def _coalesce_rows(spark, rows, gap=0):
    from ferenda_spark.operators.temporal import coalesce_intervals

    df = spark.createDataFrame(
        rows, "subj string, pred string, value string, "
              "valid_from bigint, valid_to bigint")
    out = coalesce_intervals(df, gap=gap).collect()
    return sorted((r.subj, r.pred, r.value, r.valid_from, r.valid_to,
                   r.n_merged) for r in out)


def _brute(rows, gap=0):
    per = {}
    for s, p, v, a, b in rows:
        per.setdefault((s, p, v), []).append((a, b))
    out = []
    for k, iv in per.items():
        iv.sort()
        cur_a, cur_b, n = iv[0][0], iv[0][1], 1
        for a, b in iv[1:]:
            if a > cur_b + gap:
                out.append((*k, cur_a, cur_b, n))
                cur_a, cur_b, n = a, b, 1
            else:
                cur_b = max(cur_b, b)
                n += 1
        out.append((*k, cur_a, cur_b, n))
    return sorted(out)


def test_coalesce_overlap_and_gap(spark):
    rows = [
        ("e1", "p", "v", 0, 10),
        ("e1", "p", "v", 5, 20),    # overlaps -> merge
        ("e1", "p", "v", 25, 30),   # gap of 5 -> separate at gap=0
        ("e1", "p", "w", 0, 100),   # different value: own island
        ("e2", "p", "v", 3, 4),
    ]
    assert _coalesce_rows(spark, rows) == _brute(rows)
    # gap=5 bridges the 20->25 hole
    assert _coalesce_rows(spark, rows, gap=5) == _brute(rows, gap=5)


def test_coalesce_contained_and_touching(spark):
    rows = [
        ("e", "p", "v", 0, 50),
        ("e", "p", "v", 10, 20),   # fully contained
        ("e", "p", "v", 50, 60),   # touching endpoint merges (not >)
        ("e", "p", "v", 61, 70),   # gap 1 -> separate
    ]
    assert _coalesce_rows(spark, rows) == _brute(rows)


def test_coalesce_random_vs_brute(spark):
    import random

    rng = random.Random(13)
    rows = []
    for _ in range(300):
        a = rng.randrange(100)
        rows.append((f"e{rng.randrange(6)}", "p", f"v{rng.randrange(3)}",
                     a, a + rng.randrange(1, 15)))
    rows = list(set(rows))
    assert _coalesce_rows(spark, rows) == _brute(rows)
    assert _coalesce_rows(spark, rows, gap=3) == _brute(rows, gap=3)


def test_coalesce_timestamp_bounds_gap_zero(spark):
    """gap=0 must work on TIMESTAMP bounds (regression: `prev_max + 0`
    was an int-plus-timestamp DATATYPE_MISMATCH on Spark 4.x)."""
    from ferenda_spark.operators.temporal import coalesce_intervals

    df = spark.createDataFrame(
        [
            ("e", "p", "v", "2026-01-01 00:00:00", "2026-01-03 00:00:00"),
            ("e", "p", "v", "2026-01-02 00:00:00", "2026-01-05 00:00:00"),
            ("e", "p", "v", "2026-01-06 00:00:00", "2026-01-07 00:00:00"),
        ],
        "subj string, pred string, value string, f string, t string",
    ).select(
        "subj", "pred", "value",
        F.to_timestamp("f").alias("valid_from"),
        F.to_timestamp("t").alias("valid_to"),
    )
    out = sorted(
        (str(r.valid_from), str(r.valid_to), r.n_merged)
        for r in coalesce_intervals(df).collect()
    )
    assert out == [
        ("2026-01-01 00:00:00", "2026-01-05 00:00:00", 2),
        ("2026-01-06 00:00:00", "2026-01-07 00:00:00", 1),
    ]
