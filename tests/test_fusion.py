"""Truth-discovery fusion (operators/fusion.py) vs a pure-Python reference
implementation of the same fixed-point, plus hand-checked conflict cases."""

from __future__ import annotations

import random

import pytest

from ferenda_spark.operators.fusion import fuse_claims


def _reference(claims, n_iter):
    """Naive dict-based replay of the documented update rule."""
    claims = sorted(set(claims))
    sources = sorted({s for s, *_ in claims})
    trust = {s: 1.0 for s in sources}
    conf = {}
    for _ in range(n_iter):
        belief = {}
        for s, subj, pred, obj in claims:
            belief[(subj, pred, obj)] = belief.get((subj, pred, obj), 0.0) + trust[s]
        total = {}
        for (subj, pred, _obj), b in belief.items():
            total[(subj, pred)] = total.get((subj, pred), 0.0) + b
        conf = {f: b / total[f[:2]] for f, b in belief.items()}
        acc = {}
        for s, subj, pred, obj in claims:
            acc.setdefault(s, []).append(conf[(subj, pred, obj)])
        trust = {s: sum(v) / len(v) for s, v in acc.items()}
    resolved = {}
    for (subj, pred, obj), c in conf.items():
        cur = resolved.get((subj, pred))
        # max confidence, ties -> min obj (same rule as the operator)
        if cur is None or (-c, obj) < (-cur[1], cur[0]):
            resolved[(subj, pred)] = (obj, c)
    return resolved, trust


def _run(spark, rows, n_iter=3):
    df = spark.createDataFrame(rows, "source string, subj string, pred string, obj string")
    resolved, trust = fuse_claims(df, n_iter=n_iter)
    r = {(x.subj, x.pred): (x.obj, x.confidence, x.n_sources, x.n_candidates)
         for x in resolved.collect()}
    t = {x.source: x.trust for x in trust.collect()}
    return r, t


def test_majority_wins(spark):
    rows = [
        ("s1", "e1", "pop", "100"),
        ("s2", "e1", "pop", "100"),
        ("s3", "e1", "pop", "999"),
    ]
    r, t = _run(spark, rows)
    obj, conf, n_src, n_cand = r[("e1", "pop")]
    assert obj == "100" and n_src == 2 and n_cand == 2
    assert conf > 0.5
    # the out-voted source ends up less trusted than the majority pair
    assert t["s3"] < t["s1"] == t["s2"]


def test_reliable_source_breaks_tie(spark):
    # s1 is right about e1 (majority), so its solo claim on e2 outweighs
    # s3's solo claim — trust learned on one fact transfers to another.
    rows = [
        ("s1", "e1", "pop", "100"),
        ("s2", "e1", "pop", "100"),
        ("s3", "e1", "pop", "999"),
        ("s1", "e2", "pop", "55"),
        ("s3", "e2", "pop", "77"),
    ]
    r, _ = _run(spark, rows, n_iter=4)
    assert r[("e2", "pop")][0] == "55"


def test_duplicate_assertions_count_once(spark):
    rows = [
        ("s1", "e1", "pop", "100"),
        ("s1", "e1", "pop", "100"),  # dup: same source, same fact
        ("s2", "e1", "pop", "999"),
        ("s3", "e1", "pop", "999"),
    ]
    r, _ = _run(spark, rows)
    assert r[("e1", "pop")][0] == "999"


def test_tie_breaks_to_min_obj(spark):
    rows = [("s1", "e1", "pop", "b"), ("s2", "e1", "pop", "a")]
    r, _ = _run(spark, rows)
    obj, conf, _, _ = r[("e1", "pop")]
    assert obj == "a" and conf == pytest.approx(0.5)


def test_matches_reference_random(spark):
    rng = random.Random(7)
    rows = []
    for _ in range(300):
        s = f"s{rng.randrange(12)}"
        subj = f"e{rng.randrange(25)}"
        pred = rng.choice(["pop", "area"])
        obj = f"v{rng.randrange(4)}"
        rows.append((s, subj, pred, obj))
    r, t = _run(spark, rows, n_iter=3)
    ref_resolved, ref_trust = _reference([tuple(x) for x in rows], 3)
    assert set(r) == set(ref_resolved)
    for k, (obj, conf, _, _) in r.items():
        assert obj == ref_resolved[k][0], k
        assert conf == pytest.approx(ref_resolved[k][1], abs=1e-9)
    for s, tr in t.items():
        assert tr == pytest.approx(ref_trust[s], abs=1e-9)


def test_partitioning_invariance(spark):
    rng = random.Random(11)
    rows = [(f"s{rng.randrange(6)}", f"e{rng.randrange(9)}", "p",
             f"v{rng.randrange(3)}") for _ in range(120)]
    df1 = spark.createDataFrame(rows, "source string, subj string, pred string, obj string")
    df2 = df1.repartition(13)
    r1, _ = fuse_claims(df1, n_iter=2)
    r2, _ = fuse_claims(df2, n_iter=2)
    a = sorted((x.subj, x.pred, x.obj, round(x.confidence, 9)) for x in r1.collect())
    b = sorted((x.subj, x.pred, x.obj, round(x.confidence, 9)) for x in r2.collect())
    assert a == b
