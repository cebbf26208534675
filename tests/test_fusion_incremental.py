"""Incremental fusion folds (operators/fusion.py:fold_claims) vs a
pure-Python replay of the documented fold semantics, plus the
first-fold ≡ fuse_claims(n_iter=1) equivalence."""

from __future__ import annotations

import random

import pytest

from ferenda_spark.operators.fusion import fold_claims, fuse_claims


def _ref_fold(batches):
    """Replay the documented amortized semantics."""
    trust = {}      # source -> [n_claims, sum_conf]
    facts = {}      # (s,p,o) -> [belief, n_sources]
    resolved = {}
    for batch in batches:
        b = sorted(set(batch))
        cur_trust = {
            s: (st[1] / st[0] if st[0] else 1.0) for s, st in trust.items()
        }
        delta = {}
        for src, s, p, o in b:
            t = cur_trust.get(src, 1.0)
            d = delta.setdefault((s, p, o), [0.0, 0])
            d[0] += t
            d[1] += 1
        for f, (db, dn) in delta.items():
            cur = facts.setdefault(f, [0.0, 0])
            cur[0] += db
            cur[1] += dn
        touched = {(s, p) for (s, p, _o) in delta}
        conf = {}
        for (s, p) in touched:
            cands = {f: v for f, v in facts.items() if f[:2] == (s, p)}
            total = sum(v[0] for v in cands.values())
            for f, v in cands.items():
                conf[f] = (v[0] / total, v[1], len(cands))
            best = min(cands, key=lambda f: (-conf[f][0], f[2]))
            resolved[(s, p)] = (best[2], *conf[best])
        for src, s, p, o in b:
            c = conf[(s, p, o)][0]
            st = trust.setdefault(src, [0, 0.0])
            st[0] += 1
            st[1] += c
    return trust, facts, resolved


def _run_folds(spark, batches):
    ts = fs = None
    deltas = {}
    for batch in batches:
        df = spark.createDataFrame(
            batch, "source string, subj string, pred string, obj string"
        )
        ts, fs, rd = fold_claims(df, ts, fs)
        for r in rd.collect():
            deltas[(r.subj, r.pred)] = (
                r.obj, r.confidence, r.n_sources, r.n_candidates
            )
    return ts, fs, deltas


def _batches(rng, n_batches, n_rows):
    return [
        [(f"s{rng.randrange(6)}", f"e{rng.randrange(8)}", "p",
          f"v{rng.randrange(3)}") for _ in range(n_rows)]
        for _ in range(n_batches)
    ]


def test_first_fold_equals_one_round_fusion(spark):
    rng = random.Random(5)
    rows = _batches(rng, 1, 150)[0]
    df = spark.createDataFrame(
        rows, "source string, subj string, pred string, obj string"
    )
    _, _, rd = fold_claims(df)
    got = {(r.subj, r.pred): (r.obj, pytest.approx(r.confidence, abs=1e-9),
                              r.n_sources, r.n_candidates)
           for r in rd.collect()}
    resolved, _ = fuse_claims(df, n_iter=1)
    want = {(r.subj, r.pred): (r.obj, r.confidence, r.n_sources,
                               r.n_candidates)
           for r in resolved.collect()}
    assert set(got) == set(want)
    for k, (obj, conf, ns, nc) in want.items():
        assert got[k] == (obj, pytest.approx(conf, abs=1e-9), ns, nc), k


def test_multi_batch_matches_reference(spark):
    rng = random.Random(9)
    batches = _batches(rng, 3, 60)
    ts, fs, deltas = _run_folds(spark, batches)
    rtrust, rfacts, rresolved = _ref_fold(batches)

    got_trust = {r.source: (r.n_claims, pytest.approx(r.sum_conf, abs=1e-9))
                 for r in ts.collect()}
    assert set(got_trust) == set(rtrust)
    for s, (n, sc) in rtrust.items():
        assert got_trust[s] == (n, pytest.approx(sc, abs=1e-9)), s

    got_facts = {(r.subj, r.pred, r.obj):
                 (pytest.approx(r.belief, abs=1e-9), r.n_sources)
                 for r in fs.collect()}
    assert set(got_facts) == set(rfacts)
    for f, (b, n) in rfacts.items():
        assert got_facts[f] == (pytest.approx(b, abs=1e-9), n), f

    for k, (obj, conf, ns, nc) in rresolved.items():
        g = deltas[k]
        assert g[0] == obj and g[1] == pytest.approx(conf, abs=1e-9), k
        assert (g[2], g[3]) == (ns, nc), k


def test_untouched_keys_not_in_delta(spark):
    b1 = [("s1", "e1", "p", "x"), ("s2", "e2", "p", "y")]
    b2 = [("s3", "e2", "p", "z")]
    df1 = spark.createDataFrame(
        b1, "source string, subj string, pred string, obj string")
    ts, fs, _ = fold_claims(df1)
    df2 = spark.createDataFrame(
        b2, "source string, subj string, pred string, obj string")
    _, _, rd2 = fold_claims(df2, ts, fs)
    keys = {(r.subj, r.pred) for r in rd2.collect()}
    assert keys == {("e2", "p")}  # e1 untouched by batch 2
