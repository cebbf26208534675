"""Context disambiguation (operators/disambig.py) vs a brute-force
tf-idf cosine reference."""

from __future__ import annotations

import math
import re

import pytest

from ferenda_spark.operators.disambig import disambiguate


def _toks(s):
    return [t for t in re.split(r"\s+", s.lower().strip()) if t]


def _ref(mentions, candidates, profiles):
    n_ent = len({e for e, _ in profiles})
    tf = {}
    for e, txt in profiles:
        for t in _toks(txt):
            tf[(e, t)] = tf.get((e, t), 0) + 1
    df = {}
    for (e, t) in tf:
        df[t] = df.get(t, 0) + 1
    idf = {t: math.log((n_ent + 1) / (d + 1)) + 1 for t, d in df.items()}
    w = {(e, t): c * idf[t] for (e, t), c in tf.items()}
    norm = {}
    for (e, t), v in w.items():
        norm[e] = norm.get(e, 0.0) + v * v
    norm = {e: math.sqrt(v) for e, v in norm.items()}
    out = {}
    for mid, ctx in mentions:
        ctf = {}
        for t in _toks(ctx):
            ctf[t] = ctf.get(t, 0) + 1
        cw = {t: c * idf[t] for t, c in ctf.items() if t in idf}
        cnorm = math.sqrt(sum(v * v for v in cw.values()))
        cands = sorted({e for m, e in candidates if m == mid})
        if not cands:
            continue
        scores = {}
        for e in cands:
            dot = sum(v * w.get((e, t), 0.0) for t, v in cw.items())
            scores[e] = (dot / (cnorm * norm[e])
                         if dot and cnorm > 0 and norm[e] > 0 else 0.0)
        win = min(cands, key=lambda e: (-scores[e], e))
        second = max((scores[e] for e in cands if e != win), default=None)
        margin = scores[win] - (second if second is not None else scores[win])
        out[mid] = (win, scores[win], margin, len(cands))
    return out


MENTIONS = [
    (1, "the river seine flows through the capital city of france"),
    (2, "he starred in the film about the trojan war prince"),
    (3, "completely unrelated words about spark shuffle joins"),
    (4, "capital city lights"),
]
CANDS = [(1, "paris_fr"), (1, "paris_person"),
         (2, "paris_fr"), (2, "paris_person"),
         (3, "paris_fr"), (3, "paris_person"),
         (4, "paris_fr")]
PROFILES = [
    ("paris_fr", "capital city of france on the river seine europe"),
    ("paris_person", "trojan prince of troy film war mythology"),
]


def _run(spark):
    m = spark.createDataFrame(MENTIONS, "mention_id bigint, context string")
    c = spark.createDataFrame(CANDS, "mention_id bigint, entity string")
    p = spark.createDataFrame(PROFILES, "entity string, profile string")
    return {r.mention_id: (r.entity, r.score, r.margin, r.n_candidates)
            for r in disambiguate(m, c, p).collect()}


def test_matches_reference_and_intuition(spark):
    got = _run(spark)
    want = _ref(MENTIONS, CANDS, PROFILES)
    assert set(got) == set(want)
    for mid, (e, s, mg, nc) in want.items():
        ge, gs, gm, gn = got[mid]
        assert ge == e, mid
        assert gs == pytest.approx(s, abs=1e-9)
        assert gm == pytest.approx(mg, abs=1e-9)
        assert gn == nc
    # the intuitive picks
    assert got[1][0] == "paris_fr"
    assert got[2][0] == "paris_person"
    # no-evidence mention: scores 0, tie -> min entity, margin 0
    assert got[3][0] == "paris_fr" and got[3][1] == 0.0 and got[3][2] == 0.0
    # single candidate: margin 0 by contract
    assert got[4][3] == 1 and got[4][2] == 0.0


def test_margin_is_abstain_signal(spark):
    got = _run(spark)
    assert got[1][2] > 0.1   # clear margins on well-separated contexts
    assert got[2][2] > 0.1
