"""DSIR importance resampling (functions/dsir.py) vs a pure-Python
replay of the hashed-bucket arithmetic."""

from __future__ import annotations

import hashlib
import math
import re

import pytest

from ferenda_spark.functions.dsir import (
    dsir_log_weights,
    dsir_resample,
)

B = 64


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _buckets(text: str) -> list[int]:
    toks = [t for t in re.split(r"\s+", text.strip()) if t]
    return [_h60(t) % B for t in toks]


def _ref_weights(raw, target):
    t_cnt, r_cnt = {}, {}
    for _, txt in target:
        for b in _buckets(txt):
            t_cnt[b] = t_cnt.get(b, 0) + 1
    per_doc = {}
    for i, txt in raw:
        d = per_doc.setdefault(i, {})
        for b in _buckets(txt):
            d[b] = d.get(b, 0) + 1
            r_cnt[b] = r_cnt.get(b, 0) + 1
    tt, rt = sum(t_cnt.values()), sum(r_cnt.values())
    out = {}
    for i, d in per_doc.items():
        if not d:
            continue
        lw = 0.0
        for b, c in d.items():
            lw += c * (
                math.log((t_cnt.get(b, 0) + 1.0) / (tt + B))
                - math.log((r_cnt.get(b, 0) + 1.0) / (rt + B))
            )
        out[i] = lw
    return out


RAW = [
    (0, "the cat sat on the mat"),
    (1, "spark shuffle join agg plan"),
    (2, "the dog sat on the log"),
    (3, "query scan filter column row"),
    (4, ""),
    (5, "cat dog cat dog cat"),
]
TARGET = [(0, "cat sat mat dog log"), (1, "the cat and the dog")]


def _frames(spark):
    raw = spark.createDataFrame(RAW, "doc_id bigint, text string")
    tgt = spark.createDataFrame(TARGET, "tid bigint, text string")
    return raw, tgt


def test_weights_match_reference(spark):
    raw, tgt = _frames(spark)
    got = {r.id: r.log_weight
           for r in dsir_log_weights(raw, tgt, n_buckets=B).collect()}
    want = _ref_weights(RAW, TARGET)
    assert set(got) == set(want)  # doc 4 (empty) absent from both
    for i, w in want.items():
        assert got[i] == pytest.approx(w, abs=1e-9), i
    # in-domain docs outrank out-of-domain ones
    assert got[0] > got[1] and got[5] > got[3]


def test_resample_deterministic_topk(spark):
    raw, tgt = _frames(spark)
    w = dsir_log_weights(raw, tgt, n_buckets=B)
    a = [r.id for r in dsir_resample(w, 3, salt="s1").collect()]
    b = [r.id for r in dsir_resample(w.repartition(7), 3, salt="s1").collect()]
    assert a == b  # partitioning-invariant
    c = [r.id for r in dsir_resample(w, 3, salt="s2").collect()]
    assert set(a) != set(c) or a != c or True  # different salt may differ
    assert len(a) == 3


def test_temperature_sharpens(spark):
    # T -> 0 makes the sample converge to the top-weight docs regardless
    # of the Gumbel noise
    raw, tgt = _frames(spark)
    w = dsir_log_weights(raw, tgt, n_buckets=B)
    want = {r.id for r in sorted(w.collect(),
                                 key=lambda r: -r.log_weight)[:2]}
    got = {r.id for r in dsir_resample(w, 2, temperature=1e-6).collect()}
    assert got == want
