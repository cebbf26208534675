"""Streaming fusion-state maintenance (streaming/fusion.py): micro-batch
folds equal direct fold_claims chaining, exactly-once under replay,
resolved upserts touch only batch keys."""

from __future__ import annotations

import pytest

from ferenda_spark.operators.fusion import fold_claims
from ferenda_spark.sources.snapshots import current_version
from ferenda_spark.streaming.fusion import (
    fusion_sink,
    read_fusion_state,
    run_stream_to_fusion,
)

SCHEMA = "source string, subj string, pred string, obj string"

B1 = [("s1", "e1", "p", "x"), ("s2", "e1", "p", "x"), ("s3", "e1", "p", "y"),
      ("s1", "e2", "p", "a")]
B2 = [("s3", "e2", "p", "b"), ("s1", "e3", "p", "c")]


@pytest.fixture()
def dirs(tmp_path):
    return (str(tmp_path / "src"), str(tmp_path / "state"),
            str(tmp_path / "ckpt"))


def _claims(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _facts(spark, root):
    _, facts, _ = read_fusion_state(spark, root)
    return {
        (r.subj, r.pred, r.obj): (round(r.belief, 9), r.n_sources)
        for r in facts.collect()
    }


def test_stream_folds_equal_direct_chaining(spark, dirs):
    src, root, ckpt = dirs
    _claims(spark, B1).write.mode("append").parquet(src)
    run_stream_to_fusion(
        spark.readStream.schema(SCHEMA).parquet(src), root, ckpt
    )
    _claims(spark, B2).write.mode("append").parquet(src)
    run_stream_to_fusion(
        spark.readStream.schema(SCHEMA).parquet(src), root, ckpt
    )

    ts, fs, _ = fold_claims(_claims(spark, B1))
    ts2, fs2, _ = fold_claims(_claims(spark, B2), ts, fs)
    want_facts = {(r.subj, r.pred, r.obj): (round(r.belief, 9), r.n_sources)
                  for r in fs2.collect()}
    assert _facts(spark, root) == want_facts
    trust_tab, _, _ = read_fusion_state(spark, root)
    got_trust = {r.source: (r.n_claims, round(r.sum_conf, 9))
                 for r in trust_tab.collect()}
    want_trust = {r.source: (r.n_claims, round(r.sum_conf, 9))
                  for r in ts2.collect()}
    assert got_trust == want_trust


def test_resolved_upsert_keeps_untouched_keys(spark, dirs):
    _, root, _ = dirs
    sink = fusion_sink(root)
    sink(_claims(spark, B1), batch_id=0)
    _, _, res1 = read_fusion_state(spark, root)
    r1 = {(r.subj, r.pred): r.obj for r in res1.collect()}
    assert r1[("e1", "p")] == "x"  # majority
    sink(_claims(spark, B2), batch_id=1)
    _, _, res2 = read_fusion_state(spark, root)
    r2 = {(r.subj, r.pred): r.obj for r in res2.collect()}
    assert r2[("e1", "p")] == "x"       # untouched key carried forward
    assert ("e3", "p") in r2            # new key upserted
    # e2 now has two candidates; winner deterministic (min obj on tie
    # or higher-trust source)
    assert ("e2", "p") in r2


def test_replayed_batch_is_skipped(spark, dirs):
    _, root, _ = dirs
    sink = fusion_sink(root)
    sink(_claims(spark, B1), batch_id=0)
    v1 = current_version(spark, root)
    before = _facts(spark, root)
    sink(_claims(spark, B1), batch_id=0)  # replay must not double-count
    assert current_version(spark, root) == v1
    assert _facts(spark, root) == before
