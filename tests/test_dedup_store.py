"""Cross-batch incremental dedup (operators/dedup_store.py)."""

import shutil

import pytest

from ferenda_spark.operators.dedup_store import dedup_against_store
from ferenda_spark.sources.snapshots import current_version


@pytest.fixture()
def root(tmp_path):
    p = str(tmp_path / "fpstore")
    yield p
    shutil.rmtree(p, ignore_errors=True)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_first_batch_all_survive_and_commit(spark, root):
    b1 = _df(spark, [(1, "alpha beta"), (2, "gamma delta"), (3, "ALPHA  beta")])
    surv, v = dedup_against_store(b1, root, "batch-1")
    got = sorted(r.doc_id for r in surv.collect())
    # 3 is a normalized dup of 1 (case/whitespace) — min id wins
    assert got == [1, 2]
    assert v == 1 and current_version(spark, root) == 1


def test_second_batch_drops_history_dups(spark, root):
    dedup_against_store(
        _df(spark, [(1, "alpha beta"), (2, "gamma delta")]), root, "batch-1"
    )
    b2 = _df(
        spark,
        [
            (10, "alpha beta"),      # dup of batch-1
            (11, "epsilon zeta"),    # fresh
            (12, "epsilon  ZETA"),   # in-batch dup of 11
        ],
    )
    surv, v = dedup_against_store(b2, root, "batch-2")
    assert sorted(r.doc_id for r in surv.collect()) == [11]
    assert v == 2


def test_retry_same_batch_id_is_idempotent(spark, root):
    dedup_against_store(_df(spark, [(1, "alpha beta")]), root, "batch-1")
    b2 = _df(spark, [(10, "alpha beta"), (11, "fresh text")])
    s1, v1 = dedup_against_store(b2, root, "batch-2")
    first = sorted(r.doc_id for r in s1.collect())
    # retry: must NOT dedup the batch against its own committed fps and
    # must not grow the store
    s2, v2 = dedup_against_store(b2, root, "batch-2")
    assert sorted(r.doc_id for r in s2.collect()) == first == [11]
    assert v1 == v2 == 2
    assert current_version(spark, root) == 2


def test_third_batch_sees_all_prior_fps(spark, root):
    dedup_against_store(_df(spark, [(1, "one")]), root, "b1")
    dedup_against_store(_df(spark, [(2, "two")]), root, "b2")
    surv, v = dedup_against_store(
        _df(spark, [(30, "one"), (31, "two"), (32, "three")]), root, "b3"
    )
    assert sorted(r.doc_id for r in surv.collect()) == [32]
    assert v == 3


def test_all_dup_batch_commits_empty(spark, root):
    dedup_against_store(_df(spark, [(1, "one")]), root, "b1")
    surv, v = dedup_against_store(_df(spark, [(9, "one")]), root, "b2")
    assert surv.count() == 0 and v == 2
    # store still serves batch 3 correctly
    s3, _ = dedup_against_store(_df(spark, [(5, "one"), (6, "new")]), root, "b3")
    assert sorted(r.doc_id for r in s3.collect()) == [6]
