"""asof_join (operators/asof.py) vs pandas merge_asof, plus edge cases and
the plan-shape guarantee (union-window form: no join node)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from ferenda_spark.operators.asof import asof_join

BASE = dt.datetime(2024, 1, 1)


def _frames(seed: int, n_left: int = 60, n_right: int = 50, n_keys: int = 4):
    rng = np.random.RandomState(seed)
    left = pd.DataFrame(
        {
            "user": rng.randint(0, n_keys, n_left),
            "ts": [
                BASE + dt.timedelta(minutes=int(m))
                for m in rng.randint(0, 300, n_left)
            ],
            "lv": np.arange(n_left),
        }
    )
    right = pd.DataFrame(
        {
            "user": rng.randint(0, n_keys, n_right),
            "ts": [
                BASE + dt.timedelta(minutes=int(m))
                for m in rng.randint(0, 300, n_right)
            ],
            "price": rng.rand(n_right).round(3),
            "rid": np.arange(n_right),
        }
    )
    return left, right


def _expected(left, right, tolerance=None):
    ls = left.sort_values(["ts", "lv"]).reset_index(drop=True)
    rs = (
        right.sort_values(["ts", "rid"])
        .drop_duplicates(subset=["user", "ts"], keep="last")
        .reset_index(drop=True)
    )
    return pd.merge_asof(
        ls,
        rs,
        on="ts",
        by="user",
        direction="backward",
        suffixes=("", "_right"),
        tolerance=tolerance,
    )


def _rid_map(df: pd.DataFrame) -> dict:
    return {
        int(r.lv): (None if pd.isna(r.rid) else int(r.rid))
        for r in df.itertuples()
    }


@pytest.mark.parametrize("seed", [3, 7, 21])
def test_matches_merge_asof(spark, seed):
    left, right = _frames(seed)
    got = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="user",
        payload=["price", "rid"],
        right_order="rid",
    ).toPandas()
    assert _rid_map(got) == _rid_map(_expected(left, right))


def test_tolerance_nulls_stale_matches(spark):
    left, right = _frames(11)
    tol = dt.timedelta(minutes=20)
    got = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="user",
        payload=["price", "rid"],
        right_order="rid",
        tolerance=tol,
    ).toPandas()
    exp = _expected(left, right, tolerance=pd.Timedelta(tol))
    assert _rid_map(got) == _rid_map(exp)


def test_equal_ts_inclusive_and_tie_break(spark):
    t = BASE
    left = spark.createDataFrame([(1, t, 0)], "user long, ts timestamp, lv long")
    right = spark.createDataFrame(
        [(1, t, 10.0, 1), (1, t, 20.0, 2)],
        "user long, ts timestamp, price double, rid long",
    )
    row = asof_join(left, right, on="user", payload=["price", "rid"],
                    right_order="rid").head()
    assert row.rid == 2 and row.price == 20.0  # inclusive; largest rid wins


def test_null_right_ts_ignored_and_no_match_nulls(spark):
    left = spark.createDataFrame(
        [(1, BASE, 0), (2, BASE, 1)], "user long, ts timestamp, lv long"
    )
    right = spark.createDataFrame(
        [(1, None, 99.0, 9), (2, BASE + dt.timedelta(hours=1), 1.0, 1)],
        "user long, ts timestamp, price double, rid long",
    )
    got = {r.lv: r.rid for r in asof_join(
        left, right, on="user", payload=["price", "rid"], right_order="rid"
    ).collect()}
    assert got == {0: None, 1: None}  # null-ts row never matches; future row neither


def test_plan_is_window_not_join(spark):
    left, right = _frames(5)
    out = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on="user",
        payload=["rid"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, "as-of must be the union-window form, not a join"
    assert plan.count("Exchange") == 1, "one shuffle on the key, no more"


# --------------------------------------------------------- sessionize


def test_sessionize_reference(spark):
    from ferenda_spark.operators.asof import sessionize

    rows = [
        # user 1: events at 0, 10, 50 min → gaps 10, 40 → sessions 0,0,1
        (1, BASE, 100),
        (1, BASE + dt.timedelta(minutes=10), 101),
        (1, BASE + dt.timedelta(minutes=50), 102),
        # user 2: single event
        (2, BASE, 200),
        # user 1 again: exactly-30-min gap stays in session (strict >)
        (1, BASE + dt.timedelta(minutes=80), 103),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    out = {
        r.event_id: r.session_id
        for r in sessionize(df, gap_seconds=1800, tiebreak="event_id").collect()
    }
    assert out == {100: 0, 101: 0, 102: 1, 103: 1, 200: 0}


def test_sessionize_single_window_node(spark):
    from ferenda_spark.operators.asof import sessionize

    df = spark.createDataFrame(
        [(1, BASE + dt.timedelta(minutes=i), i) for i in range(20)],
        "user_id long, ts timestamp, event_id long",
    )
    plan = (
        sessionize(df, tiebreak="event_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert plan.count("Window") <= 2  # lag + cumsum share the sort
