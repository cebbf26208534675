"""As-of join: for each left row, the newest right row at-or-before its
timestamp, per key — the temporal-alignment operator Spark's built-in join
zoo lacks (pandas has merge_asof; DuckDB has ASOF JOIN; Flink has temporal
table joins — all public designs this mirrors).

Web-pipeline uses: align a crawl snapshot with the newest robots.txt /
sitemap fetch at-or-before its warc_ts; join page metrics to the latest
model-version rollout before the event; attach the prevailing URI
dictionary version to each parse batch.

Scale design — the UNION-WINDOW form, not a join:

    tag right rows side=0 carrying payload, left rows side=1 with NULL
    payload → ONE shuffle on the key → per key, sort by (ts, side) →
    last(payload, ignorenulls) over rows UNBOUNDED PRECEDING..CURRENT →
    keep side=1 rows.

A naive implementation (left join right on key + ts ≤ ts, then max-window
or groupBy) materializes every (left, right-before) PAIR — quadratic per
key for the celebrity keys a web corpus always has. The union-window form
is linear: each row crosses the wire once, the window is a single running
carry, and the plan is Exchange → Sort → Window → Filter (no join node at
all). Equal timestamps: right sorts before left (side 0 < 1), so an
exact-tie right row IS visible to the left row (inclusive as-of,
merge_asof's default); ties among right rows resolve to the largest
``right_order`` column value (explicit, deterministic).

``tolerance`` bounds staleness: matches older than ``left_ts − tolerance``
null out (merge_asof's tolerance), applied AFTER the carry so it is a
projection, not a second window.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    *,
    payload: list[str] | None = None,
    right_order: str | None = None,
    tolerance: _dt.timedelta | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join (backward, inclusive). Returns every left row plus
    the newest right payload at-or-before ``left_ts`` within the key group
    (NULLs when none). Output columns: all left columns, then matched
    payload columns renamed ``<name><suffix>`` where they collide with a
    left name, plus ``<right_ts><suffix>`` (the matched right timestamp).

    ``payload`` defaults to all non-key, non-ts right columns.
    ``right_order`` breaks exact-timestamp ties among RIGHT rows (largest
    wins); defaults to the first payload column."""
    keys = [on] if isinstance(on, str) else list(on)
    if payload is None:
        payload = [
            c for c in right.columns if c not in keys and c != right_ts
        ]
    if not payload:
        raise ValueError("right side has no payload columns")
    order_col = right_order or payload[0]
    if order_col not in right.columns:
        raise ValueError(f"right_order {order_col!r} not in right columns")

    matched_ts = right_ts + suffix
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in payload
    }

    # one struct carries ts + payload so ONE last(ignorenulls) window
    # expression does the whole carry (not one window per column)
    r_struct = F.struct(
        F.col(right_ts).alias("__ts"),
        F.col(order_col).alias("__ord"),
        *[F.col(c).alias(c) for c in payload],
    )
    # a NULL right timestamp would sort first and poison every carry in
    # the group — an as-of match at an unknown time is no match
    right = right.filter(F.col(right_ts).isNotNull())
    r_side = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        r_struct.alias("__p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in left.columns],
    )
    l_side = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r_side.schema["__p"].dataType).alias("__p"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    unioned = r_side.unionByName(l_side)

    # right rows first at equal ts (inclusive); among right ties the
    # largest __ord sorts last and wins the carry
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__t").asc(), F.col("__side").asc(), F.col("__p.__ord").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__m", F.last("__p", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 1)

    m = F.col("__m")
    if tolerance is not None:
        fresh = m["__ts"] >= (
            F.col("__t") - F.lit(tolerance)
        )
        m = F.when(fresh, F.col("__m"))

    return out.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        m["__ts"].alias(matched_ts),
        *[m[c].alias(out_names[c]) for c in payload],
    )


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_seconds: int = 1800,
    tiebreak: str | None = None,
) -> DataFrame:
    """Gap-based sessionization: within each key, a new session starts when
    the time since the previous event exceeds ``gap_seconds``. Returns the
    input plus ``session_id`` (0-based per key) — the standard
    lag-then-cumulative-sum window form (one shuffle on the key, two
    window functions over the SAME sort — Spark evaluates them in one
    Window node, no second sort).

    The streaming twin of this batch form is a session window aggregation;
    batch sessionization is what a training pipeline runs over historical
    event logs (e.g. crawl fetch sessions per host for politeness audits).
    """
    order = [F.col(ts).asc()] + (
        [F.col(tiebreak).asc()] if tiebreak else []
    )
    w = Window.partitionBy(key).orderBy(*order)
    # integer-microsecond gap test (cast through TIMESTAMP: NTZ columns
    # refuse unix_micros directly; session TZ is pinned UTC) — exact, no
    # float boundary risk, and oracle-replayable via epoch_us
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    prev = F.lag(us).over(w)
    is_new = F.when(
        prev.isNull() | (us - prev > int(gap_seconds) * 1_000_000),
        1,
    ).otherwise(0)
    return events.withColumn(
        "session_id",
        (F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ) - 1).cast("bigint"),
    )
