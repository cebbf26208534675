"""Range join: match point values into intervals — the second temporal
operator Spark's join zoo lacks (DuckDB ships range joins via its IEJoin;
Databricks documents a range-join hint; open-source Spark falls back to
BroadcastNestedLoopJoin, which is quadratic).

Web-pipeline uses: land events inside maintenance/promo windows, crawl
timestamps inside robots-validity intervals, offsets inside WARC record
ranges.

Scale design — interval bucketing, the public standard trick:

    pick a bucket width w ≥ the longest interval (measured with one scalar
    aggregate when not supplied) → each interval overlaps ≤ 2 buckets →
    explode intervals to their buckets, map points to floor(p/w), and
    EQUI-join on (keys…, bucket), then filter start ≤ p < end.

The nested-loop theta join becomes a shuffled (or broadcast) hash join with
≤ 2× interval duplication — linear, partitionable, AQE-skew-handled like
any equi join. Each matched pair survives in exactly ONE bucket (a point
lives in exactly one), so no post-dedup is needed.

A single monster interval drags w up and degrades bucketing toward
one-bucket (i.e. toward the broadcast join it replaces) — pass an explicit
``bucket_width`` and let long intervals explode to more buckets instead
when interval lengths are heavy-tailed: the cost is rows-per-interval =
length/w, the classic space/selectivity trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    *,
    keys: tuple[str, ...] = (),
    bucket_width: float | None = None,
) -> DataFrame:
    """Inner join of left points into right half-open intervals
    [start_col, end_col), optionally also equi-matched on ``keys``.
    Columns must be numeric (cast timestamps to epoch doubles first).
    Output: all left columns + all right columns (caller resolves name
    collisions by aliasing beforehand)."""
    overlap = set(left.columns) & set(right.columns) - set(keys)
    if overlap:
        raise ValueError(
            f"ambiguous columns {sorted(overlap)}; alias them apart first"
        )
    # empty/inverted intervals can never match — and would make
    # F.sequence run DESCENDING, minting bogus buckets
    right = right.filter(F.col(end_col) > F.col(start_col))
    if bucket_width is None:
        row = right.agg(
            F.max(F.col(end_col) - F.col(start_col)).alias("m")
        ).collect()[0]
        bucket_width = float(row["m"] or 1.0)
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    w = F.lit(float(bucket_width))

    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w),
                F.floor(F.col(end_col) / w),
            )
        ),
    )
    lb = left.withColumn("__bucket", F.floor(F.col(point_col) / w))
    cond = [lb["__bucket"] == rb["__bucket"]] + [
        lb[k] == rb[k] for k in keys
    ]
    joined = lb.join(rb, cond, "inner").filter(
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) < F.col(end_col))
    )
    return joined.select(
        *[lb[c] for c in left.columns],
        *[rb[c] for c in right.columns if c not in keys],
    )
