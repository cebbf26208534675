"""Count-Min sketch — mergeable frequency estimation.

Companion to the KMV distinct sketch (sketches.py): KMV answers "how many
distinct values", CMS answers "how often does THIS value occur" in one
bounded-size pass — the heavy-hitter / hot-key primitive behind skew
detection (which join keys need salting), stopword discovery, and crawl
politeness budgets, at any corpus size.

The sketch is a d×w grid of counters; value v increments cell
``(i, hash_i(v) mod w)`` for each of the d rows, and the point estimate is
the MIN over v's d cells — an overestimate only (collisions only add),
with error ≤ 2·N/w at probability 1-(1/2)^d for the classic parameters.

Everything is relational and engine-replayable:

- ``hash_i(v) = hash60(i ‖ ':' ‖ v)`` — the md5-60bit idiom shared with
  sketches.py/splits.py, so a DuckDB oracle rebuilds the grid cell by
  cell;
- build = one explode (×d) + one map-side-combined groupBy on uniform
  (row, col) keys — the sketch TABLE is the state, bounded by d·w rows
  per group no matter how many input rows, and merging sketches from two
  batches/clusters is a plain ``sum`` re-aggregation;
- query = d cell lookups per key: a join against the grid + a min — no
  scan of the original data.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sketches import hash60


def _cell(row: int, value_col, w: int):
    return F.pmod(
        hash60(F.concat(F.lit(f"{row}:"), F.col(value_col).cast("string"))),
        F.lit(w),
    )


def cms_build(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """→ ``(*group_cols, row, col, cnt)`` — only occupied cells are
    materialized (absent cell ≡ 0), so sparse groups stay sparse."""
    cells = df.select(
        *group_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _cell(i, value_col, w).alias("col"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("_c"),
    )
    return cells.groupBy(*group_cols, "_c.row", "_c.col").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_merge(cms: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Merge sketches sharing (group, row, col): counter addition.
    sketch(A ∪ B) == merge(sketch(A), sketch(B)) exactly."""
    return cms.groupBy(*group_cols, "row", "col").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_query(
    cms: DataFrame,
    keys: DataFrame,
    value_col: str,
    *,
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Point estimates for every DISTINCT row of ``keys``: all ``keys``
    columns + ``est_cnt`` = min over the key's d cells (missing cell =
    0). Duplicate key rows are deduped up front (the estimate is a pure
    function of the key, so one output row per distinct key is the only
    sensible contract). ``cms`` must be a single-group sketch
    (pre-filter a grouped one); the grid is d·w rows, so the join
    broadcasts. Probe coordinates live under reserved ``_cms_row`` /
    ``_cms_col`` names so a ``keys`` frame that itself has ``row`` /
    ``col`` / ``cnt`` columns cannot collide."""
    keys = keys.distinct()
    probes = keys.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("r"),
                        _cell(i, value_col, w).alias("c"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("_c"),
    ).select("*", F.col("_c.r").alias("_cms_row"),
             F.col("_c.c").alias("_cms_col")).drop("_c")
    grid = cms.select(
        F.col("row").alias("_cms_row"), F.col("col").alias("_cms_col"),
        F.col("cnt").alias("_cms_cnt"),
    )
    joined = probes.join(F.broadcast(grid), ["_cms_row", "_cms_col"], "left")
    return (
        joined.groupBy(*keys.columns)
        .agg(F.min(F.coalesce("_cms_cnt", F.lit(0))).alias("est_cnt"))
    )
