"""Fixed-bin histogram sketches + interpolated quantile estimates.

The mergeable numeric companion to KMV (distincts) and CMS (frequencies):
per-group value distributions in bounded state. Spark's own
``percentile_approx`` (KLL-ish) is neither mergeable across separately
computed tables nor replayable by another engine; a fixed-bin histogram
is both — the bin grid is part of the schema, merging is counter
addition, and the quantile readout is deterministic arithmetic any SQL
engine reproduces digit-for-digit. The price is fixed range/resolution:
error is bounded by one bin width, which for operational metrics
(document lengths, parse walls, triple counts per partition — the
north_rule's lineage metrics) is exactly the knob you want explicit.

Scale shape: build = one projection + one map-side-combined groupBy on
(group, bin) — ≤ n_bins rows per group regardless of input size; the
quantile readout runs a window over those ≤ n_bins rows, never the data.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def histogram_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """→ ``(*group_cols, bin, cnt)``; bin = floor((v - lo)/width) clamped
    to [0, n_bins-1] (out-of-range values land in the edge bins — kept,
    not dropped, so totals stay exact; pick [lo, hi) to taste). NULL
    values are dropped."""
    width = (hi - lo) / n_bins
    v = F.col(value_col).cast("double")
    b = F.floor((v - F.lit(lo)) / F.lit(width)).cast("int")
    clamped = F.least(F.greatest(b, F.lit(0)), F.lit(n_bins - 1))
    return (
        df.filter(v.isNotNull())
        .select(*group_cols, clamped.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_merge(hist: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Merge histograms sharing (group, bin): counter addition —
    hist(A ∪ B) == merge(hist(A), hist(B)) exactly."""
    return hist.groupBy(*group_cols, "bin").agg(F.sum("cnt").alias("cnt"))


def histogram_quantiles(
    hist: DataFrame,
    group_cols: Sequence[str],
    qs: Sequence[float],
    *,
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """→ ``(*group_cols, q, est)`` — linearly interpolated quantile
    estimates, rounded to 6: the target rank q·total falls in the first
    bin whose cumulative count reaches it, and the estimate interpolates
    inside that bin:

        est = lo + bin·width + (target − cum_before)/bin_cnt · width

    Pure window-cumsum + argmin over the ≤ n_bins rows per group; the
    identical arithmetic replays in any SQL engine (the oracle form).
    """
    width = (hi - lo) / n_bins
    gb = [F.col(c) for c in group_cols]
    w = Window.partitionBy(*gb).orderBy("bin")
    cum = hist.select(
        *group_cols,
        "bin",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            Window.partitionBy(*gb).orderBy("bin").rowsBetween(
                Window.unboundedPreceding, -1
            )
        ).alias("cum_before"),
        F.sum("cnt").over(Window.partitionBy(*gb)).alias("total"),
    ).withColumn("cum_before", F.coalesce("cum_before", F.lit(0)))
    qf = hist.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    cand = cum.crossJoin(F.broadcast(qf)).withColumn(
        "target", F.col("q") * F.col("total")
    )
    hit = cand.filter(F.col("cum") >= F.col("target"))
    first = (
        hit.groupBy(*group_cols, "q")
        .agg(
            F.min(
                F.struct("bin", "cnt", "cum_before", "target")
            ).alias("m")
        )
        .select(
            *group_cols,
            "q",
            F.round(
                F.lit(lo)
                + F.col("m.bin") * F.lit(width)
                + (F.col("m.target") - F.col("m.cum_before"))
                / F.col("m.cnt")
                * F.lit(width),
                6,
            ).alias("est"),
        )
    )
    return first
