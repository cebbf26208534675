"""KMV (k-minimum-values) distinct-count sketches — mergeable cardinality
estimation for corpus statistics.

Reference analog: ferenda's dataset stats are exact counts over 10^4 docs
([ref: ferenda/triplestore.py :: triple_count]); at the north_rule's scale
the interesting statistics (distinct URLs per host, distinct entities per
predicate, vocabulary growth across crawls) need ESTIMATORS whose state is
(a) tiny, (b) mergeable across partitions/batches/days, and (c)
deterministic so the resume/ledger contract and the DuckDB oracle both
hold. Spark's built-in ``approx_count_distinct`` is a HyperLogLog that
satisfies (a)+(b) but its binary state is neither inspectable nor
oracle-replayable; KMV (Bar-Yossef et al. 2002; Beyer et al. 2007 "On
Synopses for Distinct-Value Estimation") is the textbook alternative whose
state is literally "the k smallest hashes" — plain BIGINTs an oracle can
recompute with row_number.

Estimator: with h uniform on [0, 2^60) and K = the k-th smallest distinct
hash value, E[distinct] ≈ (k-1) * 2^60 / K; below k distinct values the
sketch IS the distinct set and the count is exact.

Determinism/portability: the hash is the top 60 bits of md5 (15 hex
chars), exactly `conv(substr(md5(v),1,15),16,10)` in Spark and
`try_cast('0x'||substr(md5(v),1,15) AS BIGINT)` in DuckDB — verified
identical. 60 bits keeps the value exactly representable through the
BIGINT→DOUBLE cast's 53-bit rounding in the SAME way in both engines
(IEEE round-to-nearest on identical operands).

Scale shape:

- stage 1 groups by (group, pmod(hash, n_buckets)) and keeps each
  bucket's k smallest distinct hashes: map-side-combinable, and the
  per-reducer state is bounded by the bucket's distinct count — raise
  ``n_buckets`` for ultra-hot groups (10^9 distinct URLs on one host)
  instead of ever materializing a full distinct set;
- stage 2 merges bucket sketches per group (array flatten + sort + slice
  — vocabulary-sized rows, k*n_buckets ints max);
- sketches UNION by concatenate+sort+slice (``kmv_merge``), so daily
  sketches roll up to monthly without touching raw data.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TWO_POW_60 = float(1 << 60)


def hash60(col: Column) -> Column:
    """Deterministic 60-bit uniform hash, oracle-replayable (see module
    docstring). Input is cast to string first so numeric/string columns
    hash identically across engines."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )


def kmv_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    *,
    k: int = 256,
    n_buckets: int = 64,
) -> DataFrame:
    """Per-group KMV sketch: ``(*group_cols, kmv: array<bigint>)`` with
    ``kmv`` = the k smallest distinct 60-bit hashes of ``value_col``."""
    partial = (
        df.select(*group_cols, hash60(F.col(value_col)).alias("_h"))
        .withColumn("_b", F.pmod(F.col("_h"), F.lit(n_buckets)))
        .groupBy(*group_cols, "_b")
        .agg(F.slice(F.array_sort(F.collect_set("_h")), 1, k).alias("_ks"))
    )
    return partial.groupBy(*group_cols).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("_ks")))),
            1,
            k,
        ).alias("kmv")
    )


def kmv_merge(
    sketches: DataFrame, group_cols: Sequence[str], *, k: int = 256
) -> DataFrame:
    """Union-merge sketches that share ``group_cols`` (e.g. re-aggregate
    per-day sketches to per-month): concatenate, dedupe, keep k smallest.
    sketch(A ∪ B) == merge(sketch(A), sketch(B)) exactly."""
    return sketches.groupBy(*group_cols).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("kmv")))),
            1,
            k,
        ).alias("kmv")
    )


def kmv_estimate(sketches: DataFrame, *, k: int = 256) -> DataFrame:
    """Add ``sketch_size`` (int) and ``est_distinct`` (double) columns.
    Exact below k distinct; (k-1)*2^60/kth above. ``try_element_at``
    because ANSI mode aborts on out-of-range ``element_at`` even in the
    not-taken branch."""
    size = F.size("kmv")
    kth = F.try_element_at("kmv", F.lit(k)).cast("double")
    est = F.when(size < k, size.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(TWO_POW_60) / kth
    )
    return sketches.select(
        *[c for c in sketches.columns if c != "kmv"],
        size.alias("sketch_size"),
        est.alias("est_distinct"),
    )
