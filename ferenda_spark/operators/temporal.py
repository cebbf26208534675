"""Temporal fact versioning — SCD2-style validity intervals over
re-crawled assertions.

Reference analog: ferenda keeps one current RDF file per document and a
DocumentEntry timestamp trail ([ref: ferenda/documententry.py ::
DocumentEntry] — published/updated per action); history of VALUES is
implicit in the VCS of the downloaded files and never queryable. A
Common-Crawl-scale KG sees the same (subject, predicate) asserted by many
crawls over time and must answer both "what is the current value" and
"what did it say in March": the standard warehouse answer is a slowly-
changing-dimension type-2 table of validity intervals, built here from
the raw assertion stream.

Semantics (all oracle-replayable window functions):

- assertions are ordered per key by ``(ts, value)`` — the value tiebreak
  makes simultaneous conflicting crawls deterministic;
- consecutive repeats of the SAME value do NOT open a new version (a
  re-crawl that observes no change extends the current interval) — the
  change-detection filter ``value != lag(value)``;
- each surviving change row becomes a version: ``valid_from`` = its ts,
  ``valid_to`` = the NEXT change's ts (NULL = still current),
  ``version`` = 1-based change ordinal, ``is_current`` = last version.

Scale shape: everything rides ONE window partitioning (the key columns) —
Spark plans the lag + the post-filter row_number/lead as one shuffle plus
two sorts over it; keys are (subj, pred) so hot subjects spread across
predicates. No UDFs, no collects.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fact_versions(
    assertions: DataFrame,
    *,
    key_cols: Sequence[str] = ("subj", "pred"),
    value_col: str = "obj",
    ts_col: str = "ts",
) -> DataFrame:
    """``(*key_cols, value, valid_from, valid_to, version, is_current)``
    — one row per VALUE CHANGE per key (see module docstring).

    Exact duplicate observations (same key, ts, value) collapse first, so
    re-ingesting a batch is idempotent."""
    obs = assertions.select(
        *key_cols,
        F.col(value_col).alias("value"),
        F.col(ts_col).alias("valid_from"),
    ).dropDuplicates([*key_cols, "value", "valid_from"])

    w = Window.partitionBy(*key_cols).orderBy("valid_from", "value")
    changed = obs.withColumn("_prev", F.lag("value").over(w)).filter(
        F.col("_prev").isNull() | (F.col("value") != F.col("_prev"))
    )

    w2 = Window.partitionBy(*key_cols).orderBy("valid_from", "value")
    return changed.select(
        *key_cols,
        "value",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
    )


def facts_as_of(versions: DataFrame, ts, *, ts_col_from: str = "valid_from",
                ts_col_to: str = "valid_to") -> DataFrame:
    """Time-travel view: the version rows valid at instant ``ts``
    (``valid_from <= ts < valid_to``, open-ended current rows included).
    A pure filter — partition/predicate pushdown applies when ``versions``
    is stored partitioned by a date derivative of ``valid_from``."""
    t = F.lit(ts)
    return versions.filter(
        (F.col(ts_col_from) <= t)
        & (F.col(ts_col_to).isNull() | (F.col(ts_col_to) > t))
    )


# the name SPARQL/SQL users reach for; one implementation, two entries
as_of = facts_as_of


def coalesce_intervals(
    df: DataFrame,
    *,
    key_cols: Sequence[str] = ("subj", "pred", "value"),
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    gap: int = 0,
) -> DataFrame:
    """Merge overlapping/adjacent validity intervals per key →
    ``(*key_cols, valid_from, valid_to, n_merged)``.

    The multi-source union step :func:`fact_versions` deliberately does
    not do: when SEVERAL independent sources (mirrors, crawls,
    alternate-language editions) each assert the same fact over their own
    observation windows, the canonical KG wants the union of those
    windows as disjoint intervals — "this triple was attested
    continuously from A to B" — not one version chain per source.
    Classic gaps-and-islands: per key, order by start, an interval opens
    a new island iff its start exceeds the running max end (+ ``gap``,
    for treat-near-adjacent-as-continuous semantics, e.g. re-crawl
    cadence jitter); islands aggregate to (min start, max end).

    Everything rides ONE window partitioning on the key columns (running
    max + running sum compile to a single shuffle + sort per key — hot
    facts spread across keys) and one map-side-combined final
    aggregation; type-generic over any orderable from/to (ints,
    timestamps — though a non-zero ``gap`` needs NUMERIC bounds, since
    it is added to the running max end; pre-cast timestamps to epoch
    seconds to use gap semantics on them). ``to_col`` must be non-NULL —
    open-ended intervals are a versioning concept (fact_versions'
    is_current), not an attestation window. Oracle-replayable: the SQL
    spelling is identical windows.
    """
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(from_col, to_col)
    prev_max = F.max(to_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    # gap=0 must not synthesize a `prev_max + 0` addition: int + timestamp
    # is a DATATYPE_MISMATCH on Spark 4.x, and the type-generic claim
    # (timestamps, dates, strings) only holds on the pure-comparison path
    end = prev_max if gap == 0 else prev_max + gap
    brk = F.when(
        prev_max.isNull() | (F.col(from_col) > end), 1
    ).otherwise(0)
    island = F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        df.withColumn("_island", island)
        .groupBy(*keys, "_island")
        .agg(
            F.min(from_col).alias("valid_from"),
            F.max(to_col).alias("valid_to"),
            F.count(F.lit(1)).alias("n_merged"),
        )
        .drop("_island")
    )
