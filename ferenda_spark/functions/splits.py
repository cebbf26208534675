"""Deterministic hash-based dataset splitting (training-pipeline op).

No reference analog (ferenda never samples) — this is part of the
large-scale training-data surface: a corpus split must be (a) stable
across re-runs and cluster sizes, (b) computable row-locally with no
shuffle, and (c) reproducible by any other engine auditing the split.
Random `df.sample`/`randomSplit` fail (a) under partition re-ordering and
(c) always; the standard answer is a content-hash split: bucket =
md5(key) prefix compared against precomputed hex boundaries.

Properties: pure column expressions (whole-stage codegen, no UDF, no
shuffle — the split is a projection); md5 is bit-identical everywhere
(the DuckDB oracle reproduces the assignment exactly); adding a new split
later re-uses the same key space without reshuffling existing members
(boundaries partition [0, 1) by prefix order).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_PREFIX_LEN = 8  # 8 hex chars = 32 bits of the md5 — plenty below 10^12 rows


def _boundary(cum_frac: float) -> str:
    """Cumulative fraction → the md5-prefix hex string that bounds it."""
    edge = min(int(cum_frac * (16**_PREFIX_LEN)), 16**_PREFIX_LEN - 1)
    return format(edge, f"0{_PREFIX_LEN}x")


def hash_split(key: Column | str, fracs: dict[str, float]) -> Column:
    """Split-label column: md5(key) prefix against cumulative boundaries.

    ``fracs`` maps label → fraction; fractions must sum to 1 (±1e-9).
    Assignment depends only on the key's bytes — never on row order,
    partitioning, or cluster size.
    """
    total = sum(fracs.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    col = F.col(key) if isinstance(key, str) else key
    prefix = F.substring(F.md5(col.cast("string")), 1, _PREFIX_LEN)
    labels = list(fracs)
    cum = 0.0
    expr = None
    for label in labels[:-1]:
        cum += fracs[label]
        cond = prefix < F.lit(_boundary(cum))
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    last = F.lit(labels[-1])
    return (expr.otherwise(last) if expr is not None else last).alias("split")


def sql_hash_split(key_sql: str, fracs: dict[str, float]) -> str:
    """The same assignment as ANSI SQL (DuckDB/any engine with md5) — the
    oracle form, and the documentation that the split is auditable."""
    total = sum(fracs.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    labels = list(fracs)
    parts, cum = [], 0.0
    for label in labels[:-1]:
        cum += fracs[label]
        parts.append(
            f"WHEN substr(md5(CAST({key_sql} AS VARCHAR)), 1, {_PREFIX_LEN})"
            f" < '{_boundary(cum)}' THEN '{label}'"
        )
    return "CASE " + " ".join(parts) + f" ELSE '{labels[-1]}' END"


def weighted_sample(
    df,
    key: Column | str,
    weight_col: Column | str,
    k: int,
    strata_cols: tuple[str, ...] = (),
    salt: str = "",
):
    """Deterministic weighted sampling without replacement: the top-``k``
    rows per stratum under the Efraimidis-Spirakis A-ES scheme — rank =
    ln(u)/w with u a hash-derived uniform, keep the k largest. Inclusion
    probability is proportional to weight (quality-weighted corpus
    mixing), yet the draw is a pure function of (key bytes, salt): stable
    across re-runs, partitionings, and cluster sizes, and replayable by
    any engine with md5 — the same contract as ``hash_split``, extended
    to weights.

    ``u = (hash60(key ‖ salt) + 0.5) / 2^60`` ∈ (0, 1) — the +0.5 keeps
    ln(u) finite on the all-zero hash. One window shuffle on the strata
    key; ties (impossible under distinct keys) break by the key column.
    Weights must be strictly positive.
    """
    from ..functions.sketches import TWO_POW_60, hash60

    kc = F.col(key) if isinstance(key, str) else key
    wc = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    u = (
        hash60(F.concat(kc.cast("string"), F.lit(salt))) + F.lit(0.5)
    ) / F.lit(TWO_POW_60)
    rank = F.log(u) / wc.cast("double")
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(c) for c in strata_cols]).orderBy(
        rank.desc(), kc.asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
