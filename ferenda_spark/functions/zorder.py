"""Z-order (Morton) clustering — the physical-layout operator for
multi-dimensional scan locality at 100 TB (public lineage: Morton 1966;
the OPTIMIZE ZORDER BY of Iceberg/Delta). Sorting a table by the bit
interleave of two+ bucketed dimensions makes parquet row-group min/max
stats tight on ALL of them at once, so a filter box on (host, date) or
(pred, obj_bucket) skips most of the table instead of pruning on only
the leading sort column.

``zorder_value`` is a pure codegen'd column expression (bits × ncols
shift/mask/or terms — no UDF); inputs must already be small unsigned
integers (bucket ids, ranks, truncated hashes): values are masked to
``bits`` bits, the caller owns normalization because only the caller
knows the dimension's distribution (hash-mod for categoricals,
width_bucket/ntile for continuous).

``write_zordered`` = range-repartition on the z-value + sort within
partitions + parquet write: one range shuffle (sampled boundaries, the
standard repartitionByRange mechanics), then each row group covers a
small z-interval = a small box in every dimension. The locality test
asserts the observable effect: a 2-D box filter touches a small
fraction of z-ordered files vs ALL files of a hash layout."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each column, column 0 in the
    least-significant position of each group. bits × len(cols) must fit
    a long (≤ 63)."""
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_value needs at least one column")
    if bits * n > 63:
        raise ValueError(f"bits({bits}) * ncols({n}) exceeds long range")
    mask = (1 << bits) - 1
    vals = [c.cast("long").bitwiseAND(F.lit(mask)) for c in cols]
    z = F.lit(0).cast("long")
    for b in range(bits):
        for ci, v in enumerate(vals):
            bit = F.shiftright(v, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + ci))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 16,
    n_files: int = 16,
) -> None:
    """Write df parquet, clustered by the z-order of ``cols``."""
    zv = zorder_value([F.col(c) for c in cols], bits)
    (
        df.withColumn("_z", zv)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_sql(x_expr: str, y_expr: str, bits: int) -> str:
    """The identical interleave as ANSI/DuckDB SQL — the oracle's half
    of the contract (two-column form)."""
    mask = (1 << bits) - 1
    terms = []
    # every term fully parenthesized: PostgreSQL/DuckDB give &, |, <<, >>
    # EQUAL precedence with left associativity, so an unparenthesized
    # `a << 2 | b << 3` parses as `((a << 2) | b) << 3`
    for b in range(bits):
        terms.append(
            f"((((({x_expr}) & {mask}) >> {b}) & 1) << {2 * b})"
        )
        terms.append(
            f"((((({y_expr}) & {mask}) >> {b}) & 1) << {2 * b + 1})"
        )
    return "(" + " | ".join(terms) + ")"
