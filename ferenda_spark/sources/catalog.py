"""Table catalog seam (SURVEY §7.1): Iceberg when the runtime has it,
Iceberg-STYLE partitioned Parquet otherwise.

The north_star stores the graph as "partitioned Iceberg triple tables"; this
sandbox has no Iceberg jars (verified: nothing in /opt/spark/jars, no
network), so every stage table is written as partitioned Parquet with the
same layout an Iceberg table would use (explicit partition columns, dynamic
partition overwrite for idempotent resume writes). ALL table IO in the
engine goes through this module, so pointing a real cluster at Iceberg is a
config change (`spark.ferenda.tableFormat=iceberg` + an Iceberg-enabled
Spark session), not a redesign:

- parquet:  `spark.read.parquet` / `DataFrameWriter.partitionBy().parquet`,
  with `spark.sql.sources.partitionOverwriteMode=dynamic` (session.py)
  making `mode("overwrite")` replace only the partitions present in the
  written frame — the Parquet equivalent of Iceberg's dynamic overwrite.
- iceberg:  path-based tables via the `iceberg` source
  (`df.write.format("iceberg")` / `spark.read.format("iceberg").load`);
  Iceberg's `overwrite` honors the same dynamic-partition semantics and
  adds snapshot isolation + atomic commits, which strictly strengthens the
  resume contract (operators/ledger.py) — the ledger itself deliberately
  stays plain Parquet in both modes: it IS the engine's manifest layer and
  must be readable even when the table format is being migrated.

Reference analog: the DocumentStore file layers
([ref: ferenda/documentstore.py :: DocumentStore]) — stage-addressed
storage behind one seam, here table-addressed instead of file-addressed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

CONF_KEY = "spark.ferenda.tableFormat"
_SUPPORTED = ("parquet", "iceberg")


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the session's classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def table_format(spark: SparkSession) -> str:
    """Resolve the active table format; fail fast (not at first write deep
    inside a stage) when iceberg is requested but the runtime lacks it."""
    fmt = (spark.conf.get(CONF_KEY, "parquet") or "parquet").lower()
    if fmt not in _SUPPORTED:
        raise ValueError(
            f"{CONF_KEY}={fmt!r} unsupported; expected one of {_SUPPORTED}"
        )
    if fmt == "iceberg" and not iceberg_available(spark):
        raise RuntimeError(
            f"{CONF_KEY}=iceberg but no Iceberg runtime on the classpath "
            "(add the iceberg-spark-runtime jar / --packages)"
        )
    return fmt


def read_table(spark: SparkSession, path: str) -> DataFrame:
    if table_format(spark) == "iceberg":
        return spark.read.format("iceberg").load(path)
    return spark.read.parquet(path)


def write_table(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    fmt = table_format(df.sparkSession)
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "iceberg":
        w.format("iceberg").save(path)
    else:
        w.parquet(path)


def append_table(df: DataFrame, path: str) -> None:
    write_table(df, path, mode="append")


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...],
    sort_by: tuple[str, ...] = (),
) -> None:
    """Idempotent stage-table write: replace exactly the partitions present
    in ``df`` (the resume contract's write half — operators/ledger.py).
    ``sort_by`` clusters rows within files for min/max skipping."""
    out = df.repartition(*partition_by)
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    write_table(out, path, partition_by=partition_by, mode="overwrite")
