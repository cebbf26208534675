"""Checkpoint ledger + per-partition lineage (north_rule: "resumable from
checkpoint with per-partition lineage + metrics ... restarts at the last
completed partition").

Reference analog: `DocumentEntry` JSON sidecars + the `parseifneeded` mtime
predicate ([ref: ferenda/documententry.py :: DocumentEntry],
[ref: ferenda/decorators.py :: parseifneeded],
[ref: ferenda/util.py :: outfile_is_newer]) — per-document skip logic. At
10^12 documents per-document bookkeeping is itself a big-data problem, so the
unit of resume here is the *partition* (`part_key` = pmod(xxhash64(domain),
P)): O(10^4) ledger rows instead of O(10^12).

Mechanics:
- the ledger is an append-only Parquet directory; each completed stage run
  appends one row per (stage, part_key) with status/metrics. Appends are
  atomic at file granularity, so a killed run leaves only whole completed
  partitions recorded — exactly the resume contract.
- `pending(df, stage)` = LEFT ANTI join against ok-rows (SURVEY J9/P1) —
  the Spark restatement of `list_basefiles_for(action)`.
- stage writes use dynamic partition overwrite keyed on part_key, so
  re-running a partition is idempotent (overwrite-by-partition, not append),
  and a resume never duplicates rows.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ferenda_spark.schemas import LEDGER


class Ledger:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def read(self) -> DataFrame:
        if not _exists(self.path):
            return self.spark.createDataFrame([], schema=LEDGER)
        return self.spark.read.schema(LEDGER).parquet(self.path)

    def ok_parts(self, stage: str) -> DataFrame:
        """part_keys recorded ok for `stage` (latest record wins: a partition
        re-marked failed after an ok is still ok — writes are idempotent)."""
        return (
            self.read()
            .filter((F.col("stage") == stage) & (F.col("status") == "ok"))
            .select("part_key")
            .distinct()
        )

    def pending(self, df: DataFrame, stage: str) -> DataFrame:
        """Rows of `df` whose part_key has not completed `stage` — the
        resume anti-join (J9). `df` must carry a part_key column."""
        return df.join(self.ok_parts(stage), "part_key", "left_anti")

    def mark(self, stage: str, lineage: DataFrame, status: str = "ok",
             run_id: str = "run") -> None:
        """Append one ledger row per part_key, rolling up the per-Spark-
        partition lineage rows (a part_key can span Arrow batches)."""
        now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        rows = (
            lineage.groupBy("part_key")
            .agg(
                F.sum("n_in").alias("n_in"),
                F.sum("n_out").alias("n_out"),
                F.sum("wall_ms").alias("wall_ms"),
            )
            .select(
                F.lit(stage).alias("stage"),
                F.col("part_key"),
                F.lit(status).alias("status"),
                "n_in",
                "n_out",
                "wall_ms",
                F.lit(run_id).alias("run_id"),
                F.lit(now).alias("finished"),
            )
        )
        rows.write.mode("append").parquet(self.path)

    def mark_parts(self, stage: str, part_keys: list[int], status: str = "ok",
                   run_id: str = "run") -> None:
        now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        rows = self.spark.createDataFrame(
            [(stage, int(pk), status, None, None, None, run_id, now)
             for pk in part_keys],
            schema=LEDGER,
        )
        rows.write.mode("append").parquet(self.path)

    def truncate_after(self, stage: str, max_part_key: int) -> None:
        """Test helper (resume fixture, FIXTURES §5): rewrite the ledger
        keeping only `stage` rows with part_key <= max_part_key, simulating a
        run killed mid-stage."""
        kept = self.read().filter(
            (F.col("stage") != stage) | (F.col("part_key") <= max_part_key)
        )
        tmp = self.path + ".tmp"
        kept.write.mode("overwrite").parquet(tmp)
        fresh = self.spark.read.schema(LEDGER).parquet(tmp)
        fresh.write.mode("overwrite").parquet(self.path)


def _exists(path: str) -> bool:
    return os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    )


def write_stage_partitioned(df: DataFrame, path: str) -> None:
    """Idempotent stage-table write: dynamic partition overwrite on part_key.
    Re-running a subset of partitions replaces exactly those partitions
    (spark.sql.sources.partitionOverwriteMode=dynamic, set in session.py;
    Iceberg mode gets the same semantics with snapshot isolation on top)."""
    from ferenda_spark.sources import catalog

    catalog.overwrite_partitions(df, path, partition_by=("part_key",))
