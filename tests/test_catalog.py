"""Catalog seam (sources/catalog.py): format resolution + the dynamic
partition-overwrite semantics every resumable stage write relies on."""

import pytest

from ferenda_spark.sources import catalog


def test_default_format_is_parquet(spark):
    assert catalog.table_format(spark) == "parquet"


def test_iceberg_not_on_sandbox_classpath(spark):
    assert catalog.iceberg_available(spark) is False


def test_iceberg_requested_but_unavailable_fails_fast(spark):
    spark.conf.set(catalog.CONF_KEY, "iceberg")
    try:
        with pytest.raises(RuntimeError, match="Iceberg runtime"):
            catalog.table_format(spark)
    finally:
        spark.conf.set(catalog.CONF_KEY, "parquet")


def test_unknown_format_rejected(spark):
    spark.conf.set(catalog.CONF_KEY, "delta")
    try:
        with pytest.raises(ValueError, match="unsupported"):
            catalog.table_format(spark)
    finally:
        spark.conf.set(catalog.CONF_KEY, "parquet")


def test_overwrite_partitions_replaces_only_touched(spark, tmp_path):
    """The resume-write contract: re-writing a subset of partitions must
    replace exactly those partitions and leave the rest byte-stable."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(0, "a"), (0, "b"), (1, "c")], "part_key int, v string"
    )
    catalog.overwrite_partitions(df, path, partition_by=("part_key",))
    redo = spark.createDataFrame([(0, "z")], "part_key int, v string")
    catalog.overwrite_partitions(redo, path, partition_by=("part_key",))
    got = sorted(
        (r["part_key"], r["v"])
        for r in catalog.read_table(spark, path).collect()
    )
    assert got == [(0, "z"), (1, "c")]


def test_sorted_write_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(0, 2), (0, 1)], "part_key int, v int")
    catalog.overwrite_partitions(
        df, path, partition_by=("part_key",), sort_by=("v",)
    )
    assert catalog.read_table(spark, path).count() == 2


def test_append_unpartitioned(spark, tmp_path):
    """append_table targets unpartitioned history tables (lineage/ledger
    style): successive appends accumulate rows."""
    path = str(tmp_path / "t")
    catalog.append_table(
        spark.createDataFrame([(1, "x")], "part_key int, v string"), path
    )
    catalog.append_table(
        spark.createDataFrame([(2, "y")], "part_key int, v string"), path
    )
    got = sorted(
        (r["part_key"], r["v"])
        for r in catalog.read_table(spark, path).collect()
    )
    assert got == [(1, "x"), (2, "y")]


def test_compact_table_partitioned_and_flat(spark, tmp_path):
    from pyspark.sql import functions as F

    from ferenda_spark.sources.catalog import compact_table, table_file_stats

    # fragmented partitioned table: 6 appends × 4 partitions = many files
    p = str(tmp_path / "frag")
    base = spark.range(200).select(
        F.col("id"), (F.col("id") % 4).cast("int").alias("part_key")
    )
    for i in range(6):
        base.filter((F.col("id") % 6) == i).repartition(3).write.mode(
            "append"
        ).partitionBy("part_key").parquet(p)
    before, _ = table_file_stats(spark, p)
    assert before > 4

    stats = compact_table(spark, p, partition_by=("part_key",))
    assert stats["files_before"] == before
    assert stats["files_after"] == 4  # one file per partition value
    got = spark.read.parquet(p)
    assert got.count() == 200
    assert got.select(F.sum("id")).collect()[0][0] == sum(range(200))

    # unpartitioned table collapses to one file at the default target
    q = str(tmp_path / "flat")
    spark.range(1000).repartition(16).write.parquet(q)
    stats2 = compact_table(spark, q)
    assert stats2["files_before"] == 16 and stats2["files_after"] == 1
    assert spark.read.parquet(q).count() == 1000
