"""Z-order clustering (functions/zorder.py)."""

import pytest
from pyspark.sql import functions as F

from ferenda_spark.functions.zorder import (
    write_zordered,
    zorder_value,
)


def _py_z(xs, bits, n):
    z = 0
    mask = (1 << bits) - 1
    for b in range(bits):
        for ci, v in enumerate(xs):
            z |= ((((v & mask) >> b) & 1)) << (b * n + ci)
    return z


def test_interleave_matches_reference(spark):
    rows = [(x, y) for x in range(0, 40, 3) for y in range(0, 40, 7)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn(
            "z", zorder_value([F.col("x"), F.col("y")], bits=8)
        ).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _py_z([x, y], 8, 2)
    # three columns and masking of overflow bits
    df3 = spark.createDataFrame([(5, 1000, 2)], "a long, b long, c long")
    z3 = df3.select(
        zorder_value([F.col("a"), F.col("b"), F.col("c")], bits=4).alias("z")
    ).collect()[0]["z"]
    assert z3 == _py_z([5, 1000, 2], 4, 3)


def test_bits_bounds():
    with pytest.raises(ValueError):
        zorder_value([F.lit(1), F.lit(2)], bits=32)
    with pytest.raises(ValueError):
        zorder_value([], bits=8)


def test_zordered_layout_localizes_box_filters(spark, tmp_path):
    """The observable win: a 2-D box filter touches FEW z-ordered files
    but ALL hash-partitioned files."""
    n = 4096
    df = spark.range(n).select(
        (F.col("id") * 2654435761 % 256).alias("x"),
        (F.col("id") * 40503 % 256).alias("y"),
        F.col("id").alias("payload"),
    )
    zpath = str(tmp_path / "zordered")
    hpath = str(tmp_path / "hashed")
    write_zordered(df, zpath, ["x", "y"], bits=8, n_files=16)
    df.repartition(16).write.parquet(hpath)

    def files_touched(path):
        got = (
            spark.read.parquet(path)
            .filter((F.col("x") < 32) & (F.col("y") < 32))
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )
        return got

    assert spark.read.parquet(zpath).count() == n  # nothing lost
    z_files, h_files = files_touched(zpath), files_touched(hpath)
    # the box is 1/64 of the plane: z layout confines it to a handful of
    # files; the hash layout spreads it everywhere
    assert z_files <= 4
    assert h_files >= 12
