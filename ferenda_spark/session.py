"""SparkSession factory with the configs this engine relies on.

Scale notes (100 TB / 1000-executor target, tested on local[N]):
- AQE on: runtime partition coalescing + skew-join splitting complement the
  explicit salting in ``operators.linking`` (SURVEY §4.2/§4.3).
- Arrow on: every Python-side stage is a pandas/Arrow UDF (input_hint forbids
  per-row Python UDFs).
- Session TZ pinned UTC so timestamp semantics match the DuckDB oracle and
  are cluster-independent.
- ``shuffle.partitions`` defaults to 2× cores locally; on a real cluster this
  is set per-job (rule of thumb: ~2–3× total executor cores, partitions
  sized 128–512 MB post-compression) — AQE coalesces the excess.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ferenda_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("FERENDA_SPARK_MASTER", "local[*]")
    cpus = os.cpu_count() or 4

    # Make the package importable in executor Python workers no matter the
    # caller's cwd. In local mode workers inherit the process env, so
    # prepending to PYTHONPATH before the JVM starts is sufficient; on a
    # real cluster ship the package with `spark-submit --py-files
    # ferenda_spark.zip` (north_rule's deployment mode) — executorEnv then
    # covers the worker side.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + pp if pp else "")
        )
    if shuffle_partitions is None:
        env = os.environ.get("FERENDA_SHUFFLE_PARTITIONS")
        shuffle_partitions = int(env) if env else max(2 * cpus, 32)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch size bounds pandas-UDF memory per task; html pages are
        # O(10 KB) so 2k rows ≈ 20 MB/batch — safe at executor defaults.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # Broadcast threshold: the URI dictionary (~6k rows) and TPC-H dims
        # must broadcast; 64 MB is conservative for 8 GB executors.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.driver.memory", os.environ.get("FERENDA_DRIVER_MEM", "8g"))
        .config("spark.executorEnv.PYTHONPATH", os.environ["PYTHONPATH"])
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
