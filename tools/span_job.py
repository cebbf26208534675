"""ExactSubstr span dedup at corpus scale (round-4): run
``operators/spandedup.py::remove_duplicate_spans`` on the ~1M-doc
synthetic curation corpus (tools/curation_job.py's generator — every doc
opens with the same 64-token boilerplate chunk, bodies unique) at
production L=50, and record wall + shuffle bytes per phase from the
Spark event log.

What the measurement must show for the 100 TB story:
- posting volume is O(total tokens) and the count/mark shuffles stay
  linear in it (no pair explosion — marking is fan-out-1 per posting);
- the expected output: every doc loses exactly its boilerplate prefix
  (the only >=50-token run occurring twice), bodies survive;
- throughput at two parallelism levels for the scaling-efficiency rule —
  run this once under local[2] and once under local[8]:

    /opt/spark/bin/spark-submit --master local[8] \
        --py-files /tmp/ferenda_spark.zip tools/span_job.py [n_docs]

Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _here)
sys.path.insert(0, os.path.dirname(_here))  # repo root (plain-python runs)
from curation_job import shuffle_bytes_by_group, synth_documents  # noqa: E402

N_DOCS_DEFAULT = 1 << 20


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else N_DOCS_DEFAULT
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    out_dir = tempfile.mkdtemp(prefix="span_job_", dir=base)
    evt_dir = tempfile.mkdtemp(prefix="span_events_", dir=base)
    t_boot = time.monotonic()
    spark = (
        SparkSession.builder.appName("ferenda_span_job")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", f"file://{evt_dir}")
        .config("spark.eventLog.rolling.enabled", "false")
        .config("spark.eventLog.compress", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    boot_s = round(time.monotonic() - t_boot, 2)

    from ferenda_spark.operators.spandedup import remove_duplicate_spans

    corpus_path = os.path.join(out_dir, "documents")
    synth_documents(spark, n_docs).write.parquet(corpus_path)
    docs = spark.read.parquet(corpus_path)
    n_tokens_total = docs.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+")))
    ).collect()[0][0]

    spark.sparkContext.setJobGroup("span_dedup", "span_dedup")
    t0 = time.monotonic()
    out = remove_duplicate_spans(docs, "text", "doc_id", length=50)
    out_path = os.path.join(out_dir, "cleaned")
    out.write.parquet(out_path)
    cleaned = spark.read.parquet(out_path)
    stats = cleaned.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_removed").alias("tok_removed"),
        F.sum("n_spans").alias("n_spans"),
        F.sum((F.col("n_removed") > 0).cast("long")).alias("docs_hit"),
    ).collect()[0]
    wall = round(time.monotonic() - t0, 2)
    spark.sparkContext.setJobGroup("", "")

    app_id = spark.sparkContext.applicationId
    cores = spark.sparkContext.defaultParallelism
    spark.stop()
    groups = shuffle_bytes_by_group(evt_dir, app_id)
    g = groups.get("span_dedup", {})
    report = {
        "job": "span_dedup_1m",
        "cores": cores,
        "n_docs": n_docs,
        "n_tokens_total": int(n_tokens_total),
        "boot_s": boot_s,
        "wall_s": wall,
        "tokens_per_s": round(n_tokens_total / wall, 0),
        "result": {
            "n_docs_out": stats["n_docs"],
            "tok_removed": int(stats["tok_removed"]),
            "n_spans": int(stats["n_spans"]),
            "docs_hit": int(stats["docs_hit"]),
        },
        "shuffle_write_mb": round(g.get("shuffle_write_b", 0) / 1e6, 1),
        "shuffle_read_mb": round(g.get("shuffle_read_b", 0) / 1e6, 1),
    }
    print(json.dumps(report))
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    shutil.rmtree(evt_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
