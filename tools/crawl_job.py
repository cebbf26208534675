"""Composed crawl loop at 1M-host scale (round-4 judge, next-round #5).

The capstone composition existed only as an sf0.01 driver query
(`crawl_budget`); this job runs the WHOLE loop end-to-end at 2^20 hosts
with event-log shuffle attribution, and proves the determinism the
north_rule's two-cluster-size criterion needs: the per-host budgets are
BIT-IDENTICAL across parallelism levels (run once under
SPARK_GRAFT_CPUS=2 and once =8; the printed budget_digest must match).

Stages (each its own job group):

1. ``pagerank`` over a skewed 1M-host link graph (graph_job's generator,
   6 iterations) → host rank, rounded to the repo-wide 6-decimal grain.
2. ``host_report`` over a 2-docs/host synthetic corpus → mean_quality.
3. ``allocate_crawl_budget`` rank×quality → per-host budget
   (10M-fetch budget, 10% head cap) — host-sized output.
4. ``schedule_fetches`` over a frontier of 3 URLs per budgeted host →
   politeness-sequenced fetch plan (worker, seq, not_before_ms).

The budget digest is order-insensitive (sum over per-row xxhash64), so
it is comparable across shuffles, partitionings and core counts.

Usage:  SPARK_GRAFT_CPUS=8 python tools/crawl_job.py [n_hosts]
Prints ONE JSON line. BENCH/BASELINE.md records the runs.
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
sys.path.insert(0, os.path.dirname(_here))
from curation_job import shuffle_bytes_by_group  # noqa: E402
from graph_job import synth_host_edges  # noqa: E402

N_HOSTS_DEFAULT = 1 << 20


def main() -> None:
    n_hosts = int(sys.argv[1]) if len(sys.argv) > 1 else N_HOSTS_DEFAULT
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    out_dir = tempfile.mkdtemp(prefix="crawl_job_", dir=base)
    evt_dir = tempfile.mkdtemp(prefix="crawl_events_", dir=base)
    t_boot = time.monotonic()
    spark = (
        SparkSession.builder.appName("ferenda_crawl_job")
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
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

    from ferenda_spark.operators.graph import pagerank
    from ferenda_spark.operators.profiling import host_report
    from ferenda_spark.operators.scheduler import (
        allocate_crawl_budget,
        schedule_fetches,
    )

    def note(msg: str) -> None:
        print(f"[crawl_job +{time.monotonic() - t_boot:7.1f}s] {msg}",
              file=sys.stderr, flush=True)

    # ---- inputs (generation excluded from timing) ----
    note("materializing edges + docs")
    edges_path = os.path.join(out_dir, "edges")
    synth_host_edges(spark, n_hosts, n_hosts * 8).write.parquet(edges_path)
    edges = spark.read.parquet(edges_path)
    n_edges = edges.count()
    # 2 docs per host; text varies per doc so quality/dup-share vary by host
    docs_path = os.path.join(out_dir, "docs")
    (
        spark.range(n_hosts * 2)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("h"), F.pmod("id", F.lit(n_hosts))).alias("source"),
            F.lit("en").alias("lang"),
            F.concat_ws(
                " ",
                F.lit("Crawl sample page about topic"),
                F.pmod(F.col("id") * 7, F.lit(997)).cast("string"),
                F.lit("with reviewed body text that scores reasonably."),
                F.when(F.pmod("id", F.lit(3)) == 0,
                       F.lit("Extra sentence lifts the quality score a bit."))
                .otherwise(F.lit("")),
            ).alias("text"),
        )
        .write.parquet(docs_path)
    )
    docs = spark.read.parquet(docs_path)
    n_docs = docs.count()
    note(f"inputs done: {n_edges} edges, {n_docs} docs")

    wall: dict[str, float] = {}
    results: dict[str, dict] = {}

    def timed(name, fn):
        note(f"start {name}")
        spark.sparkContext.setJobGroup(name, name)
        t0 = time.monotonic()
        results[name] = fn()
        wall[name] = round(time.monotonic() - t0, 2)
        spark.sparkContext.setJobGroup("", "")
        note(f"done  {name} in {wall[name]}s")

    def run_rank():
        pr = pagerank(edges, n_iter=6).select(
            F.concat(F.lit("h"), F.col("node")).alias("host"),
            F.round("rank", 6).alias("rank"),
        )
        pr.write.mode("overwrite").parquet(os.path.join(out_dir, "rank"))
        return {"n_hosts_ranked": spark.read.parquet(
            os.path.join(out_dir, "rank")).count()}

    timed("pagerank", run_rank)

    def run_report():
        hq = host_report(docs).select("host", "mean_quality")
        hq.write.mode("overwrite").parquet(os.path.join(out_dir, "hq"))
        return {"n_hosts_reported": spark.read.parquet(
            os.path.join(out_dir, "hq")).count()}

    timed("host_report", run_report)

    def run_budget():
        ranks = spark.read.parquet(os.path.join(out_dir, "rank"))
        hq = spark.read.parquet(os.path.join(out_dir, "hq"))
        b = allocate_crawl_budget(
            ranks, hq, total_budget=10_000_000, max_share=0.10)
        b.write.mode("overwrite").parquet(os.path.join(out_dir, "budget"))
        bt = spark.read.parquet(os.path.join(out_dir, "budget"))
        agg = bt.agg(
            F.count("*").alias("n"),
            F.sum("budget").alias("tot"),
            # order-insensitive digest: sum of per-row hashes (mod a
            # 1e9 prime so the exact-long sum cannot overflow ANSI mode)
            # over the FULL row content (host, 6-dec share, int budget)
            F.sum(F.pmod(F.xxhash64(
                "host", F.format_number("share", 6), "budget"
            ), F.lit(1_000_000_007))).alias("dig"),
        ).collect()[0]
        return {
            "n_hosts_budgeted": agg["n"],
            "total_allocated": int(agg["tot"]),
            "budget_digest": int(agg["dig"]),
        }

    timed("allocate_budget", run_budget)

    def run_schedule():
        bt = spark.read.parquet(os.path.join(out_dir, "budget"))
        frontier = (
            bt.filter(F.col("budget") > 0)
            .select(
                F.explode(F.sequence(F.lit(1), F.lit(3))).alias("i"),
                "host",
            )
            .select(F.concat(
                F.lit("https://"), F.col("host"), F.lit(".example.org/p"),
                F.col("i").cast("string"),
            ).alias("url"))
        )
        sched = schedule_fetches(frontier)
        agg = sched.agg(
            F.count("*").alias("n"),
            F.max("not_before_ms").alias("max_delay"),
            F.countDistinct("worker").alias("n_workers"),
        ).collect()[0]
        return {
            "n_fetches": agg["n"],
            "max_not_before_ms": int(agg["max_delay"]),
            "n_workers": agg["n_workers"],
        }

    timed("schedule", run_schedule)

    app_id = spark.sparkContext.applicationId
    spark.stop()
    shuffle = shuffle_bytes_by_group(evt_dir, app_id)
    rec = {
        "job": "crawl_loop_1m",
        "cores": cpus,
        "n_hosts": n_hosts,
        "n_edges": n_edges,
        "n_docs": n_docs,
        "boot_s": boot_s,
        "total_s": round(sum(wall.values()), 2),
        "wall": wall,
        "results": results,
        "shuffle_mb": {
            g: {
                "w": round(v["shuffle_write_b"] / 1e6, 1),
                "r": round(v["shuffle_read_b"] / 1e6, 1),
                "stages": v["n_stages"],
            }
            for g, v in shuffle.items() if g
        },
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
