"""DSIR + LM-perplexity at 1M-doc scale (round-4 judge, next-round #2/#6).

Two text operators whose 100 TB story had only 20k-doc bench evidence:

- **DSIR** (functions/dsir.py): importance weights over the full corpus
  against a target slice, then the deterministic Gumbel top-k resample.
  The measurement must show ONE tokenize pass (the per-doc bucket counts
  re-aggregate into the global histogram — no second corpus scan), a
  bucket-keyed shuffle linear in corpus tokens, the 1024-row ratio
  BROADCAST join, and a zero-extra-shuffle TakeOrderedAndProject resample.
- **LM perplexity** (functions/lm.py): bigram LM trained on a reference
  slice, scored over the full corpus. PLANS.md:3218 claims the unigram/
  bigram count-table joins are "AQE skew-join territory" at corpus scale
  — this job RECORDS the per-stage task skew (max vs median task wall
  and shuffle-read bytes) from the event log so the claim is measured:
  either the count tables broadcast (no shuffle join to skew) or the
  sort-merge path shows whether AQE split the hot unigram partitions.

Usage:  python tools/text_job.py [n_docs]          (local[8] default)
        SPARK_GRAFT_CPUS=2 python tools/text_job.py [n_docs]
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
from curation_job import shuffle_bytes_by_group, synth_documents  # noqa: E402

N_DOCS_DEFAULT = 1 << 20


def task_skew_by_group(event_log_dir: str, app_id: str) -> dict:
    """group label → worst-stage task-skew profile: for the stage with the
    largest max task duration in each job group, report n_tasks,
    max/median task wall (ms) and max/median shuffle-read bytes — the
    direct evidence for "did a hot key make one task the straggler"."""
    path = os.path.join(event_log_dir, app_id)
    job_group: dict[int, str] = {}
    job_stages: dict[int, list[int]] = {}
    stage_tasks: dict[int, list[tuple[int, int]]] = {}
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            kind = ev.get("Event")
            if kind == "SparkListenerJobStart":
                jid = ev["Job ID"]
                job_group[jid] = (ev.get("Properties") or {}).get(
                    "spark.jobGroup.id", "")
                job_stages[jid] = [
                    s["Stage ID"] for s in ev.get("Stage Infos", [])]
            elif kind == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                ti = ev.get("Task Info") or {}
                tm = ev.get("Task Metrics") or {}
                dur = int(ti.get("Finish Time", 0)) - int(
                    ti.get("Launch Time", 0))
                srm = tm.get("Shuffle Read Metrics") or {}
                rb = int(srm.get("Local Bytes Read", 0)) + int(
                    srm.get("Remote Bytes Read", 0))
                stage_tasks.setdefault(sid, []).append((dur, rb))

    def med(xs):
        xs = sorted(xs)
        return xs[len(xs) // 2] if xs else 0

    out: dict[str, dict] = {}
    for jid, group in job_group.items():
        for sid in job_stages.get(jid, []):
            tasks = stage_tasks.get(sid)
            if not tasks:
                continue
            prof = {
                "stage": sid,
                "n_tasks": len(tasks),
                "max_task_ms": max(t[0] for t in tasks),
                "med_task_ms": med([t[0] for t in tasks]),
                "max_read_mb": round(max(t[1] for t in tasks) / 1e6, 1),
                "med_read_mb": round(med([t[1] for t in tasks]) / 1e6, 1),
            }
            cur = out.get(group)
            if cur is None or prof["max_task_ms"] > cur["max_task_ms"]:
                out[group] = prof
    return out


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else N_DOCS_DEFAULT
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    out_dir = tempfile.mkdtemp(prefix="text_job_", dir=base)
    evt_dir = tempfile.mkdtemp(prefix="text_events_", dir=base)
    t_boot = time.monotonic()
    spark = (
        SparkSession.builder.appName("ferenda_text_job")
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

    from ferenda_spark.functions.dsir import dsir_log_weights, dsir_resample
    from ferenda_spark.functions.lm import score_perplexity, train_ngram_lm

    def note(msg: str) -> None:
        print(f"[text_job +{time.monotonic() - t_boot:7.1f}s] {msg}",
              file=sys.stderr, flush=True)

    note("materializing corpus")
    docs_path = os.path.join(out_dir, "docs")
    synth_documents(spark, n_docs).write.parquet(docs_path)
    docs = spark.read.parquet(docs_path)
    n_real = docs.count()
    note(f"corpus done: {n_real} docs")

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

    # ---- DSIR: target = every 37th doc's text (a deterministic slice
    # with a mildly different topic mix via the %997 topic ids)
    target = docs.filter(F.pmod("doc_id", F.lit(37)) == 0)

    def run_dsir_weights():
        w = dsir_log_weights(docs, target, n_buckets=1024)
        agg = w.agg(
            F.count("*").alias("n"),
            F.round(F.sum("log_weight"), 3).alias("s"),
        ).collect()[0]
        w.write.mode("overwrite").parquet(os.path.join(out_dir, "dsirw"))
        return {"n_docs_weighted": agg["n"], "sum_log_weight": agg["s"]}

    timed("dsir_weights", run_dsir_weights)
    weights = spark.read.parquet(os.path.join(out_dir, "dsirw"))

    def run_dsir_resample():
        sel = dsir_resample(weights, k=100_000)
        return {"n_selected": sel.count()}

    timed("dsir_resample", run_dsir_resample)

    # ---- LM: train on a ~1/5 reference slice, score the full corpus
    ref = docs.filter(F.pmod("doc_id", F.lit(5)) == 0)

    def run_lm_train():
        lm = train_ngram_lm(ref)
        # materialize the count tables (training is lazy otherwise)
        lm.unigrams.write.mode("overwrite").parquet(
            os.path.join(out_dir, "uni"))
        lm.bigrams.write.mode("overwrite").parquet(
            os.path.join(out_dir, "bi"))
        lm.total.write.mode("overwrite").parquet(
            os.path.join(out_dir, "tot"))
        return {
            "n_unigrams": spark.read.parquet(
                os.path.join(out_dir, "uni")).count(),
            "n_bigrams": spark.read.parquet(
                os.path.join(out_dir, "bi")).count(),
        }

    timed("lm_train", run_lm_train)

    def run_lm_score():
        from ferenda_spark.functions.lm import NgramLM

        lm = NgramLM(
            unigrams=spark.read.parquet(os.path.join(out_dir, "uni")),
            bigrams=spark.read.parquet(os.path.join(out_dir, "bi")),
            total=spark.read.parquet(os.path.join(out_dir, "tot")),
            alpha=0.4,
        )
        scored = score_perplexity(docs, lm)
        agg = scored.agg(
            F.count("*").alias("n"),
            F.round(F.avg("ppl"), 3).alias("mean_ppl"),
        ).collect()[0]
        # the finalized adaptive plan tells us whether the count-table
        # joins broadcast or went sort-merge (the skew-join question)
        plan = scored._jdf.queryExecution().executedPlan().toString()
        return {
            "n_scored": agg["n"],
            "mean_ppl": float(agg["mean_ppl"]),
            "join_strategy": (
                "broadcast" if "BroadcastHashJoin" in plan else
                "sortmerge(skew=true)" if "skew=true" in plan else
                "sortmerge"
            ),
        }

    timed("lm_score", run_lm_score)

    app_id = spark.sparkContext.applicationId
    spark.stop()  # finalizes the event log (drops the .inprogress suffix)
    shuffle = shuffle_bytes_by_group(evt_dir, app_id)
    skew = task_skew_by_group(evt_dir, app_id)
    rec = {
        "job": "text_1m",
        "cores": cpus,
        "n_docs": n_real,
        "boot_s": boot_s,
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
        "worst_stage_skew": {g: v for g, v in skew.items() if g},
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
