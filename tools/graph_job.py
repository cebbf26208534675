"""Graph/KG-enrichment family at 1M-node scale (round-3 judge, next-round
#1): run the iterative operators end-to-end on a synthetic host-link graph
of >=10M edges and record PER-ROUND wall + shuffle bytes from the Spark
event log, so "per-round shuffles stay edge-sized and round wall roughly
constant" is measured, not plan-asserted.

Operators measured (each under its own spark job group). Job==round
accounting: originally every iterative round materialized via
``localCheckpoint(eager=True)`` so one Spark JOB within the group was one
round. Since ``RoundCadence`` (checkpoint.py) the eager checkpoint runs
only every interval-th round — probe-driven loops (CC, sameAs, redirects)
still run one probe job per round, but fixed-iteration loops (pagerank,
hits, katz) execute a whole cadence window as STAGES of one job. Per-job
shuffle accumulables from the event log therefore give per-WINDOW bytes
for those; the per-round claim is evidenced by windows staying
window-sized (interval x the former round bytes) with no growth:

- ``pagerank``            8 fixed iterations, directed host graph
- ``hits``                8 fixed iterations (hub+auth double round)
- ``connected_components``  99% edge history (undirected)
- ``update_components``     +1% new-edge batch against the component map
- ``canonicalize_sameas``   string-URI sameAs closure + triple rewrite
- ``rdfs_closure``          schema closure + rdfs2/3/7/9 over typed facts

Graph shape (deterministic, JVM-generated — no driver loop, no RNG):
src uniform over 2^20 hosts, dst drawn via a squared-uniform map so
indegree is power-law-ish (density ~ k^-0.5, max hub indegree ~3500x the
median) — the skew profile a Common-Crawl host graph actually has, which
is exactly what the map-side-combined contribution groupBy must absorb.

Usage:  /opt/spark/bin/spark-submit --master local[8] \
            --py-files /tmp/ferenda_spark.zip tools/graph_job.py \
            [n_nodes] [edges_per_node]
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

N_NODES_DEFAULT = 1 << 20          # 2^20 hosts
EDGES_PER_NODE_DEFAULT = 12        # ~12.6M directed edges


def synth_host_edges(spark: SparkSession, n_nodes: int, n_edges: int):
    """Deterministic skewed host-link graph: (src, dst) longs.

    src uniform; dst = floor(n * u^2) for u uniform in [0,1) — P(dst < k)
    = sqrt(k/n), so low-id hosts are hubs (indegree density ~ k^-0.5).
    Self-loops dropped here (the operators drop them anyway; excluding
    them keeps the materialized edge count the honest work number)."""
    u = (
        F.pmod(F.xxhash64(F.col("id"), F.lit("dst")), F.lit(1_000_003))
        .cast("double")
        / 1_000_003.0
    )
    return (
        spark.range(n_edges)
        .select(
            F.pmod(F.xxhash64(F.col("id"), F.lit("src")), F.lit(n_nodes))
            .alias("src"),
            F.floor(u * u * n_nodes).cast("long").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )


def synth_sameas_triples(spark: SparkSession, n_pairs: int, n_uris: int,
                         n_facts: int):
    """TRIPLES-schema frame: n_pairs owl:sameAs string-URI edges over an
    n_uris alias space (squared-uniform dst → skewed alias clusters, the
    'popular entity with 10k aliases' case) plus n_facts property rows to
    rewrite through the closure."""
    uri = lambda c: F.concat(F.lit("http://host.example/e"), c)  # noqa: E731
    base = spark.range(n_pairs)
    u = (
        F.pmod(F.xxhash64(F.col("id"), F.lit("sb")), F.lit(999_983))
        .cast("double")
        / 999_983.0
    )
    sameas = base.select(
        uri(F.pmod(F.xxhash64(F.col("id"), F.lit("sa")), F.lit(n_uris))
            .cast("string")).alias("subj"),
        F.lit("http://www.w3.org/2002/07/owl#sameAs").alias("pred"),
        uri(F.floor(u * u * n_uris).cast("string")).alias("obj"),
        F.lit(True).alias("obj_is_uri"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit(None).cast("string").alias("obj_dtype"),
    ).filter(F.col("subj") != F.col("obj"))
    facts = spark.range(n_facts).select(
        uri(F.pmod(F.xxhash64(F.col("id"), F.lit("fs")), F.lit(n_uris))
            .cast("string")).alias("subj"),
        F.concat(F.lit("http://host.example/p"),
                 F.pmod(F.col("id"), F.lit(40)).cast("string")).alias("pred"),
        uri(F.pmod(F.xxhash64(F.col("id"), F.lit("fo")), F.lit(n_uris))
            .cast("string")).alias("obj"),
        F.lit(True).alias("obj_is_uri"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit(None).cast("string").alias("obj_dtype"),
    )
    return sameas.unionByName(facts)


def synth_typed_triples(spark: SparkSession, n_facts: int, n_uris: int):
    """TRIPLES-schema frame for rdfs_closure: a 200-class subClassOf
    forest of depth 8, 40 properties with domains/ranges + a subPropertyOf
    chain, and n_facts instance property rows (objects are URIs so rdfs3
    range typing fires too)."""
    RDFS = "http://www.w3.org/2000/01/rdf-schema#"
    uri = lambda c: F.concat(F.lit("http://host.example/e"), c)  # noqa: E731

    def lit_row(s, p, o):
        return (s, p, o, True, None, None)

    schema = []
    for c in range(1, 200):
        schema.append(lit_row(f"http://host.example/C{c}",
                              RDFS + "subClassOf",
                              f"http://host.example/C{(c - 1) // 2}"))
    for p in range(40):
        schema.append(lit_row(f"http://host.example/p{p}",
                              RDFS + "domain",
                              f"http://host.example/C{100 + (p % 80)}"))
        schema.append(lit_row(f"http://host.example/p{p}",
                              RDFS + "range",
                              f"http://host.example/C{120 + (p % 60)}"))
        if p % 4 == 1:  # chains p1->p0, p5->p4, ... (depth 1; rdfs7 work)
            schema.append(lit_row(f"http://host.example/p{p}",
                                  RDFS + "subPropertyOf",
                                  f"http://host.example/p{p - 1}"))
    schema_df = spark.createDataFrame(
        schema,
        "subj string, pred string, obj string, obj_is_uri boolean, "
        "obj_lang string, obj_dtype string",
    )
    facts = spark.range(n_facts).select(
        uri(F.pmod(F.xxhash64(F.col("id"), F.lit("ts")), F.lit(n_uris))
            .cast("string")).alias("subj"),
        F.concat(F.lit("http://host.example/p"),
                 F.pmod(F.col("id"), F.lit(40)).cast("string")).alias("pred"),
        uri(F.pmod(F.xxhash64(F.col("id"), F.lit("to")), F.lit(n_uris))
            .cast("string")).alias("obj"),
        F.lit(True).alias("obj_is_uri"),
        F.lit(None).cast("string").alias("obj_lang"),
        F.lit(None).cast("string").alias("obj_dtype"),
    )
    return schema_df.unionByName(facts)


def parse_job_metrics(path: str) -> list[dict]:
    """Event log → one record per Spark job: group label, wall, shuffle
    read/write bytes (summed over the job's completed stages; skipped
    stages reused an exchange and wrote nothing new)."""
    jobs: dict[int, dict] = {}
    stage_metrics: dict[int, dict] = {}
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            kind = ev.get("Event")
            if kind == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "group": (ev.get("Properties") or {}).get(
                        "spark.jobGroup.id", ""),
                    "t0": ev.get("Submission Time", 0),
                    "t1": None,
                    "stages": [s["Stage ID"]
                               for s in ev.get("Stage Infos", [])],
                }
            elif kind == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev.get("Completion Time")
            elif kind == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                acc = {
                    a["Name"]: a.get("Value", 0)
                    for a in si.get("Accumulables", [])
                    if str(a.get("Name", "")).startswith("internal.metrics.")
                }
                stage_metrics[si["Stage ID"]] = {
                    "w": int(acc.get(
                        "internal.metrics.shuffle.write.bytesWritten", 0)),
                    "r": int(acc.get(
                        "internal.metrics.shuffle.read.localBytesRead", 0))
                    + int(acc.get(
                        "internal.metrics.shuffle.read.remoteBytesRead", 0)),
                }
    out = []
    for jid in sorted(jobs):
        j = jobs[jid]
        w = sum(stage_metrics.get(s, {}).get("w", 0) for s in j["stages"])
        r = sum(stage_metrics.get(s, {}).get("r", 0) for s in j["stages"])
        out.append({
            "job_id": jid,
            "group": j["group"],
            "wall_s": round(((j["t1"] or j["t0"]) - j["t0"]) / 1000.0, 2),
            "shuffle_write_mb": round(w / 1e6, 1),
            "shuffle_read_mb": round(r / 1e6, 1),
        })
    return out


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else N_NODES_DEFAULT
    per_node = (int(sys.argv[2]) if len(sys.argv) > 2
                else EDGES_PER_NODE_DEFAULT)
    # optional comma-list of operators to run (argv[3]), for re-measuring
    # one operator after an optimization without paying the full family
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    n_edges = n_nodes * per_node
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    out_dir = tempfile.mkdtemp(prefix="graph_job_", dir=base)
    evt_dir = tempfile.mkdtemp(prefix="graph_events_", dir=base)
    t_boot = time.monotonic()
    spark = (
        SparkSession.builder.appName("ferenda_graph_job")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # iterative graph rounds are many SMALL shuffles: the default 200
        # shuffle partitions cost ~200 task launches per round per
        # exchange (measured 7s/round at 50k edges — pure scheduling).
        # 64 partitions keeps 1M-node/12M-edge rounds at ~5 MB/partition
        # and AQE coalesces further when a round's data is smaller.
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

    from ferenda_spark.operators.graph import (
        connected_components,
        pagerank,
        hits,
        update_components,
    )
    from ferenda_spark.operators.inference import rdfs_closure
    from ferenda_spark.operators.sameas import canonicalize_sameas

    def note(msg: str) -> None:
        print(f"[graph_job +{time.monotonic() - t_boot:7.1f}s] {msg}",
              file=sys.stderr, flush=True)

    # ---- materialize inputs first (generation excluded from timing) ----
    note("materializing edges")
    edges_path = os.path.join(out_dir, "edges")
    synth_host_edges(spark, n_nodes, n_edges).write.parquet(edges_path)
    edges = spark.read.parquet(edges_path)
    n_edges_real = edges.count()

    note(f"edges done: {n_edges_real}")
    sameas_triples = typed_triples = None
    if only is None or "sameas_canonicalize" in only:
        sameas_path = os.path.join(out_dir, "sameas_triples")
        synth_sameas_triples(
            spark, n_pairs=n_nodes * 2, n_uris=n_nodes * 4,
            n_facts=n_nodes * 4,
        ).write.parquet(sameas_path)
        sameas_triples = spark.read.parquet(sameas_path)
        note("sameas input done")
    if only is None or "rdfs_closure" in only:
        typed_path = os.path.join(out_dir, "typed_triples")
        synth_typed_triples(
            spark, n_facts=n_nodes * 4, n_uris=n_nodes * 2
        ).write.parquet(typed_path)
        typed_triples = spark.read.parquet(typed_path)

    wall: dict[str, float] = {}
    results: dict[str, dict] = {}

    def timed(name, fn):
        if only is not None and name not in only:
            return
        note(f"start {name}")
        spark.sparkContext.setJobGroup(name, name)
        t0 = time.monotonic()
        results[name] = fn()
        wall[name] = round(time.monotonic() - t0, 2)
        spark.sparkContext.setJobGroup("", "")
        note(f"done  {name} in {wall[name]}s")

    # hyperball: lgk=9 (512 registers, ~4.6% rel err) keeps the per-node
    # sketch ~256B so a 1M-node state frame is ~0.3 GB/round; harmonic
    # needs the transpose, which hyperball() does internally
    from ferenda_spark.operators.hyperball import hyperball

    timed("hyperball", lambda: dict(zip(
        ("n_nodes", "sum_harmonic"),
        [(r["n"], round(r["s"], 1)) for r in
         hyperball(edges, max_iter=16, lgk=9)
         .agg(F.count("*").alias("n"), F.sum("harmonic").alias("s"))
         .collect()][0],
    )))

    # salsa: closed-form (no iteration) — the leg evidences that the
    # bipartite-component decomposition (one CC run on the hub/auth view)
    # dominates and the scoring itself is two degree aggregations
    from ferenda_spark.operators.graph_analytics import salsa

    timed("salsa", lambda: dict(zip(
        ("n_nodes", "sum_auth"),
        [(r["n"], round(r["s"], 6)) for r in salsa(edges)
         .agg(F.count("*").alias("n"), F.sum("auth").alias("s"))
         .collect()][0],
    )))

    # pagerank / hits: force full materialization with a 1-row global agg
    timed("pagerank", lambda: dict(zip(
        ("n_nodes", "sum_rank"),
        [(r["n"], round(r["s"], 6)) for r in pagerank(edges, n_iter=8)
         .agg(F.count("*").alias("n"), F.sum("rank").alias("s"))
         .collect()][0],
    )))
    timed("hits", lambda: dict(zip(
        ("n_nodes", "sum_hub"),
        [(r["n"], round(r["s"], 6)) for r in hits(edges, n_iter=8)
         .agg(F.count("*").alias("n"), F.sum("hub").alias("s"))
         .collect()][0],
    )))

    # components on a 99% history, then incremental +1% batch. The split
    # is deterministic (xxhash64 of the pair), mirroring how a crawl
    # snapshot appends a delta.
    is_new = F.pmod(F.xxhash64("src", "dst", F.lit("batch")), F.lit(100)) == 0
    history = edges.filter(~is_new)
    batch = edges.filter(is_new)

    def run_cc():
        comp = connected_components(history)
        comp.write.mode("overwrite").parquet(os.path.join(out_dir, "cc"))
        out = spark.read.parquet(os.path.join(out_dir, "cc"))
        return {"n_nodes": out.count(),
                "n_components": out.select("comp").distinct().count()}

    timed("connected_components", run_cc)

    def run_update():
        prev = spark.read.parquet(os.path.join(out_dir, "cc"))
        merged = update_components(prev, batch)
        return {"n_nodes": merged.count(),
                "n_batch_edges": batch.count()}

    timed("update_components", run_update)

    timed("sameas_canonicalize", lambda: {
        "n_triples": canonicalize_sameas(sameas_triples).count(),
        "n_input": sameas_triples.count(),
    })
    timed("rdfs_closure", lambda: {
        "n_inferred": rdfs_closure(typed_triples).count(),
        "n_input": typed_triples.count(),
    })

    # ---- round-4 family: fusion / label spreading / betweenness / truss
    from ferenda_spark.operators.fusion import fuse_claims
    from ferenda_spark.operators.graph_analytics import (
        betweenness_sample,
        k_truss,
    )
    from ferenda_spark.operators.labelspread import spread_labels

    if only is None or {"fact_fusion", "fusion_fold"} & only:
        # claims: 8 per node over n/2 facts from n/64 sources, ~20%
        # contradicted — the conflict profile a multi-host harvest has
        claims_path = os.path.join(out_dir, "claims")
        nsrc, nfact = max(n_nodes // 64, 9), max(n_nodes // 2, 40)
        spark.range(n_nodes * 8).select(
            F.concat(F.lit("s"), F.pmod(
                F.xxhash64("id", F.lit("cs")), F.lit(nsrc)).cast("string")
            ).alias("source"),
            F.concat(F.lit("e"), F.pmod(
                F.xxhash64("id", F.lit("cf")), F.lit(nfact)).cast("string")
            ).alias("subj"),
            F.lit("p").alias("pred"),
            F.concat(F.lit("v"), F.when(
                F.pmod(F.xxhash64("id", F.lit("cw")), F.lit(5)) == 0,
                F.pmod(F.xxhash64("id", F.lit("cv")), F.lit(3)) + 1,
            ).otherwise(F.lit(0)).cast("string")).alias("obj"),
        ).write.parquet(claims_path)
        claims = spark.read.parquet(claims_path)
        note("claims input done")
        timed("fact_fusion", lambda: dict(zip(
            ("n_facts", "sum_conf"),
            [(r["n"], round(r["s"], 3)) for r in
             fuse_claims(claims, n_iter=3)[0]
             .agg(F.count("*").alias("n"),
                  F.sum("confidence").alias("s")).collect()][0],
        )))

        # incremental fold: 99% of claims as prior state, +1% delta batch
        # (the nightly-crawl shape update_components measures for CC)
        from ferenda_spark.operators.fusion import fold_claims

        is_new_c = F.pmod(
            F.xxhash64("source", "subj", "obj", F.lit("cb")), F.lit(100)
        ) == 0
        c_hist = claims.filter(~is_new_c)
        c_batch = claims.filter(is_new_c)
        # bootstrap fold of the 99% history is SETUP (fold_claims returns
        # eagerly-checkpointed frames, so the work happens here) — the
        # measured leg is the +1% delta fold alone, the nightly shape
        note("bootstrapping fusion state (untimed)")
        ts0, fs0, _ = fold_claims(c_hist)

        def run_fold():
            ts2, fs2, delta = fold_claims(c_batch, ts0, fs0)
            n_delta = delta.count()
            return {"n_state_facts": fs2.count(),
                    "n_batch_claims": c_batch.count(),
                    "n_touched_keys": n_delta}

        timed("fusion_fold", run_fold)

    def run_spread():
        seeds = (
            edges.select(F.col("src").alias("node")).distinct()
            .filter(F.pmod("node", F.lit(1000)) == 0)
            .select(
                "node",
                F.when(F.pmod("node", F.lit(2)) == 0, F.lit("spam"))
                 .otherwise(F.lit("ham")).alias("label"),
            )
        )
        out = spread_labels(edges, seeds, alpha=0.85, n_iter=5)
        r = out.agg(F.count("*").alias("n"),
                    F.sum("score").alias("s")).collect()[0]
        return {"n_pairs": r["n"], "sum_score": round(r["s"], 3)}

    timed("label_spreading", run_spread)

    timed("betweenness", lambda: dict(zip(
        ("n_nodes", "sum_delta"),
        [(r["n"], round(r["s"], 1)) for r in
         betweenness_sample(edges, list(range(8)), max_depth=6)
         .agg(F.count("*").alias("n"),
              F.sum("delta_sum").alias("s")).collect()][0],
    )))

    timed("k_truss", lambda: dict(zip(
        ("n_edges", "sum_support"),
        [(r["n"], r["s"]) for r in k_truss(edges, k=4)
         .agg(F.count("*").alias("n"),
              F.sum("support").alias("s")).collect()][0],
    )))

    total_s = round(sum(wall.values()), 2)
    app_id = spark.sparkContext.applicationId
    cores = spark.sparkContext.defaultParallelism
    spark.stop()

    per_job = parse_job_metrics(os.path.join(evt_dir, app_id))
    groups: dict[str, dict] = {}
    for j in per_job:
        g = groups.setdefault(j["group"] or "_setup", {
            "jobs": 0, "shuffle_write_mb": 0.0, "shuffle_read_mb": 0.0,
            "rounds": [],
        })
        g["jobs"] += 1
        g["shuffle_write_mb"] = round(
            g["shuffle_write_mb"] + j["shuffle_write_mb"], 1)
        g["shuffle_read_mb"] = round(
            g["shuffle_read_mb"] + j["shuffle_read_mb"], 1)
        # a "round" is a job that actually shuffled (localCheckpoint of an
        # iteration); tiny zero-shuffle jobs are probes/broadcast builds
        if j["shuffle_write_mb"] + j["shuffle_read_mb"] > 0.5:
            g["rounds"].append({
                "wall_s": j["wall_s"],
                "w_mb": j["shuffle_write_mb"],
                "r_mb": j["shuffle_read_mb"],
            })
    report = {
        "job": "graph_family_1m",
        "cores": cores,
        "n_nodes": n_nodes,
        "n_edges": n_edges_real,
        "boot_s": boot_s,
        "total_s": total_s,
        "operators": {
            name: {
                "wall_s": wall[name],
                "result": results[name],
                **{k: v for k, v in groups.get(name, {}).items()},
            }
            for name in wall
        },
    }
    print(json.dumps(report))
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    shutil.rmtree(evt_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
