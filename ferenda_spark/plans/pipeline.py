"""The full KG-construction DAG with checkpoint-resume (SURVEY §3 E1–E3).

Spark restatement of `./ferenda-build.py <repo> parse|relate|toc|news --all`
([ref: ferenda/manager.py :: run]) as three resumable stages over partitioned
stage tables:

  parse:   corpus ──mapInPandas──▶ docs table (+ lineage)          [E1]
  triples: docs ──link+assemble──▶ triples_spo + triples_pos       [E2]
  rollup:  triples ──docmeta──▶ toc + feeds + feed_main + stats    [E3]
  publish: toc/feeds ──column-expr XML──▶ atom + toc_pages tables  [E3]

Resume contract (north_rule): each stage anti-joins its input against the
ledger and recomputes ONLY part_keys not yet recorded ok; stage writes are
dynamic partition overwrites keyed on part_key, so re-runs are idempotent
and a killed run restarts at the last completed partition. `parse` and
`triples` resume at partition granularity; `rollup` and `publish` outputs
are facet-sized (O(groups) rows) so they rerun whole — recomputing a
10^2-row table is cheaper than checkpointing it.

At 100 TB: every stage boundary is a partitioned Parquet table (the
Iceberg-style layout, SURVEY §7.1), so executors stream batch-at-a-time and
nothing is ever collected to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ferenda_spark.functions.uris import part_key_col
from ferenda_spark.operators.ledger import Ledger, write_stage_partitioned
from ferenda_spark.sources import catalog
from ferenda_spark.operators.linking import link_mentions
from ferenda_spark.operators.parse import ParseMetrics, parse_stage, split_parsed
from ferenda_spark.operators.rollups import (
    feed_main,
    feeds_topk,
    toc_rollup,
    triple_stats,
)
from ferenda_spark.operators.triples import (
    append_pos,
    assemble_triples,
    docmeta_from_triples,
    write_spo,
)


def _p(out_dir: str, name: str) -> str:
    return os.path.join(out_dir, name)


def run_pipeline(
    spark: SparkSession,
    corpus: DataFrame,
    dictionary: DataFrame,
    out_dir: str,
    n_parts: int = 64,
    run_id: str = "run",
    exact_strategy: str = "broadcast",
    with_lsh: bool = True,
    base_url: str = "https://kg.example.org",
    facets=None,
    publish_html: bool = False,
    harvest_structured: bool = False,
    enrich_kg: bool = False,
    shapes: DataFrame | None = None,
    enrich_extra_triples: DataFrame | None = None,
    describe_dataset: bool = False,
    fuse: bool = False,
    fuse_iters: int = 3,
) -> dict[str, str]:
    """Run (or resume) the full DAG; returns stage-table paths.

    ``facets``: optional tuple of ferenda_spark.facets.Facet driving the
    toc/feed rollups (reference: each docrepo declares its Facet list);
    defaults to the letter/year/lang trio."""
    from ferenda_spark.facets import DEFAULT_FACETS

    facets = DEFAULT_FACETS if facets is None else tuple(facets)
    ledger = Ledger(spark, _p(out_dir, "ledger"))
    paths = {
        "docs": _p(out_dir, "docs"),
        "lineage": _p(out_dir, "lineage"),
        "triples_spo": _p(out_dir, "triples_spo"),
        "triples_pos": _p(out_dir, "triples_pos"),
        "docmeta": _p(out_dir, "docmeta"),
        "toc": _p(out_dir, "toc"),
        "feeds": _p(out_dir, "feeds"),
        "feed_main": _p(out_dir, "feed_main"),
        "triple_stats": _p(out_dir, "triple_stats"),
        "atom": _p(out_dir, "atom"),
        "toc_pages": _p(out_dir, "toc_pages"),
        "generated": _p(out_dir, "generated"),
        "ledger": _p(out_dir, "ledger"),
    }

    # ---------------------------------------------------------------- parse
    keyed = corpus.withColumn("part_key", part_key_col(F.col("url"), n_parts))
    todo = ledger.pending(keyed, "parse")
    if todo.limit(1).count() > 0:
        # the in-UDF metrics (real bytes_in / wall_ms / partition_id,
        # SURVEY A5) ride the SAME single parse pass as the docs write via
        # an accumulator — no second parse, no NULL re-aggregate
        metrics = ParseMetrics(spark)
        parsed = parse_stage(todo.drop("part_key"), n_parts=n_parts, metrics=metrics)
        docs, _ = split_parsed(parsed)
        write_stage_partitioned(docs, paths["docs"])
        # lineage rows for THIS run's partitions only; append keeps history.
        lin_rows = metrics.lineage_df(spark, stage="parse", run_id=run_id)
        catalog.append_table(lin_rows, paths["lineage"])
        ledger.mark("parse", lin_rows, run_id=run_id)

    # --------------------------------------- structured harvest (opt-in)
    # publisher-asserted graphs (JSON-LD/microdata) + the outlink graph,
    # harvested from the same html pass family as parse but kept as
    # SEPARATE stage tables from the grammar triples — provenance
    # (asserted-by-publisher vs derived-by-parse) must stay queryable, so
    # they never silently union into SPO. Resumable at part_key
    # granularity via the same ledger contract as parse; per-partition
    # lineage carries real n_in/n_out/bytes_in (html bytes) with the
    # measured stage wall apportioned by bytes share (triples-stage
    # discipline).
    if harvest_structured:
        paths["structured"] = _p(out_dir, "structured")
        paths["links"] = _p(out_dir, "links")
        todo_s = ledger.pending(keyed, "structured")
        if todo_s.limit(1).count() > 0:
            import time as _tm

            from ferenda_spark.operators.structured import structured_triples
            from ferenda_spark.operators.weblinks import outlinks

            _t0s = _tm.monotonic()
            st = structured_triples(
                todo_s, html_col="html", src_col="url"
            ).withColumn("part_key", part_key_col(F.col("src"), n_parts))
            write_stage_partitioned(st, paths["structured"])
            lk = outlinks(todo_s, html_col="html", url_col="url").withColumn(
                "part_key", part_key_col(F.col("src"), n_parts)
            )
            write_stage_partitioned(lk, paths["links"])
            wall_s = int((_tm.monotonic() - _t0s) * 1000)
            stats_in = todo_s.groupBy("part_key").agg(
                F.count(F.lit(1)).alias("n_in"),
                F.sum(F.length("html")).alias("bytes_in"),
            )
            st_out = (
                catalog.read_table(spark, paths["structured"])
                .groupBy("part_key")
                .agg(F.count(F.lit(1)).alias("n_out"))
            )
            # ≤ n_parts rows — vocabulary-sized collect
            rows = stats_in.join(st_out, "part_key", "left").collect()
            total_b = sum(r["bytes_in"] or 0 for r in rows) or 1
            lin_s = spark.createDataFrame(
                [
                    (
                        "structured",
                        int(r["part_key"]),
                        None,
                        int(r["n_in"]),
                        int(r["n_out"] or 0),
                        int(r["bytes_in"] or 0),
                        int(wall_s * (r["bytes_in"] or 0) / total_b),
                        run_id,
                    )
                    for r in rows
                ],
                "stage string, part_key int, partition_id int, n_in long, "
                "n_out long, bytes_in long, wall_ms long, run_id string",
            )
            catalog.append_table(lin_s, paths["lineage"])
            ledger.mark("structured", lin_s, run_id=run_id)

    # -------------------------------------------------------------- triples
    docs_tbl = catalog.read_table(spark, paths["docs"])
    todo_docs = ledger.pending(docs_tbl, "triples")
    if todo_docs.limit(1).count() > 0:
        import time

        _t0 = time.monotonic()
        mentions = todo_docs.select(
            "url", "part_key", F.explode("mentions").alias("m")
        ).select(
            "url", "part_key",
            F.col("m.section_ordinal").alias("section_ordinal"),
            F.col("m.mention").alias("mention"),
            F.col("m.alias_key").alias("alias_key"),
        )
        links = link_mentions(
            mentions, dictionary, exact_strategy=exact_strategy
        ) if with_lsh else None
        if links is None:  # exact tier only (cheap path for micro-tests)
            from ferenda_spark.operators.linking import _exact_broadcast
            links = _exact_broadcast(mentions, dictionary)
        triples = assemble_triples(todo_docs, links)
        write_spo(triples, paths["triples_spo"])
        # POS maintenance is INCREMENTAL: only this batch's rows (read back
        # from the durable SPO, partition-pruned to the batch part_keys) are
        # added, under new pos_batch directories — an incremental batch
        # writes O(batch) POS bytes and never rewrites the existing index
        # (append_pos falls back to a full rebuild only when its manifest
        # detects an overlapping foreign batch, which the ledger contract
        # never produces). The batch part list is ledger-bounded (≤ n_parts
        # values), so the collect is vocabulary-sized.
        batch_parts = [
            r["part_key"]
            for r in todo_docs.select("part_key").distinct().collect()
        ]
        append_pos(
            spark, paths["triples_spo"], paths["triples_pos"], batch_parts
        )
        # lineage with REAL metrics (north_rule "per-partition lineage +
        # metrics"; round-2 review: triples rows carried NULLs):
        # - n_in  = exact docs per part_key (one cheap agg over the pruned
        #   batch input)
        # - bytes_in = exact on-disk input bytes per part_key — a pure file
        #   listing of the part_key-partitioned docs table, no data read
        # - wall_ms = the measured driver wall of this stage, apportioned
        #   per partition by bytes_in share (the stage is whole-stage-
        #   codegen'd JVM work with no Python hook for a per-task
        #   accumulator; the apportioned values are deterministic and sum
        #   to the true stage wall). partition_id stays NULL: the write
        #   tasks are hash groups of part_keys, not 1:1 Spark partitions.
        wall_total = int((time.monotonic() - _t0) * 1000)
        done = catalog.read_table(spark, paths["triples_spo"]).join(
            ledger.ok_parts("triples"), "part_key", "left_anti"
        )
        n_in_pk = todo_docs.groupBy("part_key").agg(
            F.count(F.lit(1)).alias("n_in")
        )
        bytes_pk = catalog.partition_file_bytes(spark, paths["docs"]).join(
            n_in_pk.select("part_key"), "part_key", "left_semi"
        )
        # batch-total bytes for the wall apportionment — an unpartitioned
        # window over the ≤ n_parts lineage rows, not over data
        batch_bytes = F.sum("bytes").over(Window.partitionBy())
        lin_rows = (
            done.groupBy("part_key")
            .agg(F.count(F.lit(1)).alias("n_out"))
            .join(n_in_pk, "part_key")
            .join(bytes_pk, "part_key")
            .withColumn("_total", batch_bytes)
            .select(
                F.lit("triples").alias("stage"),
                "part_key",
                F.lit(None).cast("int").alias("partition_id"),
                F.col("n_in").cast("long").alias("n_in"),
                "n_out",
                F.col("bytes").cast("long").alias("bytes_in"),
                F.round(
                    F.lit(wall_total) * F.col("bytes") / F.col("_total")
                ).cast("long").alias("wall_ms"),
                F.lit(run_id).alias("run_id"),
            )
        )
        catalog.append_table(lin_rows, paths["lineage"])
        ledger.mark("triples", lin_rows, run_id=run_id)

    # --------------------------------------------- KG enrichment (opt-in)
    # owl:sameAs canonicalization + RDFS inference + SHACL-lite validation
    # over the assembled graph (optionally merged with publisher-asserted
    # structured triples — the harvest is where real sameAs edges come
    # from). Kept as SEPARATE stage tables: canonical is the query-facing
    # graph, inferred is its own layer (re-inference after a schema change
    # never rewrites asserted facts), violations are an audit table.
    # Reruns whole: the sameAs closure is GLOBAL (connected components),
    # so partition-granular resume cannot decompose it — at 10^12 docs
    # this stage runs per-snapshot, with dedup_store-style cross-batch
    # incremental components as the scale path.
    import time as _time

    if enrich_kg:
        from ferenda_spark.operators.inference import rdfs_closure
        from ferenda_spark.operators.sameas import canonicalize_sameas

        paths["triples_canonical"] = _p(out_dir, "triples_canonical")
        paths["triples_inferred"] = _p(out_dir, "triples_inferred")
        _t0e = _time.monotonic()
        spo = catalog.read_table(spark, paths["triples_spo"])
        base = spo
        if enrich_extra_triples is not None:
            base = base.unionByName(enrich_extra_triples)
        elif harvest_structured and "structured" in paths:
            from ferenda_spark.operators.structured import (
                structured_as_triples,
            )

            base = base.unionByName(
                structured_as_triples(
                    catalog.read_table(spark, paths["structured"]), n_parts
                )
            )
        canon = canonicalize_sameas(base)
        write_stage_partitioned(canon, paths["triples_canonical"])
        canon_tbl = catalog.read_table(spark, paths["triples_canonical"])
        # schema-closure rows carry no provenance → part_key -1 so the
        # partitioned layout never grows a NULL partition directory
        inferred = rdfs_closure(canon_tbl).withColumn(
            "part_key", F.coalesce("part_key", F.lit(-1)).cast("int")
        )
        write_stage_partitioned(inferred, paths["triples_inferred"])
        n_out_e = (
            catalog.read_table(spark, paths["triples_canonical"]).count()
            + catalog.read_table(spark, paths["triples_inferred"]).count()
        )
        if shapes is not None:
            from ferenda_spark.operators.validation import validate_shapes

            paths["violations"] = _p(out_dir, "violations")
            graph = canon_tbl.unionByName(
                catalog.read_table(spark, paths["triples_inferred"])
            )
            catalog.write_table(
                validate_shapes(graph, shapes), paths["violations"]
            )
        catalog.append_table(
            _whole_stage_lineage(
                spark,
                stage="enrich",
                n_in=spo.count(),
                n_out=n_out_e,
                bytes_in=_table_bytes(spark, paths["triples_spo"]),
                wall_ms=int((_time.monotonic() - _t0e) * 1000),
                run_id=run_id,
            ),
            paths["lineage"],
        )
        ledger.mark_parts("enrich", [-1], run_id=run_id)

    # --------------------------------------- fact fusion (opt-in, round-5)
    # conflict resolution between PUBLISHERS: the structured harvest's
    # publisher-asserted claims, keyed by harvesting host, run the
    # fuse_claims trust fixed point (operators/fusion.py) and land as two
    # stage tables on the same lineage/ledger path as every other stage —
    # `fused` (one resolved value per (subj, pred), with confidence and
    # source counts) and `source_trust` (the per-host reliability the
    # crawl loop's budget allocator can consume next cycle). Reruns
    # whole, like enrich: the trust fixed point is global (every claim
    # feeds every source's trust), so partition-granular resume cannot
    # decompose it; the incremental path at 10^12 docs is
    # fusion.fold_claims over the claim delta, mirroring dedup_store.
    if fuse:
        if "structured" not in paths:
            raise ValueError(
                "fuse=True requires harvest_structured=True: the fusion "
                "stage resolves conflicts between publisher-asserted "
                "claims, which come from the structured harvest"
            )
        from ferenda_spark.functions.urls import url_host
        from ferenda_spark.operators.fusion import fuse_claims

        paths["fused"] = _p(out_dir, "fused")
        paths["source_trust"] = _p(out_dir, "source_trust")
        _t0f = _time.monotonic()
        st_tbl = catalog.read_table(spark, paths["structured"])
        claims = st_tbl.select(
            url_host(F.col("src")).alias("source"), "subj", "pred", "obj"
        )
        resolved, trust = fuse_claims(claims, n_iter=fuse_iters)
        # fused facts carry no single source page; partition on the
        # subject's domain hash so the layout matches the triple tables
        write_stage_partitioned(
            resolved.withColumn(
                "part_key", part_key_col(F.col("subj"), n_parts)
            ),
            paths["fused"],
        )
        catalog.write_table(trust, paths["source_trust"])
        catalog.append_table(
            _whole_stage_lineage(
                spark,
                stage="fuse",
                n_in=st_tbl.count(),
                n_out=catalog.read_table(spark, paths["fused"]).count(),
                bytes_in=_table_bytes(spark, paths["structured"]),
                wall_ms=int((_time.monotonic() - _t0f) * 1000),
                run_id=run_id,
            ),
            paths["lineage"],
        )
        ledger.mark_parts("fuse", [-1], run_id=run_id)

    # ------------------------------------- VoID self-description (opt-in)
    # dataset statistics AS triples (operators/void_stats.py) over the
    # graph a consumer actually queries: the canonical table when the
    # enrichment stage ran, else raw SPO. Facet-sized output (O(preds +
    # classes) rows) → reruns whole, same policy as rollup.
    if describe_dataset:
        from ferenda_spark.operators.void_stats import void_description

        paths["void"] = _p(out_dir, "void")
        _t0v = _time.monotonic()
        src_path = (
            paths["triples_canonical"] if enrich_kg else paths["triples_spo"]
        )
        graph_tbl = catalog.read_table(spark, src_path)
        catalog.write_table(void_description(graph_tbl), paths["void"])
        catalog.append_table(
            _whole_stage_lineage(
                spark,
                stage="void",
                n_in=graph_tbl.count(),
                n_out=catalog.read_table(spark, paths["void"]).count(),
                bytes_in=_table_bytes(spark, src_path),
                wall_ms=int((_time.monotonic() - _t0v) * 1000),
                run_id=run_id,
            ),
            paths["lineage"],
        )
        ledger.mark_parts("void", [-1], run_id=run_id)

    # --------------------------------------------------------------- rollup

    _t0 = _time.monotonic()
    triples_tbl = catalog.read_table(spark, paths["triples_spo"])
    docmeta = docmeta_from_triples(triples_tbl)
    write_stage_partitioned(docmeta, paths["docmeta"])
    dm = catalog.read_table(spark, paths["docmeta"])
    catalog.write_table(toc_rollup(dm, facets=facets), paths["toc"])
    catalog.write_table(feeds_topk(dm, facets=facets), paths["feeds"])
    catalog.write_table(feed_main(dm), paths["feed_main"])
    catalog.write_table(triple_stats(triples_tbl), paths["triple_stats"])
    # lineage for the rerun-whole stages too (completes the north_rule
    # "per-partition lineage + metrics" across ALL four stages; rollup and
    # publish have one logical partition, part_key=-1, matching their
    # ledger rows). n_in/n_out are parquet-footer counts (no data read);
    # bytes_in is the same pure file listing the triples stage uses.
    catalog.append_table(
        _whole_stage_lineage(
            spark,
            stage="rollup",
            n_in=triples_tbl.count(),
            n_out=dm.count(),
            bytes_in=_table_bytes(spark, paths["triples_spo"]),
            wall_ms=int((_time.monotonic() - _t0) * 1000),
            run_id=run_id,
        ),
        paths["lineage"],
    )
    ledger.mark_parts("rollup", [-1], run_id=run_id)

    # -------------------------------------------------------------- publish
    # the generate-side sinks (news_generate_feeds / toc_generate_pages):
    # rollup-sized inputs, column-expression XML assembly, rerun-whole
    from ferenda_spark.operators.atom import atom_feeds
    from ferenda_spark.operators.toc_html import toc_pages

    _t0 = _time.monotonic()
    feeds_tbl = catalog.read_table(spark, paths["feeds"])
    toc_tbl = catalog.read_table(spark, paths["toc"])
    catalog.write_table(atom_feeds(feeds_tbl, base_url), paths["atom"])
    catalog.write_table(toc_pages(toc_tbl, base_url), paths["toc_pages"])
    if publish_html:
        # the reference's generate step (T10): parsed layer → browser HTML
        # via the XSLT-subset transformer. Corpus-sized but map-only (one
        # mapInPandas over the docs table, part_key partitioning reused by
        # the sink — no shuffle), resumable at partition granularity via
        # the same ledger pattern as parse/triples.
        from ferenda_spark.operators.transformer import generate_html
        from ferenda_spark.operators.xhtml import render_xhtml

        gen_todo = ledger.pending(docs_tbl, "generate")
        if gen_todo.limit(1).count() > 0:
            html = generate_html(render_xhtml(gen_todo))
            write_stage_partitioned(html, paths["generated"])
            gen_parts = [
                r["part_key"]
                for r in gen_todo.select("part_key").distinct().collect()
            ]
            ledger.mark_parts("generate", gen_parts, run_id=run_id)
    catalog.append_table(
        _whole_stage_lineage(
            spark,
            stage="publish",
            n_in=feeds_tbl.count() + toc_tbl.count(),
            n_out=catalog.read_table(spark, paths["atom"]).count()
            + catalog.read_table(spark, paths["toc_pages"]).count(),
            bytes_in=_table_bytes(spark, paths["feeds"])
            + _table_bytes(spark, paths["toc"]),
            wall_ms=int((_time.monotonic() - _t0) * 1000),
            run_id=run_id,
        ),
        paths["lineage"],
    )
    ledger.mark_parts("publish", [-1], run_id=run_id)
    return paths


def _table_bytes(spark: SparkSession, path: str) -> int:
    """Total on-disk parquet bytes of a stage table — pure file listing."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("length")
    )
    row = files.agg(F.sum("length").alias("b")).collect()[0]
    return int(row["b"] or 0)


def _whole_stage_lineage(
    spark: SparkSession,
    stage: str,
    n_in: int,
    n_out: int,
    bytes_in: int,
    wall_ms: int,
    run_id: str,
) -> DataFrame:
    """One lineage row for a rerun-whole stage (part_key=-1) in the same
    schema as the parse/triples per-partition rows."""
    return spark.createDataFrame(
        [(stage, -1, None, n_in, n_out, bytes_in, wall_ms, run_id)],
        "stage string, part_key int, partition_id int, n_in long, "
        "n_out long, bytes_in long, wall_ms long, run_id string",
    )
