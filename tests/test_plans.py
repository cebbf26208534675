"""Physical-plan contracts (SURVEY §4.2): the optimizations the engine
relies on at 100 TB must be visible in `.explain` — predicate pushdown and
column pruning into parquet scans, partition pruning on the POS layout,
broadcast joins for dimension tables, whole-stage codegen on the hot
relational paths, and TakeOrderedAndProject for global top-k. A regression
here (e.g. an expression change that breaks pushdown) silently turns a
partition-pruned scan into a full-corpus scan at scale, so it is asserted,
not just eyeballed."""

import contextlib
import io

from pyspark.sql import functions as F

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


def _explain(df, mode: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def _plan(df) -> str:
    return _explain(df, "simple")


def _formatted(df) -> str:
    return _explain(df, "formatted")


def test_parquet_filter_and_column_pushdown(spark):
    df = entrymod.queries()["filter_pushdown_part"](spark, SF_DIR)
    plan = _formatted(df)
    assert "PushedFilters:" in plan
    # p_size <= 20 reaches the scan
    assert "LessThanOrEqual(p_size,20)" in plan
    # column pruning: the scan reads only the needed columns, not p_comment
    assert "p_comment" not in plan


def test_point_lookup_pushdown(spark):
    df = entrymod.queries()["doc_point_lookup"](spark, SF_DIR)
    plan = _formatted(df)
    assert "EqualTo(doc_id,42)" in plan
    assert "text" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_pos_layout_partition_pruning(spark, tmp_path):
    """A triple-pattern filter on pred must prune POS partitions (the scan's
    PartitionFilters, not a post-scan Filter)."""
    from ferenda_spark.operators.triples import write_pos
    from ferenda_spark.schemas import P_REFERENCES, P_TITLE, TRIPLES

    rows = [
        ("u1", P_REFERENCES, "e1", True, None, None, "u1", 0),
        ("u1", P_TITLE, "T", False, "en", None, "u1", 0),
    ]
    write_pos(spark.createDataFrame(rows, TRIPLES), str(tmp_path / "pos"))
    pos = spark.read.parquet(str(tmp_path / "pos"))
    q = pos.filter(F.col("pred") == P_REFERENCES)
    plan = _formatted(q)
    assert "PartitionFilters" in plan
    assert "isnotnull(pred" in plan


def test_dimension_join_broadcasts(spark):
    """tpch_q3ish: the filtered customer dim must broadcast, not sort-merge."""
    df = entrymod.queries()["tpch_q3ish"](spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # global top-k never full-sorts


def test_whole_stage_codegen_on_agg_path(spark):
    # AQE wraps the plan before execution and hides codegen spans; disable
    # it for this assertion only (it re-enables via the finally).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = entrymod.queries()["tpch_q1ish"](spark, SF_DIR)
        plan = _plan(df)
        # whole-stage-codegen spans render as *(n) operator prefixes
        assert "*(1)" in plan
        assert plan.count("HashAggregate") >= 2  # partial + final
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_anti_join_shape(spark):
    """The resume/skeleton anti-joins must stay broadcast anti joins (a
    shuffled anti join on the ledger dim would shuffle the corpus)."""
    df = entrymod.queries()["skeleton_anti"](spark, SF_DIR)
    plan = _plan(df)
    assert "LeftAnti" in plan


def test_adamic_adar_no_nested_loop(spark):
    """The wedge join must be an equi-join on the center node and the
    final top-k a TakeOrderedAndProject — no cartesian/nested-loop join,
    no global Sort."""
    df = entrymod.queries()["adamic_adar_links"](spark, SF_DIR)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dictionary_encode_is_map_only(spark):
    """encode_triples' encoded output is a projection: zero Exchange."""
    from ferenda_spark.operators.dictenc import encode_triples

    tri = spark.createDataFrame(
        [("s", "p", "o")], "subj string, pred string, obj string"
    )
    _, enc = encode_triples(tri)
    assert "Exchange" not in _plan(enc)


def test_prov_triples_map_only(spark):
    """Lineage → PROV triples is explode + filter: zero Exchange."""
    df = entrymod.queries()["prov_lineage_triples"](spark, SF_DIR)
    # the lineage synthesis aggregates (one Exchange); the PROV conversion
    # itself must add none beyond it
    assert _plan(df).count("Exchange") <= 2  # partial+final of ONE agg


def test_nquads_serialization_map_only(spark):
    from ferenda_spark.sources.nquads import to_nquads_lines

    q = spark.createDataFrame(
        [("s", "p", "o", True, None, None, "g")],
        "subj string, pred string, obj string, obj_is_uri boolean, "
        "obj_lang string, obj_dtype string, graph string",
    )
    assert "Exchange" not in _plan(to_nquads_lines(q))


def test_bm25_ends_in_top_k(spark):
    df = entrymod.queries()["fulltext_bm25"](spark, SF_DIR)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan


def test_weighted_sample_single_window_shuffle(spark):
    """One hash-partitioned Exchange for the strata window; no global
    single-partition sort."""
    df = entrymod.queries()["weighted_sample_mix"](spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan


def test_cms_query_broadcasts_grid(spark):
    df = entrymod.queries()["cms_frequencies"](spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan


def test_span_dedup_no_global_shuffle(spark):
    """ExactSubstr span removal: every Exchange is hash-partitioned (fp
    for the gram count/mark, id for islands + rebuild) — no
    single-partition collapse anywhere, and the doc-side rebuild joins
    by id, not by scanning text twice through a shuffle."""
    df = entrymod.queries()["span_dedup_docs"](spark, SF_DIR)
    plan = _plan(df)
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_cocitation_no_cartesian_and_mapside_combine(spark):
    """Co-citation's pair join must be an equi-join on src (never a
    nested-loop product) and the pair count must partially aggregate
    map-side."""
    from ferenda_spark.operators.graph_analytics import cocitation

    e = spark.createDataFrame(
        [(i, (i * 3 + j) % 40) for i in range(40) for j in (1, 2)],
        "src bigint, dst bigint",
    )
    plan = _plan(cocitation(e, min_count=2, max_out_degree=10))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_count" in plan  # map-side combine before the exchange


def test_url_template_mining_two_exchanges(spark):
    """Template mining is map-only derivation + one (host, template)
    aggregation + one host-keyed window — nothing may inflate into a
    per-row shuffle chain or a single-partition exchange."""
    from ferenda_spark.functions.urls import mine_url_templates

    df = spark.createDataFrame(
        [(f"https://h{i % 3}.com/p/{i}",) for i in range(30)], "url string"
    )
    plan = _plan(mine_url_templates(df))
    assert "Exchange SinglePartition" not in plan
    assert plan.count("Exchange") <= 3  # agg + window (+AQE reuse slack)


def test_fusion_trust_join_not_broadcast(spark):
    """The claims x trust join must stay a shuffle join: trust is
    source-sized (10^8 hosts at scale) and the operator must not hint it
    broadcast — Spark may still pick BHJ from tiny TEST stats, so assert
    on the operator's logical plan, not the physical choice: no broadcast
    HINT nodes."""
    from ferenda_spark.operators.fusion import fuse_claims

    claims = spark.createDataFrame(
        [(f"s{i % 5}", f"e{i % 7}", "p", f"v{i % 2}") for i in range(40)],
        "source string, subj string, pred string, obj string",
    )
    resolved, trust = fuse_claims(claims, n_iter=1)
    assert "ResolvedHint" not in resolved._jdf.queryExecution().logical().toString()


def test_host_report_no_window_for_mode(spark):
    """The language mode is a struct-min aggregation, not a window — a
    window would materialize per-host sorted candidate lists."""
    from ferenda_spark.operators.profiling import host_report

    df = spark.createDataFrame(
        [(i, "a b c", "en", f"h{i % 4}") for i in range(20)],
        "doc_id bigint, text string, lang string, source string",
    )
    plan = _plan(host_report(df))
    assert "Window" not in plan
    assert "Exchange SinglePartition" not in plan


def test_dsir_ratio_join_is_broadcast(spark):
    """The bucket-ratio table (n_buckets rows) must reach the per-doc
    scoring join as a broadcast — a shuffled join there would hash the
    whole corpus's bucket counts for a 1024-row build side."""
    from ferenda_spark.functions.dsir import dsir_log_weights

    raw = spark.createDataFrame(
        [(i, f"w{i % 7} common text tokens here") for i in range(40)],
        "doc_id bigint, text string")
    tgt = raw.limit(5)
    plan = _plan(dsir_log_weights(raw, tgt, n_buckets=64, checkpoint=False))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_disambig_no_window_no_cartesian(spark):
    """Disambiguation's argmax is a struct-min aggregation and every
    join is candidate- or token-keyed — no window over candidate lists,
    no cross product."""
    from ferenda_spark.operators.disambig import disambiguate

    m = spark.createDataFrame([(1, "a b c")], "mention_id bigint, context string")
    c = spark.createDataFrame([(1, "e1"), (1, "e2")],
                              "mention_id bigint, entity string")
    p = spark.createDataFrame([("e1", "a b"), ("e2", "c d")],
                              "entity string, profile string")
    plan = _plan(disambiguate(m, c, p))
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_audit_clusters_pair_join_is_keyed(spark):
    """The audit's pair enumeration must be an equi-join on the cluster
    key (fan-out bounded by the member cap), never a nested-loop."""
    from ferenda_spark.operators.dedup import audit_clusters

    comps = spark.createDataFrame([(i, i % 3) for i in range(12)],
                                  "node bigint, comp bigint")
    docs = spark.createDataFrame(
        [(i, f"text number {i} with words") for i in range(12)],
        "doc_id bigint, text string")
    plan = _plan(audit_clusters(comps, docs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_coalesce_intervals_single_exchange(spark):
    """Both gaps-and-islands windows plus the island aggregate must ride
    ONE key-partitioned exchange (plus at most AQE reads) — a second
    corpus shuffle would double the operator's cost for nothing."""
    from ferenda_spark.operators.temporal import coalesce_intervals

    df = spark.createDataFrame(
        [("s", "p", "v", i * 3, i * 3 + 5) for i in range(20)],
        "subj string, pred string, value string, "
        "valid_from bigint, valid_to bigint")
    plan = _plan(coalesce_intervals(df))
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "Exchange SinglePartition" not in plan


def test_span_postings_hashes_each_gram_once(spark):
    """The gram-hashing expression must appear in the Generate's OUTPUT
    side only — never inside a Filter. Regression pin for the 1M-doc
    finding: exploding a prebuilt window array let Catalyst's
    InferFiltersFromGenerate synthesize size()/isnotnull predicates that
    re-embedded the whole gram-hashing transform, tripling the posting
    construction (operators/spandedup.py docstring)."""
    import re

    from ferenda_spark.operators.spandedup import span_postings

    df = spark.createDataFrame(
        [(0, "a b c d e f g h i j")], "id long, text string")
    for stride in (1, 3):
        plan = _plan(span_postings(df, "text", "id", length=3,
                                   stride=stride))
        for line in plan.splitlines():
            if re.search(r"^\s*(\+-|:-)?\s*\*?\(?\d*\)?\s*Filter", line):
                assert "xxhash64" not in line, line
        # and the hash exists exactly once in the whole plan (the
        # posting projection) — duplication anywhere is the bug
        assert plan.count("xxhash64") == 1, plan
