"""Triple assembly + SPO/POS materialization (SURVEY §2.1 S7, §4.3).

Reference analog: the render/relate steps serialize per-doc RDF and push it
to an external SPARQL store ([ref: ferenda/documentrepository.py :: relate],
[ref: ferenda/triplestore.py :: TripleStore.add_serialized]). Here the graph
IS a pair of partitioned Parquet tables sharing one schema:

- SPO layout: partitioned by ``part_key`` = pmod(xxhash64(domain(subj)), P),
  sorted within partitions by (subj, pred) — subject-centric access
  (per-doc annotations, dependency fans) prunes to one partition per domain
  and reads clustered rows.
- POS layout: partitioned by ``pred`` (predicate cardinality is vocabulary-
  sized, so partition-per-predicate is safe at any corpus scale), sorted by
  (obj, subj) — pattern filters ``?s <pred> <obj>`` prune to one partition
  and min/max-skip on obj. This is the layout that makes SPARQL-ish
  triple-pattern queries cheap (SURVEY P4, J2).
- POS incremental maintenance: a third partition level ``pos_batch``
  (digest of the batch's part_key set) makes resume-run POS writes purely
  ADDITIVE — ``append_pos`` materializes only the new batch's rows under
  brand-new ``pred=*/obj_bucket=*/pos_batch=<digest>/`` directories, so an
  incremental batch writes O(batch) bytes and never rewrites a byte of the
  existing index (the lakehouse append+compact discipline; Iceberg's
  transactional append is the config-change upgrade). Retries of the same
  batch land on the same digest → dynamic-overwrite idempotence. A tiny
  ``<pos>_batches`` manifest (one row per (batch, part_key)) detects the
  only unsafe history — a DIFFERENT batch already holding rows for a
  recomputed part_key, which the ledger contract never produces — and
  falls back to a full rebuild. Readers are unchanged: pred/obj_bucket
  partition pruning works identically; ``read_pos`` hides the batch column.

Iceberg note (SURVEY §7.1): no Iceberg jars in-sandbox; the layout is
Iceberg-style partitioned Parquet behind ``sources.catalog`` so swapping in
``writeTo(...).partitionedBy(...)`` is a config change, not a redesign.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ferenda_spark.functions.uris import part_key_col
from ferenda_spark.sources import catalog
from ferenda_spark.schemas import (
    P_IS_PART_OF,
    P_ISSUED,
    P_LANGUAGE,
    P_REFERENCES,
    P_TITLE,
    P_TYPE,
    T_DOCPART,
    T_DOCUMENT,
)


def assemble_triples(docs: DataFrame, links: DataFrame) -> DataFrame:
    """parsed doc rows + resolved entity links → canonical triples (TRIPLES
    schema), with SET semantics matching the reference's graph-isomorphism
    compare (assertEqualGraphs) — achieved WITHOUT a corpus-wide
    dropDuplicates shuffle:

    - grammar triples are deduplicated doc-locally inside the parse UDF, and
      every grammar subj embeds its doc url, so doc-local dedup IS global
      dedup. The explode below is shuffle-free.
    - entity triples can duplicate only when two links in one section resolve
      to the same canonical uri (possibly via different tiers/partitions), so
      they get their own dropDuplicates — a shuffle over just the skinny
      (subj, obj) link projection, ~4× fewer and ~3× narrower rows than the
      full triple set. At 10^12 docs this is the difference between
      shuffling the whole graph and shuffling only the entity edges.
    - the two sides cannot cross-duplicate: grammar objects live in doc-url /
      {KG_BASE}/eu/ namespaces, entity objects in {KG_BASE}/entity/.
    """
    # expand the compact per-doc encoding (schemas.TRIPLE_STRUCT) to full
    # URIs — pure column expressions, whole-stage-codegen'd, shuffle-free
    s, p, o = F.col("t.s"), F.col("t.p"), F.col("t.obj")
    # s is the node's ordinal_path ("2", "2.1", "2.1.3"; "" = the document).
    # isPartOf points at the PARENT node: drop the last path component —
    # a top-level section's parent is the document url.
    parent = F.when(
        s.contains("."),
        F.concat(F.col("url"), F.lit("#S"), F.regexp_replace(s, r"\.[^.]*$", "")),
    ).otherwise(F.col("url"))
    grammar = docs.select(
        "url", "part_key", "lang", "title", "issued",
        F.explode("triples").alias("t"),
    ).select(
        F.when(s == "", F.col("url"))
        .otherwise(F.concat(F.col("url"), F.lit("#S"), s))
        .alias("subj"),
        F.when(p == "t", F.lit(P_TITLE))
        .when(p == "d", F.lit(P_ISSUED))
        .when(p == "l", F.lit(P_LANGUAGE))
        .when(p == "y", F.lit(P_TYPE))
        .when(p == "i", F.lit(P_IS_PART_OF))
        .otherwise(F.lit(P_REFERENCES))
        .alias("pred"),
        F.when(p == "l", F.col("lang"))
        .when(p == "i", parent)
        .when(p == "d", F.date_format("issued", "yyyy-MM-dd"))
        .when((p == "y") & (s == ""), F.lit(T_DOCUMENT))
        .when(p == "y", F.lit(T_DOCPART))
        .when((p == "t") & (s == ""), F.col("title"))
        .otherwise(o)
        .alias("obj"),
        p.isin("y", "i", "r").alias("obj_is_uri"),
        F.when(p == "t", F.col("lang")).alias("obj_lang"),
        F.when(p == "d", F.lit("xsd:date")).alias("obj_dtype"),
        F.col("url").alias("src_url"),
        F.col("part_key"),
    )
    entity = (
        links.select(
            F.concat(F.col("url"), F.lit("#S"), F.col("section_ordinal")).alias("subj"),
            F.col("canonical_uri").alias("obj"),
            F.col("url").alias("src_url"),
            F.col("part_key"),
        )
        # full-row distinct ≡ dedup on (subj, obj): src_url/part_key are
        # functions of subj. distinct() compiles to a codegen'd partial+final
        # HashAggregate; dropDuplicates(subset) would need first() and fall
        # back to SortAggregate.
        .distinct()
        .select(
            "subj",
            F.lit(P_REFERENCES).alias("pred"),
            "obj",
            F.lit(True).alias("obj_is_uri"),
            F.lit(None).cast("string").alias("obj_lang"),
            F.lit(None).cast("string").alias("obj_dtype"),
            "src_url",
            "part_key",
        )
    )
    return grammar.unionByName(entity)


def write_spo(triples: DataFrame, path: str) -> None:
    catalog.overwrite_partitions(
        triples, path, partition_by=("part_key",), sort_by=("subj", "pred")
    )


#: POS sub-bucket count — the ONE definition every POS writer must share
#: (write_pos, TripleStore.add): mixed bucket counts in one table would
#: silently break partition pruning.
POS_BUCKETS = 16


def with_obj_bucket(triples: DataFrame, n_parts: int = POS_BUCKETS) -> DataFrame:
    """Attach the POS layout's obj-hash sub-bucket column."""
    return triples.withColumn(
        "obj_bucket", F.pmod(F.xxhash64("obj"), F.lit(n_parts)).cast("int")
    )


#: pos_batch value used by full rebuilds (treated as overlapping EVERY
#: part_key in the manifest — see append_pos).
FULL_BATCH = "full"


def _batch_id(part_keys) -> str:
    """Deterministic batch label for a part_key set: retries of the same
    batch (same ledger state → same todo set) reproduce it exactly, so a
    dynamic partition overwrite on pos_batch is retry-idempotent."""
    import hashlib

    key = ",".join(str(int(p)) for p in sorted(set(int(k) for k in part_keys)))
    return "b" + hashlib.sha1(key.encode()).hexdigest()[:16]


def _manifest_path(pos_path: str) -> str:
    return pos_path.rstrip("/") + "_batches"


def write_pos(triples: DataFrame, path: str, n_parts: int = POS_BUCKETS) -> None:
    """Authoritative FULL (re)build of the POS layout (bulk load / clear).

    obj-hash subpartition keeps per-file sizes bounded for mega-predicates
    (dcterms:references dominates); pred dir + minmax(obj) gives pruning.
    The rebuild is staged at a ``.rebuilding`` sibling and swapped in:
    with batch subdirectories a dynamic overwrite in place would leave any
    pre-existing batch directories alive next to the fresh ``full`` one
    (duplicates), and the sibling+swap also keeps the only copy durable at
    every crash point. The manifest is reset to the full-rebuild wildcard
    row AFTER the swap (a crash between the two leaves phantom batch rows,
    which can only cause a spurious full rebuild — never duplicates)."""
    spark = triples.sparkSession
    tmp = path.rstrip("/") + ".rebuilding"
    catalog.delete_path(spark, tmp)  # a crashed rebuild's stale partitions
    catalog.overwrite_partitions(
        with_obj_bucket(triples, n_parts).withColumn(
            "pos_batch", F.lit(FULL_BATCH)
        ),
        tmp,
        partition_by=("pred", "obj_bucket", "pos_batch"),
        sort_by=("obj", "subj"),
    )
    catalog.swap_in(spark, tmp, path)
    spark.createDataFrame(
        [(FULL_BATCH, -1)], "pos_batch string, part_key int"
    ).write.mode("overwrite").parquet(_manifest_path(path))


def append_pos(
    spark,
    spo_path: str,
    pos_path: str,
    part_keys,
    n_parts: int = POS_BUCKETS,
) -> str:
    """Incremental POS maintenance for a resume/ingest batch: add ONLY the
    batch's rows (read back from the durable SPO table, partition-pruned to
    the batch's part_keys) under new ``pos_batch=<digest>`` directories.

    Returns "append" (incremental path taken — zero pre-existing POS bytes
    rewritten) or "full" (manifest detected an overlapping foreign batch or
    a full-rebuild wildcard covering a recomputed part_key, so the whole
    layout was rebuilt from SPO — correct under ANY history, including
    manual ledger surgery; the ledger contract never produces this case on
    the normal resume path).

    Crash safety: POS directories are written before the manifest rows, so
    a crash can only under-report coverage (worst case: the retry's same
    digest overwrites its own partial dirs, or a later overlap check misses
    a batch the ledger anyway guarantees is disjoint)."""
    parts = sorted(set(int(p) for p in part_keys))
    if not parts:
        return "append"
    batch = _batch_id(parts)
    mpath = _manifest_path(pos_path)
    covered: set[int] = set()
    wildcard = False
    try:
        manifest = spark.read.parquet(mpath).collect()
    except Exception:  # no manifest yet (fresh table) — nothing can overlap
        manifest = []
    for r in manifest:
        if r["pos_batch"] == batch:
            continue  # our own retry: dynamic overwrite replaces those dirs
        if r["part_key"] == -1:
            wildcard = True
        else:
            covered.add(int(r["part_key"]))
    if wildcard or covered & set(parts):
        write_pos(catalog.read_table(spark, spo_path), pos_path, n_parts)
        return "full"
    new_rows = catalog.read_table(spark, spo_path).filter(
        F.col("part_key").isin(parts)  # SPO partition pruning
    )
    catalog.overwrite_partitions(
        with_obj_bucket(new_rows, n_parts).withColumn(
            "pos_batch", F.lit(batch)
        ),
        pos_path,
        partition_by=("pred", "obj_bucket", "pos_batch"),
        sort_by=("obj", "subj"),
    )
    spark.createDataFrame(
        [(batch, p) for p in parts], "pos_batch string, part_key int"
    ).write.mode("append").parquet(mpath)
    return "append"


def read_pos(spark, path: str) -> DataFrame:
    """Read the POS layout with the maintenance column hidden (the TRIPLES
    schema + obj_bucket, exactly what pattern scans expect); filters on
    pred/obj_bucket still prune partitions through the drop."""
    return catalog.read_table(spark, path).drop("pos_batch")


def docmeta_from_triples(triples: DataFrame) -> DataFrame:
    """SPO triples → wide per-document metadata frame — the Spark form of
    the reference's toc SPARQL SELECT ([ref: documentrepository.py ::
    toc_query]): pivot by conditional aggregation (never DataFrame.pivot —
    predicate set is static, so the plan stays a single HashAggregate)."""
    from ferenda_spark.schemas import P_LANGUAGE, P_TYPE, T_DOCUMENT

    return (
        triples.filter(
            F.col("pred").isin(P_TITLE, P_ISSUED, P_LANGUAGE, P_TYPE)
        )
        .groupBy(F.col("subj").alias("uri"), F.col("part_key"))
        .agg(
            F.max(F.when(F.col("pred") == P_TITLE, F.col("obj"))).alias("title"),
            F.max(F.when(F.col("pred") == P_ISSUED, F.col("obj"))).alias("issued"),
            F.max(F.when(F.col("pred") == P_LANGUAGE, F.col("obj"))).alias("lang"),
            F.max(
                F.when(F.col("pred") == P_TYPE, F.col("obj") == T_DOCUMENT)
            ).alias("is_document"),
        )
        .filter(F.col("is_document"))
        .drop("is_document")
    )


def part_key_for(url_col, n_parts: int):
    return part_key_col(url_col, n_parts)
