"""Incremental maintenance of the toc/feed rollups.

Reference analog: ferenda never recomputes everything — `parseifneeded`
skips unchanged docs and `relate_dependencies` invalidates exactly the
documents affected by a change ([ref: ferenda/documentrepository.py ::
relate_dependencies, parseifneeded]); `toc`/`news` then regenerate only
stale pages. This module is that mechanism restated at partition/bucket
granularity for the A1/W1 rollup tables: after an incremental ingest
changes a small set of docs, update the materialized rollups touching only
the affected buckets instead of re-aggregating the corpus. Both operators
are parameterized by the same declarative Facet list as the full rollups
(ferenda_spark.facets) — the reference's toc/news are Facet-driven, and so
is their maintenance.

Correctness model (tested against full recompute in
tests/test_incremental.py):

- a changed doc affects the buckets of its OLD facet values (it must leave
  them) and of its NEW facet values (it must appear there). Both inputs are
  therefore required: the changed docs' previous docmeta rows (empty for
  inserts) and their new rows (empty for deletes).
- per-facet buckets are recomputed EXACTLY from the rows currently
  contributing to them — `docmeta_full` filtered by pushed-down `isin`
  predicates over the affected values. The facet-value space is
  vocabulary-sized so the collected predicate lists are tiny by
  construction; the recompute scan reads only matching rows.
- the global ('all', '*') row: the COUNT is maintained algebraically
  (retract/apply — counts are abelian). The capped page list
  (rollups.toc_rollup bounds it to global_cap via TakeOrderedAndProject)
  is maintained by list surgery: filter retracted uris out of the old list,
  append the added docs, re-sort, re-cap. Surgery is exact except in ONE
  case — a deletion inside a FULL capped window, where the evicted
  (cap+1)-th doc cannot be resurrected from a capped list. That case is
  detected by a probe over the single global row and falls back to an exact
  TakeOrderedAndProject recompute of the list (no shuffle; a corpus scan of
  the skinny (title, uri) projection, paid only when actually needed) —
  so the emitted global row is ALWAYS exact, never silently stale.
- feeds: a (facet, feed) feedset is recomputed exactly when any changed doc
  touches that feed's value (old or new row); other feeds' rows are carried
  over untouched. The global "main" feed is NOT maintained here — the
  caller reruns ``rollups.feed_main(docmeta_full)`` at write time: it
  compiles to TakeOrderedAndProject (per-partition top-k, no shuffle), so
  an incremental path would add complexity without removing any cost.

Scale: the expensive full rollup is a grouping-sets shuffle over every doc;
the incremental path shuffles only docs whose facet values intersect the
affected set. For a 0.1% daily change rate on 10^12 docs, that is the
difference between re-aggregating 10^12 and ~10^9 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ferenda_spark.facets import DEFAULT_FACETS, Facet, feed_facets, toc_facets
from ferenda_spark.operators.rollups import (
    facet_columns,
    feeds_topk,
    toc_per_facet,
)


def affected_buckets(
    old_changed: DataFrame,
    new_changed: DataFrame,
    facets: tuple[Facet, ...] = DEFAULT_FACETS,
) -> DataFrame:
    """(facet, value) buckets touched by a change set — the facet values of
    the changed docs' old AND new rows. Vocabulary-sized by construction."""
    tf = toc_facets(facets)
    both = facet_columns(old_changed, facets).unionByName(
        facet_columns(new_changed, facets)
    )
    legs = [
        both.select(
            F.lit(fc.name).alias("facet"),
            F.col(fc.name).cast("string").alias("value"),
        )
        for fc in tf
    ]
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    # NULL facet values are REAL buckets (toc_per_facet gives them their
    # own (facet, NULL) row via grouping_id) — keep them, or a change to a
    # NULL-valued doc leaves its bucket silently stale
    return out.distinct()


def incremental_toc(
    docmeta_full: DataFrame,
    old_changed: DataFrame,
    new_changed: DataFrame,
    old_toc: DataFrame,
    facets: tuple[Facet, ...] = DEFAULT_FACETS,
    global_cap: int = 10_000,
) -> DataFrame:
    """New toc table = old_toc with the affected buckets replaced by exact
    recomputes and the global row maintained algebraically (count exact,
    capped list via surgery — see module docstring). ``docmeta_full`` is
    the CURRENT corpus docmeta (new rows already applied)."""
    tf = toc_facets(facets)
    buckets = affected_buckets(old_changed, new_changed, facets)
    vals: dict[str, list[str]] = {fc.name: [] for fc in tf}
    null_changed: dict[str, bool] = {fc.name: False for fc in tf}
    for r in buckets.collect():  # vocabulary-sized (see module docstring)
        if r["value"] is None:
            null_changed[r["facet"]] = True
        else:
            vals[r["facet"]].append(r["value"])

    f = facet_columns(docmeta_full, facets)
    cond = F.lit(False)
    for fc in tf:
        if vals[fc.name]:
            cond = cond | F.col(fc.name).cast("string").isin(vals[fc.name])
        if null_changed[fc.name]:
            cond = cond | F.col(fc.name).isNull()
    # filter on the faceted frame, then project back to the ORIGINAL
    # docmeta columns: the rollup re-derives facets itself, and feeding it
    # already-derived columns would double-apply self-referencing selectors.
    # Only the per-facet aggregate runs here — toc_rollup's global-row legs
    # (full count + TakeOrderedAndProject) would be discarded by the
    # semi-join anyway. Joins are null-safe on value so (facet, NULL)
    # buckets recompute/carry over correctly.
    pruned = f.filter(cond).select(*docmeta_full.columns)
    per_facet = toc_per_facet(pruned, facets)
    recomputed = per_facet.join(
        F.broadcast(buckets),
        (per_facet["facet"] == buckets["facet"])
        & per_facet["value"].eqNullSafe(buckets["value"]),
        "left_semi",
    )

    # global row: retract old contributions, apply new ones. The change
    # set is aggregated EXECUTOR-side into two single-row frames (a
    # collect_set of retracted uris, a collect_list of added doc structs)
    # and cross-joined onto the one global row — no driver-side literals,
    # so the plan size is independent of how many docs changed. The arrays
    # in flight are bounded by global_cap + |changes| (the stored list is
    # capped and the result is re-capped below).
    retract = old_changed.agg(
        F.collect_set("uri").alias("_gone"),
        F.count(F.lit(1)).alias("_n_old"),
    )
    apply_ = new_changed.agg(
        F.collect_list(
            F.struct(
                F.col("title").alias("sort_key"),
                F.col("uri").alias("uri"),
                F.col("title").alias("title"),
            )
        ).alias("_adds"),
        F.count(F.lit(1)).alias("_n_new"),
    )
    # staleness probe: surgery on a FULL capped list cannot resurrect the
    # (cap+1)-th doc after a deletion inside the window — detect exactly that
    # case (old list at cap AND a retracted uri inside it; one tiny job over
    # the single global row) and fall back to an exact recompute of the list.
    stale_rows = (
        old_toc.filter(F.col("facet") == "all")
        .crossJoin(F.broadcast(retract))
        .select(
            (
                (F.size("page_docs") >= global_cap)
                & F.exists(
                    "page_docs",
                    lambda d: F.array_contains(F.col("_gone"), d["uri"]),
                )
            ).alias("stale")
        )
        .collect()
    )
    list_stale = bool(stale_rows and stale_rows[0]["stale"])

    global_base = (
        old_toc.filter(F.col("facet") == "all")
        .crossJoin(F.broadcast(retract))
        .crossJoin(F.broadcast(apply_))
    )
    new_count = (F.col("n_docs") - F.col("_n_old") + F.col("_n_new")).alias(
        "n_docs"
    )
    if list_stale:
        # exact fallback: TakeOrderedAndProject over the skinny (title, uri)
        # projection of the CURRENT corpus — per-partition heap + driver
        # merge, no shuffle; paid only when a deletion actually evicted from
        # a full window (the count stays algebraic/exact either way)
        docs_struct = F.struct(
            F.col("title").alias("sort_key"), F.col("uri"), F.col("title")
        )
        top_global = (
            docmeta_full.select(docs_struct.alias("d"))
            .orderBy("d")
            .limit(global_cap)
            .agg(F.sort_array(F.collect_list("d")).alias("_exact_docs"))
        )
        global_row = global_base.crossJoin(F.broadcast(top_global)).select(
            "facet",
            "value",
            new_count,
            F.col("_exact_docs").alias("page_docs"),
        )
    else:
        global_row = global_base.select(
            "facet",
            "value",
            new_count,
            F.slice(
                F.sort_array(
                    F.concat(
                        F.filter(
                            F.col("page_docs"),
                            lambda d: ~F.array_contains(
                                F.col("_gone"), d["uri"]
                            ),
                        ),
                        F.col("_adds"),
                    )
                ),
                1,
                global_cap,
            ).alias("page_docs"),
        )

    non_global = old_toc.filter(F.col("facet") != "all")
    untouched = non_global.join(
        F.broadcast(buckets),
        (non_global["facet"] == buckets["facet"])
        & non_global["value"].eqNullSafe(buckets["value"]),
        "left_anti",
    )
    return untouched.unionByName(recomputed).unionByName(global_row)


def incremental_feeds(
    docmeta_full: DataFrame,
    old_changed: DataFrame,
    new_changed: DataFrame,
    old_feeds: DataFrame,
    page_size: int = 25,
    facets: tuple[Facet, ...] = DEFAULT_FACETS,
) -> DataFrame:
    """New feedsets table: affected (facet, feed) feeds — the feed-facet
    values of old+new changed rows — recomputed exactly from a value-pruned
    scan; others carried over. A NULL feed value is its own feed
    (feeds_topk windows NULL as a group): the null-safe joins below
    recompute it when any changed row has a NULL value for that facet and
    carry it over otherwise — a plain ``isin`` would silently drop it on
    both paths."""
    ff = feed_facets(facets)
    changed = facet_columns(old_changed, facets).unionByName(
        facet_columns(new_changed, facets)
    )
    legs = [
        changed.select(
            F.lit(fc.name).alias("facet"),
            F.col(fc.name).cast("string").alias("feed"),
        )
        for fc in ff
    ]
    affected = legs[0]
    for leg in legs[1:]:
        affected = affected.unionByName(leg)
    affected = affected.distinct()  # keeps NULL feed rows (distinct, not isin)
    pairs = affected.collect()  # vocabulary-sized
    by_facet: dict[str, list[str]] = {fc.name: [] for fc in ff}
    null_changed: dict[str, bool] = {fc.name: False for fc in ff}
    for r in pairs:
        if r["feed"] is None:
            null_changed[r["facet"]] = True
        else:
            by_facet[r["facet"]].append(r["feed"])

    f = facet_columns(docmeta_full, facets)
    scan_cond = F.lit(False)
    for fc in ff:
        leg_cond = F.col(fc.name).cast("string").isin(by_facet[fc.name])
        if null_changed[fc.name]:
            leg_cond = leg_cond | F.col(fc.name).isNull()
        scan_cond = scan_cond | leg_cond
    # the pruned scan includes every doc contributing to ANY affected feed;
    # docs in it also contribute partial rows to UNaffected feeds of other
    # facets — the semi-join keeps only fully-recomputed feeds. (Filter on
    # the faceted frame, project back to original columns: feeds_topk
    # re-derives facets itself.)
    pruned = f.filter(scan_cond).select(*docmeta_full.columns)
    recomputed = feeds_topk(pruned, page_size, facets)
    on = (recomputed["facet"] == affected["facet"]) & recomputed[
        "feed"
    ].eqNullSafe(affected["feed"])
    recomputed = recomputed.join(F.broadcast(affected), on, "left_semi")

    keep_on = (old_feeds["facet"] == affected["facet"]) & old_feeds[
        "feed"
    ].eqNullSafe(affected["feed"])
    untouched = old_feeds.join(F.broadcast(affected), keep_on, "left_anti")
    return untouched.unionByName(recomputed)


def invalidated_docs(deps: DataFrame, changed_uris: DataFrame) -> DataFrame:
    """Dependency-driven invalidation ([ref: relate_dependencies]): docs
    whose generated output embeds data from a changed doc → must regenerate.
    ``deps`` is the (src_doc, dep_uri) edge table from
    rollups.relate_dependencies; returns distinct src_doc rows."""
    return (
        deps.join(
            changed_uris.withColumnRenamed(changed_uris.columns[0], "dep_uri"),
            "dep_uri",
            "left_semi",
        )
        .select(F.col(deps.columns[0]).alias("uri"))
        .distinct()
    )
