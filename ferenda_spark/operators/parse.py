"""The parse stage: html → text → structure → triples + mentions.

This is the Spark restatement of the reference's
``@managedparsing``-wrapped parse driver ([ref: ferenda/decorators.py ::
managedparsing], SURVEY §3 E1): ONE ``mapInPandas`` pass per document batch
doing extract (S6) + FSM structure recovery (T2) + citation/refparse
(T3/T6) + metadata triple emission (T8), vectorized across documents via
Arrow batches, sequential within a document.

Design for 100 TB:
- no shuffle: this stage is map-only; part_key is computed JVM-side before
  the UDF and carried through, so the downstream partitioned write needs no
  extra repartition when the input was already read partition-aligned.
- per-batch metrics rows (kind='metrics') carry partition-local lineage out
  of the executors without a second pass (SURVEY A5) — filter-split after.
- entity mentions are NOT resolved here (that needs the dictionary join —
  operators/linking.py); grammar-resolvable refs (url/eulaw/article) are.
"""

from __future__ import annotations

import hashlib
import time
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ferenda_spark.functions.extract import extract_text
from ferenda_spark.functions.uris import normalize_alias, part_key_col
from ferenda_spark.operators.citations import scan_paragraph
from ferenda_spark.operators.fsm import parse_structure
from ferenda_spark.schemas import PARSED

_DOC_NULLS = dict(
    m_partition_id=None, m_n_in=None, m_n_triples=None, m_bytes_in=None, m_wall_ms=None
)


def _parse_one(
    url: str, warc_ts, html: bytes, lang: str, part_key: int,
    with_sections: bool = True,
) -> dict:
    text = extract_text(html)
    sha = hashlib.sha256(text.encode("utf-8")).hexdigest()
    ctx = parse_structure(text)
    return doc_row_from_ctx(
        url, pd.Timestamp(warc_ts), lang, part_key, ctx, sha,
        with_sections=with_sections,
    )


def doc_row_from_ctx(
    url: str, issued, lang: str, part_key: int, ctx: dict, text_sha: str,
    with_sections: bool = True,
) -> dict:
    """Structure ctx ({title, sections}) → one PARSED doc row: citation/
    refparse over every paragraph, compact metadata+structure triple
    emission, entity-mention collection. Shared by the HTML parse stage
    (webpage grammar) and the DOCX path (styled grammar) so both corpora
    produce identical downstream shapes."""
    title = ctx["title"]

    # Compact triple encoding (schemas.TRIPLE_STRUCT): (section, pred-code,
    # obj-if-not-derivable); assemble_triples expands to full URIs JVM-side.
    # RDF graphs are triple SETS, so dedup doc-locally — the expanded subj
    # embeds the url, making doc-local dedup equal to global dedup for
    # grammar triples; that is what lets assemble_triples skip a corpus-wide
    # dropDuplicates shuffle.
    triples: list[dict] = [
        dict(s="", p="t", obj=""),  # dcterms:title      <- row.title
        dict(s="", p="d", obj=""),  # dcterms:issued     <- row.issued
        dict(s="", p="l", obj=""),  # dcterms:language   <- row.lang
        dict(s="", p="y", obj=""),  # rdf:type Document
    ]
    seen_refs: set[tuple] = set()
    seen_mentions: set[tuple] = set()
    mentions: list[dict] = []
    n_paras = 0
    state = {"act": None}  # document-local refparser context (T6)
    sections_out = [] if with_sections else None
    for sec in ctx["sections"]:
        k = sec["ordinal_path"]  # "2" | "2.1" | "2.1.3" — nesting in the path
        triples.append(dict(s=k, p="y", obj=""))  # rdf:type DocumentPart
        triples.append(dict(s=k, p="i", obj=""))  # isPartOf <- parent node
        triples.append(dict(s=k, p="t", obj=sec["title"]))
        paras_out = [] if with_sections else None
        for para in sec["paras"]:
            n_paras += 1
            refs = scan_paragraph(para["text"], state)
            refs_out = [] if with_sections else None
            for r in refs:
                if with_sections:
                    refs_out.append(
                        dict(text=r.text, uri=r.uri, kind=r.kind,
                             span_start=r.start, span_end=r.end)
                    )
                if r.kind == "entity":
                    mk = (k, r.text)
                    if mk not in seen_mentions:  # same surface form in same
                        seen_mentions.add(mk)  # section links identically
                        mentions.append(
                            dict(section_ordinal=k, mention=r.text,
                                 alias_key=normalize_alias(r.text))
                        )
                else:
                    rk = (k, r.uri)
                    if rk not in seen_refs:
                        seen_refs.add(rk)
                        triples.append(dict(s=k, p="r", obj=r.uri))
            if with_sections:
                paras_out.append(
                    dict(idx=para["idx"], text=para["text"], refs=refs_out)
                )
        if with_sections:
            sections_out.append(
                dict(ordinal=sec["ordinal"], ordinal_path=k,
                     title=sec["title"], paras=paras_out)
            )

    # order-preserving dedup across ALL compact triples: repeated section
    # ordinals (malformed docs) would otherwise duplicate structural rows
    seen: set[tuple] = set()
    triples = [
        t for t in triples
        if (k := (t["s"], t["p"], t["obj"])) not in seen and not seen.add(k)
    ]

    return dict(
        kind="doc",
        url=url,
        part_key=int(part_key),
        title=title,
        lang=lang,
        issued=issued,
        text_sha256=text_sha,
        n_sections=len(ctx["sections"]),
        n_paras=n_paras,
        sections=sections_out,
        triples=triples,
        mentions=mentions,
        **_DOC_NULLS,
    )


def _parse_batches(
    batches: Iterator[pd.DataFrame],
    with_sections: bool = True,
    metrics_acc=None,
) -> Iterator[pd.DataFrame]:
    from pyspark import TaskContext

    tc = TaskContext.get()
    pid = tc.partitionId() if tc is not None else -1
    attempt = tc.attemptNumber() if tc is not None else 0
    # task-local per-part_key totals, shipped ONCE via the accumulator when
    # the input is exhausted (O(part_keys-per-task) tuples, not per-batch)
    totals: dict[int, list[int]] = {}
    for pdf in batches:
        all_rows: list[dict] = []
        # metrics are attributed per part_key: an Arrow batch can span
        # part_keys (the stage is map-only, input partitioning is the
        # upstream source's), so a single per-batch row keyed on the first
        # row's part_key would mis-attribute n_in/bytes/wall
        for pk, g in pdf.groupby("part_key", sort=False):
            t0 = time.monotonic()
            rows = [
                _parse_one(u, ts, h, lg, pk_, with_sections)
                for u, ts, h, lg, pk_ in zip(
                    g["url"], g["warc_ts"], g["html"], g["lang"], g["part_key"]
                )
            ]
            wall_ms = int((time.monotonic() - t0) * 1000)
            n_triples = sum(len(r["triples"]) for r in rows)
            bytes_in = int(sum(len(b) for b in g["html"]))
            if metrics_acc is None:
                # in-band metrics rows serve split_parsed consumers (the
                # streaming path); with an accumulator the pipeline gets
                # the same totals out-of-band — don't build+ship both
                rows.append(
                    dict(
                        kind="metrics",
                        url=None,
                        part_key=int(pk),
                        title=None, lang=None, issued=None, text_sha256=None,
                        n_sections=None, n_paras=None,
                        sections=None, triples=None, mentions=None,
                        m_partition_id=pid,
                        m_n_in=len(g),
                        m_n_triples=n_triples,
                        m_bytes_in=bytes_in,
                        m_wall_ms=wall_ms,
                    )
                )
            if metrics_acc is not None:
                t = totals.setdefault(int(pk), [0, 0, 0, 0])
                t[0] += len(g)
                t[1] += n_triples
                t[2] += bytes_in
                t[3] += wall_ms
            all_rows.extend(rows)
        if all_rows:
            yield pd.DataFrame(all_rows)
    if metrics_acc is not None and totals:
        metrics_acc.add(
            [
                (pid, attempt, pk, t[0], t[1], t[2], t[3])
                for pk, t in totals.items()
            ]
        )


class ParseMetrics:
    """Driver-side collector for the parse stage's in-UDF metrics (SURVEY
    A5, north_rule "per-partition lineage + metrics").

    The UDF ships one (partition_id, attempt, part_key, n_in, n_triples,
    bytes_in, wall_ms) tuple per (task, part_key) through a Spark
    accumulator when its input stream ends — so the metrics ride the SAME
    single parse pass that writes the docs table, instead of a second pass
    (which would re-parse) or a NULL re-aggregate (which loses bytes/wall).
    Volume is O(tasks × part_keys-per-task) small tuples, never doc data.

    Exactly-once: accumulator updates from transformations can be applied
    once per SUCCESSFUL attempt, and stage retries / speculative execution
    can complete the same partition twice — ``lineage_rows`` dedups by
    keeping, per (partition_id, part_key), the highest attempt's tuple."""

    def __init__(self, spark):
        from pyspark import AccumulatorParam

        class _P(AccumulatorParam):
            def zero(self, v):
                return []

            def addInPlace(self, a, b):
                a.extend(b)
                return a

        self.acc = spark.sparkContext.accumulator([], _P())

    def add(self, tuples):  # worker side
        self.acc.add(tuples)

    def lineage_rows(self) -> list[tuple]:
        """(partition_id, part_key, n_in, n_out, bytes_in, wall_ms) rows,
        deduped across retried attempts."""
        best: dict[tuple[int, int], tuple] = {}
        for pid, attempt, pk, n_in, n_tr, b_in, wall in self.acc.value:
            key = (pid, pk)
            if key not in best or attempt > best[key][0]:
                best[key] = (attempt, n_in, n_tr, b_in, wall)
        return [
            (pid, pk, v[1], v[2], v[3], v[4])
            for (pid, pk), v in sorted(best.items())
        ]

    def lineage_df(self, spark, stage: str = "parse", run_id: str = "run") -> DataFrame:
        rows = [
            (stage, pk, pid, n_in, n_out, b_in, wall, run_id)
            for pid, pk, n_in, n_out, b_in, wall in self.lineage_rows()
        ]
        return spark.createDataFrame(
            rows,
            "stage string, part_key int, partition_id int, n_in long, "
            "n_out long, bytes_in long, wall_ms long, run_id string",
        )


def parse_stage(
    corpus: DataFrame,
    n_parts: int = 64,
    with_sections: bool = True,
    metrics: ParseMetrics | None = None,
) -> DataFrame:
    """corpus (input_hint schema) → PARSED rows (docs + metrics).

    ``n_parts`` is the logical domain-hash partition count for the stage
    tables — at 100 TB this is O(10^4); locally it stays small so each
    partition holds enough rows to amortize Arrow batch overhead.

    ``with_sections=False`` skips building the nested doc_struct column —
    the sections tree repeats the full document text, so a consumer that
    only needs triples+mentions (the KG DAG) halves its Arrow/stage bytes
    by turning it off.
    """
    with_key = corpus.withColumn("part_key", part_key_col(F.col("url"), n_parts))
    cols = ["url", "warc_ts", "html", "lang", "part_key"]
    acc = metrics  # close over the wrapper; .add() goes through the accumulator

    def fn(it):
        return _parse_batches(it, with_sections=with_sections, metrics_acc=acc)

    return with_key.select(cols).mapInPandas(fn, schema=PARSED)


def split_parsed(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(doc rows, lineage rows) — single source, filter-split."""
    docs = parsed.filter(F.col("kind") == "doc").drop(
        "kind", *[c for c in parsed.columns if c.startswith("m_")]
    )
    lineage = (
        parsed.filter(F.col("kind") == "metrics")
        .select(
            F.lit("parse").alias("stage"),
            F.col("part_key"),
            F.col("m_partition_id").alias("partition_id"),
            F.col("m_n_in").alias("n_in"),
            F.col("m_n_triples").alias("n_out"),
            F.col("m_bytes_in").alias("bytes_in"),
            F.col("m_wall_ms").alias("wall_ms"),
        )
    )
    return docs, lineage
