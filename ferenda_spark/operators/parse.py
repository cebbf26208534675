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
    title = ctx["title"]
    issued = pd.Timestamp(warc_ts)

    # Compact triple encoding (schemas.TRIPLE_STRUCT): (section, pred-code,
    # obj-if-not-derivable); assemble_triples expands to full URIs JVM-side.
    # RDF graphs are triple SETS, so dedup doc-locally — the expanded subj
    # embeds the url, making doc-local dedup equal to global dedup for
    # grammar triples; that is what lets assemble_triples skip a corpus-wide
    # dropDuplicates shuffle.
    triples: list[dict] = [
        dict(s=-1, p="t", obj=""),  # dcterms:title      <- row.title
        dict(s=-1, p="d", obj=""),  # dcterms:issued     <- row.issued
        dict(s=-1, p="l", obj=""),  # dcterms:language   <- row.lang
        dict(s=-1, p="y", obj=""),  # rdf:type Document
    ]
    seen_refs: set[tuple] = set()
    seen_mentions: set[tuple] = set()
    mentions: list[dict] = []
    n_paras = 0
    state = {"act": None}  # document-local refparser context (T6)
    sections_out = [] if with_sections else None
    for sec in ctx["sections"]:
        k = sec["ordinal"]
        triples.append(dict(s=k, p="y", obj=""))  # rdf:type DocumentPart
        triples.append(dict(s=k, p="i", obj=""))  # isPartOf <- url
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
                dict(ordinal=k, title=sec["title"], paras=paras_out)
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
        text_sha256=sha,
        n_sections=len(ctx["sections"]),
        n_paras=n_paras,
        sections=sections_out,
        triples=triples,
        mentions=mentions,
        **_DOC_NULLS,
    )


def _parse_batches(
    batches: Iterator[pd.DataFrame], with_sections: bool = True
) -> Iterator[pd.DataFrame]:
    from pyspark import TaskContext

    tc = TaskContext.get()
    pid = tc.partitionId() if tc is not None else -1
    for pdf in batches:
        t0 = time.monotonic()
        rows = [
            _parse_one(u, ts, h, lg, pk, with_sections)
            for u, ts, h, lg, pk in zip(
                pdf["url"], pdf["warc_ts"], pdf["html"], pdf["lang"], pdf["part_key"]
            )
        ]
        wall_ms = int((time.monotonic() - t0) * 1000)
        rows.append(
            dict(
                kind="metrics",
                url=None,
                part_key=int(pdf["part_key"].iloc[0]) if len(pdf) else None,
                title=None, lang=None, issued=None, text_sha256=None,
                n_sections=None, n_paras=None,
                sections=None, triples=None, mentions=None,
                m_partition_id=pid,
                m_n_in=len(pdf),
                m_n_triples=sum(len(r["triples"]) for r in rows),
                m_bytes_in=int(sum(len(b) for b in pdf["html"])),
                m_wall_ms=wall_ms,
            )
        )
        yield pd.DataFrame(rows)


def parse_stage(
    corpus: DataFrame, n_parts: int = 64, with_sections: bool = True
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
    fn = (
        _parse_batches
        if with_sections
        else (lambda it: _parse_batches(it, with_sections=False))
    )
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
