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
from ferenda_spark.functions.uris import normalize_alias, part_key_col, section_uri
from ferenda_spark.operators.citations import scan_paragraph
from ferenda_spark.operators.fsm import parse_structure
from ferenda_spark.schemas import (
    P_IS_PART_OF,
    P_ISSUED,
    P_LANGUAGE,
    P_REFERENCES,
    P_TITLE,
    P_TYPE,
    PARSED,
    T_DOCPART,
    T_DOCUMENT,
)

_DOC_NULLS = dict(
    m_partition_id=None, m_n_in=None, m_n_triples=None, m_bytes_in=None, m_wall_ms=None
)


def _parse_one(url: str, warc_ts, html: bytes, lang: str, part_key: int) -> dict:
    text = extract_text(html)
    sha = hashlib.sha256(text.encode("utf-8")).hexdigest()
    ctx = parse_structure(text)
    title = ctx["title"]
    issued = pd.Timestamp(warc_ts)

    # RDF graphs are triple SETS; dedup doc-locally (subj embeds the url, so
    # doc-local dedup IS global dedup for grammar triples — this is what lets
    # assemble_triples skip a corpus-wide dropDuplicates shuffle).
    triples: list[dict] = [
        dict(subj=url, pred=P_TITLE, obj=title, obj_is_uri=False),
        dict(subj=url, pred=P_ISSUED, obj=issued.strftime("%Y-%m-%d"), obj_is_uri=False),
        dict(subj=url, pred=P_LANGUAGE, obj=lang, obj_is_uri=False),
        dict(subj=url, pred=P_TYPE, obj=T_DOCUMENT, obj_is_uri=True),
    ]
    seen_triples: set[tuple] = {(t["subj"], t["pred"], t["obj"]) for t in triples}
    seen_mentions: set[tuple] = set()
    mentions: list[dict] = []

    def _add_triple(subj: str, pred: str, obj: str, obj_is_uri: bool) -> None:
        k = (subj, pred, obj)
        if k not in seen_triples:
            seen_triples.add(k)
            triples.append(dict(subj=subj, pred=pred, obj=obj, obj_is_uri=obj_is_uri))
    n_paras = 0
    state = {"act": None}  # document-local refparser context (T6)
    sections_out = []
    for sec in ctx["sections"]:
        suri = section_uri(url, sec["ordinal"])
        _add_triple(suri, P_TYPE, T_DOCPART, True)
        _add_triple(suri, P_IS_PART_OF, url, True)
        _add_triple(suri, P_TITLE, sec["title"], False)
        paras_out = []
        for para in sec["paras"]:
            n_paras += 1
            refs = scan_paragraph(para["text"], state)
            refs_out = []
            for r in refs:
                refs_out.append(
                    dict(text=r.text, uri=r.uri, kind=r.kind,
                         span_start=r.start, span_end=r.end)
                )
                if r.kind == "entity":
                    mk = (sec["ordinal"], r.text)
                    if mk not in seen_mentions:  # same surface form in same
                        seen_mentions.add(mk)  # section links identically
                        mentions.append(
                            dict(section_ordinal=sec["ordinal"], mention=r.text,
                                 alias_key=normalize_alias(r.text))
                        )
                else:
                    _add_triple(suri, P_REFERENCES, r.uri, True)
            paras_out.append(dict(idx=para["idx"], text=para["text"], refs=refs_out))
        sections_out.append(
            dict(ordinal=sec["ordinal"], title=sec["title"], paras=paras_out)
        )

    return dict(
        kind="doc",
        url=url,
        part_key=int(part_key),
        title=title,
        lang=lang,
        issued=issued,
        text_sha256=sha,
        n_sections=len(sections_out),
        n_paras=n_paras,
        sections=sections_out,
        triples=triples,
        mentions=mentions,
        **_DOC_NULLS,
    )


def _parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from pyspark import TaskContext

    tc = TaskContext.get()
    pid = tc.partitionId() if tc is not None else -1
    for pdf in batches:
        t0 = time.monotonic()
        rows = [
            _parse_one(u, ts, h, lg, pk)
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


def parse_stage(corpus: DataFrame, n_parts: int = 64) -> DataFrame:
    """corpus (input_hint schema) → PARSED rows (docs + metrics).

    ``n_parts`` is the logical domain-hash partition count for the stage
    tables — at 100 TB this is O(10^4); locally it stays small so each
    partition holds enough rows to amortize Arrow batch overhead.
    """
    with_key = corpus.withColumn("part_key", part_key_col(F.col("url"), n_parts))
    cols = ["url", "warc_ts", "html", "lang", "part_key"]
    return with_key.select(cols).mapInPandas(_parse_batches, schema=PARSED)


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
