"""R2RML-lite — declarative relational→RDF mapping.

Reference analog: ferenda constructs metadata graphs in code via the
Describer fluent API ([ref: ferenda/describer.py :: Describer] —
``value()``/``rel()``/``rdftype()`` per document). The declarative
equivalent for STRUCTURED sources (a crawl-metadata table, a vendor
catalog, the TPC-H side tables in this sandbox) is W3C R2RML: a mapping
document that says which table becomes which class, how subjects are
minted, and which columns become which predicates. This module implements
the useful core of that vocabulary over DataFrames:

    TableMapping(
        subject_template="ent:{n_nationkey}",   # {col} substitution
        class_uri="c:Nation",                   # optional rdf:type row
        predicates=[
            ColumnMap("p:name", "n_name"),                    # literal
            ColumnMap("p:region", "region:{n_regionkey}",
                      template=True, is_uri=True),            # object ref
            ColumnMap("p:comment", "n_comment",
                      lang="en"),                             # lang literal
            ColumnMap("p:key", "n_nationkey",
                      dtype=XSD_INTEGER),                     # typed literal
        ],
    )

Everything compiles to ONE projection + explode per table — a map-only,
codegen'd plan with zero UDFs and zero shuffles; NULL column values emit
no triple (R2RML semantics). Output is the TRIPLES schema, so mapped
graphs flow straight into sameAs canonicalization / inference /
validation / SPARQL / the N-Triples sink.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD_INTEGER = "http://www.w3.org/2001/XMLSchema#integer"
XSD_DECIMAL = "http://www.w3.org/2001/XMLSchema#decimal"
XSD_DATE = "http://www.w3.org/2001/XMLSchema#date"

_TPL_RE = re.compile(r"\{([A-Za-z_][A-Za-z0-9_]*)\}")


def _template_col(template: str) -> Column:
    """'ent:{a}/{b}' → concat(lit('ent:'), col(a), lit('/'), col(b)).
    A row whose template references a NULL column emits nothing (concat
    returns NULL and the triple row is filtered) — R2RML's term-map rule."""
    parts: list[Column] = []
    pos = 0
    for m in _TPL_RE.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos:m.start()]))
        parts.append(F.col(m.group(1)).cast("string"))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    if not parts:
        parts = [F.lit("")]
    return F.concat(*parts)


@dataclass(frozen=True)
class ColumnMap:
    pred: str
    source: str                 # column name, or a template when template=True
    template: bool = False
    is_uri: bool = False
    lang: str | None = None
    dtype: str | None = None


@dataclass(frozen=True)
class TableMapping:
    subject_template: str
    predicates: list[ColumnMap] = field(default_factory=list)
    class_uri: str | None = None


def map_table(
    df: DataFrame,
    mapping: TableMapping,
    *,
    src_url: str | None = None,
    n_parts: int = 64,
) -> DataFrame:
    """Apply one TableMapping → TRIPLES-schema frame. part_key is the
    domain hash of the subject (same layout as grammar triples);
    src_url records the mapping provenance (e.g. the source table name)."""
    from ferenda_spark.functions.uris import part_key_col

    subj = _template_col(mapping.subject_template)
    null_s = F.lit(None).cast("string")

    terms = []
    if mapping.class_uri is not None:
        terms.append(
            F.struct(
                F.lit(RDF_TYPE).alias("pred"),
                F.lit(mapping.class_uri).alias("obj"),
                F.lit(True).alias("obj_is_uri"),
                null_s.alias("obj_lang"),
                null_s.alias("obj_dtype"),
            )
        )
    for cm in mapping.predicates:
        obj = _template_col(cm.source) if cm.template else F.col(cm.source).cast("string")
        terms.append(
            F.struct(
                F.lit(cm.pred).alias("pred"),
                obj.alias("obj"),
                F.lit(cm.is_uri).alias("obj_is_uri"),
                (F.lit(cm.lang) if cm.lang else null_s).alias("obj_lang"),
                (F.lit(cm.dtype) if cm.dtype else null_s).alias("obj_dtype"),
            )
        )

    exploded = (
        df.select(subj.alias("subj"), F.explode(F.array(*terms)).alias("t"))
        .select("subj", "t.pred", "t.obj", "t.obj_is_uri", "t.obj_lang",
                "t.obj_dtype")
        .filter(F.col("subj").isNotNull() & F.col("obj").isNotNull())
    )
    return exploded.select(
        "subj", "pred", "obj", "obj_is_uri", "obj_lang", "obj_dtype",
        (F.lit(src_url) if src_url else null_s).alias("src_url"),
        part_key_col(F.col("subj"), n_parts).alias("part_key"),
    )


def map_tables(
    frames: dict[str, tuple[DataFrame, TableMapping]], *, n_parts: int = 64
) -> DataFrame:
    """Union of per-table mappings; the dict key becomes src_url."""
    out = None
    for name, (df, mapping) in frames.items():
        t = map_table(df, mapping, src_url=name, n_parts=n_parts)
        out = t if out is None else out.unionByName(t)
    if out is None:
        raise ValueError("no mappings given")
    return out
