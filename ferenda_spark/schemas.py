"""Fixed explicit schemas for every stage table (SURVEY §1.1/§1.2).

The reference is schemaless (rdflib graphs + duck-typed element trees
[ref: ferenda/document.py :: Document], [ref: ferenda/elements/__init__.py]);
the idiomatic-Spark move is static schemas everywhere. Element-tree nesting
is bounded at depth 3 (section → paragraph → ref) per SURVEY §7.4; deeper
structure is carried losslessly in ``ordinal_path``-style string ordinals.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- vocabulary
# RDF vocabulary constants (public dcterms / rdf / bibo namespaces, the same
# ones the reference's render step emits [ref: ferenda/documentrepository.py]).
DCTERMS = "http://purl.org/dc/terms/"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
BIBO = "http://purl.org/ontology/bibo/"

P_TITLE = DCTERMS + "title"
P_ISSUED = DCTERMS + "issued"
P_LANGUAGE = DCTERMS + "language"
P_IS_PART_OF = DCTERMS + "isPartOf"
P_REFERENCES = DCTERMS + "references"
P_SUBJECT = DCTERMS + "subject"
P_TYPE = RDF_NS + "type"
T_DOCUMENT = BIBO + "Document"
T_DOCPART = BIBO + "DocumentPart"

KG_BASE = "https://kg.example.org"

# ------------------------------------------------------------------- corpus
# input_hint schema, authoritative: Common-Crawl-style web pages.
CORPUS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

# ------------------------------------------------------------------- parsed
# One row per document out of the parse stage, PLUS one metrics row per
# Arrow batch (kind='metrics') that feeds the lineage table (SURVEY A5).
REF_STRUCT = T.StructType(
    [
        T.StructField("text", T.StringType(), True),
        T.StructField("uri", T.StringType(), True),
        T.StructField("kind", T.StringType(), True),  # url | eulaw | entity
        T.StructField("span_start", T.IntegerType(), True),
        T.StructField("span_end", T.IntegerType(), True),
    ]
)

PARA_STRUCT = T.StructType(
    [
        T.StructField("idx", T.IntegerType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("refs", T.ArrayType(REF_STRUCT), True),
    ]
)

SECTION_STRUCT = T.StructType(
    [
        T.StructField("ordinal", T.IntegerType(), True),  # top-level number
        # dotted nesting path, e.g. "2", "2.1", "2.1.3" — bounded-depth
        # structs carry recursion losslessly in the path (SURVEY §7.4);
        # the flat list is in document order, fsm.nest_sections rebuilds
        # the tree
        T.StructField("ordinal_path", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("paras", T.ArrayType(PARA_STRUCT), True),
    ]
)

# Compact per-doc triple encoding inside the parse output. Full (subj, pred,
# obj) strings repeat the url and predicate vocabulary per element, which
# made the triples array the dominant Arrow-transfer + stage-table cost
# (~5.5 KB/doc vs ~1.3 KB compact). `operators.triples.assemble_triples`
# expands to full URIs JVM-side (pure column expressions).
#   s:  section ordinal_path ("2", "2.1", …); '' = the document itself
#   p:  predicate code — t=title d=issued l=language y=rdf:type
#       i=isPartOf r=references
#   obj: only where not derivable from the row (section titles, ref targets);
#        '' for l/i/y/d and the doc-level title (taken from row columns)
TRIPLE_STRUCT = T.StructType(
    [
        T.StructField("s", T.StringType(), True),
        T.StructField("p", T.StringType(), True),
        T.StructField("obj", T.StringType(), True),
    ]
)

MENTION_STRUCT = T.StructType(
    [
        T.StructField("section_ordinal", T.StringType(), True),
        T.StructField("mention", T.StringType(), True),
        T.StructField("alias_key", T.StringType(), True),  # normalized join key
    ]
)

PARSED = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),  # 'doc' | 'metrics'
        T.StructField("url", T.StringType(), True),
        T.StructField("part_key", T.IntegerType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("issued", T.TimestampType(), True),
        T.StructField("text_sha256", T.StringType(), True),
        T.StructField("n_sections", T.IntegerType(), True),
        T.StructField("n_paras", T.IntegerType(), True),
        T.StructField("sections", T.ArrayType(SECTION_STRUCT), True),
        T.StructField("triples", T.ArrayType(TRIPLE_STRUCT), True),
        T.StructField("mentions", T.ArrayType(MENTION_STRUCT), True),
        # metrics-row fields (null on doc rows)
        T.StructField("m_partition_id", T.IntegerType(), True),
        T.StructField("m_n_in", T.LongType(), True),
        T.StructField("m_n_triples", T.LongType(), True),
        T.StructField("m_bytes_in", T.LongType(), True),
        T.StructField("m_wall_ms", T.LongType(), True),
    ]
)

# ------------------------------------------------------------------- triples
# The central fact table (SPO and POS layouts share this schema; they differ
# only in partition/sort layout — SURVEY §1.1 row 3, §4.3).
TRIPLES = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("obj_is_uri", T.BooleanType(), False),
        T.StructField("obj_lang", T.StringType(), True),
        T.StructField("obj_dtype", T.StringType(), True),
        T.StructField("src_url", T.StringType(), True),
        T.StructField("part_key", T.IntegerType(), False),
    ]
)

# ---------------------------------------------------------------- dictionary
URI_DICTIONARY = T.StructType(
    [
        T.StructField("alias", T.StringType(), False),
        T.StructField("alias_key", T.StringType(), False),
        T.StructField("canonical_uri", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("is_exact", T.BooleanType(), False),
    ]
)

# -------------------------------------------------------------------- ledger
# Checkpoint/lineage (north_rule: per-partition lineage rows + metrics;
# resume restarts at the last completed partition).
LEDGER = T.StructType(
    [
        T.StructField("stage", T.StringType(), False),
        T.StructField("part_key", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),  # ok | failed
        T.StructField("n_in", T.LongType(), True),
        T.StructField("n_out", T.LongType(), True),
        T.StructField("wall_ms", T.LongType(), True),
        T.StructField("run_id", T.StringType(), True),
        T.StructField("finished", T.TimestampType(), True),
    ]
)

LINEAGE = T.StructType(
    [
        T.StructField("stage", T.StringType(), False),
        T.StructField("part_key", T.IntegerType(), True),
        T.StructField("partition_id", T.IntegerType(), True),
        T.StructField("n_in", T.LongType(), True),
        T.StructField("n_out", T.LongType(), True),
        T.StructField("bytes_in", T.LongType(), True),
        T.StructField("wall_ms", T.LongType(), True),
        T.StructField("run_id", T.StringType(), True),
    ]
)

# golden / fixture schemas
GOLDEN_TRIPLES = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("obj_is_uri", T.BooleanType(), False),
    ]
)

GOLDEN_LINKS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("mention", T.StringType(), False),
        T.StructField("canonical_uri", T.StringType(), False),
    ]
)
