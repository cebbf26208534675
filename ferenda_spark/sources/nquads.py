"""N-Quads sink/source — N-Triples plus a named-graph term.

Reference analog: ferenda keeps per-document metadata graphs in separate
files and loads them into a quad store under a context URI
([ref: ferenda/triplestore.py — `context` parameter on add/clear]); the
north_rule's provenance requirement ("per-partition lineage") needs the
same at corpus scale: every triple travels with the graph that says WHERE
it came from (publisher harvest vs grammar parse vs inference — the
enrichment stage's provenance split). N-Quads is the line-oriented,
splittable dump format for that (the format of Common-Crawl's own WAT-
derived RDF releases and of Wikidata's full dumps).

Same design as ntriples.py, which this module reuses verbatim for term
escaping and literal rendering: serialization is a map-only codegen'd
projection, parse-back is regexp_extract + constant literal replaces,
malformed lines become ``kind='nq_error'`` rows. A missing graph term
parses as the default graph (graph NULL), mirroring the spec's optional
fourth term — so an N-Triples dump reads back through the quad parser
unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ntriples import _LIT_RE, _unesc, to_ntriples_lines

_QLINE_RE = r'^<([^>]*)> <([^>]*)> (.*?)( <[^>]*>)? \.$'


def to_nquads_lines(
    quads: DataFrame, *, graph_col: str = "graph", line_col: str = "line"
) -> DataFrame:
    """All input columns + ``line``: canonical N-Quads. Rows with a NULL
    ``graph`` render as plain N-Triples lines (default graph)."""
    nt = to_ntriples_lines(quads, line_col="_nt")
    g = F.col(graph_col)
    return nt.withColumn(
        line_col,
        F.concat(
            F.expr("substring(_nt, 1, length(_nt) - 2)"),  # strip ' .'
            F.when(g.isNotNull(), F.concat(F.lit(" <"), g, F.lit(">")))
            .otherwise(F.lit("")),
            F.lit(" ."),
        ),
    ).drop("_nt")


def parse_nquads_lines(
    lines: DataFrame, *, line_col: str = "line"
) -> DataFrame:
    """NQ lines → ``(subj, pred, obj, obj_is_uri, obj_lang, obj_dtype,
    graph, kind)``; ``kind`` = 'quad' | 'nq_error'. The object-term regex
    is non-greedy with an optional trailing ``<graph>`` group, so a
    literal containing `` <x>`` never leaks into the graph slot (the
    graph term may not contain quotes, and literal escaping keeps raw
    ``"`` out of the rendered object).

    IRI-only restriction (deliberate, same stance as ``ntriples.py``):
    subject and graph terms must be ``<IRI>``s — spec-legal blank-node
    subjects/graphs (``_:b0 …``), which external dumps such as Wikidata's
    do contain, parse as ``kind='nq_error'`` rows rather than quads. This
    pipeline never emits blank nodes (COIN minting skolemizes first); to
    ingest a bnode-bearing external dump, pre-process it through
    ``functions.uris.skolemize_col`` (rewrite ``_:label`` into a
    deterministic ``<.well-known/genid/...>`` IRI per dump file), after
    which every line parses."""
    line = F.col(line_col)
    kept = lines.filter(
        (F.trim(line) != "") & ~F.trim(line).startswith("#")
    )
    m = kept.select(
        line.alias("_raw"),
        F.regexp_extract(line, _QLINE_RE, 1).alias("subj"),
        F.regexp_extract(line, _QLINE_RE, 2).alias("pred"),
        F.regexp_extract(line, _QLINE_RE, 3).alias("_term"),
        F.regexp_extract(line, _QLINE_RE, 4).alias("_g"),
        line.rlike(_QLINE_RE).alias("_ok"),
    )
    term = F.col("_term")
    is_uri = term.startswith("<") & term.endswith(">") & F.col("_ok")
    lit_ok = term.rlike(_LIT_RE)
    suffix = F.regexp_extract(term, _LIT_RE, 2)
    return m.select(
        F.when(F.col("_ok"), F.col("subj")).alias("subj"),
        F.when(F.col("_ok"), F.col("pred")).alias("pred"),
        F.when(is_uri, F.expr("substring(_term, 2, length(_term) - 2)"))
        .when(F.col("_ok") & lit_ok, _unesc(F.regexp_extract(term, _LIT_RE, 1)))
        .otherwise(F.col("_raw"))
        .alias("obj"),
        is_uri.alias("obj_is_uri"),
        F.when(
            F.col("_ok") & lit_ok & suffix.startswith("@"),
            F.substring(suffix, 2, 1 << 20),
        ).alias("obj_lang"),
        F.when(
            F.col("_ok") & lit_ok & suffix.startswith("^^<"),
            F.regexp_extract(suffix, r"^\^\^<([^>]*)>$", 1),
        ).alias("obj_dtype"),
        F.when(
            F.col("_ok") & (F.col("_g") != ""),
            F.expr("substring(_g, 3, length(_g) - 3)"),  # ' <' … '>'
        ).alias("graph"),
        F.when(
            F.col("_ok") & (is_uri | lit_ok), F.lit("quad")
        ).otherwise(F.lit("nq_error")).alias("kind"),
    )


def write_nquads(
    quads: DataFrame, path: str, *, graph_col: str = "graph",
    compress: bool = True,
) -> None:
    """One-column text write of the NQ lines; gzip by default."""
    lines = to_nquads_lines(quads, graph_col=graph_col).select("line")
    w = lines.write.mode("overwrite")
    if compress:
        w = w.option("compression", "gzip")
    w.text(path)


def read_nquads(spark, path: str) -> DataFrame:
    """Text-source read + parse (gzip transparent); one task per file."""
    return parse_nquads_lines(
        spark.read.text(path).withColumnRenamed("value", "line")
    )
