"""N-Triples sink/source — the RDF interchange layer.

Reference analog: ferenda materializes each document's metadata graph as
a `distilled/{basefile}.rdf` file ([ref: ferenda/documentstore.py ::
DocumentStore.distilled_path]) so external consumers (triplestores, other
pipelines) can load it. At corpus scale the interchange format of choice
is N-Triples — line-oriented, splittable, the format Wikidata/DBpedia
dumps and every bulk loader speak. This module converts the TRIPLES-schema
tables to and from canonical NT lines with PURE COLUMN EXPRESSIONS — the
serialization of a 10^12-triple table is a map-only codegen'd projection,
and parsing a dump back is regexp_extract + a constant number of literal
replaces per line, no UDFs anywhere.

Escaping (N-Triples ECHAR set): ``\\`` ``\"`` ``\n`` ``\r`` ``\t``, applied
in that order; unescaping runs in reverse with a NUL sentinel for the
escaped backslash (raw control characters are forbidden in NT input, so
the sentinel cannot collide). Terms are assumed well-formed URIs (no
raw ``>`` or whitespace — ours are minted by uris.py); malformed input
lines surface as ``kind='nt_error'`` rows, never exceptions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SENTINEL = "\x00"
_LINE_RE = r'^<([^>]*)> <([^>]*)> (.*) \.$'
_LIT_RE = r'^"(.*)"(@[A-Za-z][A-Za-z0-9-]*|\^\^<[^>]*>)?$'


def _esc(col: Column) -> Column:
    out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    for raw, esc in (('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t")):
        out = F.replace(out, F.lit(raw), F.lit(esc))
    return out


def _unesc(col: Column) -> Column:
    out = F.replace(col, F.lit("\\\\"), F.lit(_SENTINEL))
    for raw, esc in (('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t")):
        out = F.replace(out, F.lit(esc), F.lit(raw))
    return F.replace(out, F.lit(_SENTINEL), F.lit("\\"))


def to_ntriples_lines(triples: DataFrame, *, line_col: str = "line") -> DataFrame:
    """All input columns + ``line``: the canonical N-Triples rendering of
    (subj, pred, obj, obj_is_uri, obj_lang, obj_dtype). ``@lang`` wins
    over ``^^dtype`` when both are set (NT literals carry at most one,
    and rdf:langString's datatype is implied by the tag)."""
    lit_term = F.concat(
        F.lit('"'),
        _esc(F.col("obj")),
        F.lit('"'),
        F.when(
            F.col("obj_lang").isNotNull(), F.concat(F.lit("@"), F.col("obj_lang"))
        )
        .when(
            F.col("obj_dtype").isNotNull(),
            F.concat(F.lit("^^<"), F.col("obj_dtype"), F.lit(">")),
        )
        .otherwise(F.lit("")),
    )
    obj_term = F.when(
        F.col("obj_is_uri"), F.concat(F.lit("<"), F.col("obj"), F.lit(">"))
    ).otherwise(lit_term)
    return triples.withColumn(
        line_col,
        F.concat(
            F.lit("<"), F.col("subj"), F.lit("> <"), F.col("pred"),
            F.lit("> "), obj_term, F.lit(" ."),
        ),
    )


def parse_ntriples_lines(
    lines: DataFrame, *, line_col: str = "line"
) -> DataFrame:
    """NT lines → ``(subj, pred, obj, obj_is_uri, obj_lang, obj_dtype,
    kind)`` with ``kind`` = 'triple' | 'nt_error' (malformed lines keep
    their bytes in ``obj`` for triage — errors-as-data, the ingest-wide
    contract). Blank lines and ``#`` comments are dropped per spec."""
    line = F.col(line_col)
    kept = lines.filter(
        (F.trim(line) != "") & ~F.trim(line).startswith("#")
    )
    m = kept.select(
        line.alias("_raw"),
        F.regexp_extract(line, _LINE_RE, 1).alias("subj"),
        F.regexp_extract(line, _LINE_RE, 2).alias("pred"),
        F.regexp_extract(line, _LINE_RE, 3).alias("_term"),
        line.rlike(_LINE_RE).alias("_ok"),
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
            F.col("_ok") & (is_uri | lit_ok), F.lit("triple")
        ).otherwise(F.lit("nt_error")).alias("kind"),
    )


def write_ntriples(triples: DataFrame, path: str, *, compress: bool = True) -> None:
    """One-column text write of the NT lines; gzip by default (NT dumps
    compress ~10x and text sources split per file — parallelism is the
    file count, controlled by the upstream partitioning)."""
    lines = to_ntriples_lines(triples).select("line")
    w = lines.write.mode("overwrite")
    if compress:
        w = w.option("compression", "gzip")
    w.text(path)


def read_ntriples(spark, path: str) -> DataFrame:
    """Text-source read + parse (gzip transparent). Each file is one
    task; shard the dump for parallelism."""
    return parse_ntriples_lines(
        spark.read.text(path).withColumnRenamed("value", "line")
    )
