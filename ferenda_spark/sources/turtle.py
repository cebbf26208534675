"""Turtle (compact, grouped) serialization — the human-facing RDF sink.

Reference analog: ferenda's distilled per-document RDF files are meant to
be READ by people debugging the pipeline as much as loaded by stores; the
line-oriented N-Triples/N-Quads sinks (ntriples.py, nquads.py) optimize
for splittable bulk interchange, while this module emits the compact
Turtle form — one subject block with ``;``-grouped predicates and
``,``-grouped objects — that graph debuggers, documentation, and diff
reviews want.

Serialize-only by design: Turtle PARSING needs a real tokenizer (prefix
resolution, multiline literals, collections) and the bulk read path is
already served by the strict NT/NQ parsers; a dump written here reloads
through them after an `rapper`/`riot` conversion, or simply by writing NT
alongside. (Same stance as the XHTML sink — a presentation surface, not
an ingest format.)

Shape: everything is codegen'd column expressions — the object terms are
EXACTLY ntriples.py's (shared escape chain), grouping is two
map-side-combinable aggregations (subj,pred → sorted object list; subj →
sorted predicate list), deterministic by construction and replayable in
SQL via two nested string_agg(... ORDER BY ...) levels. One output row
per subject; at 10^12 triples the grouping is the same shuffle the SPO
sort already pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ntriples import to_ntriples_lines


def to_turtle_lines(triples: DataFrame, *, line_col: str = "line") -> DataFrame:
    """→ ``(subj, line)`` — one compact Turtle statement per subject:

        <s> <p1> o1 , o2 ; <p2> o3 .

    Objects sort by their serialized term, predicates by IRI — the output
    is a pure function of the triple SET (insertion order never shows)."""
    # reuse the NT line to extract the canonical object term: the NT line
    # is '<s> <p> TERM .', so TERM = line minus the subject/pred prefix
    # and the ' .' suffix. Cheaper and safer than re-deriving the literal
    # escape chain here.
    nt = to_ntriples_lines(triples, line_col="_nt")
    # NT line = '<'+s+'> <'+p+'> '+TERM+' .': TERM starts at
    # len(s)+len(p)+7 (1-indexed) and spans len(line)-len(s)-len(p)-8
    term = F.expr(
        "substring(_nt, length(subj) + length(pred) + 7, "
        "length(_nt) - length(subj) - length(pred) - 8)"
    )
    terms = nt.select("subj", "pred", term.alias("term"))
    per_pred = terms.groupBy("subj", "pred").agg(
        F.concat_ws(" , ", F.sort_array(F.collect_list("term"))).alias("objs")
    )
    per_subj = per_pred.select(
        "subj",
        F.concat(F.lit("<"), F.col("pred"), F.lit("> "), F.col("objs")).alias(
            "pv"
        ),
        "pred",
    ).groupBy("subj").agg(
        F.concat_ws(
            " ; ",
            F.sort_array(F.collect_list(F.struct("pred", "pv"))).getField("pv"),
        ).alias("body")
    )
    return per_subj.select(
        "subj",
        F.concat(
            F.lit("<"), F.col("subj"), F.lit("> "), F.col("body"), F.lit(" .")
        ).alias(line_col),
    )


def write_turtle(triples: DataFrame, path: str, *, compress: bool = True) -> None:
    """One-column text write of the Turtle lines (gzip default)."""
    lines = to_turtle_lines(triples).select("line")
    w = lines.write.mode("overwrite")
    if compress:
        w = w.option("compression", "gzip")
    w.text(path)
