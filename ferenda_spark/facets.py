"""Declarative Facet abstraction (SURVEY §1.1, §2.5 A1, §2.6 W1).

Reference analog: ``Facet(rdftype, rdf_predicate, selector, key,
identificator, use_for_toc, use_for_feed)`` — each docrepo declares a list
of Facet objects and the toc pagesets, news feedsets and search facets are
ALL parameterized by that list ([ref: ferenda/facet.py :: Facet;
ferenda/documentrepository.py :: facets, toc_pagesets, news_feedsets]).
Round-1 hardcoded the default three (letter/year/lang) into the rollup
operators; this module restores the reference's extensibility: a user adds
a corpus dimension (publisher, dcterms:creator, …) by appending a Facet,
never by editing an operator.

Spark form: the reference's selector/key are per-document Python callables;
here they are SQL expression strings over the docmeta columns, so facet
computation stays JVM-side inside whole-stage codegen (adding a facet adds
a projection column, not a UDF). ``use_for_toc`` / ``use_for_feed`` mirror
the reference flags: toc buckets come from the toc facets' grouping sets,
feedsets get one feed per (facet, value) of the feed facets plus the global
"main" feed (rollups.feed_main).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Facet:
    """One corpus dimension: ``name`` labels the facet in rollup/feed
    outputs; ``selector`` is a SQL expression over docmeta columns
    producing the document's value for this facet (NULL = the document has
    no value and joins no bucket of this facet)."""

    name: str
    selector: str
    use_for_toc: bool = True
    use_for_feed: bool = False

    def col(self) -> Column:
        return F.expr(self.selector)


#: The reference's default facet set ([ref: ferenda/facet.py ::
#: Facet.firstletter / Facet.year; documentrepository.py declares
#: dcterms:title (firstletter), dcterms:issued (year), dcterms:language]).
DEFAULT_FACETS: tuple[Facet, ...] = (
    Facet("letter", "upper(substring(title, 1, 1))"),
    Facet("year", "cast(substring(issued, 1, 4) as int)"),
    Facet("lang", "lang", use_for_feed=True),
)


def toc_facets(facets: tuple[Facet, ...]) -> list[Facet]:
    return [f for f in facets if f.use_for_toc]


def feed_facets(facets: tuple[Facet, ...]) -> list[Facet]:
    return [f for f in facets if f.use_for_feed]
