"""Main-content extraction (boilerplate removal) — the block-level
text cleaner a web-corpus pipeline runs between raw HTML and the parse/
curation stages. Public lineage: jusText (Pomikálek 2011) and
trafilatura classify block elements by link density / length / tag
context; this is the deterministic, oracle-replicable subset of that
idea (no stopword lists, no ML).

Pinned semantics (every rule oracle-visible):

* The page is split into BLOCKS at block-level tag boundaries
  (p/div/section/article/main/li/ul/ol/table/tr/td/th/h1-h6/blockquote/
  pre/br/body/nav/header/footer/aside/form): text accumulated since the
  last boundary, whitespace-normalized; empty blocks are discarded
  entirely (counted nowhere).
* A block is BOILERPLATE if, at flush time, it sits inside
  nav/header/footer/aside/form/noscript (depth-counted), or its link
  density — chars contributed inside <a> elements / total chars —
  exceeds ``max_link_density``, or it is shorter than ``min_chars`` and
  not a heading (text flushed while an h1-h6 is open).
* script/style/template contents are suppressed before blocking.
* ``main_text`` = kept blocks joined by "\\n\\n" in document order.

Scale shape: one Arrow-batched pandas UDF, map-only, zero shuffle —
same plumbing tier as extract.extract_text (which stays the
byte-identity surface; this is the curation-facing cleaned view)."""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_BLOCK = frozenset(
    "p div section article main li ul ol table tr td th h1 h2 h3 h4 h5 h6"
    " blockquote pre br body nav header footer aside form".split()
)
_BOILER = frozenset("nav header footer aside form noscript".split())
_SUPPRESS = frozenset("script style template".split())
_HEADINGS = frozenset("h1 h2 h3 h4 h5 h6".split())


class _Blocker(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, int, bool, bool]] = []
        # (text, n_chars, link_chars, in_boiler, is_heading)
        self._buf: list[str] = []
        self._link_chars = 0
        self._boiler = 0
        self._suppress = 0
        self._link = 0
        self._heading = 0

    def _flush(self) -> None:
        text = " ".join("".join(self._buf).split())
        link_chars = self._link_chars
        self._buf, self._link_chars = [], 0
        if not text:
            return
        self.blocks.append(
            (
                text,
                len(text),
                min(link_chars, len(text)),
                self._boiler > 0,
                self._heading > 0,
            )
        )

    def handle_starttag(self, tag, attrs):
        if tag in _SUPPRESS:
            self._suppress += 1
            return
        if tag in _BLOCK:
            self._flush()
            if tag in _BOILER:
                self._boiler += 1
            if tag in _HEADINGS:
                self._heading += 1
        elif tag == "a":
            self._link += 1

    def handle_startendtag(self, tag, attrs):
        if tag in _BLOCK:  # e.g. <br/>
            self._flush()

    def handle_endtag(self, tag):
        if tag in _SUPPRESS:
            self._suppress = max(0, self._suppress - 1)
            return
        if tag in _BLOCK:
            self._flush()
            if tag in _BOILER:
                self._boiler = max(0, self._boiler - 1)
            if tag in _HEADINGS:
                self._heading = max(0, self._heading - 1)
        elif tag == "a":
            self._link = max(0, self._link - 1)

    def handle_data(self, data):
        if self._suppress:
            return
        self._buf.append(data)
        if self._link:
            # normalized contribution: collapsed like the block text
            self._link_chars += len(" ".join(data.split()))


def extract_main_content(
    html,
    min_chars: int = 25,
    max_link_density: float = 0.5,
) -> tuple[str, int, int]:
    """html (str/bytes) → (main_text, n_blocks, n_kept). Never raises."""
    if html is None:
        return ("", 0, 0)
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    b = _Blocker()
    try:
        b.feed(html)
        b.close()
    except Exception:
        pass
    b._flush()  # trailing text in tag soup
    kept = [
        text
        for text, n, link, boiler, heading in b.blocks
        if not boiler
        and (link / n) <= max_link_density
        and (n >= min_chars or heading)
    ]
    return ("\n\n".join(kept), len(b.blocks), len(kept))


_SCHEMA = "struct<main_text:string,n_blocks:int,n_kept:int>"


def main_content(
    docs: DataFrame,
    html_col: str = "html",
    min_chars: int = 25,
    max_link_density: float = 0.5,
) -> DataFrame:
    """All input columns + (main_text, n_blocks, n_kept)."""

    @pandas_udf(_SCHEMA)
    def _ex(htmls: pd.Series) -> pd.DataFrame:
        rows = [
            extract_main_content(h, min_chars, max_link_density)
            for h in htmls
        ]
        return pd.DataFrame(
            rows, columns=["main_text", "n_blocks", "n_kept"]
        )

    out = docs.withColumn("_mc", _ex(F.col(html_col)))
    return out.select(
        *[c for c in docs.columns],
        F.col("_mc.main_text").alias("main_text"),
        F.col("_mc.n_blocks").alias("n_blocks"),
        F.col("_mc.n_kept").alias("n_kept"),
    )


# --------------------------------------------------------- corpus-frequency
def remove_frequent_lines(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    host_col: str = "source",
    text_col: str = "text",
    min_docs: int = 3,
    min_frac: float = 0.0,
) -> DataFrame:
    """CCNet/RefinedWeb-style per-host boilerplate removal by CORPUS
    statistics (vs ``main_content``'s per-page structural rules): a line
    whose trimmed form appears in ≥ ``min_docs`` distinct documents of the
    same host AND in ≥ ``min_frac`` of the host's documents is navigation/
    footer chrome, not content — strip it from every document of that
    host.

    Returns ``(id_col, host_col, clean_text, n_lines, n_removed)``:
    ``clean_text`` is the byte-exact original lines that survive, joined
    by ``\\n`` in original order (duplicates within a doc preserved);
    blank lines (trim = '') are structural, never counted and never
    removed.

    Scale shape (the CCNet step is famously shuffle-heavy; this is the
    bounded version):

    - lines travel as ``md5(trim(line))`` 128-bit keys through the
      frequency join, never as text — the shuffle stays narrow whatever
      the line length (md5 rather than xxhash64 so the DuckDB oracle can
      replay key-for-key);
    - doc-frequency = groupBy (host, key) over the per-doc DISTINCT line
      set — two map-side-combinable aggregations on a key that is uniform
      by construction (hash);
    - the per-host doc count is a host-cardinality dim, broadcast;
    - the frequent-line set joins back against the exploded lines on
      (host, key) — fan-out 1 — and reassembly is ONE groupBy(doc)
      sort_array; everything else is codegen'd column work.
    """
    exploded = docs.select(
        F.col(id_col),
        F.col(host_col),
        F.posexplode(F.split(F.col(text_col), "\n", -1)).alias(
            "_pos", "_line"
        ),
    ).select(
        id_col,
        host_col,
        "_pos",
        "_line",
        F.md5(F.trim(F.col("_line"))).alias("_key"),
        (F.trim(F.col("_line")) == "").alias("_blank"),
    )

    host_docs = docs.groupBy(host_col).agg(
        F.countDistinct(id_col).alias("_host_docs")
    )
    freq = (
        exploded.filter(~F.col("_blank"))
        .select(host_col, "_key", id_col)
        .distinct()
        .groupBy(host_col, "_key")
        .agg(F.countDistinct(id_col).alias("_df"))
        .join(F.broadcast(host_docs), host_col)
        .filter(
            (F.col("_df") >= min_docs)
            & (F.col("_df") >= F.col("_host_docs") * min_frac)
        )
        .select(host_col, "_key", F.lit(True).alias("_drop"))
    )

    marked = exploded.join(freq, [host_col, "_key"], "left").withColumn(
        "_removed", F.coalesce("_drop", F.lit(False)) & ~F.col("_blank")
    )
    return (
        marked.groupBy(id_col, host_col)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("_removed").cast("int")).alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("_removed"),
                                F.struct(
                                    F.col("_pos"), F.col("_line").alias("line")
                                ),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("clean_text"),
        )
        .select(
            id_col,
            host_col,
            "clean_text",
            F.col("n_lines").cast("int").alias("n_lines"),
            F.col("n_removed").cast("int").alias("n_removed"),
        )
    )
