"""Gopher-style repetition signals for training-data curation.

The repetition filters from Rae et al. 2021 ("Scaling Language Models:
Methods, Analysis & Insights from Training Gopher", §A1.1 — public paper):
documents dominated by repeated lines or repeated word n-grams are
boilerplate/spam and get filtered before LLM training. No reference analog
(mavteam/ferenda stops at structure parsing); this is part of the
corpus-curation surface a 100 TB web-text pipeline needs.

Scale design — two tiers, chosen per signal by its work profile:

* **Line signals** (duplicate-line fraction, duplicate-line char fraction,
  bullet-start / ellipsis-end fractions) are pure column expressions over
  higher-order functions: zero shuffle, whole-stage-codegen'd, O(lines ×
  distinct-lines) per document (web pages have tens-to-hundreds of lines,
  so the quadratic term is bounded and beats a per-doc shuffle by far).

* **N-gram signals** (top-n-gram char fraction, duplicated-n-gram char
  fraction) are LINEAR explode → groupBy(id, gram) → per-doc re-aggregate:
  a per-doc HOF would be O(grams²) — ruinous for 10k-token documents —
  while the exploded groupBy gets map-side combine and a uniform
  (doc, gram) shuffle key. Two narrow shuffles total, both skew-free.

Definitions (documented because they gate byte-parity with the DuckDB
oracle in `__spark_entry__.py`):

* lines = `\\n`-split, trimmed, empties dropped.
* duplicate_line_fraction = (n_lines − n_distinct_lines) / n_lines.
* duplicate_line_char_fraction = chars in occurrences BEYOND THE FIRST of
  each repeated line / total line chars (Gopher counts "characters
  contained within duplicated lines"; counting beyond-first occurrences
  makes the measure 0 for a no-dup doc and 1−1/k for k copies of one line,
  which is the monotone signal the filter needs).
* top_ngram_char_fraction(n) = max over word-n-grams of
  count(gram) × length(gram) / length(text).
* dup_ngram_char_fraction(n) = Σ over grams with count > 1 of
  count(gram) × length(gram) / length(text). Overlapping occurrences are
  each counted (Gopher's exact overlap bookkeeping needs positional scans;
  this upper bound keeps the op linear and shuffle-friendly — flagged docs
  are a superset, which is the safe direction for a filter).

Tokenization matches `functions.textstats.tokens` (trim + split on \\s+)
so token budgets and repetition signals agree on what a word is.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ferenda_spark.functions.textstats import tokens

__all__ = [
    "doc_lines",
    "duplicate_line_fraction",
    "duplicate_line_char_fraction",
    "bullet_start_fraction",
    "ellipsis_end_fraction",
    "word_ngrams",
    "repetition_signals",
    "repetition_flag",
]


# ------------------------------------------------------------- line signals


def doc_lines(col: Column) -> Column:
    """Non-empty trimmed lines of a document as ARRAY<STRING>."""
    raw = F.split(col, r"\n")
    # NB: `F.transform(raw, F.trim)` would pass the element INDEX as
    # trim's optional trimStr argument — wrap in a one-arg lambda.
    return F.filter(F.transform(raw, lambda l: F.trim(l)), lambda l: F.length(l) > 0)


def _dup_line_fraction_of(lines: Column) -> Column:
    n = F.size(lines)
    dups = (n - F.size(F.array_distinct(lines))).cast("double")
    return F.when(n > 0, dups / n).otherwise(F.lit(0.0))


def _dup_line_char_fraction_of(lines: Column) -> Column:
    total = F.aggregate(
        lines, F.lit(0).cast("bigint"), lambda acc, l: acc + F.length(l)
    )
    dup_chars = F.aggregate(
        F.array_distinct(lines),
        F.lit(0).cast("bigint"),
        lambda acc, d: acc
        + (F.size(F.filter(lines, lambda l: l == d)) - 1) * F.length(d),
    )
    return F.when(total > 0, dup_chars.cast("double") / total).otherwise(F.lit(0.0))


def _bullet_start_fraction_of(lines: Column) -> Column:
    n = F.size(lines)
    hits = F.size(F.filter(lines, lambda l: F.substring(l, 1, 1).isin("-", "*", "•")))
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def _ellipsis_end_fraction_of(lines: Column) -> Column:
    n = F.size(lines)
    hits = F.size(
        F.filter(lines, lambda l: l.endswith("...") | l.endswith("…"))
    )
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


# Public per-text-column forms. NB for hot paths: these embed the
# line-splitting expression, which higher-order-function lambdas re-evaluate
# per element (see ngrams_from); repetition_signals() pre-projects the line
# array once and uses the _of internals on the column reference instead.


def duplicate_line_fraction(col: Column) -> Column:
    return _dup_line_fraction_of(doc_lines(col))


def duplicate_line_char_fraction(col: Column) -> Column:
    """Chars in beyond-first occurrences of repeated lines / total line
    chars. O(distinct × lines) nested HOF — bounded by per-page line counts,
    zero shuffle."""
    return _dup_line_char_fraction_of(doc_lines(col))


def bullet_start_fraction(col: Column) -> Column:
    """Fraction of lines starting with a bullet marker (-, *, •)."""
    return _bullet_start_fraction_of(doc_lines(col))


def ellipsis_end_fraction(col: Column) -> Column:
    """Fraction of lines ending in an ellipsis ('...' or '…') — truncated
    link-farm/teaser text."""
    return _ellipsis_end_fraction_of(doc_lines(col))


# ------------------------------------------------------------ ngram signals


def ngrams_from(toks: Column, n: int) -> Column:
    """Positional word n-grams from a PRE-PROJECTED token-array column.

    The token array must be a plain column reference, not the tokenizing
    expression itself: a free expression inside a higher-order-function
    lambda is re-evaluated PER ELEMENT (measured: the regex split re-ran
    once per gram — O(tokens²) splits per document, ~8× the whole branch),
    while a column reference is a row-field read. Grams are assembled with
    O(1) ``element_at`` lookups, not per-gram ``slice`` allocations."""
    cnt = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(cnt - (n - 1), F.lit(0)))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    return F.when(cnt >= n, grams).otherwise(F.array().cast("array<string>"))


def word_ngrams(col: Column, n: int) -> Column:
    """Positional (non-distinct) word n-grams, space-joined. Documents with
    fewer than n tokens yield an empty array. Convenience form over a text
    column; hot paths should pre-project ``tokens(col)`` and call
    ``ngrams_from`` (see its docstring for why)."""
    return ngrams_from(tokens(col), n)


def _ngram_fractions(
    df: DataFrame, id_col: str, text_col: str, top_n: int, dup_n: int
) -> DataFrame:
    """Per-doc (top_{top_n}gram_char_frac, dup_{dup_n}gram_char_frac) via
    ONE explode of both gram sizes tagged by n → groupBy(id, n, gram) with
    map-side combine → per-doc agg. Returns (id, top_frac, dup_frac).
    Tokenizes ONCE into a projected column (see ngrams_from)."""
    toked = df.select(
        F.col(id_col).alias("_id"),
        F.length(F.col(text_col)).alias("_nc"),
        tokens(F.col(text_col)).alias("_toks"),
    )
    base = toked.select(
        "_id",
        "_nc",
        ngrams_from(F.col("_toks"), top_n).alias("_g_top"),
        ngrams_from(F.col("_toks"), dup_n).alias("_g_dup"),
    )
    tagged = base.select(
        "_id",
        "_nc",
        F.explode(
            F.concat(
                F.transform(
                    "_g_top", lambda g: F.struct(F.lit("t").alias("k"), g.alias("g"))
                ),
                F.transform(
                    "_g_dup", lambda g: F.struct(F.lit("d").alias("k"), g.alias("g"))
                ),
            )
        ).alias("e"),
    ).select("_id", "_nc", F.col("e.k").alias("_k"), F.col("e.g").alias("_gram"))
    per_gram = tagged.groupBy("_id", "_nc", "_k", "_gram").agg(
        F.count(F.lit(1)).alias("_c")
    )
    per_doc = per_gram.groupBy("_id", "_nc").agg(
        F.max(
            F.when(F.col("_k") == "t", F.col("_c") * F.length("_gram")).otherwise(0)
        ).alias("_top_chars"),
        F.sum(
            F.when(
                (F.col("_k") == "d") & (F.col("_c") > 1),
                F.col("_c") * F.length("_gram"),
            ).otherwise(0)
        ).alias("_dup_chars"),
    )
    return per_doc.select(
        "_id",
        F.when(F.col("_nc") > 0, F.col("_top_chars").cast("double") / F.col("_nc"))
        .otherwise(F.lit(0.0))
        .alias(f"top_{top_n}gram_char_frac"),
        F.when(F.col("_nc") > 0, F.col("_dup_chars").cast("double") / F.col("_nc"))
        .otherwise(F.lit(0.0))
        .alias(f"dup_{dup_n}gram_char_frac"),
    )


# -------------------------------------------------------------- the operator


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 2,
    dup_n: int = 5,
) -> DataFrame:
    """All repetition signals per document. Plan shape: one narrow HOF
    projection over the scan (line signals) LEFT JOIN one linear
    explode-groupBy branch (n-gram signals — docs shorter than the gram
    size fall out of the branch and coalesce to 0.0). Both branches read
    the same scan once each; the join key is the doc id (uniform)."""
    lined = df.select(
        F.col(id_col), doc_lines(F.col(text_col)).alias("_lines")
    )
    line_side = lined.select(
        F.col(id_col),
        _dup_line_fraction_of(F.col("_lines")).alias("dup_line_frac"),
        _dup_line_char_fraction_of(F.col("_lines")).alias("dup_line_char_frac"),
        _bullet_start_fraction_of(F.col("_lines")).alias("bullet_start_frac"),
        _ellipsis_end_fraction_of(F.col("_lines")).alias("ellipsis_end_frac"),
    )
    gram_side = _ngram_fractions(df, id_col, text_col, top_n, dup_n)
    out = line_side.join(
        gram_side, line_side[id_col] == gram_side["_id"], "left"
    ).drop("_id")
    return out.select(
        id_col,
        "dup_line_frac",
        "dup_line_char_frac",
        "bullet_start_frac",
        "ellipsis_end_frac",
        F.coalesce(F.col(f"top_{top_n}gram_char_frac"), F.lit(0.0)).alias(
            f"top_{top_n}gram_char_frac"
        ),
        F.coalesce(F.col(f"dup_{dup_n}gram_char_frac"), F.lit(0.0)).alias(
            f"dup_{dup_n}gram_char_frac"
        ),
    )


def repetition_flag(
    dup_line_frac: Column,
    top_2gram_char_frac: Column,
    ellipsis_end_frac: Column,
    bullet_start_frac: Column,
) -> Column:
    """Gopher-style pass/fail gate on the repetition signals (thresholds
    from the paper's Table A1 where applicable; bullet/ellipsis from its
    formatting filters). True = document is repetition-flagged."""
    return (
        (dup_line_frac > 0.30)
        | (top_2gram_char_frac > 0.20)
        | (ellipsis_end_frac > 0.30)
        | (bullet_start_frac > 0.90)
    )
