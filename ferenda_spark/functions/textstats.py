"""Text-analysis column functions for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

No reference analog (mavteam/ferenda stops at structure/citation parsing);
these are the corpus-curation operations a 100 TB web-text pipeline needs on
top of it. Everything here is a *pure column expression* over
`pyspark.sql.functions` — JVM-side, whole-stage-codegen'd, zero Python in
the hot path. Each builder takes a string column and returns a Column, so
they compose into one narrow projection over the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic
# language identifier. Chosen to be mutually exclusive, high-frequency
# function words (public linguistic knowledge).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "that", "with", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "est", "que", "des", "une"],
    "es": ["el", "los", "las", "es", "que", "una", "por", "con"],
}

STOPWORDS_EN = LANG_MARKERS["en"] + ["a", "in", "on", "it", "as", "at", "by"]


def tokens(col: Column) -> Column:
    """Whitespace tokenization (the fast tier; `bpe_ish_tokens` below is the
    regex tier). ALL empty fragments are filtered — not just the
    empty-string case: trim() strips only 0x20, so text ending in \\t/\\n
    used to leak a trailing '' token that the DuckDB oracle idiom
    (list_filter(string_split_regex(...), t -> t != '')) never produces."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != F.lit(""))


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("bigint")


def bpe_ish_tokens(col: Column) -> Column:
    """BPE-style pre-tokenizer segmentation via regex: letter runs, digit
    runs, and single punctuation marks each count as a token (a real BPE
    merge table would run as a pandas UDF on top of this split)."""
    return F.regexp_extract_all(
        col, F.lit(r"[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]"), F.lit(0)
    )


def bpe_ish_token_count(col: Column) -> Column:
    return F.size(bpe_ish_tokens(col)).cast("bigint")


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are sentence punctuation."""
    total = F.length(col)
    punct = total - F.length(F.regexp_replace(col, r"[.,;:!?]", ""))
    return F.when(total > 0, punct.cast("double") / total).otherwise(F.lit(0.0))


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(w) for w in (stopwords or STOPWORDS_EN)])
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    return F.when(F.size(toks) > 0, hits.cast("double") / F.size(toks)).otherwise(
        F.lit(0.0)
    )


def mean_token_len(col: Column) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total.cast("double") / F.size(toks)).otherwise(
        F.lit(0.0)
    )


def quality_score(col: Column) -> Column:
    """Heuristic document quality in [0,1] — the C4/Gopher-style cheap
    filters: enough tokens, sane mean word length, some punctuation, some
    stopwords. Weighted sum of four indicator-ish terms."""
    n = token_count(col)
    mtl = mean_token_len(col)
    has_len = F.when((n >= 10) & (n <= 100000), 1.0).otherwise(0.0)
    sane_words = F.when((mtl >= 2.0) & (mtl <= 12.0), 1.0).otherwise(0.0)
    has_punct = F.when(punct_ratio(col) > 0.0005, 1.0).otherwise(0.0)
    has_stop = F.when(stopword_ratio(col) > 0.02, 1.0).otherwise(0.0)
    return (
        0.3 * has_len + 0.3 * sane_words + 0.2 * has_punct + 0.2 * has_stop
    ).cast("double")


def detect_lang(col: Column) -> Column:
    """Stopword-marker language ID: score = marker hits per language, argmax
    wins, 'und' (undetermined) when nothing matches. One projection, no UDF,
    and ONE pass over the token array: a single `aggregate` carries a
    struct-of-counters accumulator (a per-language `filter` would traverse
    the tokens once per language — measured ~1.5× slower)."""
    toks = F.transform(tokens(col), lambda t: F.lower(t))
    langs = list(LANG_MARKERS.items())
    init = F.struct(*[F.lit(0).alias(f"c{i}") for i in range(len(langs))])

    def _step(acc, t):
        return F.struct(
            *[
                (
                    acc[f"c{i}"]
                    + F.when(
                        F.array_contains(F.array(*[F.lit(w) for w in words]), t), 1
                    ).otherwise(0)
                ).alias(f"c{i}")
                for i, (_, words) in enumerate(langs)
            ]
        )

    counts = F.aggregate(toks, init, _step)
    scored = F.array(
        *[
            F.struct(counts[f"c{i}"].alias("score"), F.lit(lang).alias("lang"))
            for i, (lang, _) in enumerate(langs)
        ]
    )
    best = F.sort_array(scored, asc=False)[0]
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def doc_fingerprint(col: Column) -> Column:
    """64-bit whole-document fingerprint over whitespace-normalized,
    case-folded text — the exact-dedup key."""
    norm = F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))
    return F.xxhash64(norm)


def shingles(col: Column, k: int = 5) -> Column:
    """Distinct word-k-gram set as ARRAY<STRING> (near-dup feature base)."""
    toks = tokens(col)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))
    )
    return F.when(n >= k, F.array_distinct(grams)).otherwise(
        F.when(n > 0, F.array(F.concat_ws(" ", toks))).otherwise(
            F.array().cast("array<string>")
        )
    )


def shingle_fingerprints(col: Column, k: int = 5) -> Column:
    """Rolling-hash fingerprint set: xxhash64 of each word-k-gram —
    the winnowing-style representation (take array_min / pick mod-p subset
    downstream to sparsify)."""
    return F.transform(shingles(col, k), lambda s: F.xxhash64(s))
