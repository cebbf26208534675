"""Exact duplicated-substring removal (span dedup) for web-scale corpora.

Removes every token span of length >= L that occurs verbatim more than
once across the corpus — the ExactSubstr operation of Lee et al. 2022
("Deduplicating Training Data Makes Language Models Better", ACL), which
the paper implements with a single-machine suffix array. A suffix array
does not distribute, but its OUTPUT is exactly reproducible relationally:
a span is removed iff every L-token window inside it is duplicated, and
the union of duplicated L-windows equals the union of duplicated
maximal substrings of length >= L (any duplicated run of length m >= L
is covered by its m-L+1 duplicated windows; conversely a duplicated
window IS a duplicated length-L substring). So the suffix-array scan
becomes: posting list of every L-gram occurrence -> global occurrence
count -> mark windows whose gram count >= min_count -> merge overlapping
/adjacent windows per doc (gaps-and-islands) -> cut the merged spans out.

No reference analog (ferenda's curated corpora are unique by
construction); this is the strongest-precision dedup tier a training-data
pipeline runs, below which MinHash/SimHash operate at document
granularity only.

Design targets 100 TB:

- The posting list is O(total_tokens) rows of (64-bit fp, id, pos) — the
  same shuffle volume class as ``shingle_fingerprints``-based LSH, and
  the groupBy key is a uniform 64-bit hash, so the count shuffle is
  skew-free by construction. A gram occurring 10^6 times (site-wide
  boilerplate) costs 10^6 *linear* posting rows and ONE count row —
  marking is a posting⋈dup-gram equi-join with fan-out exactly 1 per
  posting, never the pair explosion that forces a df-cap in
  ``ngram_jaccard_pairs``.
- Two shuffles total (count, mark+islands share the fp->id repartition);
  the island merge is one doc-keyed window; span removal is map-only.
- Span cut-out is ``F.aggregate`` over the sorted span list building the
  kept text from array slices — O(n_tokens + n_spans) per doc, fully
  JVM-side (no per-token exists() probe, no Python).
- Production knobs the paper also documents: raise ``min_count`` to keep
  n-plicated boilerplate below a threshold, and ``stride`` for the
  approximate mode that bounds the posting list for the 100 TB path
  (see below).

Approximate mode (``stride`` > 1) — winnowing, not position-stride:

The obvious "keep every s-th position" sampling has NO detection
guarantee: occurrence A at offset p1 and occurrence B at offset p2 of
the same run only share a sampled gram when p1 ≡ p2 (mod s), so a
misaligned duplicate of ANY length can be missed entirely. The mode
implemented here is winnowing (Schleimer, Wilkerson & Aiken, SIGMOD
2003 — public): within every window of ``stride`` consecutive gram
positions, select the gram with the minimal (fp, pos) struct; the
posting list is the distinct selections. Because the minimal fp inside
a window that lies fully within a duplicated run is determined by the
run's CONTENT alone, both occurrences emit a posting with that same fp
— giving the deterministic guarantee the stride knob was specified to
have: **every duplicated run of length ≥ length + stride − 1 tokens is
detected**, at an expected posting density of 2/(stride+1) (the
winnowing paper's bound; ~1/s of the corpus for the documented knob).
Shorter duplicates may be missed, and detected spans under-approximate
the true run by < stride tokens at each edge (only selected windows
mark). Selection is ONE doc-keyed window pass (min(struct(fp,pos)) over
a [current, +stride-1] frame, then distinct) — a single extra shuffle
of the skinny (id, pos, fp) postings, which the count shuffle was going
to move anyway. Keep ``stride ≤ length`` so selected windows inside one
run still overlap and merge into a single island.

Tokens are whitespace tokens per the pipeline-wide definition
(``functions.textstats.tokens``); cleaned text is the kept tokens
re-joined with single spaces, i.e. span dedup composes after
whitespace normalization, like every text operator in this repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ferenda_spark.functions.textstats import tokens


def _tokenized(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("toks")
    )


def span_postings(
    df: DataFrame, text_col: str, id_col: str, *,
    length: int = 50, stride: int = 1
) -> DataFrame:
    """L-token windows as ``(id, pos, fp)`` — pos is the 0-based token
    index of the window start, fp the xxhash64 of the space-joined gram.
    Docs shorter than ``length`` emit nothing (they cannot contain a
    duplicated span of that length).

    ``stride`` = 1 emits EVERY window (exact mode). ``stride`` > 1 emits
    the winnowing selection: the minimal (fp, pos) entry of each window
    of ``stride`` consecutive positions, deduplicated — ~2/(stride+1) of
    the windows, with every duplicated run ≥ length + stride − 1 tokens
    guaranteed to keep matching fps in all its occurrences (module
    docstring). Docs with fewer than ``stride`` windows clamp to one
    whole-doc window so every doc ≥ ``length`` tokens still posts."""
    if stride < 1:
        raise ValueError(f"stride must be >= 1: {stride}")
    t = _tokenized(df, text_col, id_col)
    n = F.size("toks")
    # Explode the CHEAP index sequence first and hash each gram per
    # OUTPUT row, after the Generate. Building the full window array in
    # one projection and exploding it reads nicer, but Catalyst's
    # InferFiltersFromGenerate then synthesizes `size(win) > 0 AND
    # isnotnull(win)` predicates that each re-embed the whole
    # gram-hashing transform — the 1M-doc span_job leg measured the
    # posting construction running ~3x (every gram concat+hashed three
    # times). With the sequence as the generator input, the inferred
    # predicates cost two ints and the expensive slice+concat+xxhash64
    # runs exactly once per posting, fused into the post-Generate
    # projection by whole-stage codegen (toks never crosses an exchange).
    posts = (
        t.filter(n >= length)
        .select(
            "id",
            "toks",
            (n - length).alias("_maxq"),  # = n_windows - 1
            F.explode(F.sequence(F.lit(0), n - length)).alias("pos"),
        )
        .select(
            "id",
            "_maxq",
            "pos",
            F.xxhash64(
                F.concat_ws(
                    " ", F.slice("toks", F.col("pos") + 1, F.lit(length))
                )
            ).alias("fp"),
        )
    )
    if stride == 1:
        return posts.select("id", "pos", "fp")
    # winnowing selection as ONE doc-keyed window pass: each valid window
    # start q contributes min(struct(fp, pos)) over [q, q+stride-1]
    # (frame truncates at the partition end, which IS the short-doc
    # clamp: a doc with fewer than `stride` windows keeps q=0 selecting
    # over the whole doc). fp leads the struct so selection is
    # content-driven; distinct = the union of per-window minima.
    w = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, stride - 1)
    )
    return (
        posts.withColumn("_wmin", F.min(F.struct("fp", "pos")).over(w))
        .where(
            (F.col("pos") <= F.col("_maxq") - (stride - 1))
            | (F.col("pos") == 0)
        )
        .select(
            "id",
            F.col("_wmin.pos").alias("pos"),
            F.col("_wmin.fp").alias("fp"),
        )
        .distinct()
    )


def duplicate_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    length: int = 50,
    min_count: int = 2,
    keep_first: bool = False,
    stride: int = 1,
) -> DataFrame:
    """Merged duplicated spans per doc: ``(id, span_start, span_end,
    n_windows)`` with token-index bounds, ``span_end`` exclusive.
    Overlapping AND exactly-adjacent windows merge into one span.
    ``stride`` > 1 switches to the winnowed approximate posting list
    (module docstring): only runs ≥ length + stride − 1 are guaranteed
    detected, spans shrink by < stride tokens per edge, and
    ``n_windows`` counts SELECTED windows only.

    A window is duplicated when its gram's total occurrence count
    (across AND within docs — intra-doc repetition counts, matching the
    suffix-array semantics) is >= ``min_count``. With ``keep_first``,
    each duplicated gram's canonical occurrence — minimal (id, pos) — is
    not marked; note this is occurrence-level keep-first: when
    overlapping grams chain, the canonical doc may still lose tokens to
    OTHER grams' non-canonical occurrences, so it does not guarantee one
    full surviving copy of a long run (the paper's keep-one variant has
    the same property)."""
    posts = span_postings(df, text_col, id_col,
                          length=length, stride=stride)
    counts = posts.groupBy("fp").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.min(F.struct("id", "pos")).alias("first_occ"),
    )
    marked = posts.join(counts.filter(F.col("cnt") >= min_count), "fp")
    if keep_first:
        marked = marked.filter(
            ~(
                (F.col("id") == F.col("first_occ.id"))
                & (F.col("pos") == F.col("first_occ.pos"))
            )
        )
    w = Window.partitionBy("id").orderBy("pos")
    prev_max_end = F.max(F.col("pos") + length).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = (F.col("pos") > F.coalesce(prev_max_end, F.lit(-1))).cast("int")
    return (
        marked.select("id", "pos")
        .withColumn("_island", F.sum(brk).over(w))
        .groupBy("id", "_island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + length).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .drop("_island")
    )


def remove_duplicate_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    length: int = 50,
    min_count: int = 2,
    keep_first: bool = False,
    stride: int = 1,
) -> DataFrame:
    """Cut every duplicated span out of every doc: ``(id, n_tokens,
    n_dup_windows, n_spans, n_removed, text)`` — text is the kept tokens
    space-joined ('' when the whole doc was duplicated), n_removed the
    token count cut. One doc-keyed aggregation collects each doc's span
    list (bounded by n_tokens / length rows); the cut itself is a single
    ``F.aggregate`` walk over the sorted spans appending the inter-span
    slices — linear per doc, entirely in codegen."""
    spans = duplicate_spans(
        df, text_col, id_col,
        length=length, min_count=min_count, keep_first=keep_first,
        stride=stride,
    )
    per_doc = spans.groupBy("id").agg(
        F.sort_array(
            F.collect_list(F.struct("span_start", "span_end"))
        ).alias("spans"),
        F.sum("n_windows").alias("n_dup_windows"),
        F.count(F.lit(1)).alias("n_spans"),
    )
    t = _tokenized(df, text_col, id_col).join(per_doc, "id", "left")
    toks, n = F.col("toks"), F.size("toks")
    sp = F.coalesce(
        "spans",
        F.array().cast("array<struct<span_start:int,span_end:int>>"),
    )

    # walk the sorted spans: acc = (kept-so-far, cursor); append the gap
    # slice before each span, jump the cursor to its end, then flush the
    # tail. slice() with length 0 returns [] so empty gaps are free.
    def _merge(acc, s):
        return F.struct(
            F.concat(
                acc["parts"],
                F.slice(toks, acc["cur"] + 1, s["span_start"] - acc["cur"]),
            ).alias("parts"),
            s["span_end"].alias("cur"),
        )

    kept = F.aggregate(
        sp,
        F.struct(
            F.array().cast("array<string>").alias("parts"),
            F.lit(0).alias("cur"),
        ),
        _merge,
        lambda acc: F.concat(
            acc["parts"], F.slice(toks, acc["cur"] + 1, n - acc["cur"])
        ),
    )
    return t.select(
        "id",
        n.cast("long").alias("n_tokens"),
        F.coalesce("n_dup_windows", F.lit(0)).cast("long").alias("n_dup_windows"),
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        (n - F.size(kept)).cast("long").alias("n_removed"),
        F.concat_ws(" ", kept).alias("text"),
    )
