"""Tiered entity linking / canonicalization (north_star J3/J4).

Reference analog: LegalRef grammars + COIN URISpace resolve mention →
canonical URI ([ref: ferenda/sources/legal/se/legalref.py],
[ref: ferenda/thirdparty/coin.py]); the dictionary there is implicit in
grammar data. Here it is an explicit ``uri_dictionary`` table and the
linking is a three-tier join cascade:

tier 1 — exact:   broadcast hash join on normalized alias key (dictionary
                  ~10^4–10^6 rows ≪ broadcast threshold at any realistic
                  dictionary size; O(corpus) map-side, zero shuffle).
tier 2 — salted:  the same equi-join as a *shuffle* join with explicit key
                  salting, for deployments where the dictionary outgrows
                  broadcast. Mentions follow a Zipf law (FIXTURES: hottest
                  domain ≈30%), so a plain shuffle join puts the hottest
                  alias_key on one reducer; salting spreads each key over
                  SALT reducers by exploding the dictionary side ×SALT.
                  (AQE skew-join can split sort-merge stragglers at runtime,
                  but north_rule demands explicit handling — this is it.)
tier 3 — fuzzy:   unresolved mentions (typo'd surface forms) resolve to the
                  best dictionary candidate by character-3-gram Jaccard.
                  Two physical strategies, same semantics:
                  * ``ngram`` — EXACT Jaccard against the broadcast
                    dictionary (JVM-side array_intersect with a length-ratio
                    prune; no ML stage, no extra shuffles). Right whenever
                    the dictionary fits broadcast — which is also exactly
                    when tier 1 chose broadcast.
                  * ``lsh`` — `MinHashLSH` blocking over hashed 3-gram
                    features + approxSimilarityJoin. The scale path for
                    dictionaries too large to broadcast: candidate pairs
                    only, never the cross product. (north_star's
                    "MinHash-LSH blocking for alias resolution".)
                  ``auto`` picks ngram below _NGRAM_DICT_MAX dictionary
                  rows, lsh above.
"""

from __future__ import annotations

from pyspark.ml.feature import HashingTF, MinHashLSH, NGram
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MENTION_KEYS = ["url", "part_key", "section_ordinal", "mention", "alias_key"]

# worker-process-level cache of built gram indexes, keyed by the broadcast
# value's identity (the identity check below guards against id() reuse).
_GRAM_INDEX_CACHE: dict[int, tuple] = {}

# Above this many dictionary rows, `auto` switches the fuzzy tier from the
# exact broadcast-ngram join to MinHash-LSH blocking. 200k rows of
# (alias_key, uri, grams) is ~50 MB broadcast — inside the 64 MB threshold
# the session pins.
_NGRAM_DICT_MAX = 200_000


def _exact_broadcast(mentions: DataFrame, dictionary: DataFrame) -> DataFrame:
    d = dictionary.filter(F.col("is_exact")).select("alias_key", "canonical_uri")
    return (
        mentions.join(F.broadcast(d), "alias_key", "inner")
        .select(*MENTION_KEYS, "canonical_uri")
        .withColumn("tier", F.lit("exact"))
    )


def tuned_salt(
    mentions: DataFrame,
    target_rows_per_reducer: int = 2_000_000,
    max_salt: int = 256,
) -> int:
    """Derive the salt factor S from a key-histogram stats pass (SURVEY
    §4.3; north_rule "skew handled explicitly") instead of a guessed
    constant: S = ceil(hottest alias_key's row count / target rows per
    reducer), clamped to [1, max_salt].

    The stats pass is one partial-aggregated groupBy over the mention keys
    reduced to a single max — shuffle volume O(distinct alias_keys)
    (vocabulary-sized), cost amortized over the join it tunes. S = 1 when
    no key is hot, so the salted join degenerates to a plain shuffle join
    with zero build-side blowup; a Zipf-skewed corpus gets exactly the
    fan-out its hottest key needs and no more."""
    hot = (
        mentions.groupBy("alias_key")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n").alias("m"))
        .collect()[0]["m"]
    ) or 0
    return int(min(max(1, -(-hot // target_rows_per_reducer)), max_salt))


def _exact_salted(
    mentions: DataFrame, dictionary: DataFrame, salt: int | None
) -> DataFrame:
    """Same result as ``_exact_broadcast``, shuffle-join + explicit salting.

    Probe side: salt = pmod(xxhash64(url), S) — deterministic, spreads a hot
    alias_key over S reducers. Build side: exploded ×S so every salted probe
    key finds its dictionary row. Build-side blowup is S× the dictionary —
    acceptable because the dictionary is the small side by assumption.

    ``salt=None`` self-tunes S from the mention key histogram
    (``tuned_salt``); pass an int to pin it explicitly.
    """
    if salt is None:
        salt = tuned_salt(mentions)
    d = (
        dictionary.filter(F.col("is_exact"))
        .select("alias_key", "canonical_uri")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    )
    m = mentions.withColumn(
        "salt", F.pmod(F.xxhash64(F.col("url")), F.lit(salt)).cast("int")
    )
    return (
        m.hint("shuffle_hash")
        .join(d, ["alias_key", "salt"], "inner")
        .select(*MENTION_KEYS, "canonical_uri")
        .withColumn("tier", F.lit("salted"))
    )


def _char_grams(col) -> F.Column:
    """Distinct character 3-grams of a string column, JVM-side, hashed to
    64-bit ints (xxhash64): long-array set ops and long join keys are far
    cheaper than string ones, and a 64-bit hash collision over ~10^5 grams
    is negligible (~10^-9). Strings shorter than 3 chars use the whole
    string as their single gram."""
    k = F.col(col) if isinstance(col, str) else col
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.length(k) - F.lit(2)),
            lambda i: F.xxhash64(k.substr(i, F.lit(3))),
        )
    )
    return F.when(F.length(k) >= 3, grams).otherwise(
        F.array(F.xxhash64(k))
    )


def _py_grams(s: str) -> frozenset:
    """Python twin of ``_char_grams`` gram *sets* (unhashed: in-process sets
    need no 64-bit packing)."""
    return (
        frozenset(s[i : i + 3] for i in range(len(s) - 2))
        if len(s) >= 3
        else frozenset((s,))
    )


class _GramIndex:
    """Prefix-filtered inverted index over a dictionary's char-3-gram sets
    (AllPairs/ppjoin family, Bayardo et al. WWW'07; Xiao et al. WWW'08).

    Grams are globally ordered by dictionary document-frequency (rarest
    first; ties by gram) — the vocabulary id IS that order. Each entry is
    indexed ONLY under its |B|−⌈s·|B|⌉+1 rarest grams, with the gram's
    position q in the entry's ordered set on the posting — hot template
    grams sort last and never enter the index, so posting lists stay
    short. Probing applies the ppjoin positional filter before exact
    set-Jaccard verification: a candidate met via gram positions (p, q)
    can overlap by at most 1 + min(na−p−1, nb−q−1), and J ≥ s needs
    overlap ≥ ⌈s/(1+s)·(na+nb)⌉, so most frequency-band collisions are
    dropped without touching their gram sets. Grams absent from the
    dictionary can't match; they count toward |A| and consume prefix
    slots (they sort before every seen gram, having df=0).
    """

    def __init__(self, entries: list[tuple[str, str]], s_min: float):
        import math

        gsets = [_py_grams(k) for k, _ in entries]
        df: dict[str, int] = {}
        for gs in gsets:
            for g in gs:
                df[g] = df.get(g, 0) + 1
        vocab_sorted = sorted(df, key=lambda g: (df[g], g))
        self.vocab = {g: i for i, g in enumerate(vocab_sorted)}
        self.gsets = gsets
        self.sizes = [len(gs) for gs in gsets]
        self.uris = [u for _, u in entries]
        # postings: vocab id -> [(entry id, gram position in entry)]
        postings: dict[int, list[tuple[int, int]]] = {}
        for i, gs in enumerate(gsets):
            ids = sorted(self.vocab[g] for g in gs)
            plen = len(gs) - math.ceil(s_min * len(gs)) + 1
            for q, v in enumerate(ids[:plen]):
                postings.setdefault(v, []).append((i, q))
        self.postings = postings
        self.s_min = s_min

    def probe(self, key: str, threshold: float):
        """Best (jaccard ≤ threshold) entry for `key`, ties broken on
        (jaccard, canonical_uri); None if nothing qualifies.

        Hot loop notes: the size filter is precomputed as an [lo, hi] window
        on |B| and the ppjoin α as a lookup table over |B| — the original
        per-candidate min/max/ceil arithmetic was ~40% of probe time on
        near-dictionary keys (which hit hundreds of candidates each)."""
        import math

        ka = _py_grams(key)
        na = len(ka)
        vocab = self.vocab
        kv = sorted(vocab[g] for g in ka if g in vocab)
        plen = na - math.ceil(self.s_min * na) + 1
        n_probe = plen - (na - len(kv))  # unseen grams consume slots only
        if n_probe <= 0:
            return None
        s = self.s_min
        # size filter window: min(na,nb) >= s*max(na,nb) ⇔ lo <= nb <= hi
        lo = math.ceil(s * na)
        hi = int(na / s)
        c1 = s / (1.0 + s)
        alpha = [0] * (hi + 1)
        for nb in range(lo, hi + 1):
            alpha[nb] = math.ceil(c1 * (na + nb))
        postings, sizes, gsets, uris = (
            self.postings, self.sizes, self.gsets, self.uris,
        )
        best = None
        seen: set[int] = set()
        seen_add = seen.add
        for p in range(min(n_probe, len(kv))):
            plist = postings.get(kv[p])
            if plist is None:
                continue
            rem_a1 = na - p  # 1 + (na - p - 1)
            for i, q in plist:
                if i in seen:
                    continue
                seen_add(i)
                nb = sizes[i]
                if nb < lo or nb > hi:
                    continue
                rb1 = nb - q
                ov = rem_a1 if rem_a1 < rb1 else rb1  # ppjoin positional cap
                if ov < alpha[nb]:
                    continue
                kb = gsets[i]
                c = len(ka & kb)
                jac = 1.0 - c / (na + nb - c)
                if jac <= threshold and (
                    best is None or (jac, uris[i]) < best
                ):
                    best = (jac, uris[i])
        return best[1] if best is not None else None


def _ngram_tier(
    unresolved: DataFrame, dictionary: DataFrame, threshold: float
) -> DataFrame:
    """EXACT char-3-gram Jaccard against a broadcast in-process gram index —
    ONE shuffle-free mapInPandas stage over the distinct unresolved keys.

    Why not DataFrame joins: the match is vocabulary-sized (distinct
    surface forms × dictionary), but expressing prefix-filtered set-
    similarity relationally costs ~20 tiny shuffle stages (gram explode,
    df table, two ranking windows, candidate join, verify join, best-match
    window) whose fixed per-job cost dominates and *worsens* with core
    count (measured: 25s at local[8] → 64s at local[32] for an 11k-key ×
    6.9k-entry match). Here the dictionary — broadcast-sized BY CONTRACT
    in this tier (`auto` routes bigger dictionaries to `_lsh_tier`) — ships
    once per executor as a Spark broadcast; each worker builds the
    prefix-filtered inverted index once, probes its keys through the
    index (candidate generation via the key's own prefix under the same
    global gram order — the AllPairs guarantee), and verifies candidates
    with exact set Jaccard. Zero shuffles, embarrassingly parallel,
    deterministic (ties break on (jaccard, canonical_uri)).
    """
    from typing import Iterator

    import pandas as pd

    s_min = 1.0 - threshold  # minimum Jaccard similarity
    spark = unresolved.sparkSession
    entries = [
        (r["alias_key"], r["canonical_uri"])
        for r in dictionary.select("alias_key", "canonical_uri").collect()
    ]
    bc = spark.sparkContext.broadcast(entries)

    def _match(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one index build per worker process, not per task: workers are
        # reused across tasks, and the probe stage is deliberately split
        # into many small tasks (repartition below) for core utilization.
        cached = _GRAM_INDEX_CACHE.get(id(bc.value))
        if cached is None or cached[0] is not bc.value or cached[1] != s_min:
            index = _GramIndex(bc.value, s_min)
            _GRAM_INDEX_CACHE[id(bc.value)] = (bc.value, s_min, index)
        else:
            index = cached[2]
        for pdf in batches:
            out_k, out_u = [], []
            for key in pdf["alias_key"]:
                uri = index.probe(key, threshold)
                if uri is not None:
                    out_k.append(key)
                    out_u.append(uri)
            yield pd.DataFrame(
                {"alias_key": out_k, "canonical_uri": out_u}
            )

    # Explicit repartition: the distinct's post-shuffle volume is tiny
    # (vocabulary-sized keys), so AQE coalesces it to ~1-3 partitions — but
    # this stage is PROBE-CPU-bound, not data-bound (~0.7 ms/key measured on
    # near-dictionary keys, which hit hundreds of candidates each), and the
    # coalesce serializes ~30 s of probe CPU onto 3 cores at ANY cluster
    # size. A user repartition pins the fan-out to the core count.
    n_probe_parts = max(spark.sparkContext.defaultParallelism * 2, 8)
    resolved_keys = (
        unresolved.select("alias_key")
        .distinct()
        .repartition(n_probe_parts)
        .mapInPandas(_match, "alias_key string, canonical_uri string")
    )
    return (
        unresolved.join(F.broadcast(resolved_keys), "alias_key", "inner")
        .select(*MENTION_KEYS, "canonical_uri")
        .withColumn("tier", F.lit("ngram"))
    )


def _char_ngram_features(df: DataFrame, col: str, n: int = 3, dim: int = 8192):
    """col → sparse count vector of character n-grams (JVM-side only:
    split-to-chars → NGram → HashingTF; no Python UDF)."""
    chars = df.withColumn("_chars", F.slice(F.split(F.col(col), ""), 1, 10_000))
    ng = NGram(n=n, inputCol="_chars", outputCol="_ngrams")
    tf = HashingTF(inputCol="_ngrams", outputCol="_features", numFeatures=dim)
    return tf.transform(ng.transform(chars)).drop("_chars", "_ngrams")


def _lsh_tier(
    unresolved: DataFrame,
    dictionary: DataFrame,
    threshold: float = 0.5,
    num_hash_tables: int = 6,
) -> DataFrame:
    """MinHash-LSH blocking + best-match resolution for fuzzy mentions.

    Scale: approxSimilarityJoin shuffles on LSH band buckets — candidate
    pairs only, never the cross product. numHashTables trades recall for
    shuffle volume; 6 tables at J≈0.8 true similarity gives >99.9% pair
    recall. Seed fixed → deterministic across runs/cluster sizes.
    """
    keys = (
        unresolved.select("alias_key").distinct()
    )  # dedup before the expensive join: many mentions share a surface form
    k_feat = _char_ngram_features(keys, "alias_key")
    d = dictionary.select("alias_key", "canonical_uri").withColumnRenamed(
        "alias_key", "dict_key"
    )
    d_feat = _char_ngram_features(d, "dict_key")

    mh = MinHashLSH(
        inputCol="_features", outputCol="_hashes", numHashTables=num_hash_tables, seed=42
    )
    model = mh.fit(d_feat)
    pairs = model.approxSimilarityJoin(
        k_feat, d_feat, threshold, distCol="jaccard"
    ).select(
        F.col("datasetA.alias_key").alias("alias_key"),
        F.col("datasetB.dict_key").alias("dict_key"),
        F.col("datasetB.canonical_uri").alias("canonical_uri"),
        "jaccard",
    )
    best = Window.partitionBy("alias_key").orderBy(
        F.col("jaccard").asc(), F.col("canonical_uri").asc()
    )
    resolved_keys = (
        pairs.withColumn("_rn", F.row_number().over(best))
        .filter(F.col("_rn") == 1)
        .select("alias_key", "canonical_uri")
    )
    return (
        unresolved.join(F.broadcast(resolved_keys), "alias_key", "inner")
        .select(*MENTION_KEYS, "canonical_uri")
        .withColumn("tier", F.lit("lsh"))
    )


def link_mentions_onepass(
    mentions: DataFrame, dictionary: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """Row-identical to ``link_mentions(exact_strategy='broadcast',
    fuzzy_strategy='ngram')`` — same rows, same tier labels — but as ONE
    resolve stage + ONE broadcast hash join instead of the three-scan tier
    cascade. This is the deployment path of tools/kg_job.py.

    Why: the tiered cascade costs ~6 extra stages (exact join, anti-join,
    distinct, fuzzy resolve, fuzzy join, union), each with fixed driver/
    codegen/scheduling cost that does NOT shrink with cores — measured as
    the link phase *anti-scaling* from 31 s at local[4] to ~50 s at
    local[16] on a 1M-doc corpus. Since both lookup structures are
    broadcast-sized BY CONTRACT (same contract as the tiered broadcast/
    ngram pair), every key can be resolved in one in-process pass:

    1. distinct alias keys — the only shuffle, vocabulary-sized, partial
       aggregation map-side;
    2. one mapInPandas resolve stage over the keys: exact dictionary hash
       lookup (tier 'exact'), miss → prefix-filtered gram-index probe
       (tier 'ngram') — same ``_GramIndex``, same tie-breaking. The key
       space saturates with corpus size (measured: 9.06M mention rows →
       50,191 distinct keys at 1M docs; surface-form variation is
       vocabulary-bounded, not corpus-bounded), so the resolved map stays
       ~10 MB broadcast at any scale;
    3. ONE broadcast hash join mentions ⋈ resolved(alias_key) — this is
       the J3 "broadcast/hash-join entity linking" of the north_star; the
       salted shuffle variant for over-broadcast dictionaries remains
       ``_exact_salted``.
    """
    from typing import Iterator

    import pandas as pd

    s_min = 1.0 - threshold
    spark = mentions.sparkSession
    # sorted() makes the broadcast order deterministic regardless of
    # collect()'s partition order; the exact tier below is a MULTIMAP so a
    # dictionary with several canonical URIs per alias_key (an ambiguous
    # alias) emits one link row per match — exactly what the tiered
    # ``_exact_broadcast`` inner join does. A plain dict would silently
    # collapse duplicates to the last-collected row (nondeterministic) and
    # break the "row-identical to link_mentions" contract.
    entries = sorted(
        (r["alias_key"], r["canonical_uri"], r["is_exact"])
        for r in dictionary.select(
            "alias_key", "canonical_uri", "is_exact"
        ).collect()
    )
    bc = spark.sparkContext.broadcast(entries)

    def _resolve(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cached = _GRAM_INDEX_CACHE.get(id(bc.value))
        if cached is None or cached[0] is not bc.value or cached[1] != s_min:
            exact: dict[str, list[str]] = {}
            for k, u, ex in bc.value:
                if ex:
                    exact.setdefault(k, []).append(u)
            index = _GramIndex([(k, u) for k, u, _ in bc.value], s_min)
            _GRAM_INDEX_CACHE[id(bc.value)] = (bc.value, s_min, (exact, index))
        else:
            exact, index = cached[2]
        for pdf in batches:
            out_k, out_u, out_t = [], [], []
            for key in pdf["alias_key"]:
                uris = exact.get(key)
                if uris is not None:
                    for uri in uris:
                        out_k.append(key)
                        out_u.append(uri)
                        out_t.append("exact")
                    continue
                uri = index.probe(key, threshold)
                if uri is not None:
                    out_k.append(key)
                    out_u.append(uri)
                    out_t.append("ngram")
            yield pd.DataFrame(
                {"alias_key": out_k, "canonical_uri": out_u, "tier": out_t}
            )

    n_probe_parts = max(spark.sparkContext.defaultParallelism * 2, 8)
    resolved = (
        mentions.select("alias_key")
        .distinct()
        .repartition(n_probe_parts)
        .mapInPandas(
            _resolve, "alias_key string, canonical_uri string, tier string"
        )
    )
    return mentions.join(F.broadcast(resolved), "alias_key", "inner").select(
        *MENTION_KEYS, "canonical_uri", "tier"
    )


def link_mentions(
    mentions: DataFrame,
    dictionary: DataFrame,
    exact_strategy: str = "broadcast",
    salt: int | None = None,
    lsh_threshold: float = 0.5,
    fuzzy_strategy: str = "auto",
) -> DataFrame:
    """mentions(url, part_key, section_ordinal, mention, alias_key) →
    links(..., canonical_uri, tier). Unlinkable mentions are dropped
    (reference behavior: unrecognized refs emit nothing).

    ``fuzzy_strategy``: 'ngram' (exact Jaccard vs broadcast dictionary),
    'lsh' (MinHash-LSH blocking — the >_NGRAM_DICT_MAX-row path), or
    'auto' (pick by dictionary size). ``salt=None`` lets the salted exact
    strategy self-tune from the key histogram (``tuned_salt``)."""
    exact = (
        _exact_broadcast(mentions, dictionary)
        if exact_strategy == "broadcast"
        else _exact_salted(mentions, dictionary, salt)
    )
    # tier 2/3 input: mentions whose key has no exact-dictionary row.
    exact_keys = dictionary.filter(F.col("is_exact")).select("alias_key").distinct()
    unresolved = mentions.join(F.broadcast(exact_keys), "alias_key", "left_anti")
    if fuzzy_strategy == "auto":
        # bounded probe: limit(MAX+1) stops scanning as soon as the
        # threshold is crossed instead of counting the whole dictionary
        # (round-2 review nit: a full count() was an extra job per call)
        over = (
            dictionary.limit(_NGRAM_DICT_MAX + 1).count()
            > _NGRAM_DICT_MAX
        )
        fuzzy_strategy = "lsh" if over else "ngram"
    fuzzy = (
        _ngram_tier(unresolved, dictionary, threshold=lsh_threshold)
        if fuzzy_strategy == "ngram"
        else _lsh_tier(unresolved, dictionary, threshold=lsh_threshold)
    )
    return exact.unionByName(fuzzy)
